"""Pallas fused FAST+Harris+NMS kernel vs the jnp reference path.

Runs in Pallas interpreter mode on CPU; scores must agree with the pure
jnp implementation away from the (border-masked) edges.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from visionx_slam_tpu.models import orb_jax as OJ


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(3)
    cells = rng.uniform(30, 220, size=(16, 20))
    im = np.kron(cells, np.ones((8, 8)))[:120, :160]
    im = im + rng.uniform(-1, 1, size=im.shape)  # break exact NMS ties
    return jnp.asarray(np.clip(im, 0, 255), jnp.float32)


def reference_score(img, threshold=20.0, border=31):
    # mirror the production jnp path's precision: bf16 taps/products, f32
    # det/trace cancellation (models/orb_jax.py dense passes)
    img16 = img.astype(jnp.bfloat16)
    corners = OJ._fast_corners(img16, jnp.bfloat16(threshold))
    harris = OJ._harris(img16).astype(jnp.float32)
    cand = corners & OJ._nms3(jnp.where(corners, harris, -jnp.inf))
    return jnp.where(cand, harris, -jnp.inf)


def test_pallas_matches_reference(img):
    from visionx_slam_tpu.ops import pallas_detect as PD

    with pltpu.force_tpu_interpret_mode():
        score_p = PD.fast_harris_score(img, 20.0)
    score_r = reference_score(img)

    b = 31  # compare only inside the detection border
    sp = np.asarray(score_p)[b:-b, b:-b]
    sr = np.asarray(score_r)[b:-b, b:-b]
    mask_p = sp > 0.5 * PD.NEG
    mask_r = np.isfinite(sr)
    agree = (mask_p == mask_r).mean()
    # residual disagreements come from float-associativity NMS ties
    assert agree > 0.99, f"corner mask agreement {agree:.4f}"
    both = mask_p & mask_r
    if both.any():
        # kernel computes the blur/box in a different association order
        # than XLA's fusion; bf16 keeps them within ~1%
        np.testing.assert_allclose(sp[both], sr[both], rtol=2e-2, atol=20.0)


def test_orb_extract_pallas_flag_cpu(img):
    """use_pallas=0 on CPU must work and stay deterministic (the auto flag
    resolves to the jnp path on CPU)."""
    g = img.astype(jnp.uint8)
    out0 = OJ.orb_extract(g, n_features=100, n_levels=2, n_slots=128, use_pallas=0)
    out1 = OJ.orb_extract(g, n_features=100, n_levels=2, n_slots=128)
    np.testing.assert_array_equal(np.asarray(out0[0]), np.asarray(out1[0]))


def test_pallas_blur_matches_sepconv(img):
    """The kernel's fused 7-tap Gaussian must match the jnp separable
    blur (bf16) away from edges."""
    from visionx_slam_tpu.ops import pallas_detect as PD

    H, W = img.shape
    with pltpu.force_tpu_interpret_mode():
        _, blur_p = PD.fast_harris_blur(
            img.astype(jnp.bfloat16), jnp.ones((H, W), jnp.int8), 20.0
        )
    blur_r = OJ._sep_conv(img.astype(jnp.bfloat16), OJ._gaussian_kernel1d())
    b = 8
    bp = np.asarray(blur_p[b:-b, b:-b], np.float32)
    br = np.asarray(blur_r[b:-b, b:-b], np.float32)
    np.testing.assert_allclose(bp, br, rtol=2e-2, atol=2.0)
