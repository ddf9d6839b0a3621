"""TPU-native ORB: pyramid -> FAST-9 -> Harris -> per-level top-K ->
orientation -> steered BRIEF-256, entirely in JAX.

This is the first-party replacement for the OpenCV work hidden behind
``cv::ORB::detectAndCompute`` (reference orb_extractor.cpp:13; delegated
algorithm inventory SURVEY.md §2.3 row 1): 1000 features, scale 1.2,
8 levels, 32-byte descriptors.

TPU-first shape of each stage (everything is dense image-wide math that
XLA fuses into a few elementwise/reduce kernels per level — no per-feature
control flow until the final fixed-size top-K):

- FAST-9/16: the 16 circle taps are materialized by `jnp.roll` shifts (all
  static), bright/dark masks reduced with a circular 9-window minimum
  computed on the doubled mask stack — a [32,H,W] reduce, not a loop over
  pixels.
- Harris response on Sobel gradients with a 7x7 box window (OpenCV ORB
  uses HARRIS_SCORE ranking; blockSize 7, k = 0.04).
- 3x3 NMS via max-pool comparison.
- per-level candidate budget n_i ~ geometric(1/1.2) of n_features (the
  OpenCV per-level distribution), selected with one `lax.top_k` over the
  flattened response map.
- orientation by intensity centroid over the radius-15 disc, computed for
  the selected keypoints via gathered 31x31 patches (vmapped
  dynamic_slice).
- rBRIEF: a fixed 256-pair pattern (deterministic Gaussian pattern, sigma
  = patch/5 — descriptors are self-consistent, NOT bitwise-equal to
  OpenCV's learned pattern; parity is validated statistically, see
  SURVEY.md §7.3) steered by the keypoint angle, sampled with nearest
  rounding from a 7x7 Gaussian-blurred level image, packed to uint8[32].

The public entry point pads/validity-masks to a fixed feature capacity,
matching the extractor protocol (SURVEY.md §2.1 "Feature extractor ABC").
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

FAST_RADIUS = 3
HALF_PATCH = 15          # orientation disc radius (OpenCV HALF_PATCH_SIZE)
BRIEF_RADIUS = 13        # pattern points live in [-13, 13]
PAD = 40                 # sampling pad so all gathers stay in bounds
HARRIS_K = 0.04
HARRIS_BLOCK = 7

# FAST circle taps (dy, dx), radius 3, clockwise from 12 o'clock — the
# standard Bresenham circle used by every FAST implementation.
FAST_CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    np.int32,
)


def brief_pattern(seed: int = 12345, n_pairs: int = 256) -> np.ndarray:
    """Deterministic BRIEF pattern: [n_pairs, 2, 2] int offsets (y, x).

    Pairs drawn iid Gaussian(0, (2*BRIEF_RADIUS/5)^2) clipped to the disc,
    per the BRIEF paper's G-II distribution. Fixed seed -> stable
    descriptors across processes/devices.
    """
    rng = np.random.RandomState(seed)
    sigma = 2.0 * BRIEF_RADIUS / 5.0
    pts = rng.normal(0.0, sigma, size=(n_pairs, 2, 2))
    pts = np.clip(np.round(pts), -BRIEF_RADIUS, BRIEF_RADIUS).astype(np.int32)
    # avoid degenerate identical pairs
    same = np.all(pts[:, 0] == pts[:, 1], axis=-1)
    pts[same, 1, 0] += 1
    return pts


_PATTERN = brief_pattern()


def _gaussian_kernel1d(size: int = 7, sigma: float = 2.0) -> np.ndarray:
    x = np.arange(size) - size // 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _sep_conv(img: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """Separable 2D convolution with symmetric padding (single image)."""
    r = len(k) // 2
    kj = jnp.asarray(k)
    p = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    out = sum(kj[i] * p[i : i + img.shape[0], :] for i in range(len(k)))
    p = jnp.pad(out, ((0, 0), (r, r)), mode="edge")
    return sum(kj[i] * p[:, i : i + img.shape[1]] for i in range(len(k)))


def _box7(img: jnp.ndarray) -> jnp.ndarray:
    ones = np.ones(HARRIS_BLOCK, np.float32)
    return _sep_conv(img, ones)


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shifted view: out[y,x] = img[y+dy, x+dx] (edge padded)."""
    return jnp.roll(img, (-dy, -dx), axis=(0, 1))


def _fast_corners(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-9/16 corner mask (bool [H,W]).

    The 16 circle comparisons are packed into an int32 bitmask per pixel
    and the cyclic run-of-9 test is done with shift-ANDs — two [H,W] int32
    temporaries instead of a [24,H,W] stack of window minimums (which
    lowered to a pathological fusion on TPU).
    """
    hi = img + threshold
    lo = img - threshold
    bright = jnp.zeros(img.shape, jnp.int32)
    dark = jnp.zeros(img.shape, jnp.int32)
    for i, (dy, dx) in enumerate(FAST_CIRCLE):
        tap = _shift(img, int(dy), int(dx))
        bit = jnp.int32(1 << i)
        bright = bright | jnp.where(tap > hi, bit, 0)
        dark = dark | jnp.where(tap < lo, bit, 0)

    def run9(m):
        x = m | (m << 16)
        r = x & (x >> 1)   # runs >= 2
        r = r & (r >> 2)   # runs >= 4
        r = r & (r >> 4)   # runs >= 8
        r = r & (x >> 8)   # runs >= 9
        return (r & jnp.int32(0xFFFF)) != 0

    return run9(bright) | run9(dark)


def _harris(img: jnp.ndarray) -> jnp.ndarray:
    """Harris response with Sobel gradients and a 7x7 block window."""
    # Sobel via separable [1,2,1] x [-1,0,1]
    smooth = np.array([1.0, 2.0, 1.0], np.float32)
    diff = np.array([-1.0, 0.0, 1.0], np.float32)

    def sobel(img, horizontal):
        r = 1
        p = jnp.pad(img, r, mode="edge")
        ky, kx = (smooth, diff) if horizontal else (diff, smooth)
        rows = sum(ky[i] * p[i : i + img.shape[0], :] for i in range(3))
        return sum(kx[i] * rows[:, i : i + img.shape[1]] for i in range(3))

    dx = sobel(img, True) * 0.25
    dy = sobel(img, False) * 0.25
    sxx = _box7(dx * dx)
    syy = _box7(dy * dy)
    sxy = _box7(dx * dy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - HARRIS_K * tr * tr


def _nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression mask."""
    neigh = [
        _shift(score, dy, dx)
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        if (dy, dx) != (0, 0)
    ]
    return score >= jnp.stack(neigh).max(axis=0)


def _level_quotas(n_features: int, n_levels: int, scale: float) -> list[int]:
    """Per-level feature budget, geometric in 1/scale (OpenCV ORB scheme)."""
    q = 1.0 / scale
    first = n_features * (1 - q) / (1 - q**n_levels)
    quotas = [int(round(first * q**i)) for i in range(n_levels - 1)]
    quotas.append(max(n_features - sum(quotas), 0))
    return quotas


PATCH_R = 18  # covers the rotated BRIEF radius (13*sqrt2 ~ 18.4 rounds to <=18)
PATCH_S = 2 * PATCH_R + 1


def _orientation(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle from [K, PATCH_S, PATCH_S] patches over the
    radius-15 disc (IC-angle, reference inventory §2.3)."""
    ys, xs = np.mgrid[-PATCH_R : PATCH_R + 1, -PATCH_R : PATCH_R + 1]
    disc = (xs**2 + ys**2 <= HALF_PATCH**2).astype(np.float32)
    wx = jnp.asarray((xs * disc).astype(np.float32))
    wy = jnp.asarray((ys * disc).astype(np.float32))
    m10 = jnp.sum(patches * wx, axis=(-2, -1))
    m01 = jnp.sum(patches * wy, axis=(-2, -1))
    return jnp.arctan2(m01, m10)


def _extract_level(
    img: jnp.ndarray,  # [H,W] float32 level image (unpadded)
    quota: int,
    fast_threshold: float,
    border: int,
    use_pallas: bool = False,
    profile_stage: int = 3,  # 1=detect+topk, 2=+patches/orientation, 3=full
):
    """One pyramid level -> (xy [q,2] level coords, resp [q], desc [q,32],
    valid [q])."""
    H, W = img.shape
    ys, xs = np.mgrid[0:H, 0:W]
    in_border = jnp.asarray(
        (xs >= border) & (xs < W - border) & (ys >= border) & (ys < H - border)
    )
    if use_pallas:
        # fused FAST+Harris+NMS in one VMEM-resident Pallas kernel
        from ..ops.pallas_detect import NEG, fast_harris_score

        raw = fast_harris_score(img, fast_threshold)
        score = jnp.where(in_border & (raw > 0.5 * NEG), raw, -jnp.inf)
    else:
        corners = _fast_corners(img, fast_threshold)
        harris = _harris(img)
        cand = corners & in_border & _nms3(jnp.where(corners, harris, -jnp.inf))
        score = jnp.where(cand, harris, -jnp.inf)

    # grid-bucketed top-K: keep only the best corner per CELL x CELL cell,
    # then top-K over cells. A top_k over the full H*W map dominated the
    # frame budget; bucketing is ~60x smaller AND improves the spatial
    # distribution (the moral analog of OpenCV ORB's grid retention).
    CELL = 8
    Hc, Wc = -(-H // CELL), -(-W // CELL)
    pad_h, pad_w = Hc * CELL - H, Wc * CELL - W
    sp = jnp.pad(score, ((0, pad_h), (0, pad_w)), constant_values=-jnp.inf)
    cells = sp.reshape(Hc, CELL, Wc, CELL).transpose(0, 2, 1, 3).reshape(
        Hc, Wc, CELL * CELL
    )
    cell_max = jnp.max(cells, axis=-1)              # [Hc,Wc]
    cell_arg = jnp.argmax(cells, axis=-1)           # [Hc,Wc] offset in cell
    top, cidx = jax.lax.top_k(cell_max.reshape(-1), quota)
    cy = (cidx // Wc).astype(jnp.int32)
    cx = (cidx % Wc).astype(jnp.int32)
    off = cell_arg.reshape(-1)[cidx].astype(jnp.int32)
    yy = cy * CELL + off // CELL
    xx = cx * CELL + off % CELL
    valid = jnp.isfinite(top)

    xy0 = jnp.stack([xx.astype(jnp.float32), yy.astype(jnp.float32)], -1)
    if profile_stage <= 1:  # detector + top-K only (profiling)
        return xy0, jnp.where(valid, top, 0.0), jnp.zeros(
            (quota, 32), jnp.uint8), valid

    # ---- one patch extraction feeds both orientation and BRIEF ----
    # (full-image fancy gathers serialize on TPU; one windowed gather per
    # keypoint from the blurred image feeds everything downstream)
    blurred = _sep_conv(img, _gaussian_kernel1d())
    spad = jnp.pad(blurred, PAD, mode="edge")

    def patch(y, x):
        return jax.lax.dynamic_slice(
            spad, (y + PAD - PATCH_R, x + PAD - PATCH_R), (PATCH_S, PATCH_S)
        )

    patches = jax.vmap(patch)(yy, xx)          # [q,S,S]
    angles = _orientation(patches)
    if profile_stage <= 2:  # + patches/orientation, no BRIEF (profiling)
        return xy0, jnp.where(valid, top, 0.0) + 0 * angles, jnp.zeros(
            (quota, 32), jnp.uint8), valid

    # ---- steered BRIEF sampled inside the patch (take_along_axis keeps the
    # gather batched per keypoint; the full-image fancy gather serialized) ----
    pat = jnp.asarray(_PATTERN.astype(np.float32))  # [256,2,2] (y,x)
    ca, sa = jnp.cos(angles), jnp.sin(angles)  # [q]
    py, px_ = pat[..., 0], pat[..., 1]  # [256,2]
    ry = jnp.round(px_[None] * sa[:, None, None] + py[None] * ca[:, None, None])
    rx = jnp.round(px_[None] * ca[:, None, None] - py[None] * sa[:, None, None])
    lin = (
        (ry.astype(jnp.int32) + PATCH_R) * PATCH_S
        + (rx.astype(jnp.int32) + PATCH_R)
    )  # [q,256,2] indices into the flattened patch
    q = lin.shape[0]
    flat = patches.reshape(q, PATCH_S * PATCH_S)
    vals = jnp.take_along_axis(flat, lin.reshape(q, -1), axis=1).reshape(q, 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)  # [q,256]
    weights = jnp.asarray((2 ** np.arange(8)).astype(np.uint8))
    desc = jnp.sum(
        bits.reshape(-1, 32, 8) * weights[None, None, :], axis=-1, dtype=jnp.uint8
    )

    xy = jnp.stack([xx.astype(jnp.float32), yy.astype(jnp.float32)], -1)
    resp = jnp.where(valid, top, 0.0)
    return xy, resp, desc, valid


@functools.partial(
    jax.jit,
    static_argnames=("n_features", "scale_factor", "n_levels", "n_slots",
                     "fast_threshold", "border", "use_pallas",
                     "profile_stage"),
)
def orb_extract(
    gray_u8: jnp.ndarray,  # [H,W] uint8
    n_features: int = 1000,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    n_slots: int = 1024,
    fast_threshold: float = 20.0,
    border: int = 31,
    use_pallas: int = -1,  # -1 auto (TPU only), 0 off, 1 on
    profile_stage: int = 3,  # profiling knob: 1=detect, 2=+orient, 3=full
):
    """Full ORB: returns (px [S,2] level-0 pixels, resp [S], desc [S,32],
    valid [S]) with S = n_slots; defaults mirror orb_extractor.h:11-13."""
    if use_pallas == -1:
        # default OFF: this environment's tunneled backend cannot compile
        # Mosaic kernels (remote compile helper env is broken server-side,
        # local AOT libtpu is version-mismatched). The kernel is validated
        # in interpreter mode (tests/test_pallas_detect.py); opt in with
        # VXS_PALLAS=1 on a setup with a working Mosaic toolchain.
        import os

        use_pallas = 1 if (
            os.environ.get("VXS_PALLAS") == "1"
            and jax.default_backend() not in ("cpu",)
        ) else 0
    H, W = gray_u8.shape
    img0 = gray_u8.astype(jnp.float32)
    quotas = _level_quotas(n_features, n_levels, scale_factor)

    all_xy, all_resp, all_desc, all_valid = [], [], [], []
    img = img0
    for lvl in range(n_levels):
        s = scale_factor**lvl
        h, w = int(round(H / s)), int(round(W / s))
        if lvl > 0:
            img = jax.image.resize(img0, (h, w), method="linear")
        xy, resp, desc, valid = _extract_level(
            img, quotas[lvl], fast_threshold, border,
            use_pallas=bool(use_pallas), profile_stage=profile_stage,
        )
        all_xy.append(xy * s)  # scale coords back to level 0
        all_resp.append(resp)
        all_desc.append(desc)
        all_valid.append(valid)

    xy = jnp.concatenate(all_xy)
    resp = jnp.concatenate(all_resp)
    desc = jnp.concatenate(all_desc)
    valid = jnp.concatenate(all_valid)

    # compact into n_slots (valid first, by construction ordered by level)
    S = n_slots
    n_total = xy.shape[0]
    if n_total < S:
        pad = S - n_total
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2), xy.dtype)])
        resp = jnp.concatenate([resp, jnp.zeros((pad,), resp.dtype)])
        desc = jnp.concatenate([desc, jnp.zeros((pad, 32), desc.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    else:
        # order: keep valid entries first
        order = jnp.argsort(~valid)  # stable: valid (False<True after ~)
        xy, resp, desc, valid = xy[order][:S], resp[order][:S], desc[order][:S], valid[order][:S]
    return xy, resp, desc, valid


class JaxOrbExtractor:
    """Device ORB with the host extractor protocol (numpy in/out)."""

    def __init__(self, n_features: int = 1000, scale_factor: float = 1.2,
                 n_levels: int = 8, n_slots: int = 1024,
                 fast_threshold: float = 20.0):
        self.kwargs = dict(
            n_features=n_features, scale_factor=scale_factor,
            n_levels=n_levels, n_slots=n_slots, fast_threshold=fast_threshold,
        )
        self.n_slots = n_slots

    def extract(self, gray: np.ndarray):
        px, resp, desc, valid = orb_extract(jnp.asarray(gray), **self.kwargs)
        return (np.asarray(px), np.asarray(resp), np.asarray(desc),
                np.asarray(valid))
