"""Pallas TPU kernel: fused FAST-9 + Harris + NMS + border mask + blur.

The detection stage of the ORB frontend is ~50 elementwise passes over the
pyramid atlas (circle taps, run tests, Sobel, box filters, NMS, Gaussian
blur); as separate XLA fusions they round-trip HBM several times. This
kernel computes BOTH detection outputs in one VMEM-resident pass per row
tile:

- ``score`` f32 [H, W]: Harris response where (FAST corner & 3x3 NMS winner
  & border mask), else NEG;
- ``blur`` bf16 [H, W]: the 7-tap Gaussian blur the BRIEF patch stage
  samples from (computed from the same VMEM-resident rows for free).

Semantics match the jnp path in ``models/orb_jax.py`` (same taps, same
Harris constants, same masked NMS, bf16 arithmetic with f32 det/trace
cancellation). The contiguous-9 test packs the 16 circle comparisons into
an int32 and detects a cyclic run of 9 with shift-ANDs.

Mosaic lessons baked in (round 2): no jnp.pad in-kernel (lowers to a
tpu.concatenate with offsets Mosaic rejects) — halo carried by wider
static slices; row tiles bound the stack-allocated temporaries (a
monolithic whole-image kernel exceeded VMEM); the whole padded image stays
in VMEM so the input spec remains vmap-compatible (ANY-space blocked
inputs are not); slice shapes 8-row / 128-lane aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.orb_jax import (
    FAST_CIRCLE,
    HARRIS_BLOCK,
    HARRIS_K,
    _gaussian_kernel1d,
)

PAD_K = 12  # halo; 12 (not the minimal 9) keeps BH + 2*PAD_K 8-row-aligned
NEG = -3.0e38  # stand-in for -inf that survives f32 arithmetic


def _kernel(img_ref, mask_ref, score_ref, blur_ref, *, W, BH, threshold):
    # row-tiled: load this tile's rows (+halo) from the VMEM-resident
    # image, compute the [BH, W] score + blur tiles on-chip.
    ti = pl.program_id(0)
    img = img_ref[pl.ds(ti * BH, BH + 2 * PAD_K), :]  # bf16
    H = BH            # all region math below is per-tile

    def sl(arr, dy, dx, h, w, oy, ox):
        # offsets are static python ints -> static slices (Mosaic-friendly)
        return arr[oy + dy : oy + dy + h, ox + dx : ox + dx + w]

    # ---------------- FAST-9/16 over the [H+2, W+2] NMS halo -------------
    H2, W2 = H + 2, W + 2
    oy = ox = PAD_K - 1
    # compares in f32: an i1 born from a bf16 compare carries 16-sublane
    # mask tiling and Mosaic cannot relayout it to the int32 select's
    # 32-bit tiling ("Invalid relayout ... replicated in destination")
    center = sl(img, 0, 0, H2, W2, oy, ox).astype(jnp.float32)
    hi = center + jnp.float32(threshold)
    lo = center - jnp.float32(threshold)
    bright = jnp.zeros((H2, W2), jnp.int32)
    dark = jnp.zeros((H2, W2), jnp.int32)
    for i, (dy, dx) in enumerate(FAST_CIRCLE):
        tap = sl(img, int(dy), int(dx), H2, W2, oy, ox).astype(jnp.float32)
        bit = jnp.int32(1 << i)
        bright = bright | jnp.where(tap > hi, bit, 0)
        dark = dark | jnp.where(tap < lo, bit, 0)

    def run9(m):
        # cyclic run of >= 9 set bits among 16: duplicate to 32 bits, then
        # shift-AND doubling (>=2, >=4, >=8) plus one more for >=9
        x = m | (m << 16)
        r = x & (x >> 1)   # runs >= 2
        r = r & (r >> 2)   # runs >= 4
        r = r & (r >> 4)   # runs >= 8
        r = r & (x >> 8)   # runs >= 9
        return r & jnp.int32(0xFFFF)

    # corner mask as f32 0/1 via arithmetic (no i1 select on splats)
    corner2 = jnp.minimum(
        (run9(bright) | run9(dark)).astype(jnp.float32), 1.0
    )

    # ---------------- Harris over the same [H+2, W+2] region -------------
    # Sobel needs a further +-1, the 7x7 box a further +-3: compute the
    # gradients over [H2+6, W2+6] (one wider so the horizontal taps are
    # static slices — jnp.pad would lower to an unsupported concatenate).
    HB, WB = H2 + 6, W2 + 6
    gy = gx = PAD_K - 4

    def sobel_at(dy, dx):
        return sl(img, dy, dx, HB, WB + 2, gy, gx - 1)

    # separable [1,2,1] x [-1,0,1] (x0.25, as the jnp path), bf16
    two = jnp.bfloat16(2.0)
    rows_s = sobel_at(0, 0) * two + sobel_at(-1, 0) + sobel_at(1, 0)
    rows_d = sobel_at(1, 0) - sobel_at(-1, 0)

    q = jnp.bfloat16(0.25)
    dx_img = (rows_s[:, 2 : 2 + WB] - rows_s[:, 0:WB]) * q
    dy_img = (
        rows_d[:, 0:WB] + two * rows_d[:, 1 : 1 + WB] + rows_d[:, 2 : 2 + WB]
    ) * q

    def box7(a):
        # separable 7x7 box on the inner [H2, W2] region of a [HB, WB] map
        acc = jnp.zeros((H2, WB), a.dtype)
        for k in range(HARRIS_BLOCK):
            acc = acc + a[k : k + H2, :]
        out = jnp.zeros((H2, W2), a.dtype)
        for k in range(HARRIS_BLOCK):
            out = out + acc[:, k : k + W2]
        return out

    # products/box in bf16 (VPU throughput); det/trace CANCELLATION in
    # f32, matching models/orb_jax._harris
    sxx = box7(dx_img * dx_img).astype(jnp.float32)
    syy = box7(dy_img * dy_img).astype(jnp.float32)
    sxy = box7(dx_img * dy_img).astype(jnp.float32)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    harris2 = det - HARRIS_K * tr * tr  # [H2, W2] f32

    # ---------------- masked 3x3 NMS -------------------------------------
    # arithmetic mask (corner2 is exactly 0/1): avoids an i1 select
    masked2 = corner2 * harris2 + (1.0 - corner2) * NEG
    nmax = jnp.full((H, W), NEG, jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) == (0, 0):
                continue
            nmax = jnp.maximum(
                nmax, masked2[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
            )
    center_m = masked2[1 : 1 + H, 1 : 1 + W]
    corner_cf = corner2[1 : 1 + H, 1 : 1 + W]
    harris_c = harris2[1 : 1 + H, 1 : 1 + W]
    maskf = mask_ref[:].astype(jnp.float32)
    k = corner_cf * maskf                      # 0/1, f32 arithmetic
    score0 = k * harris_c + (1.0 - k) * NEG
    # single select whose branches share the non-splat layout
    score_ref[:] = jnp.where(center_m >= nmax, score0,
                             jnp.zeros((H, W), jnp.float32) + NEG)

    # ---------------- 7-tap Gaussian blur (for BRIEF patches) ------------
    kblur = _gaussian_kernel1d()
    bx = PAD_K - 3
    racc = jnp.zeros((H, W + 6), jnp.bfloat16)
    for k in range(7):
        racc = racc + jnp.bfloat16(float(kblur[k])) * sl(
            img, k - 3, 0, H, W + 6, PAD_K, bx
        )
    out = jnp.zeros((H, W), jnp.bfloat16)
    for k in range(7):
        out = out + jnp.bfloat16(float(kblur[k])) * racc[:, k : k + W]
    blur_ref[:] = out


@functools.partial(jax.jit, static_argnames=("threshold", "block_rows"))
def fast_harris_blur(
    img16: jnp.ndarray,   # [H, W] bf16 (atlas)
    mask: jnp.ndarray,    # [H, W] int8 border mask (1 = allowed)
    threshold: float = 20.0,
    block_rows: int = 128,  # 128-row tiles measured fastest (0.416 vs
                            # 0.436 ms/frame at 64; fewer grid steps, halo
                            # amortized over more rows; VMEM still fits
                            # under the chunk-of-8 vmap)
):
    """Fused detection + blur over a pyramid atlas. Returns
    (score f32 [H,W] — NEG where not a surviving masked corner,
    blur bf16 [H,W])."""
    H, W = img16.shape
    BH = block_rows
    Hp = -(-H // BH) * BH
    # lane (width) dim must be 128-aligned for the in-kernel slices
    Wp = -(-(W + 2 * PAD_K) // 128) * 128
    padded = jnp.pad(
        img16, ((PAD_K, PAD_K + Hp - H), (PAD_K, Wp - W - PAD_K)),
        mode="edge",
    )
    mask_p = jnp.pad(mask, ((0, Hp - H), (0, 0)))
    kernel = functools.partial(_kernel, W=W, BH=BH, threshold=threshold)
    score, blur = pl.pallas_call(
        kernel,
        grid=(Hp // BH,),
        out_shape=(
            jax.ShapeDtypeStruct((Hp, W), jnp.float32),
            jax.ShapeDtypeStruct((Hp, W), jnp.bfloat16),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((BH, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BH, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BH, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(padded, mask_p)
    return score[:H], blur[:H]


@functools.partial(jax.jit, static_argnames=("threshold", "block_rows"))
def fast_harris_score(img: jnp.ndarray, threshold: float = 20.0,
                      block_rows: int = 128) -> jnp.ndarray:
    """Detection-only compatibility wrapper (f32 in / f32 score out, no
    border mask — callers mask downstream)."""
    H, W = img.shape
    mask = jnp.ones((H, W), jnp.int8)
    score, _ = fast_harris_blur(
        img.astype(jnp.bfloat16), mask, threshold, block_rows
    )
    return score
