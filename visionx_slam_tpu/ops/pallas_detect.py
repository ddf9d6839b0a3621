"""Pallas TPU kernel: fused FAST-9 + Harris + NMS corner scoring.

The detection stage of the ORB frontend is ~50 elementwise passes over
each pyramid level (circle taps, run tests, Sobel, box filters, NMS); as
separate XLA fusions they round-trip HBM several times per level. This
kernel computes the final per-pixel candidate score in ONE VMEM-resident
pass: the level image is DMA'd into VMEM once and every intermediate
lives on-chip.

Semantics are IDENTICAL to the jnp reference path in ``models/orb_jax.py``
(same taps, same Harris constants, same masked NMS); the contiguous-9
test uses a bitmask run trick (pack the 16 circle comparisons into an
int32, detect a cyclic run of 9 with shift-ANDs) instead of materializing
a [24,H,W] stack — the stack would not fit VMEM.

Input: level image padded by PAD_K=9 on all sides (edge padding), f32.
Output: score [H, W] — Harris response where (FAST corner & 3x3 NMS
winner among corner-masked scores), else -inf. Border masking and top-K
stay in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.orb_jax import FAST_CIRCLE, HARRIS_BLOCK, HARRIS_K

PAD_K = 12  # halo; 12 (not the minimal 9) keeps BH + 2*PAD_K 8-row-aligned for DMA
NEG = -3.0e38  # stand-in for -inf that survives f32 arithmetic


def _kernel(img_ref, score_ref, *, W, BH, threshold):
    # row-tiled: load this tile's rows (+halo) from the VMEM-resident
    # image, compute the [BH, W] score tile on-chip. Tiling bounds the
    # per-tile temporaries (a monolithic whole-image kernel exceeded VMEM:
    # Mosaic stack-allocates the unrolled taps); the whole padded image in
    # VMEM keeps the input spec vmap-compatible (ANY-space inputs are not).
    ti = pl.program_id(0)
    img = img_ref[pl.ds(ti * BH, BH + 2 * PAD_K), :]
    H = BH            # all region math below is per-tile

    def sl(arr, dy, dx, h, w, oy, ox):
        # offsets are static python ints -> static slices (Mosaic-friendly)
        return arr[oy + dy : oy + dy + h, ox + dx : ox + dx + w]

    # ---------------- FAST-9/16 over the [H+2, W+2] NMS halo -------------
    H2, W2 = H + 2, W + 2
    oy = ox = PAD_K - 1
    center = sl(img, 0, 0, H2, W2, oy, ox)
    hi = center + threshold
    lo = center - threshold
    bright = jnp.zeros((H2, W2), jnp.int32)
    dark = jnp.zeros((H2, W2), jnp.int32)
    for i, (dy, dx) in enumerate(FAST_CIRCLE):
        tap = sl(img, int(dy), int(dx), H2, W2, oy, ox)
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
        return (r & jnp.int32(0xFFFF)) != 0

    corner2 = run9(bright) | run9(dark)

    # ---------------- Harris over the same [H+2, W+2] region -------------
    # Sobel needs a further +-1, the 7x7 box a further +-3: compute the
    # gradients over [H2+6, W2+6].
    HB, WB = H2 + 6, W2 + 6
    gy = gx = PAD_K - 4

    def sobel_at(dy, dx):
        # one-wider region ([HB, WB+2], origin one column left) so the
        # horizontal +-1 taps become STATIC SLICES of the aggregate —
        # jnp.pad here lowered to a tpu.concatenate Mosaic can't lay out
        return sl(img, dy, dx, HB, WB + 2, gy, gx - 1)

    # separable [1,2,1] x [-1,0,1] (x0.25, as the jnp path)
    rows_s = sobel_at(0, 0) * 2.0 + sobel_at(-1, 0) + sobel_at(1, 0)
    rows_d = sobel_at(1, 0) - sobel_at(-1, 0)

    dx_img = (rows_s[:, 2 : 2 + WB] - rows_s[:, 0:WB]) * 0.25
    dy_img = (
        rows_d[:, 0:WB] + 2.0 * rows_d[:, 1 : 1 + WB] + rows_d[:, 2 : 2 + WB]
    ) * 0.25

    def box7(a):
        # separable 7x7 box on the inner [H2, W2] region of a [HB, WB] map
        acc = jnp.zeros((H2, WB), a.dtype)
        for k in range(HARRIS_BLOCK):
            acc = acc + a[k : k + H2, :]
        out = jnp.zeros((H2, W2), a.dtype)
        for k in range(HARRIS_BLOCK):
            out = out + acc[:, k : k + W2]
        return out

    sxx = box7(dx_img * dx_img)
    syy = box7(dy_img * dy_img)
    sxy = box7(dx_img * dy_img)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    harris2 = det - HARRIS_K * tr * tr  # [H2, W2]

    # ---------------- masked 3x3 NMS -------------------------------------
    masked2 = jnp.where(corner2, harris2, NEG)
    nmax = jnp.full((H, W), NEG, jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) == (0, 0):
                continue
            nmax = jnp.maximum(
                nmax, masked2[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
            )
    center_m = masked2[1 : 1 + H, 1 : 1 + W]
    corner_c = corner2[1 : 1 + H, 1 : 1 + W]
    harris_c = harris2[1 : 1 + H, 1 : 1 + W]
    keep = corner_c & (center_m >= nmax)
    score_ref[:] = jnp.where(keep, harris_c, NEG)


@functools.partial(jax.jit, static_argnames=("threshold", "block_rows"))
def fast_harris_score(img: jnp.ndarray, threshold: float = 20.0,
                      block_rows: int = 64) -> jnp.ndarray:
    """Per-pixel candidate score for one pyramid level / atlas (f32 [H,W]
    in, [H,W] out; -inf-like NEG where not a surviving corner). Gridded
    over ``block_rows``-row tiles; each tile DMAs its halo'd rows from HBM
    into a VMEM scratch."""
    H, W = img.shape
    BH = block_rows
    Hp = -(-H // BH) * BH
    # lane (width) dim of the DMA must be 128-aligned: pad right
    Wp = -(-(W + 2 * PAD_K) // 128) * 128
    padded = jnp.pad(img, ((PAD_K, PAD_K + Hp - H),
                           (PAD_K, Wp - W - PAD_K)), mode="edge")
    kernel = functools.partial(_kernel, W=W, BH=BH, threshold=threshold)
    out = pl.pallas_call(
        kernel,
        grid=(Hp // BH,),
        out_shape=jax.ShapeDtypeStruct((Hp, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BH, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(padded)
    return out[:H]
