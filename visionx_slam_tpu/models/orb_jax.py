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
  OpenCV per-level distribution), selected with a per-8x8-cell argmax then
  `lax.top_k` over cells.
- orientation by intensity centroid over the radius-15 disc, computed for
  the selected keypoints from 31x31 patches gathered via a space-to-depth
  cell layout (3x3 gathers of 256-lane cell vectors + one-hot recentering
  einsums — no per-keypoint dynamic_slice).
- rBRIEF: a fixed 256-pair pattern (deterministic Gaussian pattern, sigma
  = patch/5, clipped to the radius-13 disc — descriptors are
  self-consistent, NOT bitwise-equal to OpenCV's learned pattern; parity
  is validated statistically, see SURVEY.md §7.3) steered by the keypoint
  angle quantized to 32 bins, computed as ONE MXU matmul against +1/-1
  difference banks over the blurred patch, packed to uint8[32].

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
    # clip to the radius-13 DISC (not the square): rotated samples then stay
    # within radius 13.5, so one 31x31 patch (PATCH_R=15) serves both
    # orientation and BRIEF — smaller patches than the square-clipped
    # pattern's 37x37 requirement
    r = np.linalg.norm(pts, axis=-1, keepdims=True)
    pts = np.where(r > BRIEF_RADIUS, pts * (BRIEF_RADIUS / np.maximum(r, 1e-9)), pts)
    pts = np.round(pts).astype(np.int32)
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
    """Separable 2D convolution with symmetric padding (single image).
    Accumulates in the IMAGE dtype (bf16 stays bf16 — no silent f32
    promotion; the callers choose precision)."""
    r = len(k) // 2
    kj = jnp.asarray(k.astype(np.float32)).astype(img.dtype)
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
        ky = jnp.asarray(ky).astype(img.dtype)
        kx = jnp.asarray(kx).astype(img.dtype)
        rows = sum(ky[i] * p[i : i + img.shape[0], :] for i in range(3))
        return sum(kx[i] * rows[:, i : i + img.shape[1]] for i in range(3))

    # gradients/products in the input dtype (bf16 on the hot path: these
    # 12+ dense passes are bandwidth-bound); the det/trace CANCELLATION is
    # the precision-sensitive part, so the box sums are cast to f32 first —
    # ranking noise stays at the product level (~0.4%), validated vs cv2
    dx = sobel(img, True) * jnp.asarray(0.25, img.dtype)
    dy = sobel(img, False) * jnp.asarray(0.25, img.dtype)
    sxx = _box7(dx * dx).astype(jnp.float32)
    syy = _box7(dy * dy).astype(jnp.float32)
    sxy = _box7(dx * dy).astype(jnp.float32)
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


PATCH_R = 15  # covers the rotated disc-clipped BRIEF radius (13.5 -> 14)
PATCH_S = 2 * PATCH_R + 1  # 31: one patch feeds orientation AND BRIEF
BRIEF_BINS = 32  # orientation quantization for the matmul BRIEF (11.25 deg;
                 # OpenCV ORB quantizes to 12 deg — same fidelity class)


@functools.lru_cache(maxsize=2)
def _brief_bank(A: int = BRIEF_BINS) -> np.ndarray:
    """Difference banks for matmul BRIEF: [PATCH_S^2, A*256] with +1 at the
    first rotated sample and -1 at the second, per orientation bin.

    Each BRIEF bit is the sign of a linear functional of the flattened
    patch, so descriptor extraction for every keypoint becomes ONE MXU
    matmul [Q, S^2] x [S^2, A*256] followed by a per-keypoint bin select —
    ~14x faster on TPU than the per-keypoint dynamic gather it replaces
    (per-row gathers serialize on the VPU; the MXU eats the dense
    contraction). Rotation uses the same nearest-rounded steering as the
    gather formulation, at A quantized angles.
    """
    pat = _PATTERN.astype(np.float32)
    py, px = pat[:, :, 0], pat[:, :, 1]          # [256, 2]
    D = np.zeros((PATCH_S * PATCH_S, A * 256), np.float32)
    cols = np.arange(256)
    for a in range(A):
        th = 2.0 * np.pi * a / A
        ca, sa = np.cos(th), np.sin(th)
        ry = np.round(px * sa + py * ca).astype(np.int64)
        rx = np.round(px * ca - py * sa).astype(np.int64)
        lin = (ry + PATCH_R) * PATCH_S + (rx + PATCH_R)
        np.add.at(D, (lin[:, 0], a * 256 + cols), 1.0)
        np.add.at(D, (lin[:, 1], a * 256 + cols), -1.0)
    return D


def _orientation(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle from [K, PATCH_S, PATCH_S] patches over the
    radius-15 disc (IC-angle, reference inventory §2.3) — computed as ONE
    [K, S^2] x [S^2, 2] matmul (f32 accumulation) instead of two windowed
    VPU reductions."""
    ys, xs = np.mgrid[-PATCH_R : PATCH_R + 1, -PATCH_R : PATCH_R + 1]
    disc = (xs**2 + ys**2 <= HALF_PATCH**2).astype(np.float32)
    wxy = np.stack([(xs * disc).reshape(-1), (ys * disc).reshape(-1)], -1)
    k = patches.shape[0]
    m = jax.lax.dot_general(
        patches.reshape(k, -1),
        jnp.asarray(wxy).astype(patches.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [K, 2] = (m10, m01)
    return jnp.arctan2(m[:, 1], m[:, 0])


@functools.lru_cache(maxsize=8)
def _atlas_layout(H: int, W: int, n_levels: int, scale_factor: float,
                  border: int):
    """Static atlas geometry: greedy SHELF PACKING of the pyramid levels
    into one [total, W] image (small levels share a shelf side by side —
    ~15% fewer dense-pass pixels than a plain vertical stack). Every
    placement is 8-aligned in both axes (f32 sublane tile / cell grid).
    Returns (placements (oy,ox,h,w) per level, total rows, border mask).
    Levels touch with no guard gap: dense stencils contaminate <= 4 px
    across a seam and the per-level ``border``-px mask excludes them."""
    dims = []
    for lvl in range(n_levels):
        s = scale_factor**lvl
        dims.append((int(round(H / s)), int(round(W / s))))
    place = []
    y = 0
    shelf_h = 0
    x = 0
    for (h, w) in dims:  # heights descend, so first-fit shelves are tight
        wa = -(-w // 8) * 8
        if x + wa > W:
            y += -(-shelf_h // 8) * 8
            x, shelf_h = 0, 0
        place.append((y, x, h, w))
        x += wa
        shelf_h = max(shelf_h, h)
    total = y + -(-shelf_h // 8) * 8
    mask = np.zeros((total, W), bool)
    for (oy, ox, h, w) in place:
        mask[oy + border : oy + h - border,
             ox + border : ox + w - border] = True
    return tuple(place), total, mask


@functools.lru_cache(maxsize=1)
def _pallas_available() -> bool:
    """Probe: can the fused Mosaic detection kernel compile AND run on this
    backend? Cached per process; any failure (missing toolchain, version
    mismatch, lowering regression) silently selects the XLA path."""
    if jax.default_backend() == "cpu":
        return False
    try:
        from ..ops.pallas_detect import fast_harris_blur

        a = jnp.zeros((64, 128), jnp.bfloat16)
        m = jnp.ones((64, 128), jnp.int8)
        score, blur = fast_harris_blur(a, m, 20.0)
        jax.block_until_ready(score)
        return True
    except Exception:
        return False


@functools.partial(
    jax.jit,
    static_argnames=("n_features", "scale_factor", "n_levels", "n_slots",
                     "fast_threshold", "border", "use_pallas",
                     "profile_stage", "patch_cell", "resize_f32"),
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
    patch_cell: int = 32,  # s2d cell side for the patch gather (16 or 32):
                           # 2x2 gathers of 1024-lane cells beat 3x3 of
                           # 256-lane cells (gather cost ~ row count, rule 9)
    resize_f32: int = 0,   # 1: build the pyramid (resize/pack) in f32 and
                           # cast once — the pre-bf16-build behavior, kept
                           # for the strict reference-fidelity config whose
                           # ATE band is sensitive to resize rounding
):
    """Full ORB: returns (px [S,2] level-0 pixels, resp [S], desc [S,32],
    valid [S]) with S = n_slots; defaults mirror orb_extractor.h:11-13.

    All pyramid levels are packed into ONE vertical atlas image so each
    dense pass (FAST bitmask, Harris, NMS, Gaussian blur) runs once over a
    single well-tiled [Ha,W] array instead of 8 separately-launched levels
    with awkward shapes — the dominant cost of extraction on TPU was the
    per-level launch/fusion overhead, not the pixel math. Level boundaries
    need no guard rows: rolls/convs contaminate at most 4 rows across a
    boundary and the per-level 31-px border mask excludes them.
    """
    if use_pallas == -1:
        # auto: probe the Mosaic toolchain once per process and use the
        # fused kernel when it works (VXS_PALLAS=0/1 forces off/on; the
        # kernel is also validated in interpreter mode on CPU,
        # tests/test_pallas_detect.py)
        import os

        env = os.environ.get("VXS_PALLAS", "")
        if env == "0":
            use_pallas = 0
        elif env == "1":
            use_pallas = 1
        else:
            use_pallas = 1 if _pallas_available() else 0
    H, W = gray_u8.shape
    # the whole pyramid lives in bf16: every consumer (FAST compares,
    # Harris products, blur, patch gather) already computes in bf16, so
    # building/resizing/packing the atlas at f32 was pure wasted
    # bandwidth; bilinear weights on values <= 255 add < 1 intensity of
    # rounding — the same noise class as the bf16 blur itself
    img0 = gray_u8.astype(jnp.float32 if resize_f32 else jnp.bfloat16)
    quotas = _level_quotas(n_features, n_levels, scale_factor)
    place, total_rows, border_mask = _atlas_layout(
        H, W, n_levels, scale_factor, border
    )

    # ---- build the shelf-packed atlas (one resize per level) ----
    levels = [
        img0 if lvl == 0 else jax.image.resize(
            img0, (place[lvl][2], place[lvl][3]), method="linear"
        )
        for lvl in range(n_levels)
    ]
    shelves = []          # list of (y, [padded level blocks]) per shelf
    for lvl, (oy, ox, h, w) in enumerate(place):
        if ox == 0:
            shelves.append((oy, []))
        shelves[-1][1].append((lvl, ox, h, w))
    row_blocks = []
    ycur = 0
    for si, (oy, members) in enumerate(shelves):
        next_oy = shelves[si + 1][0] if si + 1 < len(shelves) else total_rows
        sh = next_oy - oy
        cols = []
        xcur = 0
        for (lvl, ox, h, w) in members:
            wa = -(-w // 8) * 8
            cols.append(jnp.pad(levels[lvl], ((0, sh - h), (0, wa - w))))
            xcur = ox + wa
        if xcur < W:
            cols.append(jnp.zeros((sh, W - xcur), img0.dtype))
        row_blocks.append(jnp.concatenate(cols, axis=1))
    atlas = jnp.concatenate(row_blocks, axis=0)      # [total_rows, W]
    in_border = jnp.asarray(border_mask)

    # ---- dense passes, once over the whole pyramid (bf16: these are
    # HBM-bandwidth-bound elementwise/window ops; image intensities and
    # Harris RANKING survive bf16 — validated vs the f32 oracle in
    # tests/test_orb_jax.py) ----
    blurred16 = None
    if use_pallas:
        from ..ops.pallas_detect import NEG, fast_harris_blur

        raw, blurred16 = fast_harris_blur(
            atlas.astype(jnp.bfloat16),
            jnp.asarray(border_mask.astype(np.int8)),
            fast_threshold,
        )
        score = jnp.where(raw > 0.5 * NEG, raw, -jnp.inf)
    else:
        atlas16 = atlas.astype(jnp.bfloat16)
        corners = _fast_corners(atlas16, jnp.bfloat16(fast_threshold))
        harris = _harris(atlas16).astype(jnp.float32)
        # NMS kept despite the per-cell argmax below: dropping it was ~2%
        # faster but doubled ATE on the synthetic benchmark (cross-cell
        # near-duplicates crowd out weaker-but-distinct corners)
        cand = corners & in_border & _nms3(
            jnp.where(corners, harris, -jnp.inf)
        )
        score = jnp.where(cand, harris, -jnp.inf)

    if profile_stage <= 0:
        # profiling: dense passes only (atlas + detect, no selection)
        S = n_slots
        resp = jnp.zeros((S,), jnp.float32).at[0].set(
            jnp.sum(jnp.where(jnp.isfinite(score), score, 0.0))
        )
        return (jnp.zeros((S, 2), jnp.float32), resp,
                jnp.zeros((S, 32), jnp.uint8), jnp.zeros((S,), bool))

    # ---- per-level grid-bucketed top-K (cheap: cell reductions) ----
    CELL = 8
    all_yy, all_xx, all_lxy, all_resp, all_valid = [], [], [], [], []
    for lvl, (oy, ox, h, w) in enumerate(place):
        hp = -(-h // 8) * 8
        wa = -(-w // 8) * 8                          # ox and wa 8-aligned
        sl = score[oy : oy + hp, ox : ox + wa]       # [hp, wa]
        Hc, Wc = hp // CELL, wa // CELL
        cells = sl.reshape(Hc, CELL, Wc, CELL).transpose(0, 2, 1, 3).reshape(
            Hc, Wc, CELL * CELL
        )
        cell_max = jnp.max(cells, axis=-1)
        cell_arg = jnp.argmax(cells, axis=-1)
        quota = quotas[lvl]
        # exact top_k: approx_max_k (recall 0.95) was tried here and
        # REGRESSED e2e 452 -> 335 fps — the ~5% different corner picks
        # cascade into the keyframe policy (+25% keyframes -> more kf
        # chain/link/GBA/retrack work), swamping the sort saving
        top, cidx = jax.lax.top_k(cell_max.reshape(-1), quota)
        cy = (cidx // Wc).astype(jnp.int32)
        cx = (cidx % Wc).astype(jnp.int32)
        off_in = cell_arg.reshape(-1)[cidx].astype(jnp.int32)
        yy = cy * CELL + off_in // CELL              # level-local row
        xx = cx * CELL + off_in % CELL
        all_yy.append(yy + oy)                       # atlas coords
        all_xx.append(xx + ox)
        all_lxy.append(jnp.stack(
            [xx.astype(jnp.float32), yy.astype(jnp.float32)], -1
        ) * jnp.float32(scale_factor**lvl))          # level-0 pixels
        all_resp.append(top)
        all_valid.append(jnp.isfinite(top))
    yy = jnp.concatenate(all_yy)                     # [Q] atlas coords
    xx = jnp.concatenate(all_xx)
    top = jnp.concatenate(all_resp)
    valid = jnp.concatenate(all_valid)
    resp = jnp.where(valid, top, 0.0)
    xy = jnp.concatenate(all_lxy)                    # level-0 pixels

    if profile_stage <= 1:
        desc = jnp.zeros((xy.shape[0], 32), jnp.uint8)
    else:
        # ---- one blur + space-to-depth patch gather for ALL keypoints ----
        # Per-keypoint dynamic_slice serialized (~1.6 ms/frame); instead the
        # blurred atlas is retiled into CSxCS cells [Hc*Wc, CS*CS] so each
        # patch is an NCxNC gather of FULL CS*CS-lane cell vectors (gather
        # cost scales with ROW count, so fewer/wider cells win: measured
        # 3x3 gathers of 256-lane cells beat 5x5 of 64-lane by ~1.4x, and
        # the current default CS=32 makes it a 2x2 gather of 1024-lane
        # cells), reassembled to a REGxREG region and recentered to the
        # 31x31 patch with two one-hot einsums (MXU, exact 0/1 selection).
        # blur + gather + recenter all in bf16: the descriptor COMPARES
        # blurred values (sign decisions), orientation accumulates in f32
        blurred = (blurred16 if blurred16 is not None else
                   _sep_conv(atlas.astype(jnp.bfloat16), _gaussian_kernel1d()))
        CS = patch_cell
        NC = 1 + -(-(PATCH_S - 1) // CS)             # cells per patch side
        REG = NC * CS                                # 48 (CS=16) / 64 (CS=32)
        # region spans [base - base%CS, +REG): up to CS-1+PATCH_S+PATCH_R
        # past a keypoint, and keypoints sit PATCH_R+... >=31 px inside a
        # level but levels touch: pad one extra cell both axes
        Hp2 = -(-blurred.shape[0] // CS) * CS + CS
        Wp2 = -(-W // CS) * CS + CS
        blurred = jnp.pad(
            blurred, ((0, Hp2 - blurred.shape[0]), (0, Wp2 - W))
        )
        Hc2, Wc2 = Hp2 // CS, Wp2 // CS
        s2d = blurred.reshape(Hc2, CS, Wc2, CS).transpose(0, 2, 1, 3).reshape(
            Hc2 * Wc2, CS * CS
        )
        Q = yy.shape[0]
        base_y = yy - PATCH_R
        base_x = xx - PATCH_R
        cy, oy = base_y // CS, base_y % CS
        cx, ox = base_x // CS, base_x % CS
        d3 = jnp.arange(NC, dtype=jnp.int32)
        cell_idx = (
            (cy[:, None, None] + d3[:, None]) * Wc2
            + cx[:, None, None] + d3[None, :]
        )  # [Q,NC,NC]; keypoints are >=31 px inside, so cells stay in range
        # (dead top_k slots may wrap negatively — harmless, masked by valid)
        g = s2d[cell_idx.reshape(-1)]                # [Q*NC*NC, CS*CS]
        region = g.reshape(Q, NC, NC, CS, CS).transpose(0, 1, 3, 2, 4).reshape(
            Q, REG, REG
        )
        ii = jnp.arange(PATCH_S, dtype=jnp.int32)
        jj = jnp.arange(REG, dtype=jnp.int32)
        Ysel = (oy[:, None, None] + ii[:, None] == jj).astype(jnp.bfloat16)
        Xsel = (ox[:, None, None] + ii[:, None] == jj).astype(jnp.bfloat16)
        t = jnp.einsum(
            "qij,qjk->qik", Ysel, region,
            preferred_element_type=jnp.bfloat16,
        )
        patches = jnp.einsum(
            "qik,qjk->qij", t, Xsel,
            preferred_element_type=jnp.bfloat16,
        )  # [Q,31,31] bf16 (one-hot selection exact; values bf16)
        angles = _orientation(patches)
        if profile_stage <= 2:
            resp = resp + 0 * jnp.sum(angles)
            desc = jnp.zeros((xy.shape[0], 32), jnp.uint8)
        else:
            # matmul BRIEF: one [Q, S^2] x [S^2, A*256] MXU contraction
            # computes every bit's pixel difference for ALL orientation
            # bins; each keypoint then selects its quantized bin's 256
            # columns. int8 path: each bank column holds exactly one +1
            # and one -1, so centering the patch at -128 keeps the
            # difference EXACT in int8 ((a-128)-(b-128) = a-b) while the
            # int8 MXU runs at 2x bf16 throughput. Rounding blur to
            # integer intensity shifts sign decisions by < 0.5 — the same
            # noise class as the bf16 blur itself (validated
            # statistically, tests/test_orb_jax.py).
            A = BRIEF_BINS
            Dj8 = jnp.asarray(_brief_bank(A).astype(np.int8))
            bins = jnp.mod(
                jnp.round(angles / (2.0 * np.pi / A)).astype(jnp.int32), A
            )
            q = patches.shape[0]
            flat = patches.reshape(q, PATCH_S * PATCH_S)
            flat8 = (
                jnp.clip(jnp.round(flat.astype(jnp.float32)), 0.0, 255.0)
                .astype(jnp.int32) - 128
            ).astype(jnp.int8)
            # int8 MXU contraction, but the [q, A*256] intermediate is the
            # bandwidth cost (32 MB/frame at int32) — accumulate f32 and
            # round the OUTPUT to bf16: each value is one (a-128)-(b-128)
            # = a-b in [-255, 255]; bf16 rounding preserves the sign (only
            # magnitude rounds, and integers up to 256 are exact), so the
            # sign decisions are bit-identical to the int32 path while the
            # intermediate halves to 16 MB
            vals = jax.lax.dot_general(
                flat8, Dj8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )  # [q, A*256] = first-sample minus second-sample, per bin
            sel = jnp.take_along_axis(
                vals.reshape(q, A, 256), bins[:, None, None], axis=1
            )[:, 0]
            bits = (sel < 0).astype(jnp.uint8)
            weights = jnp.asarray((2 ** np.arange(8)).astype(np.uint8))
            desc = jnp.sum(
                bits.reshape(-1, 32, 8) * weights[None, None, :],
                axis=-1, dtype=jnp.uint8,
            )

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
                 fast_threshold: float = 20.0, resize_f32: bool = False):
        self.kwargs = dict(
            n_features=n_features, scale_factor=scale_factor,
            n_levels=n_levels, n_slots=n_slots, fast_threshold=fast_threshold,
            resize_f32=int(resize_f32),
        )
        self.n_slots = n_slots

    def extract(self, gray: np.ndarray):
        px, resp, desc, valid = orb_extract(jnp.asarray(gray), **self.kwargs)
        return (np.asarray(px), np.asarray(resp), np.asarray(desc),
                np.asarray(valid))
