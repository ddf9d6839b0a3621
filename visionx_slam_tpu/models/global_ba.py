"""Global bundle adjustment: batched block-sparse Schur-complement GN.

The reference has NO global BA (SURVEY.md §5.7: only the 5-keyframe local
window, no loop closure, no pose graph); BASELINE.json config 4 ("global
bundle adjustment over the full fr3 map") requires one. This is the
TPU-native design SURVEY.md §7.7 sketches: the reduced camera system is
built blockwise over landmark chunks and solved densely.

Structure (for K keyframes, L landmarks, observations from the map-state
link table):

- Hll is block-diagonal [L,3,3] (landmark Hessians) — same scatter-add
  construction as the local BA point pass;
- Hpp is block-diagonal [K,6,6] (no pose-pose coupling except through
  landmarks);
- the pose-landmark coupling W is reduced in CHUNKS of landmarks: for each
  chunk, W_chunk [C, K*6, 3] is scattered from per-observation outer
  products, whitened by chol(Hll^-1), and contracted into the Schur
  complement with ONE [6K, 3C] x [3C, 6K] matmul on the MXU — the
  blockwise analog of ring/blockwise scanning for long sequences;
- S dx_p = rhs is a dense [6K, 6K] Cholesky solve (6K <= 384 for the
  64-slot ring: tiny); dx_l back-substitutes landmark-wise.

Gauge freedom is fixed by freezing the OLDEST keyframe's pose (the
reference's local BA leaves the gauge loose inside its window; a global
solve must pin it — documented design choice).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.camera import CameraParams
from ..ops.se3 import Pose, quat_to_matrix, se3_compose, se3_exp, so3_hat
from ..tracking import mapstate as msl
from ..tracking.mapstate import MapState
from .local_ba import _huber_w, _proj_jacobian


class GlobalBAOptions(NamedTuple):
    max_iterations: int = 10
    huber_delta: float = 5.0
    max_reproj_error: float = 5.0
    min_point_observations: int = 2
    damping: float = 1e-6
    chunk: int = 4096          # landmarks per Schur reduction chunk


class GlobalBAStats(NamedTuple):
    iterations: jnp.ndarray
    final_cost: jnp.ndarray
    total_obs: jnp.ndarray


@partial(jax.jit, static_argnames=("opts",))
def global_ba(
    ms: MapState, cam: CameraParams, opts: GlobalBAOptions = GlobalBAOptions()
) -> tuple[MapState, GlobalBAStats]:
    K = ms.kf_capacity
    L = ms.lm_physical
    N = ms.n_features
    C = opts.chunk
    n_chunks = -(-L // C)
    P6 = K * 6

    alive_kf = msl.kf_alive(ms)                    # [K]
    f_valid = ms.kf_fvalid & alive_kf[:, None]
    f_lm = ms.kf_feat_lm
    has_lm = f_valid & (f_lm >= 0)
    lm_idx = jnp.clip(f_lm, 0, L - 1)

    obs_count = msl.landmark_observation_counts(ms)
    # landmarks below the observation threshold stay CONSTANT: their
    # residuals still constrain poses (as in the reference's pose pass,
    # local_ba.cpp:131-137) but they are excluded from the point update and
    # from the Schur reduction.
    lm_opt = ms.lm_alive & (obs_count >= opts.min_point_observations)

    # gauge fix: freeze the oldest alive keyframe
    ids = jnp.where(alive_kf, ms.kf_id, jnp.iinfo(jnp.int32).max)
    fixed_kf = jnp.argmin(ids)
    free_kf = alive_kf & (jnp.arange(K) != fixed_kf)

    enabled = (jnp.sum(alive_kf) >= 2) & jnp.any(ms.lm_alive)

    def residuals(q, t, lm_pos):
        pw = jnp.moveaxis(lm_pos[:, lm_idx], 0, -1)  # [K,N,3]
        R = quat_to_matrix(q)
        pc = jnp.einsum("kij,knj->kni", R, pw) + t[:, None, :]
        z_ok = pc[..., 2] > 1e-6
        zs = jnp.maximum(pc[..., 2], 1e-6)
        u = cam.fx * pc[..., 0] / zs + cam.cx
        v = cam.fy * pc[..., 1] / zs + cam.cy
        err = jnp.swapaxes(ms.kf_px, 1, 2) - jnp.stack([u, v], -1)
        err_n = jnp.linalg.norm(err, axis=-1)
        obs = (
            has_lm & ms.lm_alive[lm_idx] & z_ok
            & (err_n <= opts.max_reproj_error)
        )
        w = jnp.where(obs, _huber_w(err_n, opts.huber_delta), 0.0)
        return err, pc, obs, w

    def iteration(carry, _):
        q, t, lm_pos, last_cost, done, iters = carry
        err, pc, obs, w = residuals(q, t, lm_pos)

        cost = jnp.sum(w * jnp.sum(err * err, -1))
        total_obs = jnp.sum(obs).astype(jnp.int32)

        # --- per-observation Jacobians ---
        Jp_proj = _proj_jacobian(cam, pc)                       # [K,N,2,3]
        eye3 = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (K, N, 3, 3))
        Jse = jnp.concatenate([eye3, -so3_hat(pc)], -1)          # [K,N,3,6]
        Jpose = Jp_proj @ Jse                                    # [K,N,2,6]
        R = quat_to_matrix(q)
        Jpt = jnp.einsum("knij,kjl->knil", Jp_proj, R)           # [K,N,2,3]

        # --- block-diagonal Hessians + gradients ---
        Hpp = jnp.einsum("knij,knil,kn->kjl", Jpose, Jpose, w)   # [K,6,6]
        bp = jnp.einsum("knij,kni,kn->kj", Jpose, err, w)        # [K,6]

        # the landmark system + coupling use only optimizable landmarks
        obs_opt = obs & lm_opt[lm_idx]
        w_opt = jnp.where(obs_opt, w, 0.0)
        flat_lm = jnp.where(obs_opt, lm_idx, L).reshape(-1)
        Hll_c = jnp.einsum("knij,knil,kn->knjl", Jpt, Jpt, w_opt)  # [K,N,3,3]
        bl_c = jnp.einsum("knij,kni,kn->knj", Jpt, err, w_opt)     # [K,N,3]
        Hll = jnp.zeros((L, 3, 3), pc.dtype).at[flat_lm].add(
            Hll_c.reshape(-1, 3, 3), mode="drop"
        ) + opts.damping * jnp.eye(3, dtype=pc.dtype)
        bl = jnp.zeros((L, 3), pc.dtype).at[flat_lm].add(
            bl_c.reshape(-1, 3), mode="drop"
        )

        # pose-landmark coupling blocks per observation: Wb = w Jpose^T Jpt
        Wobs = jnp.einsum("knij,knil,kn->knjl", Jpose, Jpt, w_opt)  # [K,N,6,3]

        from ..ops.linalg import inv3x3

        Hll_inv = inv3x3(Hll)                                    # [L,3,3]
        Hll_inv_bl = jnp.einsum("lij,lj->li", Hll_inv, bl)       # [L,3]
        # cholesky of the SPD inverse for whitening W (closed form: [L,3,3]
        # batched LAPACK-style cholesky schedules poorly for large L)
        from ..ops.linalg import chol3x3

        Ge = chol3x3(Hll_inv + 1e-12 * jnp.eye(3, dtype=pc.dtype))

        kk = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N)).reshape(-1)

        def schur_chunk(c, acc):
            S_acc, rhs_acc = acc
            lo = c * C
            # scatter W blocks of this landmark chunk: [C, K, 6, 3]
            local = flat_lm - lo
            in_chunk = (local >= 0) & (local < C)
            li = jnp.where(in_chunk, local, C)
            Wc = jnp.zeros((C, K, 6, 3), pc.dtype).at[li, kk].add(
                Wobs.reshape(-1, 6, 3), mode="drop"
            )
            Gc = jax.lax.dynamic_slice(Ge, (lo, 0, 0), (C, 3, 3))
            ybc = jax.lax.dynamic_slice(Hll_inv_bl, (lo, 0), (C, 3))
            # whiten: M = W @ chol(Hll^-1): [C,K6,3]
            Wf = Wc.reshape(C, P6, 3)
            M = jnp.einsum("cax,cxy->cay", Wf, Gc)
            Mr = M.transpose(0, 2, 1).reshape(C * 3, P6)
            S_acc = S_acc - Mr.T @ Mr
            rhs_acc = rhs_acc - jnp.einsum("cax,cx->a", Wf, ybc)
            return S_acc, rhs_acc

        # assemble dense block-diagonal Hpp into [6K,6K]
        S_init = jnp.zeros((P6, P6), pc.dtype)
        idx6 = jnp.arange(6)
        base = jnp.arange(K) * 6
        ri = base[:, None, None] + idx6[None, :, None]
        ci = base[:, None, None] + idx6[None, None, :]
        S_init = S_init.at[ri, ci].add(Hpp)
        S_init = S_init + opts.damping * jnp.eye(P6, dtype=pc.dtype)
        rhs_init = bp.reshape(P6)

        S, rhs = jax.lax.fori_loop(
            0, n_chunks, lambda c, acc: schur_chunk(c, acc), (S_init, rhs_init)
        )

        # freeze gauge + dead keyframes: identity rows/cols for their blocks
        free_mask6 = jnp.repeat(free_kf, 6)
        S = jnp.where(free_mask6[:, None] & free_mask6[None, :], S, 0.0)
        S = S + jnp.diag(jnp.where(free_mask6, 0.0, 1.0))
        rhs = jnp.where(free_mask6, rhs, 0.0)

        dxp = jax.scipy.linalg.solve(S, rhs, assume_a="pos")     # [6K]
        dxp = jnp.where(jnp.all(jnp.isfinite(dxp)), dxp, jnp.zeros_like(dxp))
        dxp_k = dxp.reshape(K, 6)

        # back-substitute landmarks: dxl = Hll^-1 (bl - W^T dxp)
        Wt_dxp = jnp.zeros((L, 3), pc.dtype).at[flat_lm].add(
            jnp.einsum("oij,oi->oj", Wobs.reshape(-1, 6, 3),
                       dxp_k[kk]), mode="drop"
        )
        dxl = jnp.einsum("lij,lj->li", Hll_inv, bl - Wt_dxp)
        dxl = jnp.where(
            lm_opt[:, None] & jnp.all(jnp.isfinite(dxl), axis=-1, keepdims=True),
            dxl, 0.0,
        )

        apply = ~done & enabled
        dxp_k = jnp.where((free_kf & apply)[:, None], dxp_k, 0.0)
        newp = se3_compose(se3_exp(dxp_k), Pose(q, t))
        lm_new = jnp.where(apply, lm_pos + dxl.T, lm_pos)

        converged = (total_obs == 0) | (jnp.abs(last_cost - cost) < 1e-6 * last_cost)
        iters = iters + jnp.where(done | ~enabled, 0, 1)
        done = done | converged
        return (newp.q, newp.t, lm_new, cost, done, iters), (cost, total_obs)

    init = (
        ms.kf_q, ms.kf_t, ms.lm_pos,
        jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32),
        ~enabled, jnp.zeros((), jnp.int32),
    )
    (q, t, lm_pos, cost, done, iters), (costs, obs_hist) = jax.lax.scan(
        iteration, init, None, length=opts.max_iterations
    )

    out = ms._replace(kf_q=q, kf_t=t, lm_pos=lm_pos)
    return out, GlobalBAStats(iterations=iters, final_cost=cost,
                              total_obs=obs_hist[-1])
