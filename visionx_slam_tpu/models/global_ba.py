"""Global bundle adjustment: matrix-free Schur-complement GN with PCG.

The reference has NO global BA (SURVEY.md §5.7: only the 5-keyframe local
window, no loop closure, no pose graph); BASELINE.json config 4 ("global
bundle adjustment over the full fr3 map") requires one. TPU-native design
(SURVEY.md §7.7), round-2 revision: the reduced camera system is never
materialized — the Schur complement is applied as an OPERATOR inside
preconditioned conjugate gradients, so the whole solve is gathers, k-major
reductions, and ONE pre-sorted segment scatter per matvec. (The round-1
version scattered per-landmark coupling blocks chunk-by-chunk into
[C,K,6,3] buffers; those 32 large unsorted scatters were 43% of the
offline pipeline's frame budget.)

Structure (K keyframes, L landmarks, observations = map-state links):

- Hll is block-diagonal [L,3,3]; Hpp is block-diagonal [K,6,6]; both built
  with one sorted segment-sum (observations pre-sorted by landmark once —
  the link table is constant across GN iterations).
- S v = (Hpp + λ) v − W Hll⁻¹ Wᵀ v, applied per matvec as:
    Wᵀv : per-obs einsum with a gather of v at the obs' keyframe, then a
          sorted segment-sum into landmarks;
    Hll⁻¹: closed-form batched 3×3 inverse (ops/linalg.py);
    W u : per-obs einsum with a gather of u at the obs' landmark, then a
          k-major [K,N,6] → [K,6] reduction (no scatter at all).
- PCG preconditioner: block-diagonal (Hpp + λ)⁻¹ (batched 6×6 solves, K is
  tiny). Fixed CG iteration count (static shape), converged components
  freeze via masking.
- dx_l back-substitutes landmark-wise.

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
from ..ops.linalg import inv3x3
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
    cg_iterations: int = 25


class GlobalBAStats(NamedTuple):
    iterations: jnp.ndarray
    final_cost: jnp.ndarray
    total_obs: jnp.ndarray


@jax.jit
def map_reproj_error(ms: MapState, cam: CameraParams) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(mean reprojection error [px], n_observations) over every live
    keyframe-feature -> landmark link of the map — the fitness metric
    global BA must reduce."""
    K = ms.kf_capacity
    L = ms.lm_physical
    alive_kf = msl.kf_alive(ms)
    f_lm = ms.kf_feat_lm
    has = alive_kf[:, None] & ms.kf_fvalid & (f_lm >= 0)
    lm_idx = jnp.clip(f_lm, 0, L - 1)
    pw = jnp.moveaxis(ms.lm_pos[:, lm_idx], 0, -1)
    R = quat_to_matrix(ms.kf_q)
    pc = jnp.einsum("kij,knj->kni", R, pw) + ms.kf_t[:, None, :]
    z_ok = pc[..., 2] > 1e-6
    zs = jnp.maximum(pc[..., 2], 1e-6)
    u = cam.fx * pc[..., 0] / zs + cam.cx
    v = cam.fy * pc[..., 1] / zs + cam.cy
    err = jnp.linalg.norm(
        jnp.swapaxes(ms.kf_px, 1, 2) - jnp.stack([u, v], -1), axis=-1
    )
    obs = has & ms.lm_alive[lm_idx] & z_ok
    n = jnp.sum(obs)
    mean = jnp.sum(jnp.where(obs, err, 0.0)) / jnp.maximum(n, 1)
    return mean, n.astype(jnp.int32)


@partial(jax.jit, static_argnames=("opts",))
def global_ba(
    ms: MapState, cam: CameraParams, opts: GlobalBAOptions = GlobalBAOptions()
) -> tuple[MapState, GlobalBAStats]:
    K = ms.kf_capacity
    L = ms.lm_physical
    N = ms.n_features
    O = K * N

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
    free6 = free_kf[:, None]                      # [K,1] masks [K,6] vecs

    enabled = (jnp.sum(alive_kf) >= 2) & jnp.any(ms.lm_alive)

    # the link table never changes during GBA: sort observations by
    # landmark ONCE, so every per-iteration landmark reduction is a sorted
    # segment-sum (unsorted TPU scatters serialize per element)
    flat_lm_all = lm_idx.reshape(-1)               # [O]
    kk = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N)).reshape(-1)
    opt_obs_mask = (has_lm & lm_opt[lm_idx]).reshape(-1)
    perm = jnp.argsort(jnp.where(opt_obs_mask, flat_lm_all, L))  # dead last
    sorted_lm = jnp.where(opt_obs_mask, flat_lm_all, L)[perm]    # ascending
    kk_perm = kk[perm]

    def seg_sum_lm(per_obs):       # [O, d] -> [L, d], pre-sorted scatter
        d = per_obs.shape[-1]
        return jnp.zeros((L + 1, d), per_obs.dtype).at[sorted_lm].add(
            per_obs[perm], indices_are_sorted=True, mode="drop"
        )[:L]

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

        # --- block-diagonal pose system (k-major reductions, no scatter) --
        Hpp = jnp.einsum("knij,knil,kn->kjl", Jpose, Jpose, w)   # [K,6,6]
        bp = jnp.einsum("knij,kni,kn->kj", Jpose, err, w)        # [K,6]

        # --- landmark system + coupling (optimizable landmarks only) ---
        obs_opt = obs & lm_opt[lm_idx]
        w_opt = jnp.where(obs_opt, w, 0.0)
        Hll_c = jnp.einsum("knij,knil,kn->knjl", Jpt, Jpt, w_opt)  # [K,N,3,3]
        bl_c = jnp.einsum("knij,kni,kn->knj", Jpt, err, w_opt)     # [K,N,3]
        packed = jnp.concatenate(
            [Hll_c.reshape(O, 9), bl_c.reshape(O, 3)], axis=-1
        )
        table = seg_sum_lm(packed)                                 # [L,12]
        Hll = table[:, :9].reshape(L, 3, 3) + opts.damping * jnp.eye(
            3, dtype=pc.dtype
        )
        bl = table[:, 9:]
        Hll_inv = inv3x3(Hll)                                      # [L,3,3]
        Hll_inv_bl = jnp.einsum("lij,lj->li", Hll_inv, bl)         # [L,3]

        Wobs = jnp.einsum(
            "knij,knil,kn->knjl", Jpose, Jpt, w_opt
        ).reshape(O, 6, 3)                                         # W blocks

        def WT_v(v6):  # [K,6] -> [L,3]
            per_obs = jnp.einsum("oij,oi->oj", Wobs, v6[kk])       # [O,3]
            return seg_sum_lm(per_obs)

        def W_u(u3):   # [L,3] -> [K,6]
            u_pad = jnp.concatenate([u3, jnp.zeros((1, 3), u3.dtype)])
            u_at = u_pad[jnp.where(opt_obs_mask, flat_lm_all, L)]  # [O,3]
            per_obs = jnp.einsum("oij,oj->oi", Wobs, u_at)         # [O,6]
            return per_obs.reshape(K, N, 6).sum(axis=1)            # k-major

        lam = opts.damping

        def S_mv(v6):  # [K,6] -> [K,6], gauge rows pinned to identity
            v6 = jnp.where(free6, v6, 0.0)
            hv = jnp.einsum("kij,kj->ki", Hpp, v6) + lam * v6
            sv = hv - W_u(jnp.einsum("lij,lj->li", Hll_inv, WT_v(v6)))
            return jnp.where(free6, sv, v6)

        rhs = bp - W_u(Hll_inv_bl)
        rhs = jnp.where(free6, rhs, 0.0)

        # block-Jacobi preconditioner: (Hpp + λI)^-1 per keyframe
        Hpp_d = Hpp + lam * jnp.eye(6, dtype=pc.dtype)
        eyeK = jnp.broadcast_to(jnp.eye(6, dtype=pc.dtype), (K, 6, 6))
        Hpp_safe = jnp.where(free_kf[:, None, None], Hpp_d, eyeK)
        Pinv = jnp.linalg.inv(Hpp_safe)                            # [K,6,6]

        def prec(r):
            return jnp.where(free6, jnp.einsum("kij,kj->ki", Pinv, r), 0.0)

        # fixed-iteration PCG (static shapes; converged state freezes)
        x0 = jnp.zeros_like(rhs)
        r0 = rhs
        z0 = prec(r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)

        def cg_step(carry, _):
            x, r, p, rz = carry
            Ap = S_mv(p)
            pAp = jnp.sum(p * Ap)
            ok = (pAp > 1e-30) & (rz > 1e-30)
            alpha = jnp.where(ok, rz / jnp.maximum(pAp, 1e-30), 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = prec(r)
            rz_new = jnp.sum(r * z)
            beta = jnp.where(ok, rz_new / jnp.maximum(rz, 1e-30), 0.0)
            p = z + beta * p
            return (x, r, p, rz_new), None

        (dxp_k, _, _, _), _ = jax.lax.scan(
            cg_step, (x0, r0, p0, rz0), None, length=opts.cg_iterations
        )
        dxp_k = jnp.where(
            jnp.all(jnp.isfinite(dxp_k)), dxp_k, jnp.zeros_like(dxp_k)
        )

        # back-substitute landmarks: dxl = Hll^-1 (bl - W^T dxp)
        dxl = jnp.einsum("lij,lj->li", Hll_inv, bl - WT_v(dxp_k))
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
