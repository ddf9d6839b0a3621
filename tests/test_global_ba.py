"""Global (Schur-complement) BA tests: convergence on a full synthetic map,
gauge fixing, and agreement with the reprojection objective."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from visionx_slam_tpu.models.global_ba import GlobalBAOptions, global_ba
from visionx_slam_tpu.ops.camera import make_camera
from visionx_slam_tpu.ops.se3 import Pose
from visionx_slam_tpu.tracking import mapstate as msl

CAM = make_camera(525.0, 525.0, 319.5, 239.5)
K_CAP, L_CAP, N = 8, 512, 128
OPTS = GlobalBAOptions(max_iterations=8, cg_iterations=30)


def project_np(R, t, X):
    pc = X @ R.T + t
    return np.stack(
        [525.0 * pc[:, 0] / pc[:, 2] + 319.5, 525.0 * pc[:, 1] / pc[:, 2] + 239.5], -1
    )


def build_map(rng, n_kf=7, n_lm=120, px_noise=0.25, pose_err=0.004, point_err=0.01):
    X_gt = rng.uniform([-2, -1.5, 3.0], [2, 1.5, 7.0], size=(n_lm, 3))
    ms = msl.empty_map(K_CAP, L_CAP, N)
    for k in range(n_kf):
        R = Rotation.from_rotvec(rng.normal(scale=0.04, size=3)).as_matrix()
        t = np.array([0.12 * k, 0.02 * k, 0.0]) + rng.normal(scale=0.02, size=3)
        px = project_np(R, t, X_gt) + rng.normal(scale=px_noise, size=(n_lm, 2))
        px_pad = np.zeros((N, 2), np.float32)
        px_pad[:n_lm] = px
        links = np.full(N, msl.FREE, np.int32)
        links[:n_lm] = np.arange(n_lm)
        valid = np.zeros(N, bool)
        valid[:n_lm] = True
        if k == 0:
            Rp, tp = R, t  # first keyframe starts exact (it is the gauge)
        else:
            dR = Rotation.from_rotvec(rng.normal(scale=pose_err, size=3)).as_matrix()
            Rp = dR @ R
            tp = t + rng.normal(scale=pose_err, size=3)
        q = Rotation.from_matrix(Rp).as_quat()
        pose = Pose(jnp.asarray([q[3], q[0], q[1], q[2]], jnp.float32),
                    jnp.asarray(tp, jnp.float32))
        ms, _ = msl.insert_keyframe(
            ms, jnp.asarray(k), pose, jnp.asarray(px_pad),
            jnp.zeros((N, 32), jnp.uint8), jnp.asarray(valid),
            jnp.asarray(links), jnp.zeros(N, jnp.float32),
        )
    Lp = ms.lm_physical
    pos = np.zeros((Lp, 3), np.float32)
    pos[:n_lm] = X_gt + rng.normal(scale=point_err, size=X_gt.shape)
    alive = np.zeros(Lp, bool)
    alive[:n_lm] = True
    ms = ms._replace(lm_pos=jnp.asarray(pos.T), lm_alive=jnp.asarray(alive),
                     next_lm=jnp.asarray(n_lm, jnp.int32))
    return ms, X_gt


def mean_reproj(ms):
    pos = np.asarray(ms.lm_pos).T
    tot, cnt = 0.0, 0
    for k in range(K_CAP):
        if int(np.asarray(ms.kf_id[k])) < 0:
            continue
        q = np.asarray(ms.kf_q[k])
        R = Rotation.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
        t = np.asarray(ms.kf_t[k])
        links = np.asarray(ms.kf_feat_lm[k])
        sel = np.asarray(ms.kf_fvalid[k]) & (links >= 0)
        proj = project_np(R, t, pos[links[sel]])
        tot += np.linalg.norm(proj - np.asarray(ms.kf_px[k]).T[sel], -1).sum()
        cnt += sel.sum()
    return tot / max(cnt, 1)


def test_global_ba_converges(rng):
    ms, X_gt = build_map(rng)
    before = mean_reproj(ms)
    ms2, stats = global_ba(ms, CAM, OPTS)
    after = mean_reproj(ms2)
    assert after < before * 0.5, (before, after)
    assert after < 0.8, (before, after)
    assert int(stats.total_obs) > 500


def test_global_ba_fixes_gauge(rng):
    ms, _ = build_map(rng)
    ms2, _ = global_ba(ms, CAM, OPTS)
    # the oldest keyframe's pose must be untouched
    np.testing.assert_allclose(np.asarray(ms2.kf_q[0]), np.asarray(ms.kf_q[0]),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(ms2.kf_t[0]), np.asarray(ms.kf_t[0]),
                               atol=1e-7)
    # other keyframes moved
    assert np.abs(np.asarray(ms2.kf_t[1:7]) - np.asarray(ms.kf_t[1:7])).max() > 1e-5


def test_global_ba_noop_on_empty():
    ms = msl.empty_map(K_CAP, L_CAP, N)
    ms2, stats = global_ba(ms, CAM, OPTS)
    np.testing.assert_array_equal(np.asarray(ms2.kf_q), np.asarray(ms.kf_q))
    assert int(stats.iterations) == 0
