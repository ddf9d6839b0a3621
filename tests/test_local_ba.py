"""Local BA convergence tests on synthetic windows with known ground truth
(SURVEY.md §4: BA convergence on synthetic scenes replaces absent reference
tests). Also regression-tests the documented sign fix: cost must DECREASE."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from visionx_slam_tpu.models.local_ba import BAOptions, local_ba
from visionx_slam_tpu.ops.camera import make_camera
from visionx_slam_tpu.ops.se3 import Pose
from visionx_slam_tpu.tracking import mapstate as msl

CAM = make_camera(525.0, 525.0, 319.5, 239.5)
K_CAP, L_CAP, N = 8, 256, 128


def project_np(R, t, X):
    pc = X @ R.T + t
    return np.stack(
        [525.0 * pc[:, 0] / pc[:, 2] + 319.5, 525.0 * pc[:, 1] / pc[:, 2] + 239.5], -1
    )


def build_window(rng, n_kf=5, n_lm=100, px_noise=0.3, pose_err=0.004, point_err=0.01):
    # perturbations sized so initial reprojection errors stay mostly inside
    # the 5 px BA gate (larger offsets are excluded by design, as in the
    # reference local_ba.cpp:147-150)
    X_gt = rng.uniform([-2, -1.5, 3.0], [2, 1.5, 7.0], size=(n_lm, 3))
    ms = msl.empty_map(K_CAP, L_CAP, N)

    poses_gt = []
    for k in range(n_kf):
        R = Rotation.from_rotvec(rng.normal(scale=0.03, size=3)).as_matrix()
        t = np.array([0.1 * k, 0.0, 0.0]) + rng.normal(scale=0.02, size=3)
        poses_gt.append((R, t))
        px = project_np(R, t, X_gt) + rng.normal(scale=px_noise, size=(n_lm, 2))
        px_pad = np.zeros((N, 2), np.float32)
        px_pad[:n_lm] = px
        links = np.full(N, msl.FREE, np.int32)
        links[:n_lm] = np.arange(n_lm)
        valid = np.zeros(N, bool)
        valid[:n_lm] = True

        # perturbed initial pose
        dR = Rotation.from_rotvec(rng.normal(scale=pose_err, size=3)).as_matrix()
        Rp = dR @ R
        tp = t + rng.normal(scale=pose_err, size=3)
        q = Rotation.from_matrix(Rp).as_quat()
        pose = Pose(
            jnp.asarray([q[3], q[0], q[1], q[2]], jnp.float32),
            jnp.asarray(tp, jnp.float32),
        )
        ms, _ = msl.insert_keyframe(
            ms, jnp.asarray(k), pose, jnp.asarray(px_pad),
            jnp.zeros((N, 32), jnp.uint8), jnp.asarray(valid),
            jnp.asarray(links), jnp.zeros(N, jnp.float32),
        )

    X_init = X_gt + rng.normal(scale=point_err, size=X_gt.shape)
    Lp = ms.lm_physical  # physical size (logical capacity + padding)
    pos = np.zeros((Lp, 3), np.float32)
    pos[:n_lm] = X_init
    alive = np.zeros(Lp, bool)
    alive[:n_lm] = True
    ms = ms._replace(
        lm_pos=jnp.asarray(pos.T), lm_alive=jnp.asarray(alive),
        next_lm=jnp.asarray(n_lm, jnp.int32),
    )
    return ms, X_gt, poses_gt


def mean_reproj_err(ms, X=None):
    """Mean reprojection error over all (kf, feature) observations."""
    pos = np.asarray(ms.lm_pos).T
    err_total, cnt = 0.0, 0
    for k in range(K_CAP):
        if int(np.asarray(ms.kf_id[k])) < 0:
            continue
        q = np.asarray(ms.kf_q[k])
        R = Rotation.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
        t = np.asarray(ms.kf_t[k])
        links = np.asarray(ms.kf_feat_lm[k])
        valid = np.asarray(ms.kf_fvalid[k])
        sel = valid & (links >= 0)
        px = np.asarray(ms.kf_px[k]).T[sel]
        proj = project_np(R, t, pos[links[sel]])
        err_total += np.linalg.norm(proj - px, axis=-1).sum()
        cnt += sel.sum()
    return err_total / max(cnt, 1)


def test_ba_reduces_reprojection_error(rng):
    ms, X_gt, poses_gt = build_window(rng)
    err_before = mean_reproj_err(ms)
    opts = BAOptions(window_size=5, max_iterations=5)
    ms2, stats = local_ba(ms, CAM, opts)
    err_after = mean_reproj_err(ms2)
    assert err_after < err_before * 0.5, (err_before, err_after)
    assert err_after < 1.0, (err_before, err_after)  # near the 0.3 px noise floor
    assert int(stats.total_obs) > 400


def test_ba_noop_with_single_keyframe(rng):
    ms, _, _ = build_window(rng, n_kf=1)
    opts = BAOptions(window_size=5, max_iterations=5)
    ms2, stats = local_ba(ms, CAM, opts)
    np.testing.assert_array_equal(np.asarray(ms2.kf_q), np.asarray(ms.kf_q))
    np.testing.assert_array_equal(np.asarray(ms2.lm_pos), np.asarray(ms.lm_pos))


def test_ba_respects_min_pose_observations(rng):
    # with min_pose_observations above the per-kf observation count, poses
    # must not move (local_ba.cpp:163)
    ms, _, _ = build_window(rng, n_lm=30)
    opts = BAOptions(window_size=5, max_iterations=3, min_pose_observations=50)
    ms2, _ = local_ba(ms, CAM, opts)
    np.testing.assert_allclose(
        np.asarray(ms2.kf_q), np.asarray(ms.kf_q), atol=1e-7
    )


def test_ba_ignores_outlier_links(rng):
    ms, _, _ = build_window(rng)
    # corrupt one landmark grossly; with the 5 px gate its residual is
    # excluded, so BA must not drag it back
    pos = np.array(ms.lm_pos)  # [3,Lp]
    pos[:, 0] += 5.0
    ms = ms._replace(lm_pos=jnp.asarray(pos))
    ms2, _ = local_ba(ms, CAM, BAOptions())
    moved = np.linalg.norm(np.asarray(ms2.lm_pos[:, 0]) - pos[:, 0])
    assert moved < 1e-5
