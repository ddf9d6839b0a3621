"""Monocular OFFLINE pipeline (BASELINE config 2 on the fast path):
essential-matrix relative poses + triangulated-depth scale chain
(offline_pipeline.py module docstring). Scale is unobservable, so checks
are scale-invariant: the similarity-aligned ATE is bounded and the map is
populated from triangulated (not sensor) depth.
"""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow

from visionx_slam_tpu.data import synthetic, tum
from visionx_slam_tpu.eval import trajectory as traj
from visionx_slam_tpu.ops.camera import make_camera
from visionx_slam_tpu.tracking import mapstate as msl
from visionx_slam_tpu.tracking.offline_pipeline import run_offline_pipeline
from visionx_slam_tpu.utils.config import TrackingOptions


@pytest.fixture(scope="module")
def mono_seq(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mono_off"))
    # essential estimation needs real baselines: fr1-speed 15 mm steps
    # starve the parallax gate (the reference behaves the same)
    synthetic.generate_sequence(root, n_frames=40, seed=11,
                                frames_per_loop=48)
    ds = tum.TumDataset(root, "rgbd_dataset_freiburg3_synthetic")
    assert ds.load()
    grays = np.stack([tum.load_rgb_gray(e.rgb_path) for e in ds.entries])
    zero_depth = np.zeros(grays.shape, np.float32)
    cam = make_camera(ds.intrinsics.fx, ds.intrinsics.fy,
                      ds.intrinsics.cx, ds.intrinsics.cy)
    return ds, grays, zero_depth, cam


def test_offline_mono_tracks_up_to_scale(mono_seq):
    ds, grays, depths, cam = mono_seq
    ms, outs = run_offline_pipeline(
        cam, grays, depths, TrackingOptions(), monocular=True
    )
    jax.block_until_ready(outs)
    tracked = np.asarray(outs.tracked)
    assert tracked.sum() >= 35, tracked.sum()

    # the map is built from TRIANGULATED depth: landmarks must exist even
    # though the sensor depth input was all zeros
    assert int(msl.n_landmarks(ms)) > 1000

    poses = np.asarray(outs.pose)
    sel = tracked.copy()
    gt = np.asarray([e.gt_t for e, s in zip(ds.entries, sel) if s])
    est = np.asarray(
        [traj.tcw_to_twc(poses[i])[:3, 3] for i in range(len(sel)) if sel[i]]
    )
    # similarity (with-scale) alignment: mono scale is arbitrary and the
    # chain accumulates scale drift (the reference has no correction
    # mechanism either, tracking.cpp:206-263) — regression bound, same
    # class as the online mono test's 0.3 bound (measured 0.155 at
    # introduction; the drift term dominates)
    ate = traj.ate_rmse(est, gt, with_scale=True)
    assert ate < 0.25, ate


def test_offline_mono_scale_consistency(mono_seq):
    """The scale chain must keep consecutive-pair scales coherent: the
    per-pair translation norms should follow the ground-truth step norms
    up to ONE global factor (low relative spread), not a random walk."""
    ds, grays, depths, cam = mono_seq
    ms, outs = run_offline_pipeline(
        cam, grays, depths, TrackingOptions(), monocular=True
    )
    poses = np.asarray(outs.pose)          # [T,4,4] T_cw
    tracked = np.asarray(outs.tracked)
    gt = np.asarray([e.gt_t for e in ds.entries])
    T = len(tracked)
    ratios = []
    for i in range(T - 1):
        if not (tracked[i] and tracked[i + 1]):
            continue
        c0 = traj.tcw_to_twc(poses[i])[:3, 3]
        c1 = traj.tcw_to_twc(poses[i + 1])[:3, 3]
        est_step = np.linalg.norm(c1 - c0)
        gt_step = np.linalg.norm(gt[i + 1] - gt[i])
        if gt_step > 1e-6 and est_step > 1e-9:
            ratios.append(est_step / gt_step)
    ratios = np.asarray(ratios)
    assert len(ratios) >= 20
    spread = np.percentile(ratios, 90) / np.percentile(ratios, 10)
    # per-step scale wobble is bounded, not eliminated: retrack poses
    # inherit noise from triangulation-synthesized keyframe depths
    # (measured spread ~3.6 at introduction; a random-walk chain without
    # the shared-feature ratio correction measures >> 10)
    assert spread < 6.0, (spread, ratios)


@pytest.fixture(scope="module")
def looped_seq(tmp_path_factory):
    """A sequence covering TWO full trajectory loops (stride 2 over 96
    rendered frames): place recognition finds genuine revisits here."""
    root = str(tmp_path_factory.mktemp("mono_loop"))
    synthetic.generate_sequence(root, n_frames=96, seed=13,
                                frames_per_loop=48)
    ds = tum.TumDataset(root, "rgbd_dataset_freiburg3_synthetic")
    assert ds.load()
    grays = np.stack([tum.load_rgb_gray(e.rgb_path)
                      for e in ds.entries])[::2]
    gt = np.asarray([e.gt_t for e in ds.entries])[::2]
    cam = make_camera(ds.intrinsics.fx, ds.intrinsics.fy,
                      ds.intrinsics.cx, ds.intrinsics.cy)
    return grays, gt, cam


MONO_KW = dict(kf_capacity=16, mono_pair_hypotheses=64, mono_lo_starts=2,
               mono_sample_bias=64.0, mono_score_top_k=32)


def _ate(outs, gt):
    tracked = np.asarray(outs.tracked)
    poses = np.asarray(outs.pose)
    est = np.asarray([traj.tcw_to_twc(poses[i])[:3, 3]
                      for i in range(len(tracked)) if tracked[i]])
    return traj.ate_rmse(est, gt[tracked], with_scale=True)


def test_mono_loop_closure_engages_and_bounded(looped_seq):
    """The opt-in loop-closure machinery (scale anchoring,
    _scale_loop_correction) on a revisiting trajectory: it must ENGAGE
    (verified revisits change the chain), stay bounded (factors within
    the log-4 gate), and not break tracking. Accuracy is deliberately
    NOT asserted to improve — measured across three closure mechanisms
    the synthetic-loop ATE does not benefit (see the mono_loop_pairs
    default rationale in offline_pipeline.py); the machinery ships
    opt-in for drift-dominated data."""
    grays, gt, cam = looped_seq
    depths = np.zeros(grays.shape, np.float32)
    opts = TrackingOptions()
    _, o_on = run_offline_pipeline(cam, grays, depths, opts,
                                   monocular=True, mono_loop_pairs=12,
                                   **MONO_KW)
    _, o_off = run_offline_pipeline(cam, grays, depths, opts,
                                    monocular=True, **MONO_KW)
    ate_on, ate_off = _ate(o_on, gt), _ate(o_off, gt)
    # engaged: the verified revisits' scale anchoring changes the chain
    assert not np.allclose(np.asarray(o_on.pose), np.asarray(o_off.pose))
    # bounded: no collapse/explosion, tracking intact
    assert ate_on <= max(2.0 * ate_off, 0.05), (ate_on, ate_off)
    assert np.asarray(o_on.tracked).mean() >= 0.95


def test_scale_loop_correction_gates():
    """Unit-level behavior of the scale-anchoring verification gates
    (_scale_loop_correction): dissimilar frames (no revisit) produce NO
    correction (factor exactly 1 everywhere); an exact-revisit
    construction with a known scale offset recovers it."""
    import jax
    import jax.numpy as jnp

    from visionx_slam_tpu.ops.camera import make_camera
    from visionx_slam_tpu.ops.se3 import identity_pose
    from visionx_slam_tpu.tracking.offline_pipeline import (
        _scale_loop_correction,
    )

    rng = np.random.default_rng(0)
    T, N = 32, 256
    cam = make_camera(525.0, 525.0, 319.5, 239.5)
    opts = TrackingOptions()
    px = jnp.asarray(rng.uniform(0, 600, (T, N, 2)), jnp.float32)
    valid = jnp.ones((T, N), bool)
    frame_q = jnp.tile(identity_pose().q[None], (T, 1))
    key = jax.random.PRNGKey(0)

    # case 1: every frame unique -> no partner passes the similarity gate
    desc_u = jnp.asarray(rng.integers(0, 256, (T, N, 32)), jnp.uint8)
    dfeat = jnp.asarray(rng.uniform(1.0, 3.0, (T, N)), jnp.float32)
    factor, ver = jax.jit(
        lambda d, df: _scale_loop_correction(
            cam, opts, d, valid, px, df, frame_q, 1, 12, 40, key)
    )(desc_u, dfeat)
    assert not bool(np.asarray(ver).any())
    np.testing.assert_array_equal(np.asarray(factor), 1.0)

    # case 2: frames 16.. revisit frames 0.. exactly (same descriptors)
    # with depths scaled by e^0.3 -> verified frames recover ~e^-0.3
    desc_l = jnp.concatenate([desc_u[:16], desc_u[:16]], axis=0)
    dfeat_l = jnp.concatenate([dfeat[:16], dfeat[:16] * np.exp(0.3)], 0)
    factor, ver = jax.jit(
        lambda d, df: _scale_loop_correction(
            cam, opts, d, valid, px, df, frame_q, 1, 12, 40, key)
    )(desc_l, dfeat_l)
    ver = bool(np.asarray(ver).any())
    assert ver
    f = np.asarray(factor)
    # frames with a verified partner are pulled toward e^-0.3
    corrected = f[f < 0.999]
    assert len(corrected) >= 8
    np.testing.assert_allclose(corrected, np.exp(-0.3), rtol=0.1)


def test_mono_folded_loop_closure_matches_single(looped_seq):
    """Folded-lane mono WITH loop closure must reproduce each lane's
    single-lane result (lane-gated candidates, per-lane budgets, and
    within-lane-slot RANSAC keys make the pass lane-deterministic)."""
    from visionx_slam_tpu.tracking.offline_pipeline import (
        run_offline_pipeline_batched,
    )

    grays, gt, cam = looped_seq
    depths = np.zeros(grays.shape, np.float32)
    opts = TrackingOptions()
    _, o1 = run_offline_pipeline(cam, grays, depths, opts,
                                 monocular=True, mono_loop_pairs=12,
                                 **MONO_KW)
    g2 = np.stack([grays, grays[::-1].copy()])
    d2 = np.zeros(g2.shape, np.float32)
    _, ob = run_offline_pipeline_batched(cam, g2, d2, opts,
                                         monocular=True, mono_loop_pairs=12,
                                         **MONO_KW)
    np.testing.assert_allclose(
        np.asarray(ob.pose)[0], np.asarray(o1.pose), rtol=0, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(ob.tracked)[0], np.asarray(o1.tracked)
    )
