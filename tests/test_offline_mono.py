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
