"""Monocular path (BASELINE config 2): no depth -> essential-matrix init +
two-view triangulation only. Scale is unobservable, so the check is
scale-invariant: tracking continues and the aligned-with-scale ATE is small.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from visionx_slam_tpu.data import synthetic, tum
from visionx_slam_tpu.eval import trajectory as traj
from visionx_slam_tpu.ops.camera import make_camera
from visionx_slam_tpu.tracking.scan_pipeline import run_scan_pipeline
from visionx_slam_tpu.utils.config import TrackingOptions


@pytest.fixture(scope="module")
def mono_seq(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mono"))
    # monocular init needs real baseline between consecutive frames:
    # essential estimation degenerates at fr1-speed 15mm steps (the
    # reference has the same behavior — its parallax gate never fires)
    synthetic.generate_sequence(root, n_frames=25, seed=11, frames_per_loop=48)
    ds = tum.TumDataset(root, "rgbd_dataset_freiburg3_synthetic")
    assert ds.load()
    grays = np.stack([tum.load_rgb_gray(e.rgb_path) for e in ds.entries])
    zero_depth = np.zeros_like(
        np.stack([tum.load_depth_m(e.depth_path) for e in ds.entries])
    )
    cam = make_camera(ds.intrinsics.fx, ds.intrinsics.fy,
                      ds.intrinsics.cx, ds.intrinsics.cy)
    return ds, grays, zero_depth, cam


def test_monocular_tracks_up_to_scale(mono_seq):
    ds, grays, depths, cam = mono_seq
    st, outs = run_scan_pipeline(cam, grays, depths, TrackingOptions())
    jax.block_until_ready(outs)
    tracked = np.asarray(outs.tracked)
    # mono tracking is harder; require most frames but tolerate dropouts
    assert tracked.sum() >= 15, tracked.sum()
    assert int(np.asarray(outs.n_landmarks)[-1]) > 50  # triangulated only

    poses = np.asarray(outs.pose)
    sel = tracked.copy()
    gt = np.asarray([e.gt_t for e, s in zip(ds.entries, sel) if s])
    est = np.asarray(
        [traj.tcw_to_twc(poses[i])[:3, 3] for i in range(len(sel)) if sel[i]]
    )
    # similarity (with-scale) alignment: mono scale is arbitrary, and
    # nothing corrects scale DRIFT along the run (the reference has no
    # mechanism either) — this is a does-it-track regression bound, not an
    # accuracy benchmark
    ate = traj.ate_rmse(est, gt, with_scale=True)
    assert ate < 0.3, ate


def test_monocular_accuracy_with_mono_options(mono_seq):
    """The bench's mono option set (link_tracked_landmarks +
    min_init_landmarks, config.py extensions): keyframes inherit the
    landmarks their matches track and rotation-only init pairs are
    rejected, so the map stays dense enough for PnP throughout — every
    frame tracked, and the scale-aligned ATE tightens well below the
    strict-structure bound above (measured 0.078 m at T=60/stride 4 vs
    0.199 m without; the oracle's reference-faithful run is 0.362 m)."""
    import dataclasses

    ds, grays, depths, cam = mono_seq
    opts = dataclasses.replace(
        TrackingOptions(), link_tracked_landmarks=True,
        min_init_landmarks=25,
    )
    st, outs = run_scan_pipeline(cam, grays, depths, opts)
    jax.block_until_ready(outs)
    tracked = np.asarray(outs.tracked)
    assert tracked.sum() >= len(tracked) - 2, tracked.sum()
    poses = np.asarray(outs.pose)
    gt = np.asarray([e.gt_t for e, s in zip(ds.entries, tracked) if s])
    est = np.asarray(
        [traj.tcw_to_twc(poses[i])[:3, 3]
         for i in range(len(tracked)) if tracked[i]]
    )
    ate = traj.ate_rmse(est, gt, with_scale=True)
    assert ate < 0.15, ate
