"""Fused scan pipeline vs host state machine: parity + accuracy regression.

The scan path must track the same sequence the host path tracks, with
comparable keyframe/landmark structure and centimeter-level ATE.
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
def seq(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scan"))
    synthetic.generate_sequence(root, n_frames=25, seed=11)
    ds = tum.TumDataset(root, "rgbd_dataset_freiburg3_synthetic")
    assert ds.load()
    grays = np.stack([tum.load_rgb_gray(e.rgb_path) for e in ds.entries])
    depths = np.stack([tum.load_depth_m(e.depth_path) for e in ds.entries])
    cam = make_camera(ds.intrinsics.fx, ds.intrinsics.fy,
                      ds.intrinsics.cx, ds.intrinsics.cy)
    return ds, grays, depths, cam


def test_scan_pipeline_tracks_and_is_accurate(seq):
    ds, grays, depths, cam = seq
    st, outs = run_scan_pipeline(cam, grays, depths, TrackingOptions())
    jax.block_until_ready(outs)

    tracked = np.asarray(outs.tracked)
    assert tracked.sum() >= 22, tracked.sum()
    assert int(np.asarray(outs.n_keyframes)[-1]) >= 2
    assert int(np.asarray(outs.n_landmarks)[-1]) > 500

    poses = np.asarray(outs.pose)
    gt = np.asarray([e.gt_t for e, tr in zip(ds.entries, tracked) if tr])
    est = np.asarray(
        [traj.tcw_to_twc(poses[i])[:3, 3] for i in range(len(grays)) if tracked[i]]
    )
    ate = traj.ate_rmse(est, gt)
    assert ate < 0.03, ate


def test_scan_pipeline_deterministic(seq):
    ds, grays, depths, cam = seq
    _, o1 = run_scan_pipeline(cam, grays, depths, TrackingOptions())
    _, o2 = run_scan_pipeline(cam, grays, depths, TrackingOptions())
    np.testing.assert_array_equal(np.asarray(o1.pose), np.asarray(o2.pose))
    np.testing.assert_array_equal(np.asarray(o1.n_inliers), np.asarray(o2.n_inliers))


def test_scan_pipeline_recovers_from_garbage_frames(seq):
    """Failure-injection (SURVEY.md §5.3 analog): blank out a few frames so
    tracking degrades; the pipeline must re-initialize and keep going."""
    ds, grays, depths, cam = seq
    g = grays.copy()
    g[10:13] = 0  # three black frames: extraction finds nothing
    st, outs = run_scan_pipeline(cam, g, depths, TrackingOptions())
    tracked = np.asarray(outs.tracked)
    states = np.asarray(outs.state)
    # loses tracking during the blackout (state machine leaves GOOD)...
    assert not tracked[11]
    assert (states[10:14] != 1).any(), states
    # ...and recovers: re-initializes and is tracking again at the end
    assert tracked[-3:].any(), states
    assert states[-1] == 1, states  # TRACKING_GOOD after recovery
