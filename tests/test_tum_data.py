"""Golden tests for the TUM associator + synthetic dataset + ATE evaluator."""

import os

import numpy as np
import pytest

from visionx_slam_tpu.data import tum, synthetic
from visionx_slam_tpu.eval import trajectory as traj


def test_associate_nearest_within_window():
    rgb = [(1.00, "rgb/a.png"), (1.10, "rgb/b.png"), (1.50, "rgb/c.png")]
    depth = [(1.005, "depth/a.png"), (1.115, "depth/b.png"), (1.47, "depth/c.png")]
    gt = [
        (0.995, np.zeros(3), np.array([0, 0, 0, 1.0])),
        (1.11, np.ones(3), np.array([0, 0, 0, 1.0])),
        (1.51, 2 * np.ones(3), np.array([0, 0, 0, 1.0])),
    ]
    entries = tum.associate(rgb, depth, gt, "/seq")
    assert len(entries) == 2  # 1.50 rgb: depth diff 0.03 > 0.02 -> dropped
    assert entries[0].depth_path.endswith("depth/a.png")
    assert entries[1].depth_path.endswith("depth/b.png")
    np.testing.assert_allclose(entries[1].gt_t, 1.0)


def test_associate_prefers_nearest_side():
    # nearest can be the earlier timestamp (lower_bound + prev logic)
    rgb = [(2.0, "r")]
    depth = [(1.985, "early"), (2.019, "late")]
    gt = [(2.0, np.zeros(3), np.array([0, 0, 0, 1.0]))]
    entries = tum.associate(rgb, depth, gt, "")
    assert entries[0].depth_path.endswith("early")


def test_read_list_skips_comments(tmp_path):
    p = tmp_path / "rgb.txt"
    p.write_text("# header\n# more\n1.5 rgb/x.png\n\n2.5 rgb/y.png\n")
    out = tum.read_list(str(p))
    assert out == [(1.5, "rgb/x.png"), (2.5, "rgb/y.png")]


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tumsynth"))
    synthetic.generate_sequence(root, n_frames=8, seed=3)
    return root


def test_synthetic_sequence_loads(synth_root):
    ds = tum.TumDataset(synth_root, "rgbd_dataset_freiburg3_synthetic")
    assert ds.load()
    assert len(ds.entries) == 8
    assert ds.intrinsics.fx == synthetic.FX
    gray = tum.load_rgb_gray(ds.entries[0].rgb_path)
    depth = tum.load_depth_m(ds.entries[0].depth_path)
    assert gray.shape == (480, 640) and gray.dtype == np.uint8
    assert depth.shape == (480, 640)
    # image-quality gates of the reference must pass on our scenes
    assert 30 < gray.mean() < 225
    assert gray.std() > 20
    # depth consistency: backproject center pixel, positive and in range
    d = depth[240, 320]
    assert 0.1 < d < 10.0


def test_synthetic_depth_matches_geometry(synth_root):
    """Rendered depth must equal ray-cast geometry: reproject a depth pixel
    from frame 0 into frame 1 using GT poses; photometric consistency."""
    ds = tum.TumDataset(synth_root, "rgbd_dataset_freiburg3_synthetic")
    ds.load()
    from scipy.spatial.transform import Rotation

    e0, e1 = ds.entries[0], ds.entries[1]
    g0, d0 = tum.load_rgb_gray(e0.rgb_path), tum.load_depth_m(e0.depth_path)
    g1 = tum.load_rgb_gray(e1.rgb_path)
    Rwc0 = Rotation.from_quat(e0.gt_q).as_matrix()
    Rwc1 = Rotation.from_quat(e1.gt_q).as_matrix()

    K = np.array([[synthetic.FX, 0, synthetic.CX], [0, synthetic.FY, synthetic.CY], [0, 0, 1]])
    ok, total = 0, 0
    rng = np.random.default_rng(0)
    for _ in range(300):
        u, v = rng.integers(60, 580), rng.integers(60, 420)
        z = d0[v, u]
        if z <= 0.1:
            continue
        pc0 = np.linalg.inv(K) @ np.array([u, v, 1.0]) * z
        pw = Rwc0 @ pc0 + e0.gt_t
        pc1 = Rwc1.T @ (pw - e1.gt_t)
        if pc1[2] <= 0:
            continue
        uv1 = K @ (pc1 / pc1[2])
        u1, v1 = int(round(uv1[0])), int(round(uv1[1]))
        if not (0 <= u1 < 640 and 0 <= v1 < 480):
            continue
        total += 1
        if abs(int(g0[v, u]) - int(g1[v1, u1])) < 40:
            ok += 1
    assert total > 100
    assert ok / total > 0.75  # strong photometric consistency


def test_ate_zero_for_identical():
    t = np.random.default_rng(0).normal(size=(50, 3))
    assert traj.ate_rmse(t, t) < 1e-9


def test_ate_invariant_to_rigid_transform():
    rng = np.random.default_rng(1)
    t = rng.normal(size=(50, 3))
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    t2 = (R @ t.T).T + np.array([1.0, -2.0, 3.0])
    assert traj.ate_rmse(t2, t) < 1e-6


def test_ate_detects_noise():
    rng = np.random.default_rng(2)
    t = rng.normal(size=(100, 3))
    noisy = t + rng.normal(scale=0.05, size=t.shape)
    e = traj.ate_rmse(noisy, t)
    assert 0.02 < e < 0.15


def test_trajectory_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    n = 10
    ts = np.arange(n) * 0.1 + 100.0
    mats = []
    from scipy.spatial.transform import Rotation

    for i in range(n):
        T = np.eye(4)
        T[:3, :3] = Rotation.from_rotvec(rng.normal(size=3) * 0.2).as_matrix()
        T[:3, 3] = rng.normal(size=3)
        mats.append(T)
    p = str(tmp_path / "traj.txt")
    traj.write_tum_trajectory(p, ts, mats)
    ts2, mats2 = traj.read_tum_trajectory(p)
    np.testing.assert_allclose(ts2, ts, atol=1e-6)
    np.testing.assert_allclose(np.array(mats2), np.array(mats), atol=1e-5)


def test_rpe_zero_for_identical():
    rng = np.random.default_rng(4)
    from scipy.spatial.transform import Rotation

    mats = []
    for i in range(10):
        T = np.eye(4)
        T[:3, :3] = Rotation.from_rotvec(rng.normal(size=3) * 0.1).as_matrix()
        T[:3, 3] = rng.normal(size=3)
        mats.append(T)
    mats = np.array(mats)
    t_err, r_err = traj.rpe_rmse(mats, mats)
    assert t_err < 1e-12 and r_err < 1e-6
