"""Viewer-replacement sinks (SURVEY.md L8): PLY cloud export + offline
plotter, validated on a synthetic snapshot (no GL — the reference's
Pangolin window, viewer.cpp:167-235, maps to these files)."""

import os

import numpy as np
import pytest

from visionx_slam_tpu.eval import export


def _fake_snapshot(tmp_path, n_lm=100, n_kf=5):
    rng = np.random.RandomState(0)
    lm_pos = rng.randn(3, n_lm).astype(np.float32)
    lm_alive = np.zeros(n_lm, bool)
    lm_alive[: n_lm // 2] = True
    lm_pos[:, 10] = np.nan  # a dead/garbage row that must be filtered
    q = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n_kf, 1))
    t = rng.randn(n_kf, 3).astype(np.float32)
    kf_id = np.array([0, 1, 2, -1, -1], np.int32)
    path = str(tmp_path / "map_snapshot.npz")
    np.savez(path, lm_pos=lm_pos, lm_alive=lm_alive, kf_q=q, kf_t=t,
             kf_id=kf_id)
    return path


def _read_ply(path):
    with open(path) as f:
        lines = f.read().splitlines()
    n = int(next(l for l in lines if l.startswith("element vertex")).split()[-1])
    body = lines[lines.index("end_header") + 1 :]
    assert len(body) == n
    pts = np.asarray([[float(x) for x in l.split()[:3]] for l in body])
    return pts


def test_snapshot_ply_roundtrip(tmp_path):
    snap = _fake_snapshot(tmp_path)
    ply = str(tmp_path / "map.ply")
    n = export.export_snapshot_ply(snap, ply)
    pts = _read_ply(ply)
    assert len(pts) == n
    # alive (50) minus the NaN row (1) plus alive keyframes (3)
    assert n == 49 + 3
    assert np.all(np.isfinite(pts))


def test_ply_identity_pose_center():
    # T_cw with identity rotation and translation t -> camera center -t
    c = -export._quat_to_R(np.array([1.0, 0, 0, 0])).T @ np.array([1.0, 2, 3])
    np.testing.assert_allclose(c, [-1.0, -2, -3])


def test_plot_trajectory(tmp_path):
    traj = tmp_path / "trajectory.txt"
    ts = np.arange(10, dtype=float)
    with open(traj, "w") as f:
        f.write("# estimated trajectory\n")
        for t in ts:
            f.write(f"{t:.4f} {t*0.1:.4f} 0.0 {t*0.05:.4f} 0 0 0 1\n")
    tsr, xyz = export.read_tum_trajectory(str(traj))
    assert len(tsr) == 10 and xyz.shape == (10, 3)
    pytest.importorskip("matplotlib")
    out = export.plot_trajectory(
        str(traj), str(tmp_path / "t.png"),
        cloud_npz=_fake_snapshot(tmp_path),
    )
    assert os.path.getsize(out) > 1000


def test_cli_plot(tmp_path):
    pytest.importorskip("matplotlib")
    from visionx_slam_tpu.cli import plot as plot_cli

    traj = tmp_path / "trajectory.txt"
    with open(traj, "w") as f:
        for t in range(8):
            f.write(f"{t}.0 {t*0.1} 0.0 0.0 0 0 0 1\n")
    _fake_snapshot(tmp_path)
    assert plot_cli.main(["--run_dir", str(tmp_path)]) == 0
    assert (tmp_path / "map.ply").exists()
    assert (tmp_path / "trajectory.png").exists()
