"""End-to-end regression: full SLAM on a synthetic TUM sequence.

The moral equivalent of the ATE/RPE regression on a truncated fr1_desk
slice (SURVEY.md §4) — no TUM download exists in this environment, so the
sequence is synthesized with exact GT (tests also cover decode +
association + depth semantics on the way through).
"""

import numpy as np
import pytest

from visionx_slam_tpu.data import synthetic
from visionx_slam_tpu.system.system import System
from visionx_slam_tpu.utils.config import SystemConfig


@pytest.fixture(scope="module")
def synth_seq(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    synthetic.generate_sequence(root, n_frames=25, seed=11)
    return root


def test_end_to_end_rgbd_slam(synth_seq, tmp_path):
    cfg = SystemConfig(
        dataset_dir=synth_seq,
        sequence="rgbd_dataset_freiburg3_synthetic",
        output_dir=str(tmp_path / "out"),
        extractor="opencv",
    )
    system = System(cfg)
    summary = system.run()

    assert summary["n_frames"] == 25
    # nearly every frame tracked after the two-frame init
    assert summary["n_tracked"] >= 20
    assert summary["n_keyframes"] >= 2
    assert summary["n_landmarks"] > 200
    assert "ate_rmse" in summary
    # RGB-D tracking with exact depth: centimeter-level ATE expected
    assert summary["ate_rmse"] < 0.05, summary

    # trajectory file exists and parses
    from visionx_slam_tpu.eval import trajectory as traj

    ts, mats = traj.read_tum_trajectory(summary["trajectory"])
    assert len(ts) == summary["n_tracked"]

    # snapshot exists and round-trips
    ms = System.load_snapshot(str(tmp_path / "out" / "map_snapshot.npz"))
    assert int(np.asarray(ms.next_kf)) >= 2


def test_dump_overlays(synth_seq, tmp_path):
    """--dump_overlays N writes the viewer's feature-overlay PNG for every
    Nth frame of a run (reference viewer.cpp:106-141's per-frame panel as a
    file sink)."""
    cfg = SystemConfig(
        dataset_dir=synth_seq,
        sequence="rgbd_dataset_freiburg3_synthetic",
        output_dir=str(tmp_path / "out"),
        extractor="opencv",
        max_frames=10,
        dump_overlays=4,
        export_ply=False,
        metrics_jsonl=False,
    )
    summary = System(cfg).run()
    assert summary["overlays"] == 3  # frames 0, 4, 8

    import glob

    paths = sorted(glob.glob(str(tmp_path / "out" / "overlays" / "*.png")))
    assert len(paths) == 3
    import cv2

    img = cv2.imread(paths[0])
    assert img is not None and img.shape == (480, 640, 3)
    # overlay actually drew features: some pixels are pure green
    green = (img[..., 1] == 255) & (img[..., 0] == 0) & (img[..., 2] == 0)
    assert green.sum() > 50
