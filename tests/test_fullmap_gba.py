"""Full-map global BA over archived keyframes (BASELINE config 4, round-2
mandate): when the scan path's keyframe ring evicts, --run_global_ba must
still cover EVERY keyframe ever created — the reference keeps all
keyframes (map.h:30-33) and the framework must at least match that reach
offline.

Uses a deliberately tiny ring (kf_capacity=12) on a longer sequence so the
ring wraps several times; the archive must hold more keyframes than the
ring can, and GBA over the union must not degrade the map's mean
reprojection error."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from visionx_slam_tpu.data import synthetic
from visionx_slam_tpu.system.system import System
from visionx_slam_tpu.utils.config import SystemConfig


def test_gba_covers_all_archived_keyframes(tmp_path):
    root = str(tmp_path / "seq")
    n_frames = 120
    synthetic.generate_sequence(root, n_frames=n_frames, seed=19)

    cfg = SystemConfig(
        dataset_dir=root, sequence="rgbd_dataset_freiburg3_synthetic",
        output_dir=str(tmp_path / "out"),
        pipeline="scan", metrics_jsonl=False,
        run_global_ba=True, global_ba_iterations=4,
        kf_capacity=12,
    )
    system = System(cfg)
    summary = system.run()

    gba = summary["global_ba"]
    # the ring (12 slots) wrapped: the archive covered MORE keyframes
    assert "archived_keyframes" in gba, gba
    n_arch = gba["archived_keyframes"]
    assert n_arch > 12, n_arch
    # GBA ran over the union: every archived keyframe is in the solved map
    ms = system.tracker.ms
    kf_ids = np.asarray(ms.kf_id)
    assert int((kf_ids >= 0).sum()) == n_arch
    # and the solve did not degrade the map (<= before, small slack)
    assert gba["mean_reproj_after_px"] <= gba["mean_reproj_before_px"] + 1e-3, gba
    assert gba["total_obs"] > 0

    # the refined keyframe trajectory covers all archived keyframes
    from visionx_slam_tpu.eval import trajectory as traj

    ts, mats = traj.read_tum_trajectory(gba["keyframe_trajectory"])
    assert len(ts) == n_arch
