"""Scan-vs-host frontend parity, snapshot resume, and strict-reference mode.

Three round-2 mandates:

1. The fused scan pipeline (``pipeline=scan``) and the host state machine
   (``pipeline=host``) claim identical semantics (scan_pipeline.py module
   docstring) — this asserts it on a real sequence instead of hand-keeping
   the two implementations in sync.
2. ``--resume_from`` must actually CONTINUE a run from a map snapshot
   (SURVEY.md §5.4): split a sequence in half, snapshot at the midpoint,
   resume, and compare against the single uninterrupted run.
3. ``config/reference_strict.cfg`` (all extensions off, the reference's
   shipped enable_local_ba=false) must initialize via the essential matrix
   and track — the groundwork for the <=5 % ATE reference comparison.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from visionx_slam_tpu.data import synthetic, tum
from visionx_slam_tpu.eval import trajectory as traj
from visionx_slam_tpu.system.system import System
from visionx_slam_tpu.utils.config import SystemConfig

SEQ = "rgbd_dataset_freiburg3_synthetic"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synth_seq(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("parity"))
    synthetic.generate_sequence(root, n_frames=30, seed=23)
    return root


def _run(root, out, pipeline, extractor="jax", **kw):
    cfg = SystemConfig(
        dataset_dir=root, sequence=SEQ, output_dir=str(out),
        pipeline=pipeline, extractor=extractor, metrics_jsonl=False, **kw,
    )
    system = System(cfg)
    return system, system.run()


def test_scan_host_parity(synth_seq, tmp_path):
    """Same sequence, same options, same extractor -> the two frontends
    must agree on the tracked set, keyframe decisions, and trajectory."""
    _, s_scan = _run(synth_seq, tmp_path / "scan", "scan")
    _, s_host = _run(synth_seq, tmp_path / "host", "host")

    assert s_scan["n_frames"] == s_host["n_frames"]
    # keyframe decisions and landmark structure line up
    assert s_scan["n_keyframes"] == s_host["n_keyframes"], (s_scan, s_host)
    assert abs(s_scan["n_tracked"] - s_host["n_tracked"]) <= 1
    # landmark counts agree to within the dedupe/ordering slack of the
    # batched triangulation (the host path shares the same stage functions)
    assert abs(s_scan["n_landmarks"] - s_host["n_landmarks"]) <= 0.02 * max(
        s_scan["n_landmarks"], 1
    ), (s_scan["n_landmarks"], s_host["n_landmarks"])

    ts_a, T_a = traj.read_tum_trajectory(str(tmp_path / "scan" / "trajectory.txt"))
    ts_b, T_b = traj.read_tum_trajectory(str(tmp_path / "host" / "trajectory.txt"))
    pairs = traj.associate_trajectories(ts_a, ts_b)
    assert len(pairs) >= min(len(ts_a), len(ts_b)) - 1
    pa = np.asarray([T_a[i][:3, 3] for i, _ in pairs])
    pb = np.asarray([T_b[j][:3, 3] for _, j in pairs])
    # identical stage functions, identical RNG streams -> near-identical
    # trajectories (float noise from op-ordering differences only)
    assert float(np.abs(pa - pb).max()) < 5e-3, float(np.abs(pa - pb).max())


def test_resume_matches_uninterrupted_run(synth_seq, tmp_path):
    """Run 0..29 in one go vs 0..14 + snapshot + resume 15..29."""
    _, full = _run(synth_seq, tmp_path / "full", "scan")

    sys_a, first = _run(synth_seq, tmp_path / "first", "scan", max_frames=15)
    snap = str(tmp_path / "first" / "map_snapshot.npz")
    assert os.path.exists(snap)

    # resume: feed the remaining frames (max_frames applies from the start,
    # so pass the full dataset and skip via the resume entries slice)
    cfg = SystemConfig(
        dataset_dir=synth_seq, sequence=SEQ,
        output_dir=str(tmp_path / "second"),
        pipeline="scan", metrics_jsonl=False, resume_from=snap,
    )
    system = System(cfg)
    system.dataset.entries = system.dataset.entries[15:]
    second = system.run()

    assert second["n_tracked"] >= 13  # keeps tracking immediately
    # stitched trajectory matches the uninterrupted run
    ts_f, T_f = traj.read_tum_trajectory(str(tmp_path / "full" / "trajectory.txt"))
    ts_s, T_s = traj.read_tum_trajectory(str(tmp_path / "second" / "trajectory.txt"))
    pairs = traj.associate_trajectories(ts_s, ts_f)
    assert len(pairs) >= 13
    ps = np.asarray([T_s[i][:3, 3] for i, _ in pairs])
    pf = np.asarray([T_f[j][:3, 3] for _, j in pairs])
    err = float(np.abs(ps - pf).max())
    # the resumed map lacks the culled/BA micro-state of the full run's
    # tracker (last parallax/inlier counters), so allow millimeter slack
    assert err < 0.01, err


def test_reference_strict_mode_tracks(synth_seq, tmp_path):
    """Extensions off, essential-matrix init, shipped enable_local_ba=false
    (reference config/default.cfg:34): must initialize and track. The
    essential init leaves scale arbitrary (the reference's own quirk), so
    ATE is evaluated under similarity alignment."""
    cfg_path = os.path.join(REPO, "config", "reference_strict.cfg")
    cfg = SystemConfig(
        dataset_dir=synth_seq, sequence=SEQ,
        output_dir=str(tmp_path / "strict"),
        pipeline="scan", metrics_jsonl=False, config=cfg_path,
    )
    from visionx_slam_tpu.utils.config import (
        apply_config_if_default, parse_config_file,
    )

    apply_config_if_default(cfg, parse_config_file(cfg_path), set())
    assert cfg.tracking.rgbd_init is False
    assert cfg.tracking.enable_local_ba is False

    system = System(cfg)
    summary = system.run()
    assert summary["n_tracked"] >= 20, summary
    assert summary["n_keyframes"] >= 2

    # similarity-aligned ATE: the strict init has unit-norm (arbitrary
    # scale) translation by design
    entries = system.dataset.entries
    est, gt = [], []
    for e, r in zip(entries, system.results):
        if r.pose_T_cw is not None:
            est.append(traj.tcw_to_twc(np.asarray(r.pose_T_cw))[:3, 3])
            gt.append(e.gt_t)
    ate = traj.ate_rmse(np.asarray(est), np.asarray(gt), with_scale=True)
    # bound is loose by design: strict mode's unit-norm essential init
    # (reference tracking.cpp:539-541) fixes scale from one noisy two-view
    # estimate, so aligned ATE varies with the feature pipeline (~0.07 with
    # the round-2 matmul-BRIEF descriptors); the gate is "tracks sanely",
    # the tight accuracy regression lives in the RGB-D-init tests
    assert ate < 0.12, ate
