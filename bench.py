"""Benchmark: frames/sec/chip on a synthetic fr1_desk-class sequence.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 500 — the BASELINE.json north-star target
(>= 500 frames/sec/chip on TUM fr1_desk; the reference C++ build paces
itself to <= 10 FPS by construction, system.cpp:49). No TUM download
exists in this environment, so the bench renders a TUM-layout synthetic
sequence at fr1 geometry (640x480 RGB-D) and runs the REAL end-to-end
pipeline on it: decode -> TPU ORB -> MXU matching -> PnP RANSAC ->
keyframes/triangulation -> windowed BA -> trajectory.

Flags: --quick (CPU smoke: few frames), --frames N, --extractor jax|opencv.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser("bench")
    p.add_argument("--quick", action="store_true", help="tiny CPU smoke run")
    p.add_argument("--frames", type=int, default=0)
    p.add_argument("--extractor", default="jax", choices=["jax", "opencv"])
    p.add_argument("--pipeline", default="scan", choices=["scan", "host"])
    p.add_argument("--batch", type=int, default=0,
                   help="batched throughput mode: B sequences in parallel on one chip")
    p.add_argument("--warmup", type=int, default=12)
    args = p.parse_args(argv)

    if args.batch:
        return bench_batched(args)

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

    from visionx_slam_tpu.data import synthetic, tum
    from visionx_slam_tpu.system.system import System
    from visionx_slam_tpu.utils.config import SystemConfig

    n_frames = args.frames or (20 if args.quick else 240)

    cache_root = os.path.join(tempfile.gettempdir(), f"vxs_bench_{n_frames}")
    seq = "rgbd_dataset_freiburg3_synthetic"
    if not os.path.isdir(os.path.join(cache_root, seq)):
        synthetic.generate_sequence(cache_root, sequence=seq, n_frames=n_frames, seed=5)

    out_dir = os.path.join(tempfile.gettempdir(), "vxs_bench_out")
    cfg = SystemConfig(
        dataset_dir=cache_root,
        sequence=seq,
        output_dir=out_dir,
        extractor=args.extractor,
        pipeline=args.pipeline,
        metrics_jsonl=False,
    )

    # warmup pass compiles every stage (first TPU compile is slow; cached
    # after). The scan pipeline compiles per sequence length, so its warmup
    # must use the full length — run the whole thing once.
    if args.pipeline == "scan":
        System(cfg).run()
    else:
        warm_cfg = SystemConfig(**{**cfg.__dict__, "max_frames": args.warmup,
                                   "tracking": cfg.tracking})
        System(warm_cfg).run()

    system = System(cfg)
    t0 = time.perf_counter()
    summary = system.run()
    wall = time.perf_counter() - t0

    # the device loop throughput is the chip metric; host decode overlaps in
    # deployment (threaded native loader) and is reported separately
    fps = summary.get("scan_fps", summary["n_frames"] / wall)
    result = {
        "metric": "frames/sec/chip on synthetic fr1-class RGB-D (640x480, full SLAM)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 500.0, 4),
        "detail": {
            "n_frames": summary["n_frames"],
            "n_tracked": summary["n_tracked"],
            "n_keyframes": summary["n_keyframes"],
            "n_landmarks": summary["n_landmarks"],
            "ate_rmse_m": summary.get("ate_rmse"),
            "extractor": args.extractor,
            "pipeline": args.pipeline,
            "end_to_end_fps": round(summary["n_frames"] / wall, 2),
            "decode_time_s": summary.get("decode_time_s"),
        },
    }
    print(json.dumps(result))
    return 0


def bench_batched(args) -> int:
    """Batched throughput mode (BASELINE config 5 on one chip): B synthetic
    sequences tracked in parallel by the vmapped scan pipeline; the metric
    is aggregate frames/sec/chip."""
    import time as _time

    import numpy as np

    from visionx_slam_tpu.data import synthetic, tum
    from visionx_slam_tpu.eval import trajectory as traj
    from visionx_slam_tpu.ops.camera import make_camera
    from visionx_slam_tpu.tracking.scan_pipeline import run_scan_pipeline_batched
    from visionx_slam_tpu.utils.config import TrackingOptions

    import jax
    import jax.numpy as jnp

    B = args.batch
    T = args.frames or (20 if args.quick else 120)
    grays, depths, gts = [], [], []
    seq = "rgbd_dataset_freiburg3_synthetic"
    for b in range(B):
        root = os.path.join(tempfile.gettempdir(), f"vxs_benchb_{T}_{b}")
        if not os.path.isdir(os.path.join(root, seq)):
            synthetic.generate_sequence(root, sequence=seq, n_frames=T, seed=100 + b)
        ds = tum.TumDataset(root, seq)
        ds.load()
        grays.append(np.stack([tum.load_rgb_gray(e.rgb_path) for e in ds.entries]))
        depths.append(np.stack([tum.load_depth_m(e.depth_path) for e in ds.entries]))
        gts.append(np.stack([e.gt_t for e in ds.entries]))
    grays = np.stack(grays)
    depths = np.stack(depths)
    cam = make_camera(synthetic.FX, synthetic.FY, synthetic.CX, synthetic.CY)

    opts = TrackingOptions()
    st, outs = run_scan_pipeline_batched(cam, grays, depths, opts)
    _ = float(jnp.sum(outs.n_inliers))
    best = 1e9
    for i in range(2):
        g2 = grays.copy()
        g2[:, 0, 0, 0] = i + 1
        t0 = _time.perf_counter()
        st, outs = run_scan_pipeline_batched(cam, g2, depths, opts)
        _ = float(jnp.sum(outs.n_inliers))
        best = min(best, _time.perf_counter() - t0)

    tracked = np.asarray(outs.tracked)  # [T,B]
    poses = np.asarray(outs.pose)       # [T,B,4,4]
    ates = []
    for b in range(B):
        sel = tracked[:, b]
        if sel.sum() >= 3:
            est = np.asarray([traj.tcw_to_twc(poses[t, b])[:3, 3]
                              for t in range(T) if sel[t]])
            ates.append(traj.ate_rmse(est, gts[b][sel]))
    fps = B * T / best
    result = {
        "metric": "aggregate frames/sec/chip, batched multi-sequence SLAM (640x480 RGB-D)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 500.0, 4),
        "detail": {
            "batch": B, "frames_per_seq": T,
            "per_stream_fps": round(fps / B, 2),
            "tracked_frac": float(tracked.mean()),
            "ate_rmse_m_mean": float(np.mean(ates)) if ates else None,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
