"""Mono offline accuracy/speed ablation (VERDICT r3 #3/#7): scale-aligned
ATE and device-loop fps over the mono knob grid, on the bench's stride-4
input shape (real inter-frame baselines) and at T=60.

Usage: python tools/ablate_mono.py [--runs 2]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--frames", type=int, default=240)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from visionx_slam_tpu.data import synthetic
    from visionx_slam_tpu.eval import trajectory as traj
    from visionx_slam_tpu.ops.camera import make_camera
    from visionx_slam_tpu.tracking import offline_pipeline as op
    from visionx_slam_tpu.utils.config import TrackingOptions

    _, _, entries, grays, depths, gts = bench._load_sequence(args.frames)
    cam = make_camera(synthetic.FX, synthetic.FY, synthetic.CX, synthetic.CY)
    opts = TrackingOptions()

    g4 = np.tile(grays, (4, 1, 1))[::4]          # bench 2b shape: T=240
    gt4 = np.tile(gts, (4, 1))[::4]
    T = g4.shape[0]
    gd = jax.device_put(jnp.asarray(g4))
    dd = jnp.zeros(gd.shape, jnp.float32)

    def ate_of(outs, gt):
        tracked = np.asarray(outs.tracked)
        poses = np.asarray(outs.pose)
        est = np.asarray([traj.tcw_to_twc(poses[i])[:3, 3]
                          for i in range(len(tracked)) if tracked[i]])
        return traj.ate_rmse(est, gt[tracked], with_scale=True), tracked.mean()

    from visionx_slam_tpu.tracking.offline_pipeline import (
        default_lane_kf_capacity,
    )
    K = default_lane_kf_capacity(T)

    def timed(label, **kw):
        kw.setdefault("kf_capacity", K)
        run = op.build_offline_pipeline(None, opts, monocular=True, **kw)
        f = jax.jit(lambda g, d: run(cam, g, d))
        ms, outs = f(gd, dd)
        jax.block_until_ready(outs.pose)
        ts = []
        for i in range(args.runs):
            g = gd.at[0, 0, 0].set(jnp.uint8(i + 1))
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            ms, outs = f(g, dd)
            _ = float(jnp.sum(outs.n_inliers))
            ts.append(time.perf_counter() - t0)
        t = statistics.median(ts)
        ate, trk = ate_of(outs, gt4)
        print(f"{label:52s} {t / T * 1e3:7.3f} ms/f ({T / t:6.1f} fps)"
              f"  ate={ate * 1e3:6.1f}mm trk={trk:.2f}", flush=True)

    timed("hyp=128 lo=4 (anchor)", mono_pair_hypotheses=128,
          mono_lo_starts=4)
    timed("hyp=64 lo=2 bias=64", mono_pair_hypotheses=64,
          mono_lo_starts=2, mono_sample_bias=64.0)
    timed("hyp=64 lo=2 bias=24", mono_pair_hypotheses=64,
          mono_lo_starts=2, mono_sample_bias=24.0)
    timed("hyp=64 lo=4 bias=24", mono_pair_hypotheses=64,
          mono_lo_starts=4, mono_sample_bias=24.0)
    timed("hyp=96 lo=2", mono_pair_hypotheses=96, mono_lo_starts=2)
    timed("hyp=96 lo=2 bias=24", mono_pair_hypotheses=96,
          mono_lo_starts=2, mono_sample_bias=24.0)
    timed("hyp=128 lo=2 bias=24", mono_pair_hypotheses=128,
          mono_lo_starts=2, mono_sample_bias=24.0)


if __name__ == "__main__":
    main()
