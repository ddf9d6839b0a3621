"""Mono offline ACCURACY ablation (VERDICT r3 #3: scale-aligned ATE
<= 0.10 m at 60 frames): sweep the refine/link/retrack knobs on the bench
config-2 input shape (240-frame loop strided 4x -> T=60, real baselines)
and on the config-2b shape (4 loops, T=240).

Usage: python tools/ablate_mono_acc.py [--frames 60] [--runs 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--runs", type=int, default=1)
    p.add_argument("--frames", type=int, default=60)
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
    from visionx_slam_tpu.tracking.offline_pipeline import (
        default_lane_kf_capacity,
    )
    from visionx_slam_tpu.utils.config import TrackingOptions

    _, _, entries, grays, depths, gts = bench._load_sequence(240)
    cam = make_camera(synthetic.FX, synthetic.FY, synthetic.CX, synthetic.CY)
    opts = TrackingOptions()

    if args.frames <= 60:
        g4 = grays[::4]                       # bench config 2 shape: T=60
        gt4 = gts[::4]
    else:
        g4 = np.tile(grays, (4, 1, 1))[::4]   # bench config 2b shape: T=240
        gt4 = np.tile(gts, (4, 1))[::4]
    T = g4.shape[0]
    gd = jax.device_put(jnp.asarray(g4))
    dd = jnp.zeros(gd.shape, jnp.float32)
    K = default_lane_kf_capacity(T)

    def ate_of(outs, gt):
        tracked = np.asarray(outs.tracked)
        poses = np.asarray(outs.pose)
        est = np.asarray([traj.tcw_to_twc(poses[i])[:3, 3]
                          for i in range(len(tracked)) if tracked[i]])
        return traj.ate_rmse(est, gt[tracked], with_scale=True), tracked.mean()

    def timed(label, **kw):
        kw.setdefault("kf_capacity", K)
        run = op.build_offline_pipeline(None, opts, monocular=True, **kw)
        f = jax.jit(lambda g, d: run(cam, g, d))
        t0 = time.perf_counter()
        ms, outs = f(gd, dd)
        jax.block_until_ready(outs.pose)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        ms, outs = f(gd, dd)
        jax.block_until_ready(outs.pose)
        t = time.perf_counter() - t0
        ate, trk = ate_of(outs, gt4)
        print(f"{label:58s} {t / T * 1e3:7.3f} ms/f ({T / t:6.1f} fps)"
              f"  ate={ate * 1e3:6.1f}mm trk={trk:.2f} (compile {tc:.0f}s)",
              flush=True)

    timed("default (anchor)")
    timed("refine=2", refine_iterations=2)
    timed("refine=3 cg=16", refine_iterations=3, gba_cg_iterations=16)
    timed("strides=(1,2,3)", mono_link_strides=(1, 2, 3))
    timed("strides=(1,2,4)", mono_link_strides=(1, 2, 4))
    timed("refine=2 strides=(1,2,3)", refine_iterations=2,
          mono_link_strides=(1, 2, 3))
    timed("retrack refine=6 hyp=16", retrack_refine_iters=6,
          retrack_hypotheses=16)
    timed("refine=2 strides=(1,2,3) rt refine=6", refine_iterations=2,
          mono_link_strides=(1, 2, 3), retrack_refine_iters=6)


if __name__ == "__main__":
    main()
