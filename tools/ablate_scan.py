"""Quick ablation driver for the online scan's serial chain (round-4 work
on BASELINE config 1). Times run_scan_pipeline variants on staged HBM
inputs (bench.py measurement rules) to attribute the per-frame budget.

Usage: python tools/ablate_scan.py [--frames 240] [--runs 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=240)
    p.add_argument("--runs", type=int, default=3)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from visionx_slam_tpu.data import synthetic
    from visionx_slam_tpu.eval import trajectory as traj
    from visionx_slam_tpu.ops.camera import make_camera
    from visionx_slam_tpu.tracking import scan_pipeline as sp
    from visionx_slam_tpu.utils.config import TrackingOptions

    T = args.frames
    _, _, entries, grays, depths, gts = bench._load_sequence(T)
    cam = make_camera(synthetic.FX, synthetic.FY, synthetic.CX, synthetic.CY)

    gd = jax.device_put(jnp.asarray(grays))
    dd = jax.device_put(jnp.asarray(depths))

    def scan_ate(outs):
        tracked = np.asarray(outs.tracked)
        poses = np.asarray(outs.pose)
        if tracked.sum() < 3:
            return float("nan")
        est = np.asarray([traj.tcw_to_twc(poses[i])[:3, 3]
                          for i in range(len(tracked)) if tracked[i]])
        return traj.ate_rmse(est, gts[tracked])

    def timed(label, opts, **kw):
        def go(g):
            st, outs = sp.run_scan_pipeline(cam, g, dd, opts, **kw)
            return outs
        outs = go(gd)  # compile
        ts = []
        for i in range(args.runs):
            g = gd.at[0, 0, 0].set(jnp.uint8(i + 1))
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            outs = go(g)
            _ = float(jnp.sum(outs.n_inliers))
            ts.append(time.perf_counter() - t0)
        t = statistics.median(ts)
        ate = scan_ate(outs)
        trk = float(np.asarray(outs.tracked).mean())
        print(f"{label:46s} {t / T * 1e3:7.3f} ms/f ({T / t:6.1f} fps)"
              f"  ate={ate * 1e3:6.2f}mm trk={trk:.2f}", flush=True)
        return t

    base = TrackingOptions()
    timed("default", base)
    timed("pnp_hyp=8 refine=2", dataclasses.replace(
        base, pnp_hypotheses=8, pnp_refine_iters=2))
    timed("pnp_hyp=4 refine=1", dataclasses.replace(
        base, pnp_hypotheses=4, pnp_refine_iters=1))
    timed("BA off", dataclasses.replace(base, enable_local_ba=False))
    timed("BA off + pnp_hyp=4 refine=1", dataclasses.replace(
        base, enable_local_ba=False, pnp_hypotheses=4, pnp_refine_iters=1))
    timed("ba_iters=2", dataclasses.replace(base, ba_iterations=2))
    timed("gap=6 (fewer kf events)", dataclasses.replace(
        base, min_keyframe_gap=6))


if __name__ == "__main__":
    main()
