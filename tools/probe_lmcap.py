"""Measure the online scan (config 1) at reduced landmark capacities,
with ATE/tracked so the fps win is accepted only if accuracy holds.

Usage: python tools/probe_lmcap.py [--frames 240] [--runs 3]
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
        ate, _ = bench._ate_from_outs(outs, gts)
        return float("nan") if ate is None else ate

    opts = TrackingOptions()

    def timed(label, **kw):
        def go(g):
            st, outs = sp.run_scan_pipeline(cam, g, dd, opts, **kw)
            return outs
        outs = go(gd)
        ts = []
        for i in range(args.runs):
            g = gd.at[0, 0, 0].set(jnp.uint8(i + 1))
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            outs = go(g)
            _ = float(jnp.sum(outs.n_inliers))
            ts.append(time.perf_counter() - t0)
        t = statistics.median(ts)
        n_lm = int(np.asarray(outs.n_landmarks)[-1])
        print(f"{label:28s} {t / T * 1e3:7.3f} ms/f ({T / t:6.1f} fps)"
              f"  ate={scan_ate(outs) * 1e3:7.2f}mm"
              f" trk={float(np.asarray(outs.tracked).mean()):.2f}"
              f" lm={n_lm}", flush=True)

    timed("lm_capacity=1<<17 (default)")
    timed("lm_capacity=1<<16", lm_capacity=1 << 16)
    timed("lm_capacity=3<<14 (49k)", lm_capacity=3 << 14)


if __name__ == "__main__":
    main()
