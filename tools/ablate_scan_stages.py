"""Coarse stage split of the online scan (BASELINE config 1): times
stage_limit 0 (extraction only), 1 (extraction + tracking compute), and 2
(full pipeline) on staged HBM inputs, bench.py measurement rules.

Usage: python tools/ablate_scan_stages.py [--frames 240] [--runs 3]
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

    import bench
    from visionx_slam_tpu.data import synthetic
    from visionx_slam_tpu.ops.camera import make_camera
    from visionx_slam_tpu.tracking import scan_pipeline as sp
    from visionx_slam_tpu.utils.config import TrackingOptions

    T = args.frames
    _, _, entries, grays, depths, gts = bench._load_sequence(T)
    cam = make_camera(synthetic.FX, synthetic.FY, synthetic.CX, synthetic.CY)
    gd = jax.device_put(jnp.asarray(grays))
    dd = jax.device_put(jnp.asarray(depths))
    opts = TrackingOptions()

    def timed(label, stage):
        def go(g):
            _, outs = sp.run_scan_pipeline(cam, g, dd, opts,
                                           stage_limit=stage)
            return outs
        go(gd)  # compile
        ts = []
        for i in range(args.runs):
            g = gd.at[0, 0, 0].set(jnp.uint8(i + 1))
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            outs = go(g)
            _ = float(jnp.sum(outs.n_inliers) + jnp.sum(outs.n_matches))
            ts.append(time.perf_counter() - t0)
        t = statistics.median(ts)
        print(f"{label:34s} {t / T * 1e3:7.3f} ms/f ({T / t:6.1f} fps)",
              flush=True)
        return t

    timed("stage 0: extraction only", 0)
    timed("stage 1: + track (match+PnP)", 1)
    timed("stage 2: full (kf events + BA)", 2)


if __name__ == "__main__":
    main()
