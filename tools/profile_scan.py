"""Per-stage device-loop profiler for the ONLINE scan pipeline (config 1).

Times the fused lax.scan at increasing stage_limit plus option ablations
to attribute the serial per-frame chain (same measurement rules as
bench.py: staged HBM inputs, varied between runs, dependent scalar fence,
median of N).

Usage: python tools/profile_scan.py [--frames 240] [--runs 3]
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

    def timed(opts, stage_limit=2, label="", **kw):
        def go(g):
            st, outs = sp.run_scan_pipeline(
                cam, g, dd, opts, stage_limit=stage_limit, **kw)
            return outs.pose
        f = lambda g: go(g)
        f(gd)  # compile
        ts = []
        for i in range(args.runs):
            g = gd.at[0, 0, 0].set(jnp.uint8(i + 1))
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            out = f(g)
            _ = float(jnp.sum(out[:2]))
            ts.append(time.perf_counter() - t0)
        t = statistics.median(ts)
        print(f"{label:44s} {t / T * 1e3:7.3f} ms/frame  ({T / t:7.1f} fps)")
        return t

    base = TrackingOptions()
    timed(base, stage_limit=0, label="extract only")
    timed(base, stage_limit=1, label="extract + track (match+PnP)")
    timed(dataclasses.replace(base, enable_local_ba=False),
          label="full, local BA OFF")
    timed(dataclasses.replace(base, ba_iterations=1),
          label="full, BA 1 iter")
    timed(base, label="full (config 1 default)")
    timed(base, label="full, lm_capacity=1<<16", lm_capacity=1 << 16)


if __name__ == "__main__":
    main()
