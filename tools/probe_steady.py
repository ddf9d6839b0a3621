"""Steady-state cost of the online scan: a variant where keyframe events
never fire after init (min_keyframe_inliers = huge), isolating the serial
per-frame track chain (extract + match + PnP + state glue) from the event
path. ATE is meaningless here (map frozen at the init pair); timing only.

Usage: python tools/probe_steady.py [--frames 240] [--runs 3]
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
    from visionx_slam_tpu.ops.camera import make_camera
    from visionx_slam_tpu.tracking import scan_pipeline as sp
    from visionx_slam_tpu.utils.config import TrackingOptions

    T = args.frames
    _, _, entries, grays, depths, gts = bench._load_sequence(T)
    cam = make_camera(synthetic.FX, synthetic.FY, synthetic.CX, synthetic.CY)
    gd = jax.device_put(jnp.asarray(grays))
    dd = jax.device_put(jnp.asarray(depths))

    def timed(label, opts):
        def go(g):
            _, outs = sp.run_scan_pipeline(cam, g, dd, opts)
            return outs
        outs = go(gd)
        ts = []
        for i in range(args.runs):
            g = gd.at[0, 0, 0].set(jnp.uint8(i + 1))
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            outs = go(g)
            _ = float(jnp.sum(outs.n_inliers) + jnp.sum(outs.n_matches))
            ts.append(time.perf_counter() - t0)
        t = statistics.median(ts)
        trk = float(np.asarray(outs.tracked).mean())
        nkf = int(np.asarray(outs.n_keyframes)[-1])
        print(f"{label:34s} {t / T * 1e3:7.3f} ms/f ({T / t:6.1f} fps)"
              f"  trk={trk:.2f} kf={nkf}", flush=True)

    base = TrackingOptions()
    timed("no events (steady chain only)",
          dataclasses.replace(base, min_keyframe_inliers=1 << 30))
    timed("default (reference point)", base)


if __name__ == "__main__":
    main()
