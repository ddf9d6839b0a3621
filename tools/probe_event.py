"""Attribute the online scan's keyframe-EVENT cost (config 1) by
monkeypatching individual event stages to no-ops. Profiling only — the
variants change the map (fewer landmarks), so ATE is reported to show how
distorted each probe is, and the numbers are read as attribution hints,
not semantics-preserving ablations.

Usage: python tools/probe_event.py [--frames 240] [--runs 3]
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
    from visionx_slam_tpu.models import local_ba as lba
    from visionx_slam_tpu.ops.camera import make_camera
    from visionx_slam_tpu.tracking import scan_pipeline as sp
    from visionx_slam_tpu.tracking import stages
    from visionx_slam_tpu.utils.config import TrackingOptions

    T = args.frames
    _, _, entries, grays, depths, gts = bench._load_sequence(T)
    cam = make_camera(synthetic.FX, synthetic.FY, synthetic.CX, synthetic.CY)

    gd = jax.device_put(jnp.asarray(grays))
    dd = jax.device_put(jnp.asarray(depths))

    real_depth = stages.depth_landmarks
    real_tri = stages.triangulate_pair
    real_ba = lba.local_ba

    def scan_ate(outs):
        ate, _ = bench._ate_from_outs(outs, gts)
        return float("nan") if ate is None else ate

    def timed(label, *, depth=True, tri=True, ba=True):
        stages.depth_landmarks = real_depth if depth else (
            lambda ms, cam_, slot, pose: ms)
        stages.triangulate_pair = real_tri if tri else (
            lambda ms, cam_, a, b, ang, rep, res=None: ms)
        sp.local_ba = real_ba if ba else (
            lambda ms, cam_, o: (ms, None))
        opts = TrackingOptions()
        # identical opts across variants would hit the compiled-graph
        # cache and ignore the monkeypatch
        sp._compiled_scan.cache_clear()
        try:
            def go(g):
                st, outs = sp.run_scan_pipeline(cam, g, dd, opts)
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
            print(f"{label:40s} {t / T * 1e3:7.3f} ms/f ({T / t:6.1f} fps)"
                  f"  ate={scan_ate(outs) * 1e3:7.2f}mm"
                  f" trk={float(np.asarray(outs.tracked).mean()):.2f}",
                  flush=True)
        finally:
            stages.depth_landmarks = real_depth
            stages.triangulate_pair = real_tri
            sp.local_ba = real_ba
            # the cache still holds a pipeline compiled with the no-op
            # stages under the default options key; purge it so later
            # run_scan_pipeline calls in this process recompile honestly
            sp._compiled_scan.cache_clear()

    timed("default")
    timed("no depth_landmarks", depth=False)
    timed("no triangulate_pair", tri=False)
    timed("no depth + no tri", depth=False, tri=False)
    timed("insert only (no depth/tri/BA)", depth=False, tri=False, ba=False)


if __name__ == "__main__":
    main()
