"""Per-stage device-loop profile of the MONOCULAR offline pipeline
(BASELINE config 2b): extraction, pre (pairs + essential + scale chain +
map build), refine (GBA), post (re-track), and full, at bench.py's T=240
strided shape. Also times run_pre at reduced essential budgets.

Usage: python tools/profile_mono.py [--runs 3]
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
    p.add_argument("--runs", type=int, default=3)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    import jax
    import jax.numpy as jnp

    import bench
    from visionx_slam_tpu.data import synthetic
    from visionx_slam_tpu.ops.camera import make_camera
    from visionx_slam_tpu.tracking import offline_pipeline as op
    from visionx_slam_tpu.utils.config import TrackingOptions

    _, _, entries, grays, depths, gts = bench._load_sequence(240)
    cam = make_camera(synthetic.FX, synthetic.FY, synthetic.CX, synthetic.CY)
    opts = TrackingOptions()

    import numpy as np
    g4 = np.tile(grays, (4, 1, 1))[::4]
    T = g4.shape[0]
    gd = jax.device_put(jnp.asarray(g4))
    dd = jnp.zeros(gd.shape, jnp.float32)

    def vary_g(inputs, i):
        g = inputs[0].at[0, 0, 0].set(jnp.uint8(i + 1))
        return (g,) + tuple(inputs[1:])

    def timed(label, fn, inputs, vary=vary_g):
        fn(*inputs)
        ts = []
        for i in range(args.runs):
            xs = vary(inputs, i)
            jax.block_until_ready(xs)
            t0 = time.perf_counter()
            out = fn(*xs)
            leaves = jax.tree.leaves(out)
            _ = float(jnp.sum(
                leaves[0].astype(jnp.float32).reshape(-1)[:8]))
            ts.append(time.perf_counter() - t0)
        t = statistics.median(ts)
        print(f"{label:40s} {t / T * 1e3:7.3f} ms/f ({T / t:6.1f} fps)",
              flush=True)
        return t

    from visionx_slam_tpu.tracking.offline_pipeline import (
        default_lane_kf_capacity,
    )
    K = default_lane_kf_capacity(T)

    run = op.build_offline_pipeline(None, opts, monocular=True, kf_capacity=K)
    pre = jax.jit(lambda g, d: run.pre(cam, g, d))
    t_pre = timed("run_pre (extract+pairs+chain+build)", pre, (gd, dd))

    ms, links, aux = pre(gd, dd)
    jax.block_until_ready(ms)

    ref = jax.jit(lambda m: run.refine(cam, m, links))
    timed("run_refine (GBA, mono 2-stride links)", ref, (ms,),
          vary=lambda ins, i: (ins[0]._replace(
              kf_t=ins[0].kf_t + jnp.float32(i) * 1e-7),))
    ms2 = ref(ms)
    post = jax.jit(lambda m, a: run.post(cam, m, a))
    timed("run_post (re-track, DLT hyps)", post, (ms2, aux),
          vary=lambda ins, i: (ins[0]._replace(
              kf_t=ins[0].kf_t + jnp.float32(i) * 1e-7), ins[1]))

    full = jax.jit(lambda g, d: run(cam, g, d))
    timed("FULL mono pipeline", full, (gd, dd))

    # extraction-only share (same chunked map the pipeline uses)
    from visionx_slam_tpu.tracking import scan_pipeline as sp
    ext = jax.jit(lambda g, d: sp.extract_sequence(g, d, {}, 8))
    timed("extract only", ext, (gd, dd))


if __name__ == "__main__":
    main()
