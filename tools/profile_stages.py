"""Per-stage device-loop profiler for the offline pipeline.

Times each stage of tracking/offline_pipeline.py in isolation on staged
HBM inputs (same measurement rules as bench.py: varied inputs, dependent
scalar fence, median of N). Used to target optimization work — PERF.md's
stage table is produced here.

Usage: python tools/profile_stages.py [--frames 240] [--runs 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, inputs, runs, vary):
    """Median seconds of fn(*inputs) with a dependent fence; inputs varied
    per run via `vary(inputs, i)`."""
    import jax
    import jax.numpy as jnp

    fn(*inputs)  # compile
    ts = []
    for i in range(runs):
        xs = vary(inputs, i)
        jax.block_until_ready(xs)
        t0 = time.perf_counter()
        out = fn(*xs)
        leaves = jax.tree.leaves(out)
        _ = float(jnp.sum(leaves[0].astype(jnp.float32).reshape(-1)[:8]))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


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
    from visionx_slam_tpu.models.orb_jax import orb_extract
    from visionx_slam_tpu.ops.camera import make_camera
    from visionx_slam_tpu.tracking import offline_pipeline as op
    from visionx_slam_tpu.utils.config import TrackingOptions

    T = args.frames
    _, _, entries, grays, depths, gts = bench._load_sequence(T)
    cam = make_camera(synthetic.FX, synthetic.FY, synthetic.CX, synthetic.CY)
    opts = TrackingOptions()

    gd = jax.device_put(jnp.asarray(grays))
    dd = jax.device_put(jnp.asarray(depths))

    def vary_g(inputs, i):
        g = inputs[0].at[0, 0, 0].set(jnp.uint8(i + 1))
        return (g,) + tuple(inputs[1:])

    run = op.build_offline_pipeline(None, opts)

    # ---- stage 0-3: extraction sub-stages via profile_stage ----
    C = 8
    Tc = -(-T // C) * C
    imgs = op._pad_to(gd, Tc).reshape(Tc // C, C, 480, 640)

    for stage, name in ((0, "detect dense only"), (1, "detect+topk"),
                        (2, "+patch+orient"), (3, "full extract")):
        f = jax.jit(lambda g: jax.lax.map(
            lambda ch: jax.vmap(
                lambda im: orb_extract(im, profile_stage=stage))(ch), g))
        t = timed(f, (imgs,), args.runs,
                  lambda ins, i: (ins[0].at[0, 0, 0, 0].set(jnp.uint8(i + 1)),))
        print(f"{name:24s} {t / T * 1e3:7.3f} ms/frame   ({T / t:7.1f} fps)")

    # ---- full pre stage (extract + pairs + compose + kf + map build) ----
    pre = jax.jit(lambda g, d: run.pre(cam, g, d))
    t_pre = timed(pre, (gd, dd), args.runs, vary_g)
    print(f"{'run_pre total':24s} {t_pre / T * 1e3:7.3f} ms/frame")

    ms, links, aux = pre(gd, dd)
    jax.block_until_ready(ms)

    # ---- refine (global BA) ----
    ref = jax.jit(lambda m: run.refine(cam, m, links))
    t_ref = timed(ref, (ms,), args.runs,
                  lambda ins, i: (ins[0]._replace(
                      kf_t=ins[0].kf_t + jnp.float32(i) * 1e-7),))
    print(f"{'run_refine (GBA)':24s} {t_ref / T * 1e3:7.3f} ms/frame")

    ms2 = ref(ms)

    # ---- post (re-anchor + re-track) ----
    post = jax.jit(lambda m, a: run.post(cam, m, a))
    t_post = timed(post, (ms2, aux), args.runs,
                   lambda ins, i: (ins[0]._replace(
                       kf_t=ins[0].kf_t + jnp.float32(i) * 1e-7), ins[1]))
    print(f"{'run_post (re-track)':24s} {t_post / T * 1e3:7.3f} ms/frame")

    # ---- end-to-end ----
    full = jax.jit(lambda g, d: run(cam, g, d))
    t_full = timed(full, (gd, dd), args.runs, vary_g)
    print(f"{'FULL pipeline':24s} {t_full / T * 1e3:7.3f} ms/frame   "
          f"({T / t_full:7.1f} fps)")


if __name__ == "__main__":
    main()
