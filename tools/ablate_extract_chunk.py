"""Time extract_sequence at several lax.map chunk sizes (the online scan
pre-extraction stage). Usage: python tools/ablate_extract_chunk.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    import jax
    import jax.numpy as jnp

    import bench
    from visionx_slam_tpu.tracking import scan_pipeline as sp

    T = 240
    _, _, entries, grays, depths, gts = bench._load_sequence(T)
    gd = jax.device_put(jnp.asarray(grays))
    dd = jax.device_put(jnp.asarray(depths))

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="8,16")
    chunks = tuple(int(c) for c in ap.parse_args().chunks.split(","))
    for chunk in chunks:
        fn = jax.jit(lambda g, d, c=chunk: sp.extract_sequence(g, d, {}, c))
        fn(gd, dd)
        ts = []
        for i in range(3):
            g = gd.at[0, 0, 0].set(jnp.uint8(i + 1))
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            obs, mean, std = fn(g, dd)
            _ = float(jnp.sum(obs.response))
            ts.append(time.perf_counter() - t0)
        t = statistics.median(ts)
        print(f"chunk={chunk:3d}  {t / T * 1e3:7.3f} ms/f ({T / t:6.1f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
