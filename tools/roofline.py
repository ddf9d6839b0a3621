"""Roofline / MFU report for the online scan (BASELINE config 1).

Combines XLA per-stage cost analysis (utils/flops.py) with measured
per-stage device timings to answer VERDICT r4 #2: is 2.75 ms/frame near
this chip's floor for the workload, or a software gap?

Stage times are measured with in-graph repetition (PERF.md rule 1: a
single dispatch over the tunnel costs ~30 ms, so microbenchmarks loop
inside one jit via lax.scan with varied inputs); extract/full-pipeline
times come from the stage_limit ablation. The table distinguishes
attributed time (stages measured here) from the residual, which is the
serial glue of the scan body (state machine, conds, gathers, small
vector chains) — the latency-bound part no FLOP count explains.

Usage: python tools/roofline.py [--frames 240] [--runs 3] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=240)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--json", default="")
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from visionx_slam_tpu.data import synthetic
    from visionx_slam_tpu.models import matching
    from visionx_slam_tpu.models.estimation import pnp_prior
    from visionx_slam_tpu.models.local_ba import BAOptions, local_ba
    from visionx_slam_tpu.ops.camera import make_camera
    from visionx_slam_tpu.ops.se3 import identity_pose
    from visionx_slam_tpu.tracking import mapstate as msl
    from visionx_slam_tpu.tracking import scan_pipeline as sp
    from visionx_slam_tpu.tracking import stages
    from visionx_slam_tpu.utils import flops as fl
    from visionx_slam_tpu.utils.config import TrackingOptions

    T = args.frames
    _, _, entries, grays, depths, gts = bench._load_sequence(T)
    cam = make_camera(synthetic.FX, synthetic.FY, synthetic.CX, synthetic.CY)
    gd = jax.device_put(jnp.asarray(grays))
    dd = jax.device_put(jnp.asarray(depths))
    opts = TrackingOptions()
    H, W = grays.shape[1:]
    N = 1024

    # ---- full run + extract-only (per-frame seconds) ----
    def timed_scan(stage_limit):
        def go(g):
            st, outs = sp.run_scan_pipeline(cam, g, dd, opts,
                                            stage_limit=stage_limit)
            return st, outs
        st, outs = go(gd)
        _ = float(jnp.sum(outs.n_inliers))
        ts = []
        for i in range(args.runs):
            g = gd.at[0, 0, 0].set(jnp.uint8(i + 1))
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            st, outs = go(g)
            _ = float(jnp.sum(outs.n_inliers) + jnp.sum(outs.n_matches))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts) / T, st, outs

    t_full, st_final, outs = timed_scan(2)
    t_extract, _, _ = timed_scan(0)
    events_pf = float(np.asarray(outs.is_keyframe).mean())
    ms_final = st_final.ms

    # measured BA iterations on the final (realistic) window
    ba_opts = BAOptions(
        window_size=opts.ba_window_size, max_iterations=opts.ba_iterations,
        min_pose_observations=opts.ba_min_pose_observations,
        min_point_observations=opts.ba_min_point_observations,
        huber_delta=opts.ba_huber_delta,
        max_reproj_error=opts.ba_max_reproj_error,
        rel_tol=opts.ba_rel_tol, early_exit=True,
    )
    _, ba_stats = jax.jit(lambda m: local_ba(m, cam, ba_opts))(ms_final)
    ba_iters = float(ba_stats.iterations)

    # ---- in-graph repeated stage timings on REAL data shapes ----
    def rep_time(fn, n_rep, *args, label=""):
        """Median seconds per execution of fn via lax.scan over n_rep
        variations (fn must accept (i, *args) and return a summable)."""
        @jax.jit
        def loop(*a):
            def body(c, i):
                return c + jnp.sum(fn(i, *a)), None
            out, _ = jax.lax.scan(
                body, jnp.float32(0), jnp.arange(n_rep, dtype=jnp.int32))
            return out
        _ = float(loop(*args))
        ts = []
        for r in range(args_runs):
            t0 = time.perf_counter()
            _ = float(loop(*args))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts) / n_rep

    args_runs = args.runs

    # real descriptors from the final keyframe ring
    descs = ms_final.kf_desc          # [K,N,32]
    fvalid = ms_final.kf_fvalid
    Kr = descs.shape[0]

    def match_fn(i, d, v):
        a = d[i % Kr]
        b = d[(i + 1) % Kr]
        m = matching.knn2_ratio_match(a, v[i % Kr], b, v[(i + 1) % Kr])
        return m.dist

    t_match = rep_time(match_fn, 32, descs, fvalid, label="match")

    # PnP prior on real landmark geometry (slot 0's links)
    lm = jnp.clip(ms_final.kf_feat_lm[0], 0, ms_final.lm_physical - 1)
    pts3 = ms_final.lm_pos[:, lm].T
    pts2 = ms_final.kf_px[0].T
    pval = ms_final.kf_fvalid[0] & (ms_final.kf_feat_lm[0] >= 0)

    def pnp_fn(i, p3, p2, v):
        sol = pnp_prior(cam, p3 + 1e-6 * i, p2, v, identity_pose(),
                        opts.max_reproj_error, refine_iters=2)
        return sol.pose.t

    t_pnp = rep_time(pnp_fn, 32, pts3, pts2, pval, label="pnp")

    # keyframe event (insert + depth landmarks + triangulation)
    def event_fn(i, m):
        obs_links = jnp.full((N,), -1, jnp.int32)
        m2, slot = msl.insert_keyframe(
            m, jnp.int32(1000) + i, identity_pose(), pts2,
            descs[0], fvalid[0], obs_links, m.kf_depth[0],
            fresh_links=True)
        m2 = stages.depth_landmarks(m2, cam, slot, identity_pose())
        m2 = stages.triangulate_pair(
            m2, cam, jnp.int32(0), slot,
            opts.triangulation_min_angle_deg,
            opts.triangulation_max_reproj_error)
        return m2.lm_pos[0, :8]

    t_event = rep_time(event_fn, 8, ms_final)

    def ba_fn(i, m):
        m2, _ = local_ba(m._replace(kf_t=m.kf_t + 1e-7 * i), cam, ba_opts)
        return m2.kf_t

    t_ba = rep_time(ba_fn, 8, ms_final)

    # ---- FLOP/byte inventory ----
    costs = fl.scan_stage_costs(
        cam, opts, (H, W), n_features=N,
        events_per_frame=events_pf, ba_iters_avg=ba_iters)
    peaks = fl.device_peaks()
    summary = fl.summarize(costs, t_full, peaks)

    times_pf = {
        "extract": t_extract,
        "match": t_match,
        "pnp_prior": t_pnp,
        "kf_event(insert+depth_lm+tri)": t_event * events_pf,
        "local_ba(per GN iter)": t_ba * events_pf,  # t_ba is per CALL
    }
    # local_ba cost rows are per-iteration; the measured t_ba is per call
    # (early-exit loop, ba_iters average) — align names for the table
    attributed = sum(times_pf.values())
    residual = t_full - attributed

    rows = []
    for c in costs:
        tf = times_pf.get(c.name)
        if c.name.startswith("local_ba"):
            tf = times_pf["local_ba(per GN iter)"]
        gflops = (c.flops_per_frame / tf / 1e9) if tf else None
        gbs = (c.bytes_per_frame / tf / 1e9) if tf else None
        rows.append({
            "stage": c.name,
            "flops_per_frame": c.flops_per_frame,
            "bytes_per_frame": c.bytes_per_frame,
            "ms_per_frame": None if tf is None else tf * 1e3,
            "gflops": gflops,
            "pct_bf16_peak": (None if (gflops is None or not peaks.get("flops_bf16"))
                              else 100 * gflops * 1e9 / peaks["flops_bf16"]),
            "gbs": gbs,
            "ai_flop_per_byte": c.flops_per_frame / max(c.bytes_per_frame, 1),
        })

    out = {
        "config": "1_online_scan",
        "n_frames": T,
        "t_full_ms_per_frame": t_full * 1e3,
        "fps": 1.0 / t_full,
        "events_per_frame": events_pf,
        "ba_iters_measured": ba_iters,
        "stages": rows,
        "attributed_ms_per_frame": attributed * 1e3,
        "residual_glue_ms_per_frame": residual * 1e3,
        "summary": summary,
    }
    print(json.dumps(out, indent=2, default=float))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2, default=float)

    # markdown table for PERF.md
    print("\n| stage | ms/frame | GFLOP/frame | GFLOP/s | % bf16 peak | GB/s | AI (F/B) |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print("| {stage} | {ms} | {gf:.3f} | {gs} | {pp} | {gb} | {ai:.1f} |".format(
            stage=r["stage"],
            ms="—" if r["ms_per_frame"] is None else f"{r['ms_per_frame']:.3f}",
            gf=r["flops_per_frame"] / 1e9,
            gs="—" if r["gflops"] is None else f"{r['gflops']:.0f}",
            pp="—" if r["pct_bf16_peak"] is None else f"{r['pct_bf16_peak']:.2f}",
            gb="—" if r["gbs"] is None else f"{r['gbs']:.0f}",
            ai=r["ai_flop_per_byte"],
        ))
    print(f"| residual (serial glue) | {residual * 1e3:.3f} | — | — | — | — | — |")
    print(f"| TOTAL | {t_full * 1e3:.3f} | "
          f"{summary['flops_per_frame'] / 1e9:.3f} | "
          f"{summary['achieved_gflops']:.0f} | "
          f"{100 * summary.get('mfu_vs_bf16_peak', 0):.2f} | "
          f"{summary['achieved_gbs']:.0f} | "
          f"{summary['arithmetic_intensity']:.1f} |")


if __name__ == "__main__":
    main()
