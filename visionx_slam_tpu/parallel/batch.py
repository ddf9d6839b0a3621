"""Throughput mode: batched multi-sequence mapping over a device mesh.

The reference has NO data parallelism (SURVEY.md §2.2: its only parallelism
is three host threads + mutexes). The TPU-native scaling story replaces
that entirely: independent sequences map in parallel across a
``jax.sharding.Mesh`` ("seq" axis = data parallelism over ICI), one
SPMD-jitted SLAM step per frame batch, with XLA collectives (psum) for
fleet-level statistics — BASELINE.json config 5 ("all fr1 sequences in
parallel across a v5e slice").

``slam_step`` is the fully-fused, host-sync-free device step: match
against the newest keyframe -> PnP RANSAC -> keyframe insert -> depth +
triangulated landmark creation -> windowed local BA. It is the "training
step" analog the multi-chip dry run compiles (see __graft_entry__.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import matching
from ..models.estimation import pnp_ransac
from ..models.local_ba import BAOptions, local_ba
from ..ops.camera import CameraParams
from ..tracking import mapstate as msl
from ..tracking import stages
from ..tracking.mapstate import FREE, MapState
from ..tracking.stages import FrameObs


def make_mesh(n_devices: int | None = None, axis: str = "seq") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def slam_step(
    ms: MapState,
    obs: FrameObs,
    frame_id: jnp.ndarray,
    cam: CameraParams,
    key: jax.Array,
    n_hypotheses: int = 64,
    ba_opts: BAOptions = BAOptions(max_iterations=2),
) -> tuple[MapState, jnp.ndarray, dict]:
    """One fused mapping step (no host round trips): track the frame
    against the newest keyframe, insert it as a keyframe, grow the map,
    run windowed BA. Returns (state, T_cw 4x4, stats)."""
    from ..ops.se3 import se3_matrix

    slots, svalid = msl.window_slots(ms, 1)
    slot = slots[0]
    m = matching.match_frames(
        ms.kf_desc[slot], ms.kf_fvalid[slot] & svalid[0], obs.desc, obs.valid
    )
    pts3d, pts2d, valid = stages.pnp_correspondences(ms, slot, obs, m)
    sol = pnp_ransac(cam, pts3d, pts2d, valid, key, 2.0, n_hypotheses, 5)
    # fall back to the previous keyframe pose when PnP is degenerate
    prev_pose = msl.map_pose(ms, slot)
    use = sol.ok & (sol.n_inliers >= 4)
    pose = jax.tree.map(
        lambda a, b: jnp.where(use, a, b), sol.pose, prev_pose
    )

    ms, new_slot = msl.insert_keyframe(
        ms, frame_id, pose, obs.px, obs.desc, obs.valid,
        jnp.full((ms.n_features,), FREE, jnp.int32), obs.depth,
    )
    ms = stages.depth_landmarks(ms, cam, new_slot, pose)
    ms = stages.triangulate_pair(ms, cam, slot, new_slot, 1.0, 5.0)
    ms, ba = local_ba(ms, cam, ba_opts)
    stats = {
        "inliers": sol.n_inliers,
        "matches": jnp.sum(m.valid).astype(jnp.int32),
        "ba_cost": ba.final_cost,
    }
    return ms, se3_matrix(pose), stats


def batched_slam_step(mesh: Mesh, cam: CameraParams, **step_kw):
    """Build the SPMD batched step: leading axis = sequences, sharded over
    the mesh; per-fleet totals are aggregated with psum over ICI."""
    axis = mesh.axis_names[0]

    vstep = jax.vmap(
        lambda ms, obs, fid, key: slam_step(ms, obs, fid, cam, key, **step_kw)
    )

    def _step(mss, obss, fids, keys):
        mss2, poses, stats = vstep(mss, obss, fids, keys)
        fleet = {
            "total_inliers": jax.lax.psum(jnp.sum(stats["inliers"]), axis),
            "total_matches": jax.lax.psum(jnp.sum(stats["matches"]), axis),
        }
        return mss2, poses, fleet

    from jax.experimental.shard_map import shard_map

    sharded = shard_map(
        _step,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P()),
        check_rep=False,
    )
    return jax.jit(sharded)


def stack_states(states: list[MapState]) -> MapState:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def stack_obs(obs: list[FrameObs]) -> FrameObs:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *obs)
