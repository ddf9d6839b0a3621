"""Immutable fixed-capacity map state: the TPU replacement for the
reference's mutex-guarded object graph.

The reference stores the map as ``std::map<id, Frame::Ptr>`` +
``unordered_map<id, Landmark::Ptr>`` guarded by mutexes, with per-feature
``landmark_id/has_landmark/is_outlier`` flags on each Frame
(core/map/map.h:13-34, core/map/landmark.h:12-68, core/frame/frame.h:16-64).
Here the whole map is ONE pytree of fixed-capacity SoA tables threaded
functionally through the pipeline (SURVEY.md §7.6) — no locks, no object
identity, no dynamic allocation:

- keyframes live in a ring of ``K`` slots (pose, feature pixels,
  descriptors, validity, feature->landmark links);
- landmarks live in a table of ``L`` slots with an alive mask and a
  monotone allocation cursor ("removal" = mask clear);
- the observation relation is the ``feat_lm`` table: ``feat_lm[k, i] = j``
  encodes landmark j observed by keyframe slot k at feature i — exactly
  the information the reference scatters across Landmark::observations_
  maps and Feature flags. Sentinels: FREE (-1) = no landmark,
  OUTLIER (-2) = reference's ``is_outlier`` feature flag.

Capacity semantics vs the reference: the reference's keyframe store grows
without bound (with culling off, its default); our ring evicts the oldest
keyframe once ``K`` slots are exhausted. Only the last ``ba_window_size``
keyframes influence tracking/BA, so eviction is behavior-preserving for
the estimated trajectory; landmark overflow drops new landmarks (counted
in stats so it is observable).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.se3 import Pose

FREE = -1      # feature has no landmark (reference has_landmark == false)
OUTLIER = -2   # feature marked outlier  (reference is_outlier == true)


class MapState(NamedTuple):
    # --- keyframe ring [K, ...] ---
    kf_q: jnp.ndarray        # [K,4] T_cw rotation (wxyz)
    kf_t: jnp.ndarray        # [K,3] T_cw translation
    kf_id: jnp.ndarray       # [K] int32 frame id, -1 = empty slot
    kf_px: jnp.ndarray       # [K,N,2] feature pixels
    kf_desc: jnp.ndarray     # [K,N,32] uint8 descriptors
    kf_fvalid: jnp.ndarray   # [K,N] feature validity
    kf_feat_lm: jnp.ndarray  # [K,N] int32 landmark slot / FREE / OUTLIER
    kf_depth: jnp.ndarray    # [K,N] depth (m) sampled at the feature, 0 = none
    # --- landmark table [L, ...] ---
    lm_pos: jnp.ndarray      # [L,3]
    lm_alive: jnp.ndarray    # [L] bool
    # --- cursors ---
    next_kf: jnp.ndarray     # [] int32 ring cursor (monotone; slot = next_kf % K)
    next_lm: jnp.ndarray     # [] int32 allocation cursor (monotone, drops at L)
    lm_dropped: jnp.ndarray  # [] int32 landmarks lost to capacity overflow

    @property
    def kf_capacity(self) -> int:
        return self.kf_id.shape[0]

    @property
    def lm_capacity(self) -> int:
        return self.lm_pos.shape[0]

    @property
    def n_features(self) -> int:
        return self.kf_px.shape[1]


def empty_map(
    kf_capacity: int = 64, lm_capacity: int = 1 << 17, n_features: int = 1024
) -> MapState:
    K, L, N = kf_capacity, lm_capacity, n_features
    return MapState(
        kf_q=jnp.zeros((K, 4), jnp.float32).at[:, 0].set(1.0),
        kf_t=jnp.zeros((K, 3), jnp.float32),
        kf_id=jnp.full((K,), -1, jnp.int32),
        kf_px=jnp.zeros((K, N, 2), jnp.float32),
        kf_desc=jnp.zeros((K, N, 32), jnp.uint8),
        kf_fvalid=jnp.zeros((K, N), bool),
        kf_feat_lm=jnp.full((K, N), FREE, jnp.int32),
        kf_depth=jnp.zeros((K, N), jnp.float32),
        lm_pos=jnp.zeros((L, 3), jnp.float32),
        lm_alive=jnp.zeros((L,), bool),
        next_kf=jnp.zeros((), jnp.int32),
        next_lm=jnp.zeros((), jnp.int32),
        lm_dropped=jnp.zeros((), jnp.int32),
    )


def kf_alive(ms: MapState) -> jnp.ndarray:
    return ms.kf_id >= 0


def n_keyframes(ms: MapState) -> jnp.ndarray:
    return jnp.sum(kf_alive(ms)).astype(jnp.int32)


def n_landmarks(ms: MapState) -> jnp.ndarray:
    return jnp.sum(ms.lm_alive).astype(jnp.int32)


def insert_keyframe(
    ms: MapState,
    frame_id: jnp.ndarray,
    pose: Pose,
    px: jnp.ndarray,
    desc: jnp.ndarray,
    fvalid: jnp.ndarray,
    feat_lm: jnp.ndarray,
    depth: jnp.ndarray,
) -> tuple[MapState, jnp.ndarray]:
    """Insert a keyframe into the ring; returns (state, slot).

    Replaces Map::InsertKeyFrame (map.cpp). Evicts the slot's previous
    occupant implicitly (feature links of the evicted keyframe vanish with
    the overwrite, the moral equivalent of RemoveKeyFrame on the oldest).
    """
    slot = ms.next_kf % ms.kf_capacity
    return (
        ms._replace(
            kf_q=ms.kf_q.at[slot].set(pose.q),
            kf_t=ms.kf_t.at[slot].set(pose.t),
            kf_id=ms.kf_id.at[slot].set(frame_id.astype(jnp.int32)),
            kf_px=ms.kf_px.at[slot].set(px),
            kf_desc=ms.kf_desc.at[slot].set(desc),
            kf_fvalid=ms.kf_fvalid.at[slot].set(fvalid),
            kf_feat_lm=ms.kf_feat_lm.at[slot].set(feat_lm),
            kf_depth=ms.kf_depth.at[slot].set(depth),
            next_kf=ms.next_kf + 1,
        ),
        slot,
    )


def allocate_landmarks(
    ms: MapState, want: jnp.ndarray, pos: jnp.ndarray
) -> tuple[MapState, jnp.ndarray]:
    """Allocate landmark slots for a batch of candidates.

    ``want``: [N] bool — which candidates to create; ``pos``: [N,3] world
    positions. Returns (state, slots [N] int32 with FREE where not created
    or dropped by capacity). This is the batched equivalent of the
    reference's per-feature ``new Landmark(landmark_id_++, pw)`` loops
    (tracking.cpp:640-644, :915-918).
    """
    offs = jnp.cumsum(want.astype(jnp.int32)) - 1  # position among created
    slots = ms.next_lm + offs
    in_cap = slots < ms.lm_capacity
    ok = want & in_cap
    slots = jnp.where(ok, slots, FREE)

    # inactive rows are routed out of bounds and dropped by the scatter
    idx = jnp.where(ok, slots, ms.lm_capacity)
    lm_pos = ms.lm_pos.at[idx].set(pos, mode="drop")
    lm_alive = ms.lm_alive.at[idx].set(True, mode="drop")
    n_created = jnp.sum(ok).astype(jnp.int32)
    n_wanted = jnp.sum(want).astype(jnp.int32)
    return (
        ms._replace(
            lm_pos=lm_pos,
            lm_alive=lm_alive,
            next_lm=jnp.minimum(ms.next_lm + n_wanted, ms.lm_capacity),
            lm_dropped=ms.lm_dropped + (n_wanted - n_created),
        ),
        slots,
    )


def landmark_observation_counts(ms: MapState) -> jnp.ndarray:
    """[L] int32: number of keyframe observations per landmark.

    The batched equivalent of Landmark::ObservationCount (landmark.h:44),
    derived from the feat_lm table over alive keyframes.
    """
    obs = jnp.where(
        kf_alive(ms)[:, None] & (ms.kf_feat_lm >= 0), ms.kf_feat_lm, ms.lm_capacity
    ).reshape(-1)
    counts = jnp.zeros((ms.lm_capacity + 1,), jnp.int32).at[obs].add(1, mode="drop")
    return counts[: ms.lm_capacity]


def remove_landmarks(ms: MapState, kill: jnp.ndarray) -> MapState:
    """Kill landmarks (mask clear) and detach their feature links, marking
    those features as outliers — mirroring the removal loop at
    tracking.cpp:729-747 (feat.has_landmark=false, is_outlier=true).

    ``kill``: [L] bool.
    """
    lm = ms.kf_feat_lm
    pointed = (lm >= 0) & kill[jnp.clip(lm, 0, ms.lm_capacity - 1)]
    new_links = jnp.where(pointed, OUTLIER, lm)
    return ms._replace(
        lm_alive=ms.lm_alive & ~kill,
        kf_feat_lm=new_links,
    )


def remove_keyframe_slot(ms: MapState, slot: jnp.ndarray) -> MapState:
    """Remove one keyframe (RemoveKeyFrame, tracking.cpp:752-773): clear the
    slot; its feature->landmark links disappear with it (observation counts
    derive from the table, so they drop automatically)."""
    return ms._replace(
        kf_id=ms.kf_id.at[slot].set(-1),
        kf_fvalid=ms.kf_fvalid.at[slot].set(False),
        kf_feat_lm=ms.kf_feat_lm.at[slot].set(FREE),
    )


def window_slots(ms: MapState, window_size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Slots of the most recent ``window_size`` alive keyframes, ascending
    by frame id (SelectKeyFrames, local_ba.cpp:42-62). Returns
    (slots [window_size] int32, valid [window_size] bool); invalid entries
    point at slot 0 and must be masked by callers."""
    ids = jnp.where(kf_alive(ms), ms.kf_id, jnp.int32(-1))
    order = jnp.argsort(-ids)  # descending id; dead (-1) sink to the end
    top = order[:window_size][::-1]  # ascending among the newest
    valid = ids[top] >= 0
    return top.astype(jnp.int32), valid


def map_pose(ms: MapState, slot: jnp.ndarray) -> Pose:
    return Pose(ms.kf_q[slot], ms.kf_t[slot])
