"""Map-state table tests (fixed-capacity insert/allocate/remove/window)."""

import numpy as np
import jax.numpy as jnp

from visionx_slam_tpu.ops.se3 import Pose, identity_pose
from visionx_slam_tpu.tracking import mapstate as msl

K, L, N = 6, 64, 16


def mk():
    return msl.empty_map(K, L, N)


def dummy_frame(seed, n_valid=N):
    rng = np.random.default_rng(seed)
    px = jnp.asarray(rng.uniform(0, 640, (N, 2)), jnp.float32)
    desc = jnp.asarray(rng.integers(0, 256, (N, 32)), jnp.uint8)
    valid = jnp.asarray(np.arange(N) < n_valid)
    feat_lm = jnp.full((N,), msl.FREE, jnp.int32)
    depth = jnp.asarray(rng.uniform(0.5, 5, (N,)), jnp.float32)
    return px, desc, valid, feat_lm, depth


def test_insert_and_ring_eviction():
    ms = mk()
    for i in range(K + 2):
        px, desc, valid, feat_lm, depth = dummy_frame(i)
        ms, slot = msl.insert_keyframe(
            ms, jnp.asarray(i), identity_pose(), px, desc, valid, feat_lm, depth
        )
        assert int(slot) == i % K
    assert int(msl.n_keyframes(ms)) == K
    ids = np.asarray(ms.kf_id)
    assert set(ids.tolist()) == {2, 3, 4, 5, 6, 7}  # oldest two evicted


def test_window_slots_orders_by_id():
    ms = mk()
    for i in [5, 9, 2, 7]:
        px, desc, valid, feat_lm, depth = dummy_frame(i)
        ms, _ = msl.insert_keyframe(
            ms, jnp.asarray(i), identity_pose(), px, desc, valid, feat_lm, depth
        )
    slots, valid = msl.window_slots(ms, 3)
    ids = np.asarray(ms.kf_id)[np.asarray(slots)]
    assert ids.tolist() == [5, 7, 9]  # newest 3, ascending
    assert np.asarray(valid).all()
    slots6, valid6 = msl.window_slots(ms, 6)
    assert np.asarray(valid6).sum() == 4


def test_allocate_landmarks_and_overflow():
    ms = mk()
    want = jnp.asarray(np.arange(N) % 2 == 0)  # 8 of 16
    pos = jnp.ones((N, 3), jnp.float32)
    ms, slots = msl.allocate_landmarks(ms, want, pos)
    s = np.asarray(slots)
    assert (s[::2] == np.arange(8)).all()
    assert (s[1::2] == msl.FREE).all()
    assert int(msl.n_landmarks(ms)) == 8
    # drive past capacity
    for i in range(10):
        ms, slots = msl.allocate_landmarks(ms, jnp.ones(N, bool), pos)
    assert int(ms.next_lm) == L
    assert int(msl.n_landmarks(ms)) == L
    assert int(ms.lm_dropped) == 8 + 10 * N - L


def test_observation_counts_and_removal():
    # correct mutation order: allocate landmarks (creation sets the base
    # count), then link them from keyframes (insert adds per link)
    ms = mk()
    ms, slots = msl.allocate_landmarks(
        ms, jnp.asarray(np.arange(N) < 4), jnp.ones((N, 3), jnp.float32),
        obs_init=0,
    )
    px, desc, valid, feat_lm, depth = dummy_frame(0)
    links = np.full(N, msl.FREE, np.int32)
    links[:4] = np.arange(4)
    for i in range(2):
        ms, _ = msl.insert_keyframe(
            ms, jnp.asarray(i), identity_pose(), px, desc, valid,
            jnp.asarray(links), depth
        )
    counts = np.asarray(msl.landmark_observation_counts(ms))
    assert (counts[:4] == 2).all() and counts[4:].sum() == 0

    kill = np.zeros(ms.lm_physical, bool)
    kill[1] = True
    ms = msl.remove_landmarks(ms, jnp.asarray(kill))
    assert int(msl.n_landmarks(ms)) == 3
    links_after = np.asarray(ms.kf_feat_lm)
    assert (links_after[:2, 1] == msl.OUTLIER).all()  # detached + outlier flag
    counts = np.asarray(msl.landmark_observation_counts(ms))
    assert counts[1] == 0


def test_obs_counts_decrement_on_ring_eviction():
    ms = mk()
    ms, _ = msl.allocate_landmarks(
        ms, jnp.asarray(np.arange(N) < 1), jnp.ones((N, 3), jnp.float32),
        obs_init=0,
    )
    px, desc, valid, feat_lm, depth = dummy_frame(0)
    links = np.full(N, msl.FREE, np.int32)
    links[0] = 0
    # fill the ring + 1 so slot 0 gets evicted
    for i in range(K + 1):
        ms, _ = msl.insert_keyframe(
            ms, jnp.asarray(i), identity_pose(), px, desc, valid,
            jnp.asarray(links), depth
        )
    # K+1 inserts, one eviction -> K live links
    assert int(msl.landmark_observation_counts(ms)[0]) == K


def test_remove_keyframe_slot():
    ms = mk()
    ms, _ = msl.allocate_landmarks(
        ms, jnp.asarray(np.arange(N) < 1), jnp.ones((N, 3), jnp.float32),
        obs_init=0,
    )
    px, desc, valid, feat_lm, depth = dummy_frame(0)
    links = np.full(N, msl.FREE, np.int32)
    links[0] = 0
    for i in range(2):
        ms, _ = msl.insert_keyframe(
            ms, jnp.asarray(i), identity_pose(), px, desc, valid,
            jnp.asarray(links), depth
        )
    assert np.asarray(msl.landmark_observation_counts(ms))[0] == 2
    ms = msl.remove_keyframe_slot(ms, jnp.asarray(0))
    assert int(msl.n_keyframes(ms)) == 1
    assert np.asarray(msl.landmark_observation_counts(ms))[0] == 1
