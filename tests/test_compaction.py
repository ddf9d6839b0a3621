"""Landmark table compaction: alive rows move to the front, links remap,
allocation resumes."""

import numpy as np
import jax.numpy as jnp

from visionx_slam_tpu.ops.se3 import identity_pose
from visionx_slam_tpu.tracking import mapstate as msl

K, L, N = 4, 64, 16


def test_compact_preserves_structure(rng):
    ms = msl.empty_map(K, L, N)
    # allocate 40 landmarks, kill every other one
    for _ in range(2):
        ms, _ = msl.allocate_landmarks(
            ms, jnp.ones(N, bool),
            jnp.asarray(rng.normal(size=(N, 3)), jnp.float32), obs_init=0,
        )
    ms, _ = msl.allocate_landmarks(
        ms, jnp.asarray(np.arange(N) < 8), jnp.ones((N, 3), jnp.float32),
        obs_init=0,
    )
    kill = np.zeros(ms.lm_physical, bool)
    kill[0:40:2] = True
    ms = msl.remove_landmarks(ms, jnp.asarray(kill))

    # a keyframe linking to surviving landmarks 1, 3, 5
    links = np.full(N, msl.FREE, np.int32)
    links[0], links[1], links[2] = 1, 3, 5
    links[3] = msl.OUTLIER
    px = jnp.asarray(rng.uniform(0, 640, (N, 2)), jnp.float32)
    ms, slot = msl.insert_keyframe(
        ms, jnp.asarray(0), identity_pose(), px,
        jnp.zeros((N, 32), jnp.uint8), jnp.ones(N, bool),
        jnp.asarray(links), jnp.zeros(N, jnp.float32),
    )
    pos_of = {i: np.array(ms.lm_pos[:, i]) for i in (1, 3, 5)}
    obs_of = {i: int(ms.lm_obs[i]) for i in (1, 3, 5)}

    ms2 = msl.compact_landmarks(ms)
    # only landmarks with live observations survive compaction (zero-obs
    # landmarks are unreachable: no link can point at them)
    n_alive = 3
    assert int(msl.n_landmarks(ms2)) == n_alive
    assert int(ms2.next_lm) == n_alive
    alive = np.asarray(ms2.lm_alive)
    assert alive[:n_alive].all() and not alive[n_alive:].any()

    # links remapped to the moved positions with identical payloads
    new_links = np.asarray(ms2.kf_feat_lm[int(slot)])
    for feat, old in ((0, 1), (1, 3), (2, 5)):
        nl = new_links[feat]
        assert nl >= 0
        np.testing.assert_allclose(np.asarray(ms2.lm_pos[:, nl]), pos_of[old])
        assert int(ms2.lm_obs[nl]) == obs_of[old]
    assert new_links[3] == msl.OUTLIER  # sentinels untouched

    # allocation can proceed from the compacted cursor
    ms3, slots = msl.allocate_landmarks(
        ms2, jnp.asarray(np.arange(N) < 4),
        jnp.ones((N, 3), jnp.float32), obs_init=1,
    )
    s = np.asarray(slots)
    assert (s[:4] == n_alive + np.arange(4)).all()
