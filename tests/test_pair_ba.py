"""pair_ba (structured pairwise Schur solver) vs global_ba (general
solver): same math, different data layout — on the same offline-built
map they must agree.

The map comes from build_keyframe_map on a synthetic multi-keyframe
scene with noisy poses/landmarks, so both solvers do real work (cost
must drop) and their refined poses/landmarks must match closely."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from visionx_slam_tpu.models.global_ba import (
    GlobalBAOptions,
    global_ba,
    map_reproj_error,
)
from visionx_slam_tpu.models.pair_ba import pair_ba
from visionx_slam_tpu.ops.camera import make_camera, backproject
from visionx_slam_tpu.ops.se3 import Pose, se3_apply, se3_matrix
from visionx_slam_tpu.tracking.offline_pipeline import build_keyframe_map
from visionx_slam_tpu.utils.config import TrackingOptions

CAM = make_camera(320.0, 320.0, 160.0, 120.0)
K, N = 8, 128


def _make_map(rng, noise=0.01):
    """Posed keyframes viewing one cloud; depth from exact geometry, then
    poses perturbed so BA has an error to remove."""
    pts = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 5.0], (N, 3)).astype(
        np.float32
    )
    kf_q, kf_t, kf_px, kf_depth, kf_valid = [], [], [], [], []
    for k in range(K):
        t = np.array([0.1 * k, 0.02 * k, -0.05 * k], np.float32)
        pose = Pose(jnp.array([1.0, 0, 0, 0]), jnp.asarray(t))
        pc = np.asarray(se3_apply(pose, jnp.asarray(pts)))
        u = 320.0 * pc[:, 0] / pc[:, 2] + 160.0
        v = 320.0 * pc[:, 1] / pc[:, 2] + 120.0
        ok = (pc[:, 2] > 0.3) & (u > 5) & (u < 315) & (v > 5) & (v < 235)
        kf_q.append([1.0, 0, 0, 0])
        kf_t.append(t)
        kf_px.append(np.stack([u, v], -1))
        kf_depth.append(pc[:, 2])
        kf_valid.append(ok)
    kf_q = jnp.asarray(np.array(kf_q, np.float32))
    kf_t = jnp.asarray(np.array(kf_t, np.float32))
    # descriptors: identical per point index across keyframes -> the
    # linker matches feature i of kf k to feature i of kf k+1
    desc = rng.integers(0, 256, (N, 32)).astype(np.uint8)
    kf_desc = jnp.asarray(np.broadcast_to(desc, (K, N, 32)).copy())
    ms, links = build_keyframe_map(
        CAM, TrackingOptions(),
        kf_q, kf_t, jnp.arange(K, dtype=jnp.int32),
        jnp.asarray(np.stack(kf_px).astype(np.float32)), kf_desc,
        jnp.asarray(np.stack(kf_valid)),
        jnp.asarray(np.stack(kf_depth).astype(np.float32)),
        lm_capacity=K * N,
    )
    # perturb AFTER the build (links form from consistent geometry): noise
    # on every pose but the first (the gauge anchor) and on landmarks
    ms = ms._replace(
        kf_t=ms.kf_t.at[1:].add(jnp.asarray(
            rng.normal(0, noise, (K - 1, 3)).astype(np.float32))),
        lm_pos=ms.lm_pos + jnp.asarray(
            rng.normal(0, 0.3 * noise, ms.lm_pos.shape).astype(np.float32)),
    )
    return ms, links


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_links_structure(rng):
    """Every landmark has <= 2 observations; adopter/creator tables are
    mutually consistent one-to-one partial matchings."""
    ms, links = _make_map(rng)
    created = np.asarray(links.created)
    adopter = np.asarray(links.adopter)
    creator = np.asarray(links.creator)
    assert np.all(adopter[-1] == -1)
    assert np.all(creator[0] == -1)
    # adoption consistency: adopter[k,n]=m  <=>  creator[k+1,m]=n
    for k in range(K - 1):
        for n in np.nonzero(adopter[k] >= 0)[0]:
            m = adopter[k, n]
            assert creator[k + 1, m] == n
    # adopting features never create
    assert not np.any((creator >= 0) & created)
    # observation counts match the map's incremental counters
    obs = np.asarray(ms.lm_obs[: ms.lm_capacity])
    assert obs.max() <= 2


def test_pair_ba_matches_global_ba(rng):
    ms, links = _make_map(rng)
    opts = GlobalBAOptions(max_iterations=4, cg_iterations=20)
    err0, _ = map_reproj_error(ms, CAM)

    g2, gstats = global_ba(ms, CAM, opts)
    p2, pstats = pair_ba(ms, CAM, links, opts)

    errg, _ = map_reproj_error(g2, CAM)
    errp, _ = map_reproj_error(p2, CAM)
    # both reduce reprojection error substantially
    assert float(errg) < 0.7 * float(err0)
    assert float(errp) < 0.7 * float(err0)
    # and land on the same solution
    np.testing.assert_allclose(
        np.asarray(p2.kf_t), np.asarray(g2.kf_t), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(p2.kf_q), np.asarray(g2.kf_q), atol=2e-3
    )
    alive = np.asarray(ms.lm_alive)
    np.testing.assert_allclose(
        np.asarray(p2.lm_pos)[:, alive],
        np.asarray(g2.lm_pos)[:, alive],
        atol=5e-3,
    )


def test_pair_ba_gauge_fixed(rng):
    ms, links = _make_map(rng)
    p2, _ = pair_ba(ms, CAM, links,
                    GlobalBAOptions(max_iterations=3, cg_iterations=15))
    np.testing.assert_allclose(
        np.asarray(p2.kf_t[0]), np.asarray(ms.kf_t[0]), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(p2.kf_q[0]), np.asarray(ms.kf_q[0]), atol=1e-7
    )


def test_pair_ba_noop_on_empty():
    from visionx_slam_tpu.tracking import mapstate as msl

    ms = msl.empty_map(kf_capacity=K, n_features=N, lm_capacity=K * N)
    from visionx_slam_tpu.models.pair_ba import PairLinks

    links = PairLinks(
        created=jnp.zeros((K, N), bool),
        adopter=jnp.full((K, N), -1, jnp.int32),
        creator=jnp.full((K, N), -1, jnp.int32),
        order=jnp.arange(K * N, dtype=jnp.int32),
        sidx=jnp.full((K * N,), K * N + N, jnp.int32),
    )
    ms2, stats = pair_ba(ms, CAM, links, GlobalBAOptions(max_iterations=2))
    assert int(stats.iterations) == 0
    np.testing.assert_array_equal(np.asarray(ms2.kf_t), np.asarray(ms.kf_t))
