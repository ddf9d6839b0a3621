"""Closed-form small-matrix solvers vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from visionx_slam_tpu.ops import linalg as L


def spd(rng, n, d):
    A = rng.normal(size=(n, d, d))
    return A @ A.transpose(0, 2, 1) + 0.1 * np.eye(d)


def test_inv3x3(rng):
    A = spd(rng, 64, 3)
    inv = np.asarray(L.inv3x3(jnp.asarray(A, jnp.float32)))
    np.testing.assert_allclose(inv @ A, np.broadcast_to(np.eye(3), (64, 3, 3)),
                               atol=2e-3)


def test_solve3x3(rng):
    A = spd(rng, 64, 3)
    b = rng.normal(size=(64, 3))
    x = np.asarray(L.solve3x3(jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(np.einsum("nij,nj->ni", A, x), b, atol=2e-3)


def test_solve4x4(rng):
    A = spd(rng, 64, 4)
    b = rng.normal(size=(64, 4))
    x = np.asarray(L.solve4x4(jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(np.einsum("nij,nj->ni", A, x), b, atol=5e-3)


def test_chol3x3(rng):
    A = spd(rng, 64, 3)
    C = np.asarray(L.chol3x3(jnp.asarray(A, jnp.float32)))
    np.testing.assert_allclose(C @ C.transpose(0, 2, 1), A, rtol=2e-3, atol=2e-3)
    assert np.allclose(np.triu(C, 1), 0)


def test_det3x3(rng):
    A = rng.normal(size=(32, 3, 3))
    d = np.asarray(L.det3x3(jnp.asarray(A, jnp.float32)))
    np.testing.assert_allclose(d, np.linalg.det(A), rtol=1e-4, atol=1e-5)
