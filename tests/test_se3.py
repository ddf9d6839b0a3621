"""SE(3)/SO(3) tests vs closed forms and scipy (the reference's Sophus oracle).

Mirrors the reference smoke test apps/test_sophus.cpp:5-24 (90-degree z
rotation exp + SE3 compose) plus property tests: exp/log round trips,
compose/inverse group laws, matrix conversions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from visionx_slam_tpu.ops import se3


def random_pose(rng, n=()):
    rotvec = rng.normal(size=(*n, 3))
    q = R.from_rotvec(rotvec.reshape(-1, 3)).as_quat().reshape(*n, 4)  # xyzw
    q_wxyz = np.concatenate([q[..., 3:], q[..., :3]], axis=-1)
    t = rng.normal(size=(*n, 3))
    return se3.Pose(jnp.asarray(q_wxyz, jnp.float32), jnp.asarray(t, jnp.float32))


def test_sophus_smoke_90deg_z():
    # reference apps/test_sophus.cpp: SO3::exp([0,0,pi/2]) must be a 90° z-rotation
    q = se3.so3_exp(jnp.array([0.0, 0.0, np.pi / 2]))
    Rm = np.asarray(se3.quat_to_matrix(q))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(Rm, expected, atol=1e-6)


def test_so3_exp_log_roundtrip(rng):
    # log returns the principal axis-angle, so stay inside |omega| < pi
    omega = rng.normal(size=(64, 3))
    omega *= (rng.uniform(0, np.pi - 0.05, size=(64, 1))) / np.linalg.norm(
        omega, axis=-1, keepdims=True
    )
    omega = jnp.asarray(omega, jnp.float32)
    back = se3.so3_log(se3.so3_exp(omega))
    np.testing.assert_allclose(np.asarray(back), np.asarray(omega), atol=1e-4)


def test_so3_exp_matches_scipy(rng):
    omega = rng.normal(size=(32, 3))
    ours = np.asarray(se3.quat_to_matrix(se3.so3_exp(jnp.asarray(omega, jnp.float32))))
    theirs = R.from_rotvec(omega).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_so3_exp_small_angle():
    omega = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    q = se3.so3_exp(omega)
    assert np.all(np.isfinite(np.asarray(q)))
    np.testing.assert_allclose(np.asarray(q[1]), [1, 0, 0, 0], atol=1e-7)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 6))
    xi[:, 3:] *= 0.8  # keep rotation angle well inside the principal domain
    xi = jnp.asarray(xi, jnp.float32)
    back = se3.se3_log(se3.se3_exp(xi))
    # float32 trig precision in V / V^-1 dominates at larger angles
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=5e-3, rtol=1e-3)


def test_se3_compose_inverse(rng):
    a = random_pose(rng, (16,))
    b = random_pose(rng, (16,))
    ab = se3.se3_compose(a, b)
    ident = se3.se3_compose(ab, se3.se3_inverse(ab))
    np.testing.assert_allclose(np.asarray(ident.t), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(ident.q[..., 0])), 1.0, atol=1e-5)


def test_se3_apply_matches_matrix(rng):
    T = random_pose(rng, (8,))
    p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    via_quat = se3.se3_apply(T, p)
    M = np.asarray(se3.se3_matrix(T))
    via_mat = np.einsum("bij,bj->bi", M[:, :3, :3], np.asarray(p)) + M[:, :3, 3]
    np.testing.assert_allclose(np.asarray(via_quat), via_mat, atol=1e-5)


def test_matrix_quat_roundtrip(rng):
    T = random_pose(rng, (32,))
    M = se3.se3_matrix(T)
    T2 = se3.se3_from_matrix(M)
    np.testing.assert_allclose(
        np.abs(np.sum(np.asarray(T.q) * np.asarray(T2.q), axis=-1)), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(T2.t), np.asarray(T.t), atol=1e-6)


def test_matrix_to_quat_near_180(rng):
    # worst case for Shepperd: rotations near pi
    axes = rng.normal(size=(16, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    rotvec = axes * (np.pi - 1e-4)
    Rm = R.from_rotvec(rotvec).as_matrix()
    q = np.asarray(se3.matrix_to_quat(jnp.asarray(Rm, jnp.float32)))
    back = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(back, Rm, atol=1e-4)


def test_left_retraction_matches_sophus_semantics(rng):
    # exp(dx) * T with small dx ~ first-order: R' ≈ (I + hat(omega)) R, t' ≈ t + ups + hat(omega) t
    T = random_pose(rng, ())
    dx = jnp.asarray(rng.normal(size=(6,)) * 1e-4, jnp.float32)
    T2 = se3.se3_retract_left(T, dx)
    M, M2 = np.asarray(se3.se3_matrix(T)), np.asarray(se3.se3_matrix(T2))
    omega_hat = np.asarray(se3.so3_hat(dx[3:]))
    approx_R = (np.eye(3) + omega_hat) @ M[:3, :3]
    np.testing.assert_allclose(M2[:3, :3], approx_R, atol=1e-6)
    approx_t = M[:3, 3] + np.asarray(dx[:3]) + omega_hat @ M[:3, 3]
    np.testing.assert_allclose(M2[:3, 3], approx_t, atol=1e-6)


def test_jit_and_vmap():
    f = jax.jit(jax.vmap(lambda xi: se3.se3_log(se3.se3_exp(xi))))
    xi = jnp.ones((4, 6), jnp.float32) * 0.1
    out = f(xi)
    np.testing.assert_allclose(np.asarray(out), 0.1, atol=1e-5)
