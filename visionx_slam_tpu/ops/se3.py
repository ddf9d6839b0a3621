"""SO(3) / SE(3) manifold ops in pure JAX (Sophus-equivalent).

Replaces the reference's use of Sophus (SE3d/SO3d: exp, log, hat, inverse,
compose — see reference call sites core/backend/local_ba.cpp:30,173,
core/frontend/tracking.cpp:539-541,640,884-885, core/frame/frame.h:55).

Conventions (identical to Sophus, so the reference's math carries over):
- a pose ``T`` is (q, t): a unit quaternion ``q`` in wxyz order plus a
  translation ``t``; acting on a point: ``T * p = R(q) @ p + t``.
- the se(3) tangent vector is ``xi = [upsilon(3), omega(3)]`` with the
  translational part FIRST (Sophus ordering; the BA pose Jacobian
  ``[I | -hat(pc)]`` at local_ba.cpp:26-33 assumes this).
- ``se3_exp`` uses the left Jacobian V: ``t = V(omega) @ upsilon``.
- the BA retraction is LEFT multiplicative: ``T <- exp(dx) * T``
  (local_ba.cpp:173).

All functions broadcast over leading batch dimensions and are vmap/jit
safe (no data-dependent control flow; small-angle branches via Taylor
series selected with ``jnp.where`` on numerically-safe operands).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_EPS = 1e-8


class Pose(NamedTuple):
    """SE(3) element: unit quaternion (wxyz) + translation. Batched via leading dims."""

    q: jnp.ndarray  # [..., 4] wxyz
    t: jnp.ndarray  # [..., 3]


def identity_pose(batch_shape=(), dtype=jnp.float32) -> Pose:
    q = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0], dtype), (*batch_shape, 4))
    t = jnp.zeros((*batch_shape, 3), dtype)
    return Pose(q, t)


# ---------------------------------------------------------------------------
# quaternion primitives
# ---------------------------------------------------------------------------

def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, _EPS)
    # canonicalize sign (w >= 0) so round-trips are stable
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q. Broadcasts on leading dims."""
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (wxyz); branch-free Shepperd variant."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # four candidate constructions; pick the numerically best per-element
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 0.0))

    # candidate from w
    w_w = safe_sqrt(qw2) / 2
    d_w = jnp.maximum(4 * w_w, _EPS)
    cand_w = jnp.stack([w_w, (m21 - m12) / d_w, (m02 - m20) / d_w, (m10 - m01) / d_w], -1)
    # candidate from x
    x_x = safe_sqrt(qx2) / 2
    d_x = jnp.maximum(4 * x_x, _EPS)
    cand_x = jnp.stack([(m21 - m12) / d_x, x_x, (m01 + m10) / d_x, (m02 + m20) / d_x], -1)
    # candidate from y
    y_y = safe_sqrt(qy2) / 2
    d_y = jnp.maximum(4 * y_y, _EPS)
    cand_y = jnp.stack([(m02 - m20) / d_y, (m01 + m10) / d_y, y_y, (m12 + m21) / d_y], -1)
    # candidate from z
    z_z = safe_sqrt(qz2) / 2
    d_z = jnp.maximum(4 * z_z, _EPS)
    cand_z = jnp.stack([(m10 - m01) / d_z, (m02 + m20) / d_z, (m12 + m21) / d_z, z_z], -1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], -1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], -2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# so(3)
# ---------------------------------------------------------------------------

def so3_hat(omega: jnp.ndarray) -> jnp.ndarray:
    """hat operator: omega [...,3] -> skew-symmetric [...,3,3] (Sophus SO3::hat)."""
    ox, oy, oz = jnp.moveaxis(omega, -1, 0)
    zero = jnp.zeros_like(ox)
    m = jnp.stack([zero, -oz, oy, oz, zero, -ox, -oy, ox, zero], axis=-1)
    return m.reshape(*omega.shape[:-1], 3, 3)


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [...,3] -> quaternion (wxyz). Taylor-safe near zero."""
    theta_sq = jnp.sum(omega * omega, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    half = 0.5 * theta
    small = theta_sq < 1e-10
    # sin(theta/2)/theta with Taylor fallback: 0.5 - theta^2/48
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / jnp.maximum(theta, _EPS))
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * omega], axis=-1)


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (wxyz) -> axis-angle [...,3]."""
    q = quat_normalize(q)
    w = q[..., :1]
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn < _EPS
    k = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / jnp.maximum(vn, _EPS))
    return k * v


# ---------------------------------------------------------------------------
# se(3)
# ---------------------------------------------------------------------------

def _so3_left_jacobian(omega: jnp.ndarray) -> jnp.ndarray:
    """V(omega): the SO(3) left Jacobian used by SE3 exp (Sophus SE3::exp)."""
    theta_sq = jnp.sum(omega * omega, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    O = so3_hat(omega)
    OO = O @ O
    small = theta_sq < 1e-10
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta_sq, _EPS))
    b = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (theta - jnp.sin(theta)) / jnp.maximum(theta_sq * theta, _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), O.shape)
    return eye + a * O + b * OO


def _so3_left_jacobian_inv(omega: jnp.ndarray) -> jnp.ndarray:
    theta_sq = jnp.sum(omega * omega, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    O = so3_hat(omega)
    OO = O @ O
    small = theta_sq < 1e-10
    half_theta = 0.5 * theta
    # k = (1 - theta*cos(t/2)/(2 sin(t/2))) / theta^2, Taylor: 1/12 + theta^2/720
    cot_term = half_theta * jnp.cos(half_theta) / jnp.maximum(jnp.sin(half_theta), _EPS)
    k = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - cot_term) / jnp.maximum(theta_sq, _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), O.shape)
    return eye - 0.5 * O + k * OO


def se3_exp(xi: jnp.ndarray) -> Pose:
    """se(3) tangent [...,6] = [upsilon, omega] -> Pose (Sophus SE3::exp)."""
    upsilon = xi[..., :3]
    omega = xi[..., 3:]
    q = so3_exp(omega)
    V = _so3_left_jacobian(omega)
    t = jnp.einsum("...ij,...j->...i", V, upsilon)
    return Pose(q, t)


def se3_log(T: Pose) -> jnp.ndarray:
    omega = so3_log(T.q)
    Vinv = _so3_left_jacobian_inv(omega)
    upsilon = jnp.einsum("...ij,...j->...i", Vinv, T.t)
    return jnp.concatenate([upsilon, omega], axis=-1)


def se3_compose(a: Pose, b: Pose) -> Pose:
    """a * b (first apply b, then a)."""
    return Pose(quat_normalize(quat_mul(a.q, b.q)), quat_rotate(a.q, b.t) + a.t)


def se3_inverse(T: Pose) -> Pose:
    qinv = quat_conj(T.q)
    return Pose(qinv, -quat_rotate(qinv, T.t))


def se3_apply(T: Pose, p: jnp.ndarray) -> jnp.ndarray:
    """T * p for point(s) p [...,3]; broadcasts pose over point batch dims."""
    return quat_rotate(T.q, p) + T.t


def se3_matrix(T: Pose) -> jnp.ndarray:
    """Pose -> homogeneous [...,4,4]."""
    R = quat_to_matrix(T.q)
    top = jnp.concatenate([R, T.t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0, 0, 1.0], R.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(M: jnp.ndarray) -> Pose:
    return Pose(matrix_to_quat(M[..., :3, :3]), M[..., :3, 3])


def se3_from_Rt(R: jnp.ndarray, t: jnp.ndarray) -> Pose:
    return Pose(matrix_to_quat(R), t)


def se3_retract_left(T: Pose, dx: jnp.ndarray) -> Pose:
    """Left-multiplicative GN update: exp(dx) * T (reference: local_ba.cpp:173)."""
    return se3_compose(se3_exp(dx), T)
