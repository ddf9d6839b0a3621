"""Pinhole + radial-tangential camera model as a JAX pytree.

Replaces the reference's ``Camera`` class (core/camera/camera.{h,cpp}) and
the ``ProjectToPixel`` helper (core/common/projection.h:11-31). Everything
is functional and vmap-friendly; points broadcast over leading dims.

Semantics preserved exactly:
- ``project_distorted`` applies k1,k2,p1,p2 radial-tangential distortion
  (camera.cpp:17-28); used only when projecting to *measured* pixels.
- ``backproject`` ignores distortion (camera.cpp:30-34) — the reference
  back-projects raw pixels without undistorting; we reproduce that.
- ``project_pinhole`` is distortion-free with a z > 1e-6 validity mask
  (projection.h:10-31) — the path used by culling, triangulation gates
  and bundle adjustment.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .se3 import Pose, se3_apply


class CameraParams(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray


def make_camera(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, dtype=jnp.float32) -> CameraParams:
    arr = lambda v: jnp.asarray(v, dtype)
    return CameraParams(arr(fx), arr(fy), arr(cx), arr(cy), arr(k1), arr(k2), arr(p1), arr(p2))


def intrinsic_matrix(cam: CameraParams, dtype=jnp.float32) -> jnp.ndarray:
    """3x3 K (no distortion), as built at reference tracking.cpp:850-853."""
    z = jnp.zeros((), dtype)
    o = jnp.ones((), dtype)
    return jnp.stack(
        [
            jnp.stack([cam.fx.astype(dtype), z, cam.cx.astype(dtype)]),
            jnp.stack([z, cam.fy.astype(dtype), cam.cy.astype(dtype)]),
            jnp.stack([z, z, o]),
        ]
    )


def project_distorted(cam: CameraParams, pc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points [...,3] -> distorted pixels [...,2] (camera.cpp:17-28)."""
    x = pc[..., 0] / pc[..., 2]
    y = pc[..., 1] / pc[..., 2]
    r2 = x * x + y * y
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([cam.fx * xd + cam.cx, cam.fy * yd + cam.cy], axis=-1)


def backproject(cam: CameraParams, px: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels [...,2] + depth [...] -> camera-frame points [...,3].

    NOTE: no undistortion, matching the reference (camera.cpp:30-34).
    """
    x = (px[..., 0] - cam.cx) / cam.fx
    y = (px[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def project_pinhole(
    cam: CameraParams, T_cw: Pose, pw: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """World points -> (uv [...,2], valid [...], pc [...,3]).

    Distortion-free projection with the z > 1e-6 cheirality gate,
    reproducing ``ProjectToPixel`` (projection.h:11-31). Invalid entries
    get a safe (finite) uv so downstream masked math stays NaN-free.
    """
    pc = se3_apply(T_cw, pw)
    z = pc[..., 2]
    valid = z > 1e-6
    safe_z = jnp.where(valid, z, 1.0)
    u = cam.fx * pc[..., 0] / safe_z + cam.cx
    v = cam.fy * pc[..., 1] / safe_z + cam.cy
    uv = jnp.stack([u, v], axis=-1)
    uv = jnp.where(valid[..., None], uv, 0.0)
    return uv, valid, pc
