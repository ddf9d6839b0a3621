"""Camera model tests vs OpenCV (the reference's delegated oracle).

Checks ``project_distorted`` against cv2.projectPoints (same radtan model
as reference camera.cpp:17-28), backprojection round trips
(camera.cpp:30-34), and the ProjectToPixel semantics (projection.h:11-31).
"""

import cv2
import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from visionx_slam_tpu.ops import se3
from visionx_slam_tpu.ops import camera as cam_ops

FR1 = dict(fx=517.3, fy=516.5, cx=318.6, cy=255.3, k1=0.2624, k2=-0.9531, p1=-0.0054, p2=0.0026)


def test_project_distorted_vs_opencv(rng):
    cam = cam_ops.make_camera(**FR1)
    pts = rng.uniform(-0.5, 0.5, size=(100, 3)).astype(np.float64)
    pts[:, 2] = rng.uniform(0.5, 5.0, size=100)

    K = np.array([[FR1["fx"], 0, FR1["cx"]], [0, FR1["fy"], FR1["cy"]], [0, 0, 1]])
    dist = np.array([FR1["k1"], FR1["k2"], FR1["p1"], FR1["p2"]])
    expected, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), K, dist)
    expected = expected.reshape(-1, 2)

    ours = np.asarray(cam_ops.project_distorted(cam, jnp.asarray(pts, jnp.float32)))
    np.testing.assert_allclose(ours, expected, atol=0.1)  # float32 vs float64


def test_backproject_roundtrip(rng):
    # the reference backprojects WITHOUT undistortion; round trip must hold
    # through the pinhole-only path.
    cam = cam_ops.make_camera(**FR1)
    px = jnp.asarray(rng.uniform(0, 640, size=(50, 2)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0.5, 5.0, size=(50,)), jnp.float32)
    pc = cam_ops.backproject(cam, px, depth)
    assert np.allclose(np.asarray(pc[:, 2]), np.asarray(depth))
    # pinhole re-projection (identity pose) recovers the pixel exactly
    uv, valid, _ = cam_ops.project_pinhole(cam, se3.identity_pose(), pc)
    assert np.all(np.asarray(valid))
    np.testing.assert_allclose(np.asarray(uv), np.asarray(px), atol=1e-2)


def test_project_pinhole_validity_gate(rng):
    cam = cam_ops.make_camera(**FR1)
    pts = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [0.0, 0.0, 1e-9]], jnp.float32)
    uv, valid, pc = cam_ops.project_pinhole(cam, se3.identity_pose(), pts)
    assert np.asarray(valid).tolist() == [True, False, False]
    assert np.all(np.isfinite(np.asarray(uv)))


def test_project_pinhole_with_pose(rng):
    cam = cam_ops.make_camera(**FR1)
    rotvec = rng.normal(size=3) * 0.1
    q = R.from_rotvec(rotvec).as_quat()  # xyzw
    T = se3.Pose(
        jnp.asarray([q[3], q[0], q[1], q[2]], jnp.float32),
        jnp.asarray(rng.normal(size=3) * 0.1, jnp.float32),
    )
    pw = jnp.asarray(rng.uniform(-1, 1, size=(20, 3)), jnp.float32)
    pw = pw.at[:, 2].set(jnp.abs(pw[:, 2]) + 2.0)
    uv, valid, pc = cam_ops.project_pinhole(cam, T, pw)

    Rm = R.from_rotvec(rotvec).as_matrix()
    pc_np = np.asarray(pw) @ Rm.T + np.asarray(T.t)
    exp_u = FR1["fx"] * pc_np[:, 0] / pc_np[:, 2] + FR1["cx"]
    exp_v = FR1["fy"] * pc_np[:, 1] / pc_np[:, 2] + FR1["cy"]
    ours = np.asarray(uv)[np.asarray(valid)]
    exp = np.stack([exp_u, exp_v], -1)[np.asarray(valid)]
    np.testing.assert_allclose(ours, exp, atol=1e-2)
