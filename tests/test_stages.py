"""Unit tests for the per-frame device stages (landmark creation,
triangulation, culling) against exact synthetic geometry."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from visionx_slam_tpu.ops.camera import make_camera, backproject
from visionx_slam_tpu.ops.se3 import Pose, identity_pose
from visionx_slam_tpu.tracking import mapstate as msl, stages

CAM = make_camera(525.0, 525.0, 319.5, 239.5)
K_CAP, L_CAP, N = 6, 512, 64


def pose_from(Rv, t):
    q = Rotation.from_rotvec(Rv).as_quat()
    return Pose(jnp.asarray([q[3], q[0], q[1], q[2]], jnp.float32),
                jnp.asarray(t, jnp.float32))


def insert(ms, fid, pose, px, desc, valid, depth, links=None):
    if links is None:
        links = jnp.full((N,), msl.FREE, jnp.int32)
    return msl.insert_keyframe(
        ms, jnp.asarray(fid), pose, jnp.asarray(px, jnp.float32),
        jnp.asarray(desc, jnp.uint8), jnp.asarray(valid),
        jnp.asarray(links), jnp.asarray(depth, jnp.float32),
    )


def test_depth_landmarks_semantics(rng):
    ms = msl.empty_map(K_CAP, L_CAP, N)
    px = rng.uniform(50, 500, (N, 2)).astype(np.float32)
    depth = rng.uniform(0.5, 5.0, N).astype(np.float32)
    depth[0] = 0.0      # missing -> skipped
    depth[1] = 0.05     # below kMinDepth
    depth[2] = 11.0     # above kMaxDepth
    valid = np.ones(N, bool)
    valid[3] = False    # invalid feature -> skipped
    links = np.full(N, msl.FREE, np.int32)
    links[4] = 7        # already has landmark -> skipped
    links[5] = msl.OUTLIER  # outlier features ARE eligible (tracking.cpp:610)

    pose = pose_from([0.02, -0.01, 0.03], [0.1, 0.2, -0.1])
    ms, slot = insert(ms, 0, pose, px, np.zeros((N, 32)), valid, depth,
                      jnp.asarray(links))
    ms = stages.depth_landmarks(ms, CAM, slot, pose)

    out_links = np.asarray(ms.kf_feat_lm[slot])
    assert out_links[0] == msl.FREE and out_links[1] == msl.FREE
    assert out_links[2] == msl.FREE and out_links[3] == msl.FREE
    assert out_links[4] == 7
    assert out_links[5] >= 0  # outlier got a fresh landmark
    created = (out_links >= 0) & (np.arange(N) != 4)
    assert created.sum() == N - 5  # all but the 5 special rows

    # positions: T_wc * backproject(px, d) — verify one
    i = 6
    pc = np.asarray(backproject(CAM, jnp.asarray(px[i]), jnp.asarray(depth[i])))
    from visionx_slam_tpu.ops.se3 import se3_apply, se3_inverse

    pw = np.asarray(se3_apply(se3_inverse(pose), jnp.asarray(pc)))
    np.testing.assert_allclose(
        np.asarray(ms.lm_pos[:, out_links[i]]), pw, atol=1e-5
    )


def test_triangulate_pair_creates_consistent_landmarks(rng):
    # two keyframes with identical descriptors at projected positions of
    # known 3D points -> triangulation must recover those points
    n_pts = 40
    X = rng.uniform([-1.5, -1, 3.0], [1.5, 1, 6.0], size=(n_pts, 3))
    pose_a = identity_pose()
    pose_b = pose_from([0.0, -0.05, 0.01], [0.3, 0.0, 0.0])

    from visionx_slam_tpu.ops.camera import project_pinhole

    uv_a, ok_a, _ = project_pinhole(CAM, pose_a, jnp.asarray(X, jnp.float32))
    uv_b, ok_b, _ = project_pinhole(CAM, pose_b, jnp.asarray(X, jnp.float32))

    desc = rng.integers(0, 256, (N, 32), dtype=np.uint8)  # distinct rows
    px_a = np.zeros((N, 2), np.float32)
    px_b = np.zeros((N, 2), np.float32)
    px_a[:n_pts] = np.asarray(uv_a)
    px_b[:n_pts] = np.asarray(uv_b)
    valid = np.zeros(N, bool)
    valid[:n_pts] = True

    ms = msl.empty_map(K_CAP, L_CAP, N)
    ms, slot_a = insert(ms, 0, pose_a, px_a, desc, valid, np.zeros(N))
    ms, slot_b = insert(ms, 1, pose_b, px_b, desc, valid, np.zeros(N))
    ms = stages.triangulate_pair(ms, CAM, slot_a, slot_b, 1.0, 5.0)

    links_a = np.asarray(ms.kf_feat_lm[slot_a])
    links_b = np.asarray(ms.kf_feat_lm[slot_b])
    created = links_a[:n_pts] >= 0
    assert created.sum() > n_pts * 0.8, created.sum()
    # both sides linked to the same landmark
    np.testing.assert_array_equal(
        links_a[:n_pts][created], links_b[:n_pts][created]
    )
    pos = np.asarray(ms.lm_pos).T[links_a[:n_pts][created]]
    np.testing.assert_allclose(pos, X[created], atol=2e-2)


def test_triangulate_pair_respects_angle_gate(rng):
    # zero baseline -> zero parallax angle -> nothing triangulated
    n_pts = 20
    X = rng.uniform([-1, -1, 3.0], [1, 1, 5.0], size=(n_pts, 3))
    pose = identity_pose()
    from visionx_slam_tpu.ops.camera import project_pinhole

    uv, _, _ = project_pinhole(CAM, pose, jnp.asarray(X, jnp.float32))
    desc = rng.integers(0, 256, (N, 32), dtype=np.uint8)
    px = np.zeros((N, 2), np.float32)
    px[:n_pts] = np.asarray(uv)
    valid = np.zeros(N, bool)
    valid[:n_pts] = True

    ms = msl.empty_map(K_CAP, L_CAP, N)
    ms, sa = insert(ms, 0, pose, px, desc, valid, np.zeros(N))
    ms, sb = insert(ms, 1, pose, px, desc, valid, np.zeros(N))
    ms = stages.triangulate_pair(ms, CAM, sa, sb, 1.0, 5.0)
    assert int(msl.n_landmarks(ms)) == 0


def test_cull_landmarks_kills_bad(rng):
    # 2 keyframes observing 10 landmarks; landmark 0 displaced -> high
    # reprojection error -> culled; landmark 1 observed once -> culled
    n_pts = 10
    X = rng.uniform([-1, -1, 3.0], [1, 1, 5.0], size=(n_pts, 3))
    pose_a = identity_pose()
    pose_b = pose_from([0.0, 0.02, 0.0], [0.2, 0.0, 0.0])
    from visionx_slam_tpu.ops.camera import project_pinhole

    desc = rng.integers(0, 256, (N, 32), dtype=np.uint8)
    ms = msl.empty_map(K_CAP, L_CAP, N)
    for fid, pose in ((0, pose_a), (1, pose_b)):
        uv, _, _ = project_pinhole(CAM, pose, jnp.asarray(X, jnp.float32))
        px = np.zeros((N, 2), np.float32)
        px[:n_pts] = np.asarray(uv)
        valid = np.zeros(N, bool)
        valid[:n_pts] = True
        links = np.full(N, msl.FREE, np.int32)
        links[:n_pts] = np.arange(n_pts)
        if fid == 1:
            links[1] = msl.FREE  # landmark 1: single observation
        ms, _ = insert(ms, fid, pose, px, desc, valid, np.zeros(N),
                       jnp.asarray(links))
    Lp = ms.lm_physical
    pos = np.zeros((Lp, 3), np.float32)
    pos[:n_pts] = X
    pos[0] += 0.5  # big displacement -> err >> 5 px
    alive = np.zeros(Lp, bool)
    alive[:n_pts] = True
    ms = ms._replace(lm_pos=jnp.asarray(pos.T), lm_alive=jnp.asarray(alive),
                     next_lm=jnp.asarray(n_pts, jnp.int32))

    ms2, n_culled = stages.cull_landmarks(ms, CAM, 5.0, 2)
    alive_after = np.asarray(ms2.lm_alive)
    assert not alive_after[0]   # displaced
    assert not alive_after[1]   # under-observed
    assert alive_after[2:n_pts].all()
    assert int(n_culled) == 2


def test_keyframe_redundancy(rng):
    # kf0 and kf1 share all landmarks (obs count 2 >= min_shared 2) -> both
    # fully redundant; kf2 has its own landmarks -> ratio 0
    n_pts = 8
    desc = rng.integers(0, 256, (N, 32), dtype=np.uint8)
    ms = msl.empty_map(K_CAP, L_CAP, N)
    for fid in range(3):
        links = np.full(N, msl.FREE, np.int32)
        if fid < 2:
            links[:n_pts] = np.arange(n_pts)
        else:
            links[:n_pts] = np.arange(n_pts, 2 * n_pts)
        valid = np.zeros(N, bool)
        valid[:n_pts] = True
        ms, _ = insert(ms, fid, identity_pose(),
                       rng.uniform(0, 600, (N, 2)), desc, valid,
                       np.zeros(N), jnp.asarray(links))
    alive = np.zeros(ms.lm_physical, bool)
    alive[: 2 * n_pts] = True
    ms = ms._replace(lm_alive=jnp.asarray(alive),
                     lm_pos=jnp.ones((3, ms.lm_physical), jnp.float32))
    ratio, total = stages.keyframe_redundancy(ms, jnp.asarray(2))
    ratio = np.asarray(ratio)
    assert ratio[0] == 1.0 and ratio[1] == 1.0
    assert ratio[2] == 0.0
