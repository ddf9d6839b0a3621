"""Host-side tracking state machine orchestrating the jitted stages.

Reproduces the reference frontend (core/frontend/tracking.cpp): the
INIT / TRACKING_GOOD / TRACKING_BAD / LOST state machine with two-frame
initialization, PnP-first tracking with essential-matrix fallback,
keyframe policy, depth/triangulated landmark creation, culling and local
BA. Control flow lives on the host (it is a 4-way dispatch on scalars);
every array computation is a jitted device stage from ``stages.py`` /
``models/``.

Reference quirks deliberately reproduced (SURVEY.md §7 fidelity checklist):
- the init parallax gate compares a PIXEL-mean parallax against a 1-degree
  RADIAN constant (tracking.cpp:240-245) — effectively always passing;
- the essential fallback composes a UNIT-norm translation
  (tracking.cpp:539-541) — scale drift on that path;
- TRACKING_BAD/LOST wipe the whole map and re-initialize
  (tracking.cpp:477-499) — no relocalization;
- a frame arriving in BAD/LOST state is consumed by the reset handler
  without being tracked (tracking.cpp:68-74).

Deliberate deviation: local BA uses the corrected Gauss-Newton sign (see
models/local_ba.py docstring).
"""

from __future__ import annotations

import enum
import logging
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models import matching
from ..models.estimation import (
    essential_ransac,
    essential_scale_from_depth,
    pnp_ransac,
)
from ..models.local_ba import BAOptions, local_ba
from ..ops.camera import CameraParams
from ..ops.se3 import Pose, identity_pose, se3_compose, se3_matrix
from ..utils.config import TrackingOptions
from . import mapstate as msl
from . import stages
from .mapstate import FREE, MapState
from .stages import FrameObs

log = logging.getLogger("vxs.tracking")


class State(enum.Enum):
    INIT = 0
    TRACKING_GOOD = 1
    TRACKING_BAD = 2
    LOST = 3


@dataclass
class FrameResult:
    frame_id: int
    timestamp: float
    state: str
    pose_T_cw: np.ndarray | None  # 4x4 or None when the frame has no pose
    n_features: int = 0
    n_matches: int = 0
    n_inliers: int = 0
    parallax: float = 0.0
    is_keyframe: bool = False
    n_keyframes: int = 0
    n_landmarks: int = 0
    ba_cost: float = float("nan")


@dataclass
class Tracker:
    cam: CameraParams
    options: TrackingOptions = field(default_factory=TrackingOptions)
    n_features: int = 1024
    kf_capacity: int = 64
    lm_capacity: int = 1 << 17
    seed: int = 0

    def __post_init__(self):
        self.state = State.INIT
        self.ms: MapState = msl.empty_map(
            self.kf_capacity, self.lm_capacity, self.n_features
        )
        self._key = jax.random.PRNGKey(self.seed)
        self._ba_opts = BAOptions(
            window_size=self.options.ba_window_size,
            max_iterations=self.options.ba_iterations,
            min_pose_observations=self.options.ba_min_pose_observations,
            min_point_observations=self.options.ba_min_point_observations,
            huber_delta=self.options.ba_huber_delta,
            max_reproj_error=self.options.ba_max_reproj_error,
            rel_tol=self.options.ba_rel_tol,
        )
        self._reset_episode()

    # ------------------------------------------------------------------
    def _reset_episode(self):
        """Map wipe + re-init (HandleTrackingBad/Lost, tracking.cpp:477-499)."""
        self.ms = msl.empty_map(self.kf_capacity, self.lm_capacity, self.n_features)
        self.init_obs: FrameObs | None = None
        self.init_frame_id: int | None = None
        self.init_gray: np.ndarray | None = None
        self.init_kf_slot: int | None = None
        self.last_obs: FrameObs | None = None
        self.last_pose: Pose | None = None
        self.last_kf_slot: int | None = None
        self.last_kf_frame_id: int | None = None
        self.current_pose: Pose | None = None
        self.last_inliers = 0
        self.last_parallax = 0.0

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------------
    def process(
        self, frame_id: int, timestamp: float, gray: np.ndarray, obs: FrameObs
    ) -> FrameResult:
        """Per-frame entry point (Tracking::ProcessFrame, tracking.cpp:39-89)."""
        res = FrameResult(
            frame_id=frame_id,
            timestamp=timestamp,
            state=self.state.name,
            pose_T_cw=None,
            n_features=int(np.sum(np.asarray(obs.valid))),
        )
        just_initialized = False

        if self.state == State.INIT:
            if self.init_obs is None:
                if not self._init_first(frame_id, gray, obs, res):
                    log.info("[ProcessFrame] Waiting for a better initial frame...")
                return self._finish(res)
            else:
                if not self._init_second(frame_id, obs, res):
                    log.info("[ProcessFrame] Waiting for a better second frame...")
                    return self._finish(res)
                self._update_tracking_state()
                log.info("[Tracking] Initialization success.")
                self.last_obs = obs
                self.last_pose = self.current_pose
                just_initialized = True
        elif self.state == State.TRACKING_GOOD:
            if not self._track(frame_id, obs, res):
                self._handle_tracking_failure()
                res.state = self.state.name
                return self._finish(res)
        elif self.state in (State.TRACKING_BAD, State.LOST):
            # the reference consumes this frame in the reset handler
            self._reset_episode()
            self.state = State.INIT
            log.info("[ProcessFrame] Tracking %s. Trying to re-initialize...",
                     res.state.lower())
            return self._finish(res)

        if not just_initialized and self._need_new_keyframe(frame_id):
            self._create_keyframe(frame_id, obs, res)
            if self.options.enable_culling:
                self._cull_landmarks()
                self._cull_keyframes(frame_id)
            if self.options.enable_local_ba:
                self.ms, stats = local_ba(self.ms, self.cam, self._ba_opts)
                res.ba_cost = float(stats.final_cost)
                # keep the tracker's notion of the current pose in sync
                self.current_pose = msl.map_pose(
                    self.ms, jnp.asarray(self.last_kf_slot)
                )

        self._update_tracking_state()
        self.last_obs = obs
        self.last_pose = self.current_pose
        res.state = self.state.name
        return self._finish(res)

    # ------------------------------------------------------------------
    def _finish(self, res: FrameResult) -> FrameResult:
        res.n_keyframes = int(msl.n_keyframes(self.ms))
        res.n_landmarks = int(msl.n_landmarks(self.ms))
        return res

    def _set_frame_pose(self, res: FrameResult, pose: Pose):
        self.current_pose = pose
        res.pose_T_cw = np.asarray(se3_matrix(pose))

    # ------------------------------------------------------------------
    # initialization (tracking.cpp:177-263)
    # ------------------------------------------------------------------
    def _init_first(self, frame_id, gray, obs, res) -> bool:
        n = int(np.sum(np.asarray(obs.valid)))
        if n < self.options.min_matches:
            log.warning("[InitWithFirstFrame] Not enough features: %d", n)
            return False
        h, w = gray.shape
        if not bool(stages.feature_distribution_ok(obs.px, obs.valid, w, h)):
            log.warning("[InitWithFirstFrame] Poor feature distribution.")
            return False
        mean, std = float(gray.mean()), float(gray.std())
        if mean < 30 or mean > 225 or std < 20:  # tracking.cpp:120-139
            log.warning("[InitWithFirstFrame] Poor image quality.")
            return False
        self.init_obs = obs
        self.init_frame_id = frame_id
        pose = identity_pose()
        self._set_frame_pose(res, pose)
        log.info("[Tracking] InitWithFirstFrame. Features: %d", n)
        return True

    def _init_second(self, frame_id, obs, res) -> bool:
        m = matching.match_frames(
            self.init_obs.desc, self.init_obs.valid, obs.desc, obs.valid
        )
        n_matches = int(jnp.sum(m.valid))
        res.n_matches = n_matches
        if n_matches < self.options.min_matches:
            log.warning("[InitWithSecondFrame] Not enough matches: %d", n_matches)
            return False

        pose2 = None
        inliers = 0
        if self.options.rgbd_init:
            pose2, inliers = self._init_pose_from_depth_pnp(obs, m)
            if pose2 is not None:
                log.info("[InitWithSecondFrame] RGB-D PnP init, inliers: %d", inliers)

        if pose2 is None:
            ess = essential_ransac(
                self.cam, self.init_obs.px, obs.px[m.idx], m.valid, self._next_key()
            )
            inliers = int(ess.n_inliers)
            if not bool(ess.ok) or inliers < self.options.min_inliers:
                log.warning("[EstimatePoseByEssential] Essential failed. inliers: %d",
                            inliers)
                return False
            t_init = ess.t
            if self.options.init_scale_from_depth:
                scale = essential_scale_from_depth(
                    self.cam, ess, self.init_obs.px, obs.px[m.idx],
                    self.init_obs.depth,
                )
                t_init = ess.t * scale
                log.info("[InitWithSecondFrame] depth-recovered scale: %f",
                         float(scale))
            # pose of the second frame: T_cw = T_cl * T_lw, T_lw = identity
            pose2 = Pose(
                jnp.asarray(_mat_to_quat_np(np.asarray(ess.R)), jnp.float32),
                jnp.asarray(t_init, jnp.float32),
            )

        parallax = float(stages.parallax_px(self.init_obs.px, obs.px, m))
        # reference quirk preserved: pixel parallax vs 1-degree-in-radians
        if parallax < float(np.deg2rad(1.0)):
            log.warning("[InitWithSecondFrame] Parallax too small: %f", parallax)
            return False

        pose1 = identity_pose()

        # insert both keyframes, then depth landmarks x2, then triangulation
        self.ms, slot1 = msl.insert_keyframe(
            self.ms, jnp.asarray(self.init_frame_id), pose1,
            self.init_obs.px, self.init_obs.desc, self.init_obs.valid,
            jnp.full((self.n_features,), FREE, jnp.int32), self.init_obs.depth,
        )
        self.ms, slot2 = msl.insert_keyframe(
            self.ms, jnp.asarray(frame_id), pose2,
            obs.px, obs.desc, obs.valid,
            jnp.full((self.n_features,), FREE, jnp.int32), obs.depth,
        )
        self.ms = stages.depth_landmarks(self.ms, self.cam, slot1, pose1)
        self.ms = stages.depth_landmarks(self.ms, self.cam, slot2, pose2)
        self.ms = stages.triangulate_pair(
            self.ms, self.cam, slot1, slot2,
            self.options.triangulation_min_angle_deg,
            self.options.triangulation_max_reproj_error,
        )
        self.init_kf_slot = int(slot1)
        self.last_kf_slot = int(slot2)
        self.last_kf_frame_id = frame_id
        self.last_parallax = parallax
        self.last_inliers = inliers
        res.n_inliers = inliers
        res.parallax = parallax
        self._set_frame_pose(res, pose2)
        log.info("[InitWithSecondFrame] Parallax: %f, inliers: %d", parallax, inliers)
        return True

    def _init_pose_from_depth_pnp(self, obs, m):
        """RGB-D init: PnP of the second frame against the first frame's
        depth-backprojected points (extension, ``rgbd_init``). Returns
        (pose, inliers) or (None, 0) to fall back to the essential path."""
        from ..ops.camera import backproject
        from ..ops.se3 import se3_apply, se3_inverse

        d = self.init_obs.depth
        good_d = (d >= stages.MIN_DEPTH) & (d <= stages.MAX_DEPTH)
        pw = backproject(self.cam, self.init_obs.px, d)  # init pose = identity
        valid = m.valid & good_d
        if int(jnp.sum(valid)) < self.options.min_inliers:
            return None, 0
        # blind init: full hypothesis budget (see scan_pipeline.init_second)
        sol = pnp_ransac(
            self.cam, pw, obs.px[m.idx], valid, self._next_key(),
            self.options.max_reproj_error,
            n_hypotheses=max(64, self.options.pnp_hypotheses),
            refine_iters=max(6, self.options.pnp_refine_iters),
            init_pose=identity_pose(),
            depth_curr=obs.depth[m.idx] if self.options.pnp_use_depth else None,
        )
        inliers = int(sol.n_inliers)
        if not bool(sol.ok) or inliers < self.options.min_inliers:
            return None, 0
        return sol.pose, inliers

    # ------------------------------------------------------------------
    # steady-state tracking (tracking.cpp:267-455)
    # ------------------------------------------------------------------
    def _track(self, frame_id, obs, res) -> bool:
        if self.last_kf_slot is not None:
            if self._track_pnp(frame_id, obs, res):
                return True
            log.info("[Track] PnP failed, falling back to TrackLastFrame.")
        return self._track_last_frame(frame_id, obs, res)

    def _track_pnp(self, frame_id, obs, res) -> bool:
        slot = jnp.asarray(self.last_kf_slot)
        m = matching.match_frames(
            self.ms.kf_desc[slot], self.ms.kf_fvalid[slot], obs.desc, obs.valid
        )
        n_matches = int(jnp.sum(m.valid))
        res.n_matches = n_matches
        if n_matches < self.options.min_matches:
            log.warning("[TrackWithPnP] Not enough matches: %d", n_matches)
            return False

        pts3d, pts2d, valid = stages.pnp_correspondences(self.ms, slot, obs, m)
        n_pairs = int(jnp.sum(valid))
        if n_pairs < self.options.min_inliers:
            log.warning("[TrackWithPnP] Not enough 3D-2D pairs: %d", n_pairs)
            return False

        sol = pnp_ransac(
            self.cam, pts3d, pts2d, valid, self._next_key(),
            self.options.max_reproj_error,
            n_hypotheses=self.options.pnp_hypotheses,
            refine_iters=self.options.pnp_refine_iters,
            init_pose=self.current_pose,  # motion-prior hypothesis
            depth_curr=obs.depth[m.idx] if self.options.pnp_use_depth else None,
        )
        inliers = int(sol.n_inliers)
        if not bool(sol.ok) or inliers < self.options.min_inliers:
            log.warning("[PnP] solvePnPRansac failed. Inliers: %d", inliers)
            return False
        if not bool(jnp.all(jnp.isfinite(sol.pose.q)) & jnp.all(jnp.isfinite(sol.pose.t))):
            log.warning("[TrackWithPnP] Invalid pose")
            return False

        kf_px = self.ms.kf_px[slot].T
        self.last_parallax = float(stages.parallax_px(kf_px, obs.px, m))
        self.last_inliers = inliers
        res.n_inliers = inliers
        res.parallax = self.last_parallax
        self._set_frame_pose(res, sol.pose)
        return True

    def _track_last_frame(self, frame_id, obs, res) -> bool:
        if self.last_obs is None:
            log.warning("[TrackLastFrame] last frame is null")
            return False
        m = matching.match_frames(
            self.last_obs.desc, self.last_obs.valid, obs.desc, obs.valid
        )
        n_matches = int(jnp.sum(m.valid))
        res.n_matches = max(res.n_matches, n_matches)
        if n_matches < self.options.min_matches:
            log.warning("[TrackLastFrame] Not enough matches: %d", n_matches)
            return False

        ess = essential_ransac(
            self.cam, self.last_obs.px, obs.px[m.idx], m.valid, self._next_key()
        )
        inliers = int(ess.n_inliers)
        if not bool(ess.ok) or inliers < self.options.min_inliers:
            log.warning("[TrackLastFrame] Pose estimation failed. inliers: %d", inliers)
            return False

        # the reference composes recoverPose's unit-scale translation here
        # (scale-drift quirk, tracking.cpp:539-541); with depth available we
        # optionally recover the metric scale (documented deviation)
        t_rel = ess.t
        if self.options.fallback_scale_from_depth:
            scale = essential_scale_from_depth(
                self.cam, ess, self.last_obs.px, obs.px[m.idx], self.last_obs.depth
            )
            t_rel = ess.t * scale
        T_cl = Pose(
            jnp.asarray(_mat_to_quat_np(np.asarray(ess.R)), jnp.float32),
            jnp.asarray(t_rel, jnp.float32),
        )
        pose = se3_compose(T_cl, self.last_pose)
        self.last_inliers = inliers
        self.last_parallax = float(stages.parallax_px(self.last_obs.px, obs.px, m))
        res.n_inliers = inliers
        res.parallax = self.last_parallax
        self._set_frame_pose(res, pose)
        return True

    # ------------------------------------------------------------------
    # state management (tracking.cpp:459-499)
    # ------------------------------------------------------------------
    def _update_tracking_state(self):
        if self.last_inliers >= self.options.min_inliers:
            self.state = State.TRACKING_GOOD
        else:
            self.state = State.TRACKING_BAD

    def _handle_tracking_failure(self):
        if self.state == State.TRACKING_GOOD:
            self.state = State.TRACKING_BAD
        else:
            self.state = State.LOST
        log.warning("[Tracking] Tracking failure, state = %s", self.state.name)

    # ------------------------------------------------------------------
    # keyframes (tracking.cpp:562-650, 856-929)
    # ------------------------------------------------------------------
    def _need_new_keyframe(self, frame_id) -> bool:
        if self.state != State.TRACKING_GOOD:
            return False
        if self.current_pose is None or self.last_kf_slot is None:
            return False
        if self.last_inliers < self.options.min_keyframe_inliers:
            return False
        if self.last_parallax < self.options.min_parallax:
            return False
        if frame_id - self.last_kf_frame_id < self.options.min_keyframe_gap:
            return False
        return True

    def _create_keyframe(self, frame_id, obs, res):
        pose = self.current_pose
        # recycle dead landmark slots before the allocator runs dry
        if int(self.ms.next_lm) > self.lm_capacity - 3 * self.n_features:
            self.ms = msl.compact_landmarks(self.ms)
        prev_slot = jnp.asarray(self.last_kf_slot)
        self.ms, slot = msl.insert_keyframe(
            self.ms, jnp.asarray(frame_id), pose,
            obs.px, obs.desc, obs.valid,
            jnp.full((self.n_features,), FREE, jnp.int32), obs.depth,
        )
        self.ms = stages.depth_landmarks(self.ms, self.cam, slot, pose)
        self.ms = stages.triangulate_pair(
            self.ms, self.cam, prev_slot, slot,
            self.options.triangulation_min_angle_deg,
            self.options.triangulation_max_reproj_error,
        )
        self.last_kf_slot = int(slot)
        self.last_kf_frame_id = frame_id
        res.is_keyframe = True
        log.info("[Tracking] New keyframe created.")

    # ------------------------------------------------------------------
    # culling (tracking.cpp:652-840)
    # ------------------------------------------------------------------
    def _cull_landmarks(self):
        n_lm = int(msl.n_landmarks(self.ms))
        if n_lm < self.options.min_landmarks_for_culling:
            return
        self.ms, n = stages.cull_landmarks(
            self.ms, self.cam,
            self.options.landmark_max_reproj_error,
            self.options.min_landmark_observations,
        )
        n = int(n)
        if n:
            log.info("[Tracking] Culled landmarks: %d", n)

    def _cull_keyframes(self, current_frame_id):
        n_kf = int(msl.n_keyframes(self.ms))
        if n_kf <= self.options.min_keyframes_for_culling:
            return
        exceeded = (
            self.options.max_keyframes > 0 and n_kf > self.options.max_keyframes
        )
        ratio, total = stages.keyframe_redundancy(
            self.ms, self.options.kf_min_shared_observations
        )
        ratio = np.asarray(ratio)
        total = np.asarray(total)
        kf_id = np.asarray(self.ms.kf_id)

        # iterate ascending by frame id (std::map order), pick the FIRST
        order = np.argsort(np.where(kf_id >= 0, kf_id, np.iinfo(np.int32).max))
        for slot in order:
            if kf_id[slot] < 0 or total[slot] == 0:
                continue
            if slot == self.last_kf_slot or slot == self.init_kf_slot:
                continue
            if kf_id[slot] == current_frame_id:
                continue
            r = float(ratio[slot])
            if r > self.options.kf_redundant_ratio and (exceeded or r > 0.95):
                self.ms = msl.remove_keyframe_slot(self.ms, jnp.asarray(slot))
                log.info("[Tracking] Culled keyframe %d, redundant_ratio=%f",
                         int(kf_id[slot]), r)
                self._cull_landmarks()
                break


def _mat_to_quat_np(R: np.ndarray) -> np.ndarray:
    """Host-side rotation-matrix -> wxyz quaternion."""
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(R).as_quat()  # xyzw
    return np.array([q[3], q[0], q[1], q[2]], np.float32)
