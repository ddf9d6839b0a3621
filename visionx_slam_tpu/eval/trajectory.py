"""TUM-format trajectory export and ATE/RPE evaluation.

The reference never writes its trajectory (SURVEY.md §5.4: the only sinks
are glog and the GL window) — this module is the mandated replacement for
the Pangolin viewer (core/viewer/viewer.{h,cpp}): host-side TUM-format
dumps (``timestamp tx ty tz qx qy qz qw``, camera-to-world) plus the
evaluator needed for the BASELINE fidelity target (ATE RMSE).

ATE follows the standard TUM benchmark definition: associate estimated and
GT poses by timestamp, align with a similarity/rigid Horn (Umeyama)
transform, report translational RMSE. RPE reports relative pose drift over
a fixed frame delta.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation


def write_tum_trajectory(path: str, timestamps, T_wc_list) -> None:
    """Write camera-to-world poses as TUM lines.

    ``T_wc_list``: iterable of 4x4 matrices (camera-to-world). Estimated
    poses tracked internally as T_cw must be inverted by the caller or
    passed via :func:`tcw_to_twc`.
    """
    with open(path, "w") as f:
        f.write("# estimated trajectory\n# timestamp tx ty tz qx qy qz qw\n")
        for ts, T in zip(timestamps, T_wc_list):
            t = T[:3, 3]
            q = Rotation.from_matrix(T[:3, :3]).as_quat()  # xyzw
            f.write(
                f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
            )


def tcw_to_twc(T_cw: np.ndarray) -> np.ndarray:
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    out = np.eye(4)
    out[:3, :3] = R.T
    out[:3, 3] = -R.T @ t
    return out


def read_tum_trajectory(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Returns (timestamps [N], T_wc [N,4,4])."""
    ts, mats = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()[:8]]
            T = np.eye(4)
            T[:3, :3] = Rotation.from_quat(v[4:8]).as_matrix()
            T[:3, 3] = v[1:4]
            ts.append(v[0])
            mats.append(T)
    return np.array(ts), np.array(mats)


def associate_trajectories(
    ts_a: np.ndarray, ts_b: np.ndarray, max_diff: float = 0.02
) -> list[tuple[int, int]]:
    """Nearest-timestamp pairing (same join rule as the dataset loader)."""
    pairs = []
    j = 0
    order = np.argsort(ts_b)
    ts_b_sorted = ts_b[order]
    for i, t in enumerate(ts_a):
        j = int(np.searchsorted(ts_b_sorted, t))
        cands = [k for k in (j - 1, j) if 0 <= k < len(ts_b_sorted)]
        if not cands:
            continue
        k = min(cands, key=lambda k: abs(ts_b_sorted[k] - t))
        if abs(ts_b_sorted[k] - t) <= max_diff:
            pairs.append((i, int(order[k])))
    return pairs


def umeyama_alignment(
    src: np.ndarray, dst: np.ndarray, with_scale: bool = False
) -> tuple[np.ndarray, np.ndarray, float]:
    """Least-squares rigid/similarity alignment src -> dst. Returns (R, t, s)."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs**2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


def ate_rmse(
    est_t: np.ndarray, gt_t: np.ndarray, with_scale: bool = False
) -> float:
    """Absolute trajectory error RMSE after Horn alignment ([N,3] each)."""
    R, t, s = umeyama_alignment(est_t, gt_t, with_scale)
    aligned = (s * (R @ est_t.T)).T + t
    err = aligned - gt_t
    return float(np.sqrt((err**2).sum(axis=-1).mean()))


def rpe_rmse(T_est: np.ndarray, T_gt: np.ndarray, delta: int = 1) -> tuple[float, float]:
    """Relative pose error over frame delta: (trans RMSE [m], rot RMSE [rad])."""
    n = len(T_est) - delta
    if n <= 0:
        return 0.0, 0.0
    terrs, rerrs = [], []
    for i in range(n):
        d_est = np.linalg.inv(T_est[i]) @ T_est[i + delta]
        d_gt = np.linalg.inv(T_gt[i]) @ T_gt[i + delta]
        e = np.linalg.inv(d_gt) @ d_est
        terrs.append(np.linalg.norm(e[:3, 3]))
        angle = np.arccos(np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1))
        rerrs.append(angle)
    return float(np.sqrt(np.mean(np.square(terrs)))), float(
        np.sqrt(np.mean(np.square(rerrs)))
    )
