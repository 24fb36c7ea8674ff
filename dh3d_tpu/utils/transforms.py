"""Rigid-transform math for registration evaluation.

Covers the functionality of `core/utils.py:222-581` (quaternion/euler
helpers, rigid fit, pose-error metrics) with standard formulations: the
rigid fit is the Kabsch/Umeyama SVD solve (the reference uses an equivalent
quaternion eigen-solve, `core/utils.py:259-301`).
"""

from __future__ import annotations

import numpy as np


def rigid_transform_3d(A, B):
    """Least-squares rigid transform mapping B -> A (Kabsch).

    A, B: [N, 3].  Returns (R [3,3], t [3]) with A ~= B @ R.T + t —
    the same contract as the reference (`core/utils.py:259-301`:
    "rotation matrix such that A = R * B + t").
    """
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    ca, cb = A.mean(0), B.mean(0)
    H = (B - cb).T @ (A - ca)
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = Vt.T @ D @ U.T
    t = ca - R @ cb
    return R, t


def apply_transform(pcd, transform):
    """Homogeneous 4x4 transform applied to [N, 3]
    (`core/utils.py:212-219`)."""
    pcd = np.asarray(pcd)
    homo = np.concatenate([pcd, np.ones((pcd.shape[0], 1))], axis=1)
    return (homo @ np.asarray(transform).T)[:, :3]


def to_homogeneous(R, t):
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = np.asarray(t).flatten()
    return T


def rotation_error_deg(R1, R2):
    """Geodesic angle between two rotations in degrees
    (`core/utils.py:223-225`)."""
    cos = (np.trace(R1.T @ R2) - 1.0) / 2.0
    return np.rad2deg(np.abs(np.arccos(np.clip(cos, -1.0, 1.0))))


def translation_error(t1, t2):
    return float(np.linalg.norm(np.asarray(t1).flatten()
                                - np.asarray(t2).flatten()))


def quaternion_from_matrix(R):
    """Unit quaternion (w, x, y, z) from a rotation matrix — eigenvector
    formulation as in `core/utils.py:304-379`."""
    R = np.asarray(R, np.float64)[:3, :3]
    m00, m01, m02 = R[0]
    m10, m11, m12 = R[1]
    m20, m21, m22 = R[2]
    K = np.array([
        [m00 - m11 - m22, 0.0, 0.0, 0.0],
        [m01 + m10, m11 - m00 - m22, 0.0, 0.0],
        [m02 + m20, m12 + m21, m22 - m00 - m11, 0.0],
        [m21 - m12, m02 - m20, m10 - m01, m00 + m11 + m22],
    ]) / 3.0
    w, V = np.linalg.eigh(K)
    q = V[[3, 0, 1, 2], np.argmax(w)]
    if q[0] < 0.0:
        q = -q
    return q


def quaternion_matrix(q):
    """Rotation matrix from unit quaternion (w, x, y, z)
    (`core/utils.py:449-473`)."""
    q = np.asarray(q, np.float64)
    n = q @ q
    if n < np.finfo(float).eps * 4.0:
        return np.eye(3)
    q = q * np.sqrt(2.0 / n)
    q = np.outer(q, q)
    return np.array([
        [1 - q[2, 2] - q[3, 3], q[1, 2] - q[3, 0], q[1, 3] + q[2, 0]],
        [q[1, 2] + q[3, 0], 1 - q[1, 1] - q[3, 3], q[2, 3] - q[1, 0]],
        [q[1, 3] - q[2, 0], q[2, 3] + q[1, 0], 1 - q[1, 1] - q[2, 2]],
    ])


def evaluate_R_t(R_gt, t_gt, R, t):
    """Quaternion / normalized-translation angular errors (radians),
    matching `core/utils.py:234-257`."""
    eps = 1e-15
    q = quaternion_from_matrix(R)
    q_gt = quaternion_from_matrix(R_gt)
    q = q / (np.linalg.norm(q) + eps)
    q_gt = q_gt / (np.linalg.norm(q_gt) + eps)
    loss_q = np.maximum(eps, 1.0 - np.sum(q * q_gt) ** 2)
    err_q = np.arccos(1 - 2 * loss_q)

    t = np.asarray(t, np.float64).flatten()
    t_gt = np.asarray(t_gt, np.float64).flatten()
    t = t / (np.linalg.norm(t) + eps)
    t_gt = t_gt / (np.linalg.norm(t_gt) + eps)
    loss_t = np.maximum(eps, 1.0 - np.sum(t * t_gt) ** 2)
    err_t = np.arccos(np.sqrt(1 - loss_t))
    return err_q, err_t
