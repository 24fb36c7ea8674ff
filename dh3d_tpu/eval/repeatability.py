"""Keypoint relative repeatability — the metric behind BASELINE.md rows
1-5 / the paper's Fig. 4 (`results_in_paper/results_in_paper.txt:3-10`).

Standard definition (USIP / 3DFeatNet protocol): detect the top-K
keypoints in two overlapping clouds with known relative pose; a keypoint
of cloud 1 is *repeatable* if, after warping into cloud 2's frame, some
cloud-2 keypoint lies within `radius`.  Relative repeatability is the
repeatable fraction of K.
"""

from __future__ import annotations

import numpy as np


def keypoint_repeatability(kp1, kp2, R=None, t=None, radius=0.5):
    """Fraction of kp1 with a kp2 within `radius` after warping.

    kp1: [K1, 3]; kp2: [K2, 3]; (R, t): transform mapping cloud-1
    coordinates into cloud-2's frame (x2 = x1 @ R.T + t); identity if None.
    """
    kp1 = np.asarray(kp1, np.float64)
    kp2 = np.asarray(kp2, np.float64)
    if len(kp1) == 0 or len(kp2) == 0:
        return 0.0
    warped = kp1 @ np.asarray(R).T + np.asarray(t) if R is not None else kp1
    d = np.linalg.norm(warped[:, None, :] - kp2[None, :, :], axis=-1)
    return float(np.mean(d.min(axis=1) < radius))


def top_k_keypoints(xyz, attention, k, nms_radius=0.5, min_response_ratio=0.01):
    """NMS + top-k by attention (the extraction pipeline's keypoint rule,
    `core/utils.py:15-43`); returns [<=k, 3]."""
    from dh3d_tpu.eval.nms import single_nms

    _, idx = single_nms(
        np.asarray(xyz, np.float64), np.array(attention, np.float64),
        nms_radius=nms_radius, min_response_ratio=min_response_ratio,
        max_keypoints=k,
    )
    return np.asarray(xyz)[idx]


def repeatability_curve(extract_fn, clouds, ks=(32, 64, 128, 256, 512),
                        radius=0.5, seed=0):
    """Relative repeatability averaged over `clouds` at each K, using
    synthetic rigid pairs (random z-rotation + jitter) — the self-pair
    protocol when GT pose pairs are unavailable.

    extract_fn(cloud [N,3]) -> (xyz [N,3], attention [N]).
    """
    rng = np.random.RandomState(seed)
    results = {k: [] for k in ks}
    for cloud in clouds:
        ang = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        t = rng.uniform(-2, 2, 3)
        cloud2 = (cloud @ R.T + t + rng.randn(*cloud.shape) * 0.02
                  ).astype(np.float32)
        xyz1, att1 = extract_fn(cloud)
        xyz2, att2 = extract_fn(cloud2)
        for k in ks:
            kp1 = top_k_keypoints(xyz1, att1, k)
            kp2 = top_k_keypoints(xyz2, att2, k)
            results[k].append(
                keypoint_repeatability(kp1, kp2, R, t, radius)
            )
    return {k: float(np.mean(v)) for k, v in results.items()}
