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


def repeatability_curve_pairs(extract_fn, pairs, ks=(32, 64, 128, 256, 512),
                              radius=0.5):
    """GT-pose-pair protocol (the paper/USIP evaluation behind BASELINE.md
    rows 1-5): `pairs` is an iterable of (cloud1 [N,3], cloud2 [M,3],
    R, t) with the GROUND-TRUTH relative pose x2 = x1 @ R.T + t — real
    scan pairs, partial overlap included.

    extract_fn(cloud [N,3]) -> (xyz [N,3], attention [N]).
    Returns {k: mean relative repeatability}.
    """
    results = {k: [] for k in ks}
    for c1, c2, R, t in pairs:
        xyz1, att1 = extract_fn(np.asarray(c1, np.float32))
        xyz2, att2 = extract_fn(np.asarray(c2, np.float32))
        for k in ks:
            kp1 = top_k_keypoints(xyz1, att1, k)
            kp2 = top_k_keypoints(xyz2, att2, k)
            results[k].append(keypoint_repeatability(kp1, kp2, R, t, radius))
    return {k: float(np.mean(v)) for k, v in results.items()}


def make_partial_overlap_pairs(clouds, numpts=8192, keep=0.85,
                               jitter=0.01, seed=0):
    """Construct harder evaluation pairs from single clouds: two
    PARTIAL-OVERLAP half-space crops (each keeps the lower/upper `keep`
    fraction along a random direction, overlap ~ 2*keep-1), independently
    resampled to `numpts`, the second rigidly moved by a known (R, t).

    Unlike the self-pair protocol (same points, jittered), the two crops
    share no point identities and differ in extent — closer to real scan
    pairs.  Returns a list of (cloud1, cloud2, R, t) for
    `repeatability_curve_pairs`.
    """
    rng = np.random.RandomState(seed)
    pairs = []
    for cloud in clouds:
        cloud = np.asarray(cloud, np.float64)
        u = rng.randn(3)
        u /= np.linalg.norm(u)
        proj = cloud @ u
        lo, hi = np.quantile(proj, [1.0 - keep, keep])
        part1 = cloud[proj <= hi]
        part2 = cloud[proj >= lo]
        if len(part1) < numpts // 4 or len(part2) < numpts // 4:
            continue

        def resample(pts):
            idx = rng.choice(len(pts), numpts, replace=len(pts) < numpts)
            return pts[idx] + rng.randn(numpts, 3) * jitter

        c1 = resample(part1)
        c2 = resample(part2)
        ang = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        t = rng.uniform(-5, 5, 3)
        c2 = c2 @ R.T + t
        pairs.append((c1.astype(np.float32), c2.astype(np.float32), R, t))
    return pairs


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
