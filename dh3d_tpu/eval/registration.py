"""6DoF registration evaluation: descriptor matching + RANSAC rigid fit.

Python port of the reference's MATLAB pipeline
(`evaluate/local_eval/matlab_code/eval_align.m:116-165`,
`local_align_demo.m:67-99`): mutual-nearest-neighbor descriptor matching,
RANSAC with a 1.0 m inlier threshold, final refit on the inlier set, and
success iff translation error <= 2 m AND rotation error <= 5 deg.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from dh3d_tpu.utils.transforms import (
    rigid_transform_3d,
    rotation_error_deg,
    translation_error,
)


def match_descriptors_mutual(desc1, desc2):
    """Mutual nearest neighbors in descriptor space (`eval_align.m` uses
    pdist2 'smallest' 1 in both directions).  Returns [M, 2] index pairs."""
    d = np.linalg.norm(desc1[:, None, :] - desc2[None, :, :], axis=-1)
    nn12 = np.argmin(d, axis=1)
    nn21 = np.argmin(d, axis=0)
    idx1 = np.arange(len(desc1))
    mutual = nn21[nn12] == idx1
    return np.stack([idx1[mutual], nn12[mutual]], axis=1)


@dataclass
class RansacResult:
    R: np.ndarray
    t: np.ndarray
    inliers: np.ndarray
    num_inliers: int
    num_matches: int


def ransac_rigid(xyz1, xyz2, inlier_thresh=1.0, iters=1000, seed=0,
                 min_inliers=3) -> Optional[RansacResult]:
    """RANSAC rigid fit: xyz2 -> xyz1 over given correspondences.

    xyz1, xyz2: [M, 3] matched point pairs.  Inlier threshold 1.0 m as in
    `eval_align.m:124` / `local_align_demo.m:75`.
    """
    M = xyz1.shape[0]
    if M < 3:
        return None
    rng = np.random.RandomState(seed)
    best_inliers = None
    best_count = -1
    for _ in range(iters):
        sel = rng.choice(M, 3, replace=False)
        try:
            R, t = rigid_transform_3d(xyz1[sel], xyz2[sel])
        except np.linalg.LinAlgError:
            continue
        pred = xyz2 @ R.T + t
        resid = np.linalg.norm(pred - xyz1, axis=1)
        inliers = resid < inlier_thresh
        count = int(inliers.sum())
        if count > best_count:
            best_count = count
            best_inliers = inliers
    if best_inliers is None or best_count < min_inliers:
        return None
    R, t = rigid_transform_3d(xyz1[best_inliers], xyz2[best_inliers])
    pred = xyz2 @ R.T + t
    inliers = np.linalg.norm(pred - xyz1, axis=1) < inlier_thresh
    return RansacResult(R, t, inliers, int(inliers.sum()), M)


def register_clouds(kp1, desc1, kp2, desc2, inlier_thresh=1.0, iters=1000,
                    seed=0) -> Optional[RansacResult]:
    """Full registration: mutual matching + RANSAC.  Estimates the
    transform mapping cloud-2 keypoints onto cloud 1."""
    matches = match_descriptors_mutual(desc1, desc2)
    if len(matches) < 3:
        return None
    return ransac_rigid(
        kp1[matches[:, 0]], kp2[matches[:, 1]],
        inlier_thresh=inlier_thresh, iters=iters, seed=seed,
    )


def registration_success(R_est, t_est, R_gt, t_gt, rte_thresh=2.0,
                         rre_thresh=5.0):
    """Success protocol of `eval_align.m:143` / `local_align_demo.m:86`:
    RTE <= 2 m AND RRE <= 5 degrees."""
    rte = translation_error(t_est, t_gt)
    rre = rotation_error_deg(np.asarray(R_est), np.asarray(R_gt))
    return bool(rte <= rte_thresh and rre <= rre_thresh), rte, rre
