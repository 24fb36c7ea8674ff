#!/usr/bin/env python
"""6DoF registration evaluation CLI — the Python equivalent of the
reference's MATLAB pipeline (`evaluate/local_eval/matlab_code/eval_align.m`
/ `local_align_demo.m`): mutual-NN matching of extracted keypoint
descriptors + RANSAC rigid fit (inlier 1.0 m), success iff RTE <= 2 m and
RRE <= 5 deg.

Inputs are `<name>_nms_res.bin` files from `localdesc_extract.py`
([xyz | 128-d descriptor | attention] rows).

Modes:
  --pairs FILE   lines `fileA fileB [T_gt.txt]`; T_gt is a 4x4 text matrix
                 mapping cloud B into cloud A's frame.  Without T_gt the
                 estimated transform is printed but not scored.
  --self_test F  sanity mode: apply a random rigid transform to F's
                 keypoints and verify recovery (no GT files needed).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dh3d_tpu.data.io import load_descriptor_bin  # noqa: E402
from dh3d_tpu.eval import register_clouds, registration_success  # noqa: E402
from dh3d_tpu.utils.transforms import to_homogeneous  # noqa: E402


def load_kp_file(path, desc_dim=128):
    rows = load_descriptor_bin(path, dim=3 + desc_dim + 1)
    return rows[:, :3], rows[:, 3:3 + desc_dim]


def run_pair(fa, fb, T_gt=None, iters=1000, seed=0):
    kp1, d1 = load_kp_file(fa)
    kp2, d2 = load_kp_file(fb)
    res = register_clouds(kp1, d1, kp2, d2, iters=iters, seed=seed)
    if res is None:
        return None, None
    if T_gt is None:
        return res, None
    ok, rte, rre = registration_success(res.R, res.t, T_gt[:3, :3],
                                        T_gt[:3, 3])
    return res, (ok, rte, rre)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", help="file with lines: fileA fileB [gt_T.txt]")
    p.add_argument("--self_test", help="single _nms_res.bin for a sanity run")
    p.add_argument("--iters", type=int, default=1000)
    args = p.parse_args()

    if args.self_test:
        kp, desc = load_kp_file(args.self_test)
        rng = np.random.RandomState(0)
        ang = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(ang), np.sin(ang)
        R_gt = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        t_gt = rng.uniform(-5, 5, 3)
        # kp2 = inverse-transformed keypoints, so kp = kp2 @ R_gt.T + t_gt
        # and the estimator must recover exactly (R_gt, t_gt)
        kp2 = (kp - t_gt) @ R_gt
        from dh3d_tpu.eval import ransac_rigid, match_descriptors_mutual

        matches = match_descriptors_mutual(desc, desc)
        res = ransac_rigid(kp[matches[:, 0]], kp2[matches[:, 1]],
                           iters=args.iters)
        ok, rte, rre = registration_success(res.R, res.t, R_gt, t_gt)
        print(f"self-test: success={ok} RTE={rte:.4f}m RRE={rre:.4f}deg "
              f"inliers={res.num_inliers}/{res.num_matches}")
        return

    assert args.pairs, "need --pairs or --self_test"
    n_ok = n_scored = n_total = 0
    rtes, rres = [], []
    with open(args.pairs) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            n_total += 1
            T_gt = np.loadtxt(parts[2]) if len(parts) > 2 else None
            res, score = run_pair(parts[0], parts[1], T_gt,
                                  iters=args.iters)
            if res is None:
                print(f"{parts[0]} {parts[1]}: FAILED (too few matches)")
                continue
            if score is not None:
                ok, rte, rre = score
                n_scored += 1
                n_ok += int(ok)
                rtes.append(rte)
                rres.append(rre)
                print(f"{os.path.basename(parts[0])} vs "
                      f"{os.path.basename(parts[1])}: success={ok} "
                      f"RTE={rte:.3f} RRE={rre:.3f} "
                      f"inliers={res.num_inliers}/{res.num_matches}")
            else:
                print(f"{os.path.basename(parts[0])} vs "
                      f"{os.path.basename(parts[1])}: "
                      f"T=\n{to_homogeneous(res.R, res.t)}")
    if n_scored:
        print(f"\nsuccess rate: {n_ok}/{n_scored} = {n_ok / n_scored:.4f}; "
              f"mean RTE {np.mean(rtes):.3f} m; mean RRE "
              f"{np.mean(rres):.3f} deg")


if __name__ == "__main__":
    main()
