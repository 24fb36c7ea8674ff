"""Build the /tmp/demo_train workspace from the reference demo data.

The reference ships only 100 demo clouds + retrieval GT pickles
(`evaluate/global_eval/demo_data/`, SURVEY.md §2.2 "Demo data"); the full
Oxford training set is not available.  This script turns the demo set into
a usable training/benchmark workspace:

  /tmp/demo_train/<seq>/<i>.bin        symlinks to the demo clouds
  /tmp/demo_train/local_train.pickle   {i: {"query": relpath}} for the
                                       local self-pair sampler
  /tmp/demo_train/global_train.pickle  {i: {"query", "positives",
                                       "nonnegtives", northing, easting}}
                                       with the PointNetVLAD conventions
                                       (positives < 10 m UTM, non-negatives
                                       < 50 m; cf. reference retrieval GT
                                       UTM < 25 m, `evaluation_retrieval.py:29-34`)

bench.py uses the clouds (if present) so the Morton fast path is measured
on real Oxford geometry; train.py/evaluate use the pickles.

Usage: python scripts/make_demo_train.py [--out /tmp/demo_train]
"""

import argparse
import os
import pickle

import numpy as np

REF = "/root/reference/evaluate/global_eval/demo_data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/demo_train")
    ap.add_argument("--pos_r", type=float, default=10.0)
    ap.add_argument("--nonneg_r", type=float, default=50.0)
    args = ap.parse_args()

    entries = []  # (relpath, northing, easting)
    for pkl in ("global_ref_demo.pickle", "global_query_demo.pickle"):
        with open(os.path.join(REF, pkl), "rb") as f:
            d = pickle.load(f)
        for seq, items in d.items():
            for it in items:
                entries.append(
                    (it["query"], float(it["northing"]), float(it["easting"]))
                )

    os.makedirs(args.out, exist_ok=True)
    for rel, _, _ in entries:
        src = os.path.join(REF, rel + ".bin")
        dst = os.path.join(args.out, rel + ".bin")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if not os.path.lexists(dst):
            os.symlink(src, dst)

    local = {i: {"query": rel} for i, (rel, _, _) in enumerate(entries)}
    # both names: the short one for humans, the oxford_* one train.py opens
    for name in ("local_train.pickle", "oxford_train_local_gt.pickle"):
        with open(os.path.join(args.out, name), "wb") as f:
            pickle.dump(local, f)

    xy = np.array([(n, e) for _, n, e in entries])
    d = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
    gt = {}
    usable = 0
    for i, (rel, n, e) in enumerate(entries):
        pos = [j for j in np.argsort(d[i]) if j != i and d[i, j] < args.pos_r]
        nonneg = [j for j in range(len(entries))
                  if j != i and d[i, j] < args.nonneg_r]
        gt[i] = {"query": rel, "positives": [int(j) for j in pos],
                 "nonnegtives": [int(j) for j in nonneg],
                 "northing": n, "easting": e}
        usable += len(pos) >= 2
    for name in ("global_train.pickle", "oxford_train_global_gt.pickle"):
        with open(os.path.join(args.out, name), "wb") as f:
            pickle.dump(gt, f)

    print(f"{args.out}: {len(entries)} clouds linked; "
          f"{usable} queries with >=2 positives "
          f"(pos<{args.pos_r} m, nonneg<{args.nonneg_r} m)")


if __name__ == "__main__":
    main()
