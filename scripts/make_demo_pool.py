"""Build an augmentation-expanded training pool from the demo clouds.

The reference ships only 100 demo submaps (SURVEY.md §2.2 "Demo data") —
far too few for a multi-thousand-step stage-3 run (RESULTS.md r2: the
quadruplet loss oscillates past ~100 steps on 21 usable queries).  This
script expands them into a pool of several hundred clouds by generating
partial-overlap crops of every source cloud, the same style of variation
the real Oxford set has between traversals (and the same generation idea
as `eval/repeatability.make_partial_overlap_pairs`):

  for each source cloud (UTM position known from the demo pickles):
    V variants = crop to a ball of radius ~ f * half-extent around a
    randomly shifted center (f ~ U[0.72, 0.92], |shift_xy| <= shift_m)

Each variant inherits `source UTM + crop shift` as its position, so the
global GT (positives < pos_r, non-negatives < nonneg_r by UTM distance)
is POOL-AWARE by construction: crops of the same place land within
pos_r/nonneg_r of each other and can never be drawn as negatives, while
per-epoch loader augmentation (Rotate1D/Jitter/RotateSmall,
`core/augment.py:7-32`) provides the viewpoint variation.

Outputs (default --out /tmp/demo_pool):
  <out>/<seq>/<i>_v<k>.bin               float32 xyz crops
  <out>/oxford_train_local_gt.pickle     {i: {"query": relpath}} over ALL
                                         variants (local self-pair sampler)
  <out>/oxford_train_global_gt.pickle    {i: {"query", "positives",
                                         "nonnegtives", northing, easting}}

Usage: python scripts/make_demo_pool.py [--variants 8] [--out /tmp/demo_pool]
"""

import argparse
import os
import pickle

import numpy as np

REF = "/root/reference/evaluate/global_eval/demo_data"


def crop_variant(cloud, rng, shift_m, keep_min=0.55):
    """Ball crop around a shifted center; retries until enough points
    survive (mirrors the spirit of `core/utils.py:113-118` center_crop)."""
    centroid = cloud.mean(axis=0)
    half = 0.5 * float(np.max(cloud.max(0)[:2] - cloud.min(0)[:2]))
    for _ in range(8):
        shift = np.array([rng.uniform(-shift_m, shift_m),
                          rng.uniform(-shift_m, shift_m), 0.0])
        rad = rng.uniform(0.72, 0.92) * half
        d2 = np.sum((cloud[:, :2] - (centroid + shift)[:2]) ** 2, axis=1)
        mask = d2 <= rad * rad
        if mask.mean() >= keep_min:
            return cloud[mask], shift[:2]
    return cloud, np.zeros(2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/demo_pool")
    ap.add_argument("--variants", type=int, default=8)
    ap.add_argument("--shift_m", type=float, default=5.0)
    ap.add_argument("--pos_r", type=float, default=12.0)
    ap.add_argument("--nonneg_r", type=float, default=50.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)

    sources = []  # (relpath, northing, easting)
    for pkl in ("global_ref_demo.pickle", "global_query_demo.pickle"):
        with open(os.path.join(REF, pkl), "rb") as f:
            d = pickle.load(f)
        for seq, items in d.items():
            for it in items:
                sources.append((it["query"], float(it["northing"]),
                                float(it["easting"])))

    entries = []  # (relpath, src_id, northing, easting)
    for sid, (rel, n, e) in enumerate(sources):
        pc = np.fromfile(os.path.join(REF, rel + ".bin"), np.float32)
        pc = pc.reshape(-1, 3)
        for v in range(args.variants):
            if v == 0:
                crop, shift = pc, np.zeros(2)  # keep the original view
            else:
                crop, shift = crop_variant(pc, rng, args.shift_m)
            out_rel = f"{rel}_v{v}"
            dst = os.path.join(args.out, out_rel + ".bin")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            crop.astype(np.float32).tofile(dst)
            entries.append((out_rel, sid, n + shift[0], e + shift[1]))

    local = {i: {"query": rel} for i, (rel, _, _, _) in enumerate(entries)}
    with open(os.path.join(args.out, "oxford_train_local_gt.pickle"),
              "wb") as f:
        pickle.dump(local, f)

    xy = np.array([(n, e) for _, _, n, e in entries])
    src = np.array([s for _, s, _, _ in entries])
    d = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
    gt = {}
    usable = 0
    for i, (rel, sid, n, e) in enumerate(entries):
        same = src == sid
        pos_mask = (same | (d[i] < args.pos_r))
        pos_mask[i] = False
        nonneg_mask = (same | (d[i] < args.nonneg_r))
        nonneg_mask[i] = False
        order = np.argsort(d[i])
        pos = [int(j) for j in order if pos_mask[j]]
        gt[i] = {"query": rel, "positives": pos,
                 "nonnegtives": [int(j) for j in np.where(nonneg_mask)[0]],
                 "northing": n, "easting": e}
        usable += len(pos) >= 2
    with open(os.path.join(args.out, "oxford_train_global_gt.pickle"),
              "wb") as f:
        pickle.dump(gt, f)

    pts = [np.fromfile(os.path.join(args.out, r + ".bin"),
                       np.float32).size // 3 for r, _, _, _ in entries[:200]]
    print(f"{args.out}: {len(entries)} clouds from {len(sources)} sources; "
          f"{usable} queries with >=2 positives; "
          f"points/cloud p10={int(np.percentile(pts, 10))} "
          f"median={int(np.median(pts))}")


if __name__ == "__main__":
    main()
