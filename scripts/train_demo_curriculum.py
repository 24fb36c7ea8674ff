"""Reproducible 3-stage demo curriculum (fidelity-gate training).

Runs the reference's training curriculum (`README.md:106-118`: local ->
local+detector -> global with frozen backbone) end-to-end on the
augmentation-expanded demo pool (`scripts/make_demo_pool.py`), with fixed
seeds, the production fast path (morton_order + morton_presorted +
device_pairgen + prefetch), and a linear LR warmup on stage 3 (the
stage-3 stabilizer; see dh3d_tpu/train/trainer.py:lr_schedule).

Per seed:
  stage 1  basic_config      2000 steps  (local descriptor loss)
  stage 2  detection_config  2000 steps  (+ detector loss, warm start s1)
  stage 3  global_config     1500 steps  (NetVLAD, backbone frozen,
                                          warm start s2, warmup 300)

Artifacts land in <out>/seed<k>/stage{1,2,3}/ (config.json, metrics.jsonl,
ckpt/step_*).  After training, package the gate checkpoint with
`scripts/package_checkpoint.py`.

Usage:
  python scripts/train_demo_curriculum.py --pool /tmp/demo_pool \
      --out /tmp/curriculum --seeds 0 1 2
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_ckpt(logdir):
    ckdir = os.path.join(logdir, "ckpt")
    steps = sorted(os.listdir(ckdir)) if os.path.isdir(ckdir) else []
    assert steps, f"no checkpoint under {ckdir}"
    return os.path.join(ckdir, steps[-1])


def run_stage(cfg, logdir, steps, seed, pool, extra):
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--cfg", cfg, "--logdir", logdir, "--steps", str(steps),
        "--seed", str(seed), "--data_basedir", pool,
        "--set", "morton_order=true",
    ] + extra
    print("::", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default="/tmp/demo_pool")
    ap.add_argument("--out", default="/tmp/curriculum")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0])
    ap.add_argument("--steps", type=int, nargs=3, default=[2000, 2000, 1500],
                    metavar=("S1", "S2", "S3"))
    args = ap.parse_args()

    for seed in args.seeds:
        base = os.path.join(args.out, f"seed{seed}")
        s1 = os.path.join(base, "stage1")
        s2 = os.path.join(base, "stage2")
        s3 = os.path.join(base, "stage3")

        # stages 1-2: local self-pair training on the fast path — loader
        # Z-order-sorts the raw copies (prefetch-hidden), pairgen runs
        # inside the jitted step
        local_extra = ["--device_pairgen",
                       "--set", "morton_presorted=true"]
        if not os.path.isdir(s1):
            run_stage("basic_config", s1, args.steps[0], seed, args.pool,
                      local_extra)
        if not os.path.isdir(s2):
            run_stage("detection_config", s2, args.steps[1], seed,
                      args.pool,
                      local_extra + ["--load", latest_ckpt(s1)])
        if not os.path.isdir(s3):
            # stage 3: global triplet tuples come from the host loader
            # (presorted); warmup softens the freshly initialized NetVLAD
            # head's hinge gradients (the r2 oscillation fix)
            run_stage("global_config", s3, args.steps[2], seed, args.pool,
                      ["--set", "morton_presorted=true",
                       "--set", "warmup_steps=300",
                       "--load", latest_ckpt(s2)])
        print(f"seed {seed} done: {latest_ckpt(s3)}", flush=True)


if __name__ == "__main__":
    main()
