"""TPU kernel-lowering gate: compile (and run) EVERY production Pallas
config at model shapes on the real TPU backend.

Why this exists: the CPU test suite runs Pallas in interpret mode, so a
kernel that trips a Mosaic lowering hole (e.g. round-4's uint32 `jnp.min`,
which Mosaic cannot lower) passes every test and still crashes the model
on hardware.  The reference's op tests always ran the real GPU kernels
(`user_ops/test_flex_convolution.py:42-50`); this script is the TPU
equivalent — a MANDATORY pre-snapshot step (see .claude/skills/verify).

Covers, at production shapes ([20, 8192] clouds, tile 256 / window 512):
  - knn: packed self-kNN k=8/k=16, exact, cross 3-NN, slab (k>=32),
    big-N (16384, VMEM tile-shrink path), banded packed+exact
  - fps_pallas, morton_perm
  - banded weighted-sum / max / flex-moments: plain + planned (slot-
    compacted exact correction), forward AND backward, fast=True/False,
    bwd_lo True/False
  - the flagship `entry()` forward jit
  - the full production train step (detection_config, morton presorted,
    device pairgen) fwd+bwd compile — the exact composition training runs

Usage:  python scripts/lowering_check.py [--quick]
  --quick skips the two model-level compiles (~2-4 min) and keeps only
  the op-level matrix (~1-2 min).  Exit code 0 = all pass.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="op-level matrix only (skip model/train compiles)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    plat = jax.devices()[0].platform
    if plat == "cpu":
        print("lowering_check: REFUSING to run on the CPU backend — "
              "interpret/XLA fallbacks hide Mosaic lowering failures. "
              "Run with the TPU (axon) backend.", file=sys.stderr)
        return 2
    print(f"lowering_check on backend: {plat} ({jax.devices()[0]})")

    from dh3d_tpu.ops.pallas.banded_pallas import (
        banded_max,
        banded_max_planned,
        banded_weighted_sum,
        banded_weighted_sum_planned,
        flex_moments_banded_fast,
        flex_moments_banded_planned,
        morton_perm,
        oob_plan,
    )
    from dh3d_tpu.ops.pallas.fps_pallas import fps_pallas
    from dh3d_tpu.ops.pallas.knn_pallas import knn_banded, knn_pallas

    B, N, K, C, P = 20, 8192, 8, 64, 4
    rs = np.random.RandomState(0)
    pts = jnp.asarray(rs.randn(B, N, 3).astype(np.float32) * 30.0)
    # Morton-sort so banded nbh statistics match production clouds
    perm, _ = morton_perm(pts)
    pts = jnp.take_along_axis(pts, perm[..., None], axis=1)
    feat = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
    w = jnp.asarray(rs.randn(B, N, K, P).astype(np.float32))

    def consume(out):
        """Force execution with ONE scalar readback (block_until_ready
        does not synchronize on the axon tunnel — verify skill)."""
        leaves = jax.tree_util.tree_leaves(out)
        total = sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves)
        v = float(total)
        assert np.isfinite(v), f"non-finite check output: {v}"

    failures = []
    checks = []

    def check(name, fn):
        checks.append((name, fn))

    # --- kNN matrix -------------------------------------------------------
    check("knn packed self k=8 [20,8192]",
          lambda: knn_pallas(pts, pts, 8, packed=True, self_query=True))
    check("knn packed self k=16 [20,8192]",
          lambda: knn_pallas(pts, pts, 16, packed=True, self_query=True))
    check("knn exact k=8 [20,8192]",
          lambda: knn_pallas(pts, pts, 8, packed=False))
    check("knn cross 3-NN [20,8192]<-[20,1024]",
          lambda: knn_pallas(pts, pts[:, :1024], 3))
    check("knn slab k=40 [20,8192]",
          lambda: knn_pallas(pts, pts, 40))
    pts16 = jnp.concatenate([pts, pts + 0.01], axis=1)[:4]
    check("knn packed self k=8 [4,16384] (tile-shrink)",
          lambda: knn_pallas(pts16, pts16, 8, packed=True, self_query=True))
    check("knn banded packed k=8 W=512",
          lambda: knn_banded(pts, pts, 8, window=512, packed=True))
    check("knn banded exact k=8 W=512",
          lambda: knn_banded(pts, pts, 8, window=512, packed=False))

    # --- sampling / ordering ---------------------------------------------
    check("fps [20,8192]->1024", lambda: fps_pallas(pts, 1024))
    check("morton_perm [20,8192]", lambda: morton_perm(pts))

    # production neighborhood: banded knn indices (in-band by construction)
    nbh, _ = knn_pallas(pts, pts, K, packed=True, self_query=True)
    plan = oob_plan(nbh, N, 256, 512)
    pos0 = jnp.take_along_axis(pts, nbh[..., :1], axis=1)

    # --- banded plain fwd+bwd --------------------------------------------
    for fast in (True, False):
        check(f"banded_weighted_sum fwd fast={fast}",
              lambda fast=fast: banded_weighted_sum(feat, nbh, w, fast=fast))
        check(f"banded_weighted_sum bwd fast={fast}",
              lambda fast=fast: jax.grad(
                  lambda f: banded_weighted_sum(f, nbh, w, fast=fast).sum()
              )(feat))
        check(f"banded_max fwd fast={fast}",
              lambda fast=fast: banded_max(feat, nbh, fast=fast))
        check(f"banded_max bwd fast={fast}",
              lambda fast=fast: jax.grad(
                  lambda f: banded_max(f, nbh, fast=fast)[0].sum()
              )(feat))
    for bwd_lo in (True, False):
        check(f"flex_moments fwd+bwd bwd_lo={bwd_lo}",
              lambda bwd_lo=bwd_lo: jax.value_and_grad(
                  lambda f: flex_moments_banded_fast(
                      f, pts, pos0, nbh, bwd_lo=bwd_lo).sum()
              )(feat))

    # --- planned (exact slot-compacted) fwd+bwd ---------------------------
    for fast in (True, False):
        check(f"banded_weighted_sum_planned fwd+bwd fast={fast}",
              lambda fast=fast: jax.value_and_grad(
                  lambda f: banded_weighted_sum_planned(
                      f, nbh, w, plan, fast=fast).sum()
              )(feat))
        check(f"banded_max_planned fwd+bwd fast={fast}",
              lambda fast=fast: jax.value_and_grad(
                  lambda f: banded_max_planned(f, nbh, plan,
                                               fast=fast)[0].sum()
              )(feat))
    for bwd_lo in (True, False):
        check(f"flex_moments_planned fwd+bwd bwd_lo={bwd_lo}",
              lambda bwd_lo=bwd_lo: jax.value_and_grad(
                  lambda f: flex_moments_banded_planned(
                      f, pts, pos0, nbh, plan, bwd_lo=bwd_lo).sum()
              )(feat))

    # --- model-level -------------------------------------------------------
    if not args.quick:
        def model_fwd():
            from __graft_entry__ import entry
            fn, eargs = entry()
            return jax.jit(fn)(*eargs)
        check("entry() forward (global_config, morton exact)", model_fwd)

        def train_compile():
            from dh3d_tpu import config as cfglib
            from dh3d_tpu import train as trainlib
            from dh3d_tpu.data.io import morton_sort_np

            cfg = cfglib.get_config("detection_config")
            cfg.num_points = N
            cfg.batch_size = 10
            cfg.morton_order = True
            cfg.morton_presorted = True
            cfg.device_pairgen = True
            pc = rs.randn(10, N, 3).astype(np.float32) * 30.0
            batch = {
                "pc1": jnp.asarray(morton_sort_np(pc)),
                "pc2": jnp.asarray(morton_sort_np(pc + 0.01)),
                "pairgen_key": jax.random.PRNGKey(7),
            }
            state = trainlib.init_state(cfg, jax.random.PRNGKey(0), batch)
            step = trainlib.make_train_step(cfg)
            # .lower().compile() is the gate: Mosaic errors are compile-time
            step.lower(state, batch).compile()
            return jnp.zeros(())
        check("train step compile (detection_config, morton presorted)",
              train_compile)

    for name, fn in checks:
        t0 = time.time()
        try:
            consume(fn())
            print(f"  PASS  {name}  ({time.time() - t0:.1f}s)")
        except Exception as e:
            print(f"  FAIL  {name}: {type(e).__name__}: {str(e)[:300]}")
            traceback.print_exc(limit=3)
            failures.append(name)

    print(f"\nlowering_check: {len(checks) - len(failures)}/{len(checks)} "
          f"passed" + (f"; FAILED: {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
