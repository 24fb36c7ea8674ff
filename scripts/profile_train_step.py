"""Decompose the exact-Morton train step's cost at bench shapes (real TPU).

The round-4 verdict target is >=300-350 clouds/s for the full detection-
config train step at [20, 8192] (fwd + bwd + Adam, exact semantics);
chip-measured r4 baseline was ~137 presorted.  This script times, with
the same chained-readback method bench.py uses:

  1. the shipped step (morton exact, presorted) and knob variants
     (fast_grads, remat, cap=full plans),
  2. the same graph fwd-only (loss value, no grad, no Adam),
  3. plan construction alone in train context (all three levels),
  4. the detection loss chain alone (fwd+bwd) on model-shaped inputs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train_step.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from dh3d_tpu import config as cfglib
from dh3d_tpu import train as trainlib

B, N, KP = 10, 8192, 512


def make_batch(presorted=True):
    rng = np.random.RandomState(0)
    pc1 = rng.randn(B, N, 3).astype(np.float32) * 20
    if presorted:
        from dh3d_tpu.data.io import morton_sort_np

        pc1 = morton_sort_np(pc1)
    ang = rng.uniform(-np.pi, np.pi, B)
    R = np.stack([
        np.array([[np.cos(a), np.sin(a), 0],
                  [-np.sin(a), np.cos(a), 0],
                  [0, 0, 1]], np.float32) for a in ang
    ])
    pc2 = np.einsum("bnd,bde->bne", pc1, R).astype(np.float32)
    anc = np.stack([rng.choice(N, KP, replace=False) for _ in range(B)])
    return {
        "points": jnp.asarray(np.concatenate([pc1, pc2])),
        "sample_inds": jnp.asarray(
            np.concatenate([anc, anc]).astype(np.int32)),
        "R": jnp.asarray(R),
    }


def base_cfg(**kw):
    cfg = cfglib.get_config("detection_config")
    cfg.num_points = N
    cfg.sampled_kpnum = KP
    cfg.batch_size = B
    cfg.morton_order = True
    cfg.morton_presorted = True
    for k, v in kw.items():
        cfg[k] = v
    return cfg


def time_step(cfg, batch, iters=10, label=""):
    state = trainlib.init_state(cfg, jax.random.PRNGKey(0), batch)
    step = trainlib.make_train_step(cfg)

    @jax.jit
    def one(carry, batch):
        salt, st = carry
        b = dict(batch)
        b["points"] = batch["points"] + salt * 1e-12
        st, metrics = step(st, b)
        return (metrics["total_cost"], st)

    t0 = time.perf_counter()
    carry = one((jnp.float32(0), state), batch)
    float(carry[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = one(carry, batch)
    val = float(carry[0])
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(val), label
    print(f"{label:<44s} {dt * 1e3:7.1f} ms  {2 * B / dt:6.1f} clouds/s"
          f"  (compile {compile_s:.0f}s)", flush=True)
    return dt


def time_fwd_loss(cfg, batch, iters=10, label="fwd-only loss"):
    """Same loss graph, no grad/Adam — isolates the backward's share."""
    from dh3d_tpu.train.trainer import loss_and_updates
    from dh3d_tpu.nn import DH3D

    model = DH3D(cfg)
    state = trainlib.init_state(cfg, jax.random.PRNGKey(0), batch)

    @jax.jit
    def one(salt, params, bs, batch):
        b = dict(batch)
        b["points"] = batch["points"] + salt * 1e-12
        total, _ = loss_and_updates(params, bs, b, cfg, model)
        return total

    s = one(jnp.float32(0), state.params, state.batch_stats, batch)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = one(s, state.params, state.batch_stats, batch)
    float(s)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:<44s} {dt * 1e3:7.1f} ms  {2 * B / dt:6.1f} clouds/s",
          flush=True)
    return dt


def time_plans(batch, iters=10):
    """All three levels' plan construction, fwd list + transpose ordering
    alive (as in the train step)."""
    from dh3d_tpu import ops
    from dh3d_tpu.ops.pallas import banded_pallas as bp

    @jax.jit
    def plans(salt, points):
        pts = points + salt * 1e-12
        knn_full, _ = ops.knn_bruteforce(pts, 8, mode="fast")
        sub, _, _ = ops.subsample(pts, pts, N // 8, sorted_order=True)
        knn_sub, _ = ops.knn_bruteforce(sub, 8, mode="fast")
        _, idx3 = ops.three_nn(pts, sub)
        p0 = bp.oob_plan(knn_full, N, 256, 512)
        p1 = bp.oob_plan(knn_sub, N // 8, 256, 256)
        p2 = bp.oob_plan(idx3, N // 8, 256, 256)
        # keep fwd + transpose orderings alive like the grad graph does
        s = jnp.float32(0)
        for p in (p0, p1, p2):
            s = s + jnp.sum(p.win_start[:, 0] + p.win_start2[:, 0]
                            + p.perm12[:, 0] + p.overflow)
        return s.astype(jnp.float32)

    pts = batch["points"]
    s = plans(jnp.float32(0), pts)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = plans(s * 1e-20, pts)
    float(s)
    dt = (time.perf_counter() - t0) / iters
    print(f"{'knn+fps+3nn+3 plans (fwd+transpose)':<44s} {dt * 1e3:7.1f} ms",
          flush=True)
    return dt


def time_det_loss(cfg, batch, iters=10):
    """Detection + local-desc loss chain fwd+bwd on model-shaped inputs
    (losses only, params-free: grads w.r.t. the descriptor inputs)."""
    from dh3d_tpu.losses import compute_total_loss

    rng = np.random.RandomState(1)
    Bt = 2 * B
    outs = {
        "xyz": batch["points"],
        "feat": jnp.asarray(rng.randn(Bt, N, 128).astype(np.float32)),
        "xyz_sampled": jnp.asarray(
            rng.randn(Bt, KP, 3).astype(np.float32) * 20),
        "feat_sampled": jnp.asarray(
            rng.randn(Bt, KP, 128).astype(np.float32)),
        "att_sampled": jnp.asarray(
            rng.rand(Bt, KP).astype(np.float32)),
        "sample_nodes_concat": batch["sample_inds"],
        "R": batch["R"],
    }

    def loss_fn(feat, feat_sampled, o):
        o = dict(o)
        o["feat"] = feat
        o["feat_sampled"] = feat_sampled
        total, _ = compute_total_loss(o, cfg, jnp.float32(0))
        return total

    @jax.jit
    def one(salt, o):
        g0, g1 = jax.grad(loss_fn, argnums=(0, 1))(
            o["feat"] + salt * 1e-12, o["feat_sampled"], o)
        return jnp.sum(g0[:, 0, 0]) + jnp.sum(g1[:, 0, 0])
    s = one(jnp.float32(0), outs)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = one(s * 1e-20, outs)
    float(s)
    dt = (time.perf_counter() - t0) / iters
    print(f"{'loss chain fwd+bwd (desc+det)':<44s} {dt * 1e3:7.1f} ms",
          flush=True)
    return dt


def main():
    batch = make_batch()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "plans"):
        time_plans(batch)
    if which in ("all", "loss"):
        time_det_loss(base_cfg(), batch)
    if which in ("all", "fwd"):
        time_fwd_loss(base_cfg(), batch)
    if which in ("all", "step"):
        time_step(base_cfg(), batch, label="shipped (morton exact, presorted)")
    if which in ("all", "fast"):
        time_step(base_cfg(fast_grads=True), batch,
                  label="+ fast_grads (bf16 moments bwd)")
    if which in ("remat",):
        time_step(base_cfg(remat=True), batch, label="+ remat backbone")


if __name__ == "__main__":
    main()
