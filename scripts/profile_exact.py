"""Per-op profile of the exact-Morton path at model shapes (real TPU).

Times, for each neighborhood level the model runs (stage1/initconv at
N=8192, stage2 at N=1024, 3-NN interpolation 1024->8192), the approximate
banded op vs the planned exact op, plus a decomposition of the planned
op's pieces (plan build, weight/feature gathers, contribution build, slot
delivery).  Indices are the model's real ones: exact kNN on Morton-sorted
demo clouds.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_exact.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench
from dh3d_tpu import ops
from dh3d_tpu.data.io import morton_sort_np
from dh3d_tpu.ops.pallas import banded_pallas as bp

B, N, K = 20, 8192, 8


def chain(fn, iters=20):
    """fn(salt) -> scalar; returns steady-state ms."""
    f = jax.jit(fn)
    s = f(jnp.float32(0))
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = f(s)
    float(s)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(morton_sort_np(np.asarray(bench._bench_clouds(B, N))))
    # model-path indices: exact knn at full res, FPS + exact knn at N/8
    knn_full, _ = ops.knn_bruteforce(pts, K, mode="fast")
    sub, _, _ = ops.subsample(pts, pts, N // 8, sorted_order=True)
    knn_sub, _ = ops.knn_bruteforce(sub, K, mode="fast")
    dist3, idx3 = ops.three_nn(pts, sub)
    w3 = ops.inverse_distance_weights(dist3)
    knn_full, knn_sub, idx3 = (jnp.asarray(x) for x in
                               (knn_full, knn_sub, idx3))

    plan_full = bp.oob_plan(knn_full, N, 256, 512)
    plan_sub = bp.oob_plan(knn_sub, N // 8, 256, 256)
    plan_i = bp.oob_plan(idx3, N // 8, 256, 256)
    for nm, p in (("full", plan_full), ("sub", plan_sub), ("interp", plan_i)):
        print(f"plan[{nm}]: cap={p.e.shape[1]} we={p.we} "
              f"overflow={int(jnp.max(p.overflow))}")

    levels = [
        ("L0 N=8192 C=64 P=4", pts, knn_full, plan_full, 64, 4, 512),
        ("S2 N=1024 C=128 P=4", sub, knn_sub, plan_sub, 128, 4, 256),
        ("interp 1024->8192 C=128 P=1", sub, idx3, plan_i, 128, 1, 256),
    ]

    t = chain(lambda s: ops.knn_bruteforce(pts + s * 1e-12, K,
              mode="fast")[0][0, 0, 0].astype(jnp.float32))
    print(f"exact knn [20,8192] k=8: {t:.2f} ms")
    t = chain(lambda s: bp.oob_plan(
        jnp.minimum(knn_full + s.astype(jnp.int32) * 0, N - 1),
        N, 256, 512).overflow[0].astype(jnp.float32))
    print(f"oob_plan build (full level): {t:.2f} ms")

    for name, xyz, nbh, plan, C, P, W in levels:
        M = xyz.shape[1]
        NQ, KL = nbh.shape[1], nbh.shape[2]
        feats = jnp.asarray(rng.randn(B, M, C).astype(np.float32))
        wts = jnp.asarray(rng.rand(B, NQ, KL, P).astype(np.float32))

        def approx(s):
            out = bp.banded_weighted_sum(feats + s * 1e-12, nbh, wts,
                                         tile=256, window=W,
                                         assume_inband=True)
            return out[0, 0, 0]

        def planned(s):
            out = bp.banded_weighted_sum_planned(feats + s * 1e-12, nbh,
                                                 wts, plan, tile=256,
                                                 window=W, we=plan.we)
            return out[0, 0, 0]

        ta = chain(approx)
        tp = chain(planned)

        # decomposition (forward pieces)
        def piece_gathers(s):
            w_e = bp._plan_gather_weights(wts + s * 1e-12, plan)
            fc = jnp.take_along_axis(feats.astype(jnp.float32),
                                     plan.src[..., None], axis=1)
            return w_e[0, 0, 0] + fc[0, 0, 0]

        def piece_contrib(s):
            w_e = bp._plan_gather_weights(wts + s * 1e-12, plan)
            fc = jnp.take_along_axis(feats.astype(jnp.float32),
                                     plan.src[..., None], axis=1)
            contrib = (w_e[..., :, None] * fc[..., None, :]).reshape(
                B, -1, P * C)
            return contrib[0, 0, 0]

        def piece_deliver(s):
            w_e = bp._plan_gather_weights(wts + s * 1e-12, plan)
            fc = jnp.take_along_axis(feats.astype(jnp.float32),
                                     plan.src[..., None], axis=1)
            contrib = (w_e[..., :, None] * fc[..., None, :]).reshape(
                B, -1, P * C)
            out = bp._slot_deliver(contrib, plan.qrow, plan.win_start,
                                   256, plan.we, NQ, True, False)
            return out[0, 0, 0]

        tg = chain(piece_gathers)
        tc = chain(piece_contrib)
        td = chain(piece_deliver)
        print(f"{name}: approx {ta:.2f} planned {tp:.2f} "
              f"(premium {tp - ta:.2f}) | gathers {tg:.2f} "
              f"+contrib {tc:.2f} +deliver {td:.2f}")

        # max op (SE pool path) on the full level only
        if P == 4 and M == N:
            def approx_max(s):
                out, _ = bp.banded_max(feats + s * 1e-12, nbh, tile=256,
                                       window=W, assume_inband=True)
                return out[0, 0, 0]

            def planned_max(s):
                out, _ = bp.banded_max_planned(feats + s * 1e-12, nbh,
                                               plan, tile=256, window=W,
                                               we=plan.we)
                return out[0, 0, 0]

            tam = chain(approx_max)
            tpm = chain(planned_max)
            print(f"{name} MAX: approx {tam:.2f} planned {tpm:.2f} "
                  f"(premium {tpm - tam:.2f})")


if __name__ == "__main__":
    main()
