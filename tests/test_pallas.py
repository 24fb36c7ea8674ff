"""Pallas kernel tests.

On CPU the kernels run in interpreter mode.  On a TPU backend the REAL
Mosaic kernels run instead (INTERP=False below) — both because that is
the path production uses, and because the interpreter's internal jit
closes over the operands as constants, which this TPU backend misreads
(the alternate-memory pitfall documented in banded_pallas.py)."""

import jax
import jax.numpy as jnp
import numpy as np

INTERP = jax.default_backend() != "tpu"

import oracles
from dh3d_tpu.ops.pallas.knn_pallas import knn_pallas


def test_knn_pallas_matches_oracle(rng):
    pos = rng.randn(2, 64, 3).astype(np.float32) * 5
    idx, d2 = knn_pallas(jnp.asarray(pos), jnp.asarray(pos), 6,
                         interpret=INTERP)
    oidx, odist = oracles.knn_oracle(pos, 6)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), odist, atol=1e-4)


def test_knn_pallas_cross_cloud(rng):
    q = rng.randn(1, 16, 3).astype(np.float32)
    keys = rng.randn(1, 40, 3).astype(np.float32)
    idx, d2 = knn_pallas(jnp.asarray(q), jnp.asarray(keys), 3,
                         interpret=INTERP)
    d = np.sum((q[0][:, None] - keys[0][None]) ** 2, -1)
    order = np.argsort(d, axis=-1, kind="stable")[:, :3]
    np.testing.assert_array_equal(np.asarray(idx)[0], order)


def test_knn_pallas_unaligned_sizes(rng):
    """M and N not multiples of the tile/lane sizes -> padded path."""
    pos = rng.randn(1, 100, 3).astype(np.float32)
    idx, d2 = knn_pallas(jnp.asarray(pos), jnp.asarray(pos), 4,
                         interpret=INTERP)
    assert idx.shape == (1, 100, 4)
    oidx, _ = oracles.knn_oracle(pos, 4)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    # self at slot 0
    np.testing.assert_array_equal(np.asarray(idx)[0, :, 0], np.arange(100))


def test_fps_pallas_matches_xla(rng):
    from dh3d_tpu.ops.pallas.fps_pallas import fps_pallas
    from dh3d_tpu.ops.sampling import _fps_xla
    import jax.numpy as jnp

    pts = rng.randn(3, 128, 3).astype(np.float32) * 5
    pi = fps_pallas(jnp.asarray(pts), 32, interpret=INTERP)
    xi = _fps_xla(jnp.asarray(pts), 32)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))


# ---------------- banded weighted sum (gather-wall kernel) ----------------

def _bws_oracle(feat, nbh, w):
    """Dense numpy oracle of banded_weighted_sum's semantics."""
    B, N, K = nbh.shape
    P = w.shape[-1]
    f_k = np.stack([feat[b][nbh[b]] for b in range(B)])  # [B,N,K,C]
    return np.einsum("bnkp,bnkc->bnpc", w.astype(np.float64),
                     f_k.astype(np.float64)).reshape(B, N, -1)


def test_banded_weighted_sum_exact(rng):
    """Exact mode == dense oracle for arbitrary (non-banded) indices —
    the out-of-band correction must make the op exact regardless of
    index distribution."""
    from dh3d_tpu.ops.pallas.banded_pallas import banded_weighted_sum

    B, N, K, C, P = 2, 512, 8, 64, 4
    feat = rng.randn(B, N, C).astype(np.float32)
    nbh = rng.randint(0, N, (B, N, K)).astype(np.int32)
    w = rng.randn(B, N, K, P).astype(np.float32)
    out = np.asarray(banded_weighted_sum(
        jnp.asarray(feat), jnp.asarray(nbh), jnp.asarray(w),
        None, 128, 256, False, INTERP))
    ref = _bws_oracle(feat, nbh, w)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_banded_weighted_sum_cross_size(rng):
    """Queries != keys (the three_interpolate shape)."""
    from dh3d_tpu.ops.pallas.banded_pallas import banded_weighted_sum

    B, N, M, K, C, P = 2, 512, 128, 3, 32, 1
    feat = rng.randn(B, M, C).astype(np.float32)
    nbh = rng.randint(0, M, (B, N, K)).astype(np.int32)
    w = rng.rand(B, N, K, P).astype(np.float32)
    out = np.asarray(banded_weighted_sum(
        jnp.asarray(feat), jnp.asarray(nbh), jnp.asarray(w),
        None, 128, 64, False, INTERP))
    ref = _bws_oracle(feat, nbh, w)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_banded_weighted_sum_grad_features(rng):
    """VJP wrt features == dense-path VJP (transposed banded kernel +
    out-of-band correction)."""
    import jax

    from dh3d_tpu.ops.pallas.banded_pallas import banded_weighted_sum

    B, N, K, C, P = 1, 256, 4, 32, 2
    feat = rng.randn(B, N, C).astype(np.float32)
    # mix of banded and far indices
    off = (rng.randn(B, N, K) * 30).astype(np.int64)
    nbh = np.clip(np.arange(N)[None, :, None] + off, 0, N - 1)
    far = rng.rand(B, N, K) < 0.1
    nbh = np.where(far, rng.randint(0, N, nbh.shape), nbh).astype(np.int32)
    w = rng.randn(B, N, K, P).astype(np.float32)
    dm = rng.randn(B, N, P * C).astype(np.float32)

    # all operands as jit ARGUMENTS: this backend misreads jit-constant
    # kernel operands (banded_pallas pitfall note), and arg-passing is
    # the production calling convention anyway
    def f_banded(x, i, ww, d):
        return jnp.vdot(banded_weighted_sum(
            x, i, ww, None, 128, 128, False, INTERP), d)

    def f_dense(x, i, ww, d):
        f_k = jax.vmap(lambda v, ix: v[ix])(x, i)
        out = jnp.einsum("bnkp,bnkc->bnpc", ww, f_k,
                         precision="highest").reshape(B, N, P * C)
        return jnp.vdot(out, d)

    args = (jnp.asarray(feat), jnp.asarray(nbh), jnp.asarray(w),
            jnp.asarray(dm))
    g_banded = jax.jit(jax.grad(f_banded))(*args)
    g_dense = jax.jit(jax.grad(f_dense))(*args)
    np.testing.assert_allclose(np.asarray(g_banded), np.asarray(g_dense),
                               rtol=2e-4, atol=2e-4)


def test_morton_perm(rng):
    from dh3d_tpu.ops.pallas.banded_pallas import morton_perm

    pts = rng.randn(2, 128, 3).astype(np.float32) * 10
    perm, inv = morton_perm(jnp.asarray(pts))
    perm, inv = np.asarray(perm), np.asarray(inv)
    for b in range(2):
        assert sorted(perm[b]) == list(range(128))
        np.testing.assert_array_equal(perm[b][inv[b]], np.arange(128))
    # locality: mean 1-NN index distance after sort is much smaller than
    # before (the whole point of the ordering)
    from sklearn.neighbors import NearestNeighbors

    s = pts[0][perm[0]]
    _, nn_s = NearestNeighbors(n_neighbors=2).fit(s).kneighbors(s)
    _, nn_o = NearestNeighbors(n_neighbors=2).fit(pts[0]).kneighbors(pts[0])
    band_s = np.abs(nn_s[:, 1] - np.arange(128)).mean()
    band_o = np.abs(nn_o[:, 1] - np.arange(128)).mean()
    assert band_s < band_o / 2, (band_s, band_o)


def test_banded_max_matches_dense(rng):
    from dh3d_tpu.ops.pallas.banded_pallas import banded_max

    B, N, K, C = 2, 512, 8, 64
    feat = rng.randn(B, N, C).astype(np.float32)
    nbh = rng.randint(0, N, (B, N, K)).astype(np.int32)
    val, arg = banded_max(jnp.asarray(feat), jnp.asarray(nbh),
                          128, 256, False, INTERP)
    f_k = np.stack([feat[b][nbh[b]] for b in range(B)])
    ref_v = f_k.max(axis=2)
    ref_a = np.take_along_axis(
        nbh[..., None], f_k.argmax(axis=2)[:, :, None, :], axis=2)[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(val), ref_v, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(arg), ref_a)


def test_banded_max_grad(rng):
    import jax

    from dh3d_tpu.ops.pallas.banded_pallas import banded_max

    B, N, K, C = 1, 256, 4, 32
    feat = rng.randn(B, N, C).astype(np.float32)
    nbh = rng.randint(0, N, (B, N, K)).astype(np.int32)
    dv = rng.randn(B, N, C).astype(np.float32)

    def f_banded(x, i, d):
        v, _ = banded_max(x, i, 128, 128, False, INTERP)
        return jnp.vdot(v, d)

    def f_dense(x, i, d):
        f_k = jax.vmap(lambda v, ix: v[ix])(x, i)
        return jnp.vdot(jnp.max(f_k, axis=2), d)

    args = (jnp.asarray(feat), jnp.asarray(nbh), jnp.asarray(dv))
    g_b = jax.jit(jax.grad(f_banded))(*args)
    g_d = jax.jit(jax.grad(f_dense))(*args)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               rtol=1e-5, atol=1e-5)


def test_knn_banded_inband_and_near_exact(rng):
    """Banded knn on a Morton-sorted cloud: (a) every index lies inside
    the op-kernel window for its tile (the assume_inband contract), and
    (b) the vast majority of neighbors equal the exact knn."""
    from dh3d_tpu.ops.pallas.banded_pallas import _starts_host, morton_perm
    from dh3d_tpu.ops.pallas.knn_pallas import knn_banded, knn_pallas

    N, K, W, T = 1024, 8, 512, 256
    pts = rng.randn(1, N, 3).astype(np.float32) * 10
    perm, _ = morton_perm(jnp.asarray(pts))
    pts_s = np.take_along_axis(pts, np.asarray(perm)[..., None], axis=1)

    idx_b, d2_b = knn_banded(jnp.asarray(pts_s), jnp.asarray(pts_s), K,
                             window=W, tile_q=T, packed=False,
                             interpret=INTERP)
    idx_b = np.asarray(idx_b)

    starts = np.asarray(_starts_host(N, N, T, W))
    assert ((idx_b >= starts[None, :, None])
            & (idx_b < (starts + W)[None, :, None])).all(), \
        "banded knn produced out-of-window indices"
    # self at slot 0 (exact zero distance is always in band)
    np.testing.assert_array_equal(idx_b[0, :, 0], np.arange(N))

    idx_e, _ = knn_pallas(jnp.asarray(pts_s), jnp.asarray(pts_s), K,
                          interpret=INTERP)
    agree = (idx_b == np.asarray(idx_e)).mean()
    # gaussian clouds have far worse Morton locality than real scans
    # (real Oxford clouds measure ~96% in a 512 band, PERF_NOTES); even so
    # most neighbors must agree
    assert agree > 0.8, f"banded knn agreement {agree}"


def test_banded_weighted_sum_grad_windowed(rng):
    """Grad with WB < N (the bwd query-window slicing path — a previous
    bug read the full idx row when the window was narrower than N)."""
    import jax

    from dh3d_tpu.ops.pallas.banded_pallas import banded_weighted_sum

    B, N, K, C, P = 1, 512, 4, 32, 2   # WB = 128 + 2*128 = 384 < N
    feat = rng.randn(B, N, C).astype(np.float32)
    off = (rng.randn(B, N, K) * 20).astype(np.int64)
    nbh = np.clip(np.arange(N)[None, :, None] + off, 0, N - 1).astype(np.int32)
    w = rng.randn(B, N, K, P).astype(np.float32)
    dm = rng.randn(B, N, P * C).astype(np.float32)

    # operands as jit args (backend pitfall; see grad_features test)
    def f_banded(x, i, ww, d):
        return jnp.vdot(banded_weighted_sum(
            x, i, ww, None, 128, 128, False, INTERP), d)

    def f_dense(x, i, ww, d):
        f_k = jax.vmap(lambda v, ix: v[ix])(x, i)
        out = jnp.einsum("bnkp,bnkc->bnpc", ww, f_k,
                         precision="highest").reshape(B, N, P * C)
        return jnp.vdot(out, d)

    args = (jnp.asarray(feat), jnp.asarray(nbh), jnp.asarray(w),
            jnp.asarray(dm))
    g_b = jax.jit(jax.grad(f_banded))(*args)
    g_d = jax.jit(jax.grad(f_dense))(*args)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               rtol=2e-4, atol=2e-4)


def test_banded_max_grad_inband(rng):
    """assume_inband max VJP (slot-masked banded transpose) == dense VJP
    when all indices are in-band."""
    import jax

    from dh3d_tpu.ops.pallas.banded_pallas import (
        _starts_host,
        banded_max,
    )

    B, N, K, C, T, W = 1, 512, 4, 32, 128, 128
    feat = rng.randn(B, N, C).astype(np.float32)
    starts = np.asarray(_starts_host(N, N, T, W))
    # indices strictly inside each query's window
    nbh = (starts[None, :, None]
           + rng.randint(0, W, (B, N, K))).astype(np.int32)
    dv = rng.randn(B, N, C).astype(np.float32)

    # operands as jit args (backend pitfall; see grad_features test)
    def f_banded(x, i, d):
        v, _ = banded_max(x, i, T, W, False, INTERP, True)
        return jnp.vdot(v, d)

    def f_dense(x, i, d):
        f_k = jax.vmap(lambda v, ix: v[ix])(x, i)
        return jnp.vdot(jnp.max(f_k, axis=2), d)

    args = (jnp.asarray(feat), jnp.asarray(nbh), jnp.asarray(dv))
    g_b = jax.jit(jax.grad(f_banded))(*args)
    g_d = jax.jit(jax.grad(f_dense))(*args)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               rtol=1e-5, atol=1e-5)


def test_flex_moments_banded_fast(rng):
    """Specialized moments kernel == gather oracle on in-band indices
    (fwd all four moment planes + feature VJP)."""
    import jax

    from dh3d_tpu.ops.pallas.banded_pallas import (
        _starts_host,
        flex_moments_banded_fast,
    )

    B, N, K, C, T, W = 2, 512, 4, 32, 128, 128
    feat = rng.randn(B, N, C).astype(np.float32)
    pos = (rng.randn(B, N, 3) * 0.5 + 100.0).astype(np.float32)
    starts = np.asarray(_starts_host(N, N, T, W))
    nbh = (starts[None, :, None]
           + rng.randint(0, W, (B, N, K))).astype(np.int32)
    pos0 = np.take_along_axis(pos, nbh[:, :, :1], axis=1)

    # oracle: [sum_k f, sum_k dx*f, dy*f, dz*f] p-major
    f_k = np.stack([feat[b][nbh[b]] for b in range(B)])
    p_k = np.stack([pos[b][nbh[b]] for b in range(B)])
    d = p_k - pos0[:, :, None, :]
    mnp = np.concatenate(
        [f_k.sum(2)] + [np.einsum("bnk,bnkc->bnc", d[..., a], f_k)
                        for a in range(3)], axis=-1)

    out = flex_moments_banded_fast(
        jnp.asarray(feat), jnp.asarray(pos), jnp.asarray(pos0),
        jnp.asarray(nbh), T, W, INTERP)
    # features ride the MXU in bf16 (like the generic fast path): per-
    # element rel ~2^-8; the tail reaches a few % of the mean magnitude
    err = np.abs(np.asarray(out) - mnp)
    scale = np.abs(mnp).mean() + 1e-9
    assert err.max() / scale < 3e-2
    assert err.mean() / scale < 3e-3

    # VJP wrt features vs dense-path autodiff — every operand a jit arg
    # (this backend misreads jit-constant kernel operands; pitfall note)
    dm = rng.randn(B, N, 4 * C).astype(np.float32)

    def f_fast(x, p, p0, i, d):
        return jnp.vdot(flex_moments_banded_fast(x, p, p0, i, T, W, INTERP),
                        d)

    def f_dense(x, p, p0, i, d):
        f_k = jax.vmap(lambda v, ix: v[ix])(x, i)
        p_k = jax.vmap(lambda v, ix: v[ix])(p, i)
        delta = p_k - p0[:, :, None, :]
        m0 = jnp.sum(f_k, axis=2)
        mp = jnp.einsum("bnkp,bnkc->bnpc", delta, f_k,
                        precision="highest").reshape(B, N, -1)
        return jnp.vdot(jnp.concatenate([m0, mp], axis=-1), d)

    args = (jnp.asarray(feat), jnp.asarray(pos), jnp.asarray(pos0),
            jnp.asarray(nbh), jnp.asarray(dm))
    g_f = jax.jit(jax.grad(f_fast))(*args)
    g_d = jax.jit(jax.grad(f_dense))(*args)
    gscale = np.abs(np.asarray(g_d)).mean() + 1e-9
    assert np.abs(np.asarray(g_f) - np.asarray(g_d)).max() / gscale < 5e-3


def test_moments_bwd_lo_per_call(rng):
    """bwd_lo is a per-call STATIC kernel argument, not process state
    (VERDICT r3 weak #7): two models traced in one process can use
    different moments-backward precisions without cross-contamination.
    Interleaves lo=True / lo=False / lo=True gradients and checks (a) both
    variants track the dense oracle at their documented tolerances, (b)
    the two lo=True computations are bit-identical (no leaked state), and
    (c) the variants genuinely differ (the flag reaches the kernel)."""
    import jax

    from dh3d_tpu.ops.pallas.banded_pallas import (
        _starts_host,
        flex_moments_banded_fast,
    )

    B, N, K, C, T, W = 2, 512, 4, 32, 128, 128
    feat = rng.randn(B, N, C).astype(np.float32)
    pos = (rng.randn(B, N, 3) * 0.5 + 100.0).astype(np.float32)
    starts = np.asarray(_starts_host(N, N, T, W))
    nbh = (starts[None, :, None]
           + rng.randint(0, W, (B, N, K))).astype(np.int32)
    pos0 = np.take_along_axis(pos, nbh[:, :, :1], axis=1)
    dm = rng.randn(B, N, 4 * C).astype(np.float32)

    def make(lo):
        def f(x, p, p0, i, d):
            return jnp.vdot(
                flex_moments_banded_fast(x, p, p0, i, T, W, INTERP,
                                         False, lo), d)
        return jax.jit(jax.grad(f))

    def f_dense(x, p, p0, i, d):
        f_k = jax.vmap(lambda v, ix: v[ix])(x, i)
        p_k = jax.vmap(lambda v, ix: v[ix])(p, i)
        delta = p_k - p0[:, :, None, :]
        m0 = jnp.sum(f_k, axis=2)
        mp = jnp.einsum("bnkp,bnkc->bnpc", delta, f_k,
                        precision="highest").reshape(B, N, -1)
        return jnp.vdot(jnp.concatenate([m0, mp], axis=-1), d)

    args = (jnp.asarray(feat), jnp.asarray(pos), jnp.asarray(pos0),
            jnp.asarray(nbh), jnp.asarray(dm))
    g_hi1 = np.asarray(make(True)(*args))
    g_lo = np.asarray(make(False)(*args))
    g_hi2 = np.asarray(make(True)(*args))
    g_d = np.asarray(jax.jit(jax.grad(f_dense))(*args))

    scale = np.abs(g_d).mean() + 1e-9
    assert np.abs(g_hi1 - g_d).max() / scale < 5e-3   # hi/lo bf16x2
    assert np.abs(g_lo - g_d).max() / scale < 5e-2    # single bf16 plane
    np.testing.assert_array_equal(g_hi1, g_hi2)
    assert np.abs(g_hi1 - g_lo).max() > 0, (
        "bwd_lo flag did not reach the kernel")


def test_flex_moments_banded_fast_jit_const(rng):
    """Regression: positions/indices as jit closure CONSTANTS must NOT
    reach the Mosaic kernels (constant operands are prefetched into
    alternate memory and misread on the TPU backend — silent corruption;
    `flex._mixed_tracer_const` routes such calls to the XLA gather
    path instead)."""
    import jax

    from dh3d_tpu.ops.flex import _flex_moments, _flex_moments_banded
    from dh3d_tpu.ops.pallas.banded_pallas import _starts_host

    B, N, K, C, T, W = 2, 512, 4, 32, 128, 128
    feat = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    pos = jnp.asarray((rng.randn(B, N, 3) * 0.5 + 100.0).astype(np.float32))
    starts = np.asarray(_starts_host(N, N, T, W))
    nbh = jnp.asarray((starts[None, :, None]
                       + rng.randint(0, W, (B, N, K))).astype(np.int32))

    f = jax.jit(lambda fe: _flex_moments_banded(fe, pos, nbh, T, W,
                                                True, True))
    assert "tpu_custom_call" not in f.lower(feat).as_text(), (
        "mixed tracer/const operands must not reach the Mosaic kernel")
    if jax.default_backend() == "tpu":
        # this TPU backend corrupts jit-constant operands even on the
        # plain XLA gather path (PERF_NOTES "Backend pitfall"), so only
        # the routing assertion above is checkable there
        return
    oracle = _flex_moments(feat, pos, nbh)
    np.testing.assert_allclose(np.asarray(f(feat)), np.asarray(oracle),
                               rtol=1e-4, atol=1e-4)


def test_banded_weighted_sum_grad_p1_fused(rng):
    """P=1 VJP routes through the fused _bwd_w1 kernel (the per-k scaling
    happens inside the kernel; no [B,N,K,C] dmw intermediate) — must match
    the dense VJP both with the oob correction and under assume_inband."""
    import jax

    from dh3d_tpu.ops.pallas.banded_pallas import (
        _starts_host,
        banded_weighted_sum,
    )

    B, N, K, C, T, W = 1, 512, 4, 32, 128, 128
    feat = rng.randn(B, N, C).astype(np.float32)
    off = (rng.randn(B, N, K) * 20).astype(np.int64)
    nbh = np.clip(np.arange(N)[None, :, None] + off, 0, N - 1).astype(np.int32)
    w = rng.randn(B, N, K, 1).astype(np.float32)
    dm = rng.randn(B, N, C).astype(np.float32)

    def f_dense(x, i, ww, d):
        f_k = jax.vmap(lambda v, ix: v[ix])(x, i)
        out = jnp.einsum("bnkp,bnkc->bnpc", ww, f_k,
                         precision="highest").reshape(B, N, C)
        return jnp.vdot(out, d)

    # (a) arbitrary indices + oob correction
    def f_corr(x, i, ww, d):
        return jnp.vdot(banded_weighted_sum(
            x, i, ww, None, T, W, False, INTERP), d)

    args = (jnp.asarray(feat), jnp.asarray(nbh), jnp.asarray(w),
            jnp.asarray(dm))
    g_b = jax.jit(jax.grad(f_corr))(*args)
    g_d = jax.jit(jax.grad(f_dense))(*args)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               rtol=2e-4, atol=2e-4)

    # (b) in-band indices + assume_inband (no correction at all)
    starts = np.asarray(_starts_host(N, N, T, W))
    nbh_in = (starts[None, :, None]
              + rng.randint(0, W, (B, N, K))).astype(np.int32)

    def f_inband(x, i, ww, d):
        return jnp.vdot(banded_weighted_sum(
            x, i, ww, None, T, W, False, INTERP, True), d)

    args_in = (jnp.asarray(feat), jnp.asarray(nbh_in), jnp.asarray(w),
               jnp.asarray(dm))
    g_bi = jax.jit(jax.grad(f_inband))(*args_in)
    g_di = jax.jit(jax.grad(f_dense))(*args_in)
    np.testing.assert_allclose(np.asarray(g_bi), np.asarray(g_di),
                               rtol=2e-4, atol=2e-4)


def test_planned_weighted_sum_exact_and_grads(rng):
    """banded_weighted_sum_planned (slot-compacted correction, no cond,
    no scatter) == dense oracle, forward and feature-VJP, for arbitrary
    index distributions.  All operands are jit ARGUMENTS — embedded
    jit-constant data operands are misread on this backend even by plain
    XLA gathers (banded_pallas pitfall note)."""
    from dh3d_tpu.ops.pallas.banded_pallas import (
        banded_weighted_sum_planned, oob_plan)

    B, N, K, C, P, T, W = 2, 512, 8, 32, 4, 128, 256
    feat = rng.randn(B, N, C).astype(np.float32)
    off = (rng.randn(B, N, K) * 40).astype(np.int64)
    nbh = np.clip(np.arange(N)[None, :, None] + off, 0, N - 1)
    far = rng.rand(B, N, K) < 0.15
    nbh = np.where(far, rng.randint(0, N, nbh.shape), nbh).astype(np.int32)
    w = rng.randn(B, N, K, P).astype(np.float32)
    dm = rng.randn(B, N, P * C).astype(np.float32)

    plan = jax.jit(lambda n: oob_plan(n, N, T, W, cap=1024, we=512))(
        jnp.asarray(nbh))
    assert int(np.asarray(plan.overflow).max()) == 0

    args = (jnp.asarray(feat), jnp.asarray(nbh), jnp.asarray(w), plan,
            jnp.asarray(dm))

    def f_planned(x, i, ww, pl_, d):
        return jnp.vdot(banded_weighted_sum_planned(
            x, i, ww, pl_, T, W, 512, False, INTERP), d)

    def f_dense(x, i, ww, pl_, d):
        f_k = jax.vmap(lambda v, ix: v[ix])(x, i)
        out = jnp.einsum("bnkp,bnkc->bnpc", ww, f_k,
                         precision="highest").reshape(B, N, P * C)
        return jnp.vdot(out, d)

    out = np.asarray(jax.jit(lambda x, i, ww, pl_, d:
                             banded_weighted_sum_planned(
                                 x, i, ww, pl_, T, W, 512, False, INTERP)
                             )(*args))
    ref = _bws_oracle(feat, nbh, w)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    g_p = jax.jit(jax.grad(f_planned))(*args)
    g_d = jax.jit(jax.grad(f_dense))(*args)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_d),
                               rtol=2e-4, atol=2e-4)


def test_planned_max_exact_and_grad(rng):
    """banded_max_planned == dense max/argmax oracle (incl. the reference
    lowest-k tie rule) and its VJP routes cotangents to the winners."""
    from dh3d_tpu.ops.pallas.banded_pallas import (
        banded_max_planned, oob_plan)

    B, N, K, C, T, W = 2, 512, 8, 32, 128, 256
    feat = rng.randn(B, N, C).astype(np.float32)
    off = (rng.randn(B, N, K) * 40).astype(np.int64)
    nbh = np.clip(np.arange(N)[None, :, None] + off, 0, N - 1)
    far = rng.rand(B, N, K) < 0.15
    nbh = np.where(far, rng.randint(0, N, nbh.shape), nbh).astype(np.int32)
    nbh = jnp.asarray(nbh)
    plan = jax.jit(lambda n: oob_plan(n, N, T, W, cap=1024, we=512))(nbh)
    assert int(np.asarray(plan.overflow).max()) == 0

    def dense(x, i):
        f_k = jax.vmap(lambda v, ix: v[ix])(x, i)
        v = jnp.max(f_k, axis=2)
        s = jnp.argmax(f_k, axis=2)
        a = jnp.take_along_axis(
            i[..., None].astype(jnp.int32),
            s[:, :, None, :].astype(jnp.int32), axis=2)[:, :, 0, :]
        return v, a

    args = (jnp.asarray(feat), nbh, plan)
    ov, oa = jax.jit(lambda x, i, pl_: banded_max_planned(
        x, i, pl_, T, W, 512, False, INTERP))(*args)
    rv, ra = jax.jit(dense)(jnp.asarray(feat), nbh)
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ra))

    dm = rng.randn(B, N, C).astype(np.float32)
    g_p = jax.jit(jax.grad(lambda x, i, pl_, d: jnp.vdot(
        banded_max_planned(x, i, pl_, T, W, 512, False, INTERP)[0], d)))(
            *args, jnp.asarray(dm))
    g_d = jax.jit(jax.grad(lambda x, i, d: jnp.vdot(dense(x, i)[0], d)))(
        jnp.asarray(feat), nbh, jnp.asarray(dm))
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_d),
                               rtol=2e-5, atol=2e-5)


def test_planned_max_fast_bf16_id_chunks(rng):
    """fast=True delivery rides bf16 (argmax id split into 8-bit chunks,
    every channel exactly representable): values and RECONSTRUCTED ids
    must still match the dense oracle exactly.  Features are distinct
    multiples of 4 in [-1024, 1024) — all bf16-exact, so the bf16 window
    rounding is the identity and no rounding ties can form."""
    from dh3d_tpu.ops.pallas.banded_pallas import (
        banded_max_planned, oob_plan)

    B, N, K, C, T, W = 2, 512, 8, 32, 128, 256
    feat = np.stack([
        np.stack([rng.permutation(N) * 4.0 - 1024.0 for _ in range(C)],
                 axis=1)
        for _ in range(B)
    ]).astype(np.float32)
    off = (rng.randn(B, N, K) * 40).astype(np.int64)
    nbh = np.clip(np.arange(N)[None, :, None] + off, 0, N - 1)
    far = rng.rand(B, N, K) < 0.15
    nbh = np.where(far, rng.randint(0, N, nbh.shape), nbh).astype(np.int32)
    nbh = jnp.asarray(nbh)
    plan = jax.jit(lambda n: oob_plan(n, N, T, W, cap=1024, we=512))(nbh)
    assert int(np.asarray(plan.overflow).max()) == 0

    def dense(x, i):
        f_k = jax.vmap(lambda v, ix: v[ix])(x, i)
        v = jnp.max(f_k, axis=2)
        s = jnp.argmax(f_k, axis=2)
        a = jnp.take_along_axis(
            i[..., None].astype(jnp.int32),
            s[:, :, None, :].astype(jnp.int32), axis=2)[:, :, 0, :]
        return v, a

    args = (jnp.asarray(feat), nbh, plan)
    ov, oa = jax.jit(lambda x, i, pl_: banded_max_planned(
        x, i, pl_, T, W, 512, True, INTERP))(*args)
    rv, ra = jax.jit(dense)(jnp.asarray(feat), nbh)
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ra))

    # bf16-exact cotangents (k * 0.25, |k| < 128): the fast-mode bf16
    # transpose delivery is then exact and the grad check can be strict
    dm = (rng.randint(-128, 128, (B, N, C)) * 0.25).astype(np.float32)
    g_p = jax.jit(jax.grad(lambda x, i, pl_, d: jnp.vdot(
        banded_max_planned(x, i, pl_, T, W, 512, True, INTERP)[0], d)))(
            *args, jnp.asarray(dm))
    g_d = jax.jit(jax.grad(lambda x, i, d: jnp.vdot(dense(x, i)[0], d)))(
        jnp.asarray(feat), nbh, jnp.asarray(dm))
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_d),
                               rtol=2e-5, atol=2e-5)


def test_oob_plan_overflow_counts(rng):
    """Entries beyond the static capacity are counted, not silently
    dropped."""
    from dh3d_tpu.ops.pallas.banded_pallas import oob_plan

    B, N, K = 1, 512, 8
    # all-random indices: almost everything is out of band for W=128
    nbh = rng.randint(0, N, (B, N, K)).astype(np.int32)
    plan = jax.jit(lambda n: oob_plan(n, N, 128, 128, cap=256, we=128))(
        jnp.asarray(nbh))
    assert int(np.asarray(plan.overflow)[0]) > 0


def test_oob_cap_scale_restores_exactness(rng):
    """`scale` (cfg.oob_cap_scale) multiplies the per-tile window and the
    default global capacity: a plan that overflows at defaults stops
    overflowing at a large enough scale — the documented no-code-edit
    remedy when check_oob_overflow fires on dense data."""
    from dh3d_tpu.ops.pallas.banded_pallas import oob_plan

    B, N, K = 1, 512, 8
    nbh = rng.randint(0, N, (B, N, K)).astype(np.int32)
    j = jax.jit(lambda n, scale: oob_plan(n, N, 128, 128, scale=scale),
                static_argnames=("scale",))
    assert int(np.asarray(j(jnp.asarray(nbh), scale=0.25).overflow)[0]) > 0
    big = j(jnp.asarray(nbh), scale=8.0)
    assert int(np.asarray(big.overflow)[0]) == 0


def test_moments_planned_exact_and_grads(rng):
    """flex_moments_banded_planned (the default production path for every
    FlexConv under exact-Morton) == dense gather oracle, forward and
    feature-VJP, for arbitrary index distributions — mirrors
    test_planned_weighted_sum_exact_and_grads (round-4 advisor gap: this
    custom_vjp had no oracle test)."""
    from dh3d_tpu.ops.pallas.banded_pallas import (
        flex_moments_banded_planned, oob_plan)

    B, N, K, C, T, W = 2, 512, 8, 32, 128, 256
    Cpad = 128  # lane-padded channel count (keep_pad layout, _pad_c)
    feat = rng.randn(B, N, C).astype(np.float32)
    pos = (rng.randn(B, N, 3) * 0.5 + 10.0).astype(np.float32)
    off = (rng.randn(B, N, K) * 40).astype(np.int64)
    nbh = np.clip(np.arange(N)[None, :, None] + off, 0, N - 1)
    far = rng.rand(B, N, K) < 0.15
    nbh = np.where(far, rng.randint(0, N, nbh.shape), nbh).astype(np.int32)
    pos0 = np.take_along_axis(pos, nbh[:, :, :1], axis=1)

    plan = jax.jit(lambda n: oob_plan(n, N, T, W, cap=1024, we=512))(
        jnp.asarray(nbh))
    assert int(np.asarray(plan.overflow).max()) == 0

    # dense oracle: [sum_k f | sum_k dx*f | dy*f | dz*f] p-major
    f_k = np.stack([feat[b][nbh[b]] for b in range(B)])
    p_k = np.stack([pos[b][nbh[b]] for b in range(B)])
    d = p_k - pos0[:, :, None, :]
    planes = [f_k.sum(2)] + [np.einsum("bnk,bnkc->bnc", d[..., a], f_k)
                             for a in range(3)]

    args = (jnp.asarray(feat), jnp.asarray(pos), jnp.asarray(pos0),
            jnp.asarray(nbh), plan)
    out = np.asarray(jax.jit(
        lambda x, p, p0, i, pl_: flex_moments_banded_planned(
            x, p, p0, i, pl_, T, W, 512, False, INTERP))(*args))
    assert out.shape == (B, N, 4 * Cpad)
    # bf16-window error class (same budget as test_flex_moments_banded_
    # fast): scale = mean magnitude over ALL planes
    scale = np.abs(np.concatenate(planes, axis=-1)).mean() + 1e-9
    for pi, plane in enumerate(planes):
        got = out[..., pi * Cpad:pi * Cpad + C]
        err = np.abs(got - plane)
        assert err.max() / scale < 3e-2, pi
        # padded channel lanes must be exactly zero
        np.testing.assert_array_equal(
            out[..., pi * Cpad + C:(pi + 1) * Cpad], 0.0)

    # feature-VJP vs dense-path autodiff (cotangent on REAL lanes only:
    # padded weight rows are zero in production, flex.py keep_pad callers)
    dm = np.zeros((B, N, 4 * Cpad), np.float32)
    for pi in range(4):
        dm[..., pi * Cpad:pi * Cpad + C] = rng.randn(B, N, C)

    def f_planned(x, p, p0, i, pl_, dd):
        return jnp.vdot(flex_moments_banded_planned(
            x, p, p0, i, pl_, T, W, 512, False, INTERP), dd)

    def f_dense(x, p, p0, i, dd):
        fk = jax.vmap(lambda v, ix: v[ix])(x, i)
        pk = jax.vmap(lambda v, ix: v[ix])(p, i)
        delta = pk - p0[:, :, None, :]
        m0 = jnp.sum(fk, axis=2)
        mp = jnp.einsum("bnkp,bnkc->bnpc", delta, fk,
                        precision="highest").reshape(B, N, -1)
        dense = jnp.concatenate([m0, mp], axis=-1)
        real = jnp.concatenate(
            [dd[..., pi * Cpad:pi * Cpad + C] for pi in range(4)], axis=-1)
        return jnp.vdot(dense, real)

    g_p = jax.jit(jax.grad(f_planned))(*args, jnp.asarray(dm))
    g_d = jax.jit(jax.grad(f_dense))(
        jnp.asarray(feat), jnp.asarray(pos), jnp.asarray(pos0),
        jnp.asarray(nbh), jnp.asarray(dm))
    gscale = np.abs(np.asarray(g_d)).mean() + 1e-9
    assert np.abs(np.asarray(g_p) - np.asarray(g_d)).max() / gscale < 5e-3


def test_knn_packed_self_query_duplicate_points(rng):
    """packed self-kNN on exact duplicate points: the structural self-pin
    guarantees the query's own lane lands in the zero-distance bucket
    (the MXU-identity distance build does not guarantee an exact-0 self
    distance), where the reference's stable lowest-index tie rule applies
    — a HIGHER-indexed duplicate therefore gets its lower twin at slot 0
    and itself at slot 1, exactly like the exact kernel and the CPU
    reference's stable sort (`knn_bruteforce_kernel.cc:65-68`)."""
    pos = rng.randn(1, 128, 3).astype(np.float32)
    pos[0, 64:96] = pos[0, 0:32]  # 32 exact duplicates of rows 0..31
    idx, d2 = knn_pallas(jnp.asarray(pos), jnp.asarray(pos), 4,
                         packed=True, self_query=True, interpret=INTERP)
    idx, d2 = np.asarray(idx), np.asarray(d2)
    r = np.arange(128)
    # unique rows: self at slot 0
    uniq = np.concatenate([r[32:64], r[96:]])
    np.testing.assert_array_equal(idx[0, uniq, 0], uniq)
    # duplicate pairs: both rows see (lower twin, higher twin) in slots
    # 0,1 — zero-distance bucket, lowest index first
    np.testing.assert_array_equal(idx[0, 0:32, 0], r[0:32])
    np.testing.assert_array_equal(idx[0, 0:32, 1], r[64:96])
    np.testing.assert_array_equal(idx[0, 64:96, 0], r[0:32])
    np.testing.assert_array_equal(idx[0, 64:96, 1], r[64:96])
    assert (d2[0, 0:32, :2] == 0).all() and (d2[0, 64:96, :2] == 0).all()
    assert (np.diff(d2, axis=-1) >= 0).all()


def test_oob_plan_cap_full_branch(rng):
    """cap >= NT*we clamps to `full`, taking the two-stage compaction's
    cap==full branch (rewritten round 4, untested per the advisor) — the
    planned op must stay exact there."""
    from dh3d_tpu.ops.pallas.banded_pallas import (
        banded_weighted_sum_planned, oob_plan)

    B, N, K, C, P, T, W = 1, 256, 8, 16, 4, 128, 128
    feat = rng.randn(B, N, C).astype(np.float32)
    nbh = rng.randint(0, N, (B, N, K)).astype(np.int32)  # mostly oob
    w = rng.randn(B, N, K, P).astype(np.float32)

    plan = jax.jit(lambda n: oob_plan(n, N, T, W, cap=10 ** 9, we=1024))(
        jnp.asarray(nbh))
    assert int(np.asarray(plan.overflow).max()) == 0

    out = np.asarray(jax.jit(
        lambda x, i, ww, pl_: banded_weighted_sum_planned(
            x, i, ww, pl_, T, W, plan.we, False, INTERP))(
        jnp.asarray(feat), jnp.asarray(nbh), jnp.asarray(w), plan))
    ref = _bws_oracle(feat, nbh, w)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
