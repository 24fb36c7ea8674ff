"""Op-level parity tests against the reference CPU-kernel semantics.

Pattern follows the reference's own op tests
(`user_ops/test_flex_convolution.py`): seeded random fixture at small sizes
(B=2, N=32, K=4), forward parity vs the naive oracle, and gradient checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

import oracles
from dh3d_tpu import ops


class Fixture:
    """FakePointCloud-style fixture (`user_ops/misc.py:31-84`)."""

    def __init__(self, rng, B=2, N=32, K=4, Din=3, Dout=5, Dp=3, scale=1.0):
        self.positions = rng.randn(B, N, Dp).astype(np.float32) * scale
        self.features = rng.randn(B, N, Din).astype(np.float32)
        self.theta = rng.randn(Dp, Din, Dout).astype(np.float32)
        self.bias = rng.randn(Din, Dout).astype(np.float32)
        self.neighborhood, _ = oracles.knn_oracle(self.positions, K)


def test_knn_matches_oracle(rng):
    f = Fixture(rng, N=48, K=6)
    idx, dist = ops.knn_bruteforce(jnp.asarray(f.positions), 6)
    oidx, odist = oracles.knn_oracle(f.positions, 6)
    np.testing.assert_allclose(np.asarray(dist), odist, atol=1e-4)
    # self is always slot 0
    np.testing.assert_array_equal(np.asarray(idx[..., 0]),
                                  np.arange(48)[None].repeat(2, 0))
    # indices may differ only on exactly-tied distances
    np.testing.assert_array_equal(np.asarray(idx), oidx)


def test_knn_chunked_matches_unchunked(rng):
    pos = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    i1, d1 = ops.knn_bruteforce(pos, 8, chunk=64)
    i2, d2 = ops.knn_bruteforce(pos, 8, chunk=16)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)


def test_knn_pairwise(rng):
    q = jnp.asarray(rng.randn(2, 8, 3).astype(np.float32))
    r = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))
    idx, dist = ops.knn_bruteforce_pairwise(q, r, 4)
    d = np.sqrt(np.sum((np.asarray(q)[:, :, None] - np.asarray(r)[:, None]) ** 2, -1))
    expect = np.sort(d, axis=-1)[..., :4]
    np.testing.assert_allclose(np.asarray(dist), expect, atol=1e-5)


def test_flex_conv_matches_oracle(rng):
    f = Fixture(rng)
    out = ops.flex_conv(
        jnp.asarray(f.features), jnp.asarray(f.positions),
        jnp.asarray(f.neighborhood), jnp.asarray(f.theta), jnp.asarray(f.bias),
    )
    expect = oracles.flex_conv_oracle(
        f.features, f.positions, f.neighborhood, f.theta, f.bias
    )
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_flex_conv_grads(rng):
    f = Fixture(rng, B=1, N=8, K=3, Din=2, Dout=3)
    fn = lambda feat, th, bi: jnp.sum(
        jnp.sin(ops.flex_conv(feat, jnp.asarray(f.positions),
                              jnp.asarray(f.neighborhood), th, bi))
    )
    check_grads(
        fn,
        (jnp.asarray(f.features), jnp.asarray(f.theta), jnp.asarray(f.bias)),
        order=1, modes=["rev"], atol=1e-2, rtol=1e-2,
    )


def test_flex_avg_is_neighborhood_sum(rng):
    f = Fixture(rng)
    out = ops.flex_avg(jnp.asarray(f.features), jnp.asarray(f.neighborhood))
    # flex_avg == flex_conv with zero theta, identity bias
    # (`core/layers.py:342-436`)
    Din = f.features.shape[-1]
    expect = oracles.flex_conv_oracle(
        f.features, f.positions, f.neighborhood,
        np.zeros((3, Din, Din), np.float32), np.eye(Din, dtype=np.float32),
    )
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_conv_pointset_matches_oracle(rng):
    f = Fixture(rng)
    theta = rng.randn(3, 5).astype(np.float32)
    bias = rng.randn(5).astype(np.float32)
    out = ops.conv_pointset(
        jnp.asarray(f.features), jnp.asarray(f.neighborhood),
        jnp.asarray(theta), jnp.asarray(bias),
    )
    expect = oracles.conv_pointset_oracle(f.features, f.neighborhood, theta, bias)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_flex_pool_matches_oracle(rng):
    f = Fixture(rng, Din=6)
    out, argmax = ops.flex_pool(jnp.asarray(f.features),
                                jnp.asarray(f.neighborhood))
    eo, ea = oracles.flex_pool_oracle(f.features, f.neighborhood)
    np.testing.assert_allclose(np.asarray(out), eo, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(argmax), ea)


def test_flex_deconv_matches_oracle(rng):
    f = Fixture(rng)
    out = ops.flex_deconv(
        jnp.asarray(f.features), jnp.asarray(f.positions),
        jnp.asarray(f.neighborhood), jnp.asarray(f.theta), jnp.asarray(f.bias),
    )
    expect = oracles.flex_deconv_oracle(
        f.features, f.positions, f.neighborhood, f.theta, f.bias
    )
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-3, atol=1e-3)


def test_fps_matches_oracle(rng):
    pts = rng.randn(2, 40, 3).astype(np.float32)
    idx = ops.farthest_point_sample(jnp.asarray(pts), 10)
    expect = oracles.fps_oracle(pts, 10)
    np.testing.assert_array_equal(np.asarray(idx), expect)


def test_gather_and_group(rng):
    pts = rng.randn(2, 16, 5).astype(np.float32)
    idx = rng.randint(0, 16, (2, 6)).astype(np.int32)
    out = ops.gather_point(jnp.asarray(pts), jnp.asarray(idx))
    np.testing.assert_allclose(
        np.asarray(out), np.stack([pts[b][idx[b]] for b in range(2)])
    )
    gidx = rng.randint(0, 16, (2, 4, 3)).astype(np.int32)
    g = ops.group_point(jnp.asarray(pts), jnp.asarray(gidx))
    np.testing.assert_allclose(
        np.asarray(g), np.stack([pts[b][gidx[b]] for b in range(2)])
    )


def test_query_ball_matches_oracle(rng):
    xyz1 = rng.randn(2, 32, 3).astype(np.float32)
    xyz2 = rng.randn(2, 8, 3).astype(np.float32)
    idx, cnt = ops.query_ball_point(1.0, 5, jnp.asarray(xyz1), jnp.asarray(xyz2))
    eidx, ecnt = oracles.query_ball_oracle(1.0, 5, xyz1, xyz2)
    np.testing.assert_array_equal(np.asarray(cnt), ecnt)
    np.testing.assert_array_equal(np.asarray(idx), eidx)


def test_query_ball_empty_falls_back_to_nearest(rng):
    xyz1 = np.ones((1, 4, 3), np.float32) * 10
    xyz1[0, 2] = 9.0  # nearest to origin
    xyz2 = np.zeros((1, 1, 3), np.float32)
    idx, cnt = ops.query_ball_point(0.5, 3, jnp.asarray(xyz1), jnp.asarray(xyz2))
    assert int(cnt[0, 0]) == 0
    np.testing.assert_array_equal(np.asarray(idx)[0, 0], [2, 2, 2])


def test_three_nn_matches_oracle(rng):
    xyz1 = rng.randn(2, 24, 3).astype(np.float32)
    xyz2 = rng.randn(2, 9, 3).astype(np.float32)
    dist, idx = ops.three_nn(jnp.asarray(xyz1), jnp.asarray(xyz2))
    edist, eidx = oracles.three_nn_oracle(xyz1, xyz2)
    np.testing.assert_allclose(np.asarray(dist), edist, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), eidx)


def test_three_interpolate(rng):
    pts = rng.randn(2, 9, 7).astype(np.float32)
    idx = rng.randint(0, 9, (2, 24, 3)).astype(np.int32)
    w = rng.rand(2, 24, 3).astype(np.float32)
    out = ops.three_interpolate(jnp.asarray(pts), jnp.asarray(idx), jnp.asarray(w))
    expect = np.einsum("bnj,bnjc->bnc", w,
                       np.stack([pts[b][idx[b]] for b in range(2)]))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)
    check_grads(
        lambda p: jnp.sum(ops.three_interpolate(p, jnp.asarray(idx), jnp.asarray(w))),
        (jnp.asarray(pts),), order=1, modes=["rev"], atol=1e-2, rtol=1e-2,
    )


def test_prob_sample(rng):
    inp = np.abs(rng.rand(2, 10)).astype(np.float32)
    total = inp.sum(-1, keepdims=True)
    r = (rng.rand(2, 5) * total).astype(np.float32)
    idx = ops.prob_sample(jnp.asarray(inp), jnp.asarray(r))
    cdf = np.cumsum(inp, -1)
    expect = np.stack([np.searchsorted(cdf[b], r[b], side="left") for b in range(2)])
    np.testing.assert_array_equal(np.asarray(idx), np.clip(expect, 0, 9))


def test_subsample(rng):
    pts = rng.randn(2, 32, 3).astype(np.float32)
    feat = rng.randn(2, 32, 6).astype(np.float32)
    xyz_s, feat_s, kp = ops.subsample(jnp.asarray(pts), jnp.asarray(feat), 8)
    expect_kp = oracles.fps_oracle(pts, 8)
    np.testing.assert_array_equal(np.asarray(kp), expect_kp)
    np.testing.assert_allclose(
        np.asarray(feat_s), np.stack([feat[b][expect_kp[b]] for b in range(2)])
    )


def test_hilo_split_exact_and_differentiable(rng):
    """_hilo_split: hi bf16-representable, hi+lo == x exactly, and the
    custom JVP routes the full tangent through hi (bitcast has no
    autodiff rule).  Guards the initconv banded path's precision trick
    against XLA's excess-precision convert-chain stripping."""
    import jax

    from dh3d_tpu.ops.flex import _hilo_split

    x = jnp.asarray((rng.randn(4, 64) * 100).astype(np.float32))
    hi, lo = jax.jit(_hilo_split)(x)
    np.testing.assert_array_equal(np.asarray(hi + lo), np.asarray(x))
    # hi survives a bf16 round-trip bit-exactly (mantissa truncated)
    np.testing.assert_array_equal(
        np.asarray(hi), np.asarray(hi).astype(np.dtype("bfloat16")
                                              if hasattr(np, "bfloat16")
                                              else np.float32))
    assert float(np.abs(np.asarray(lo)).max()) <= (
        float(np.abs(np.asarray(x)).max()) * 2.0 ** -7)

    g = jax.grad(lambda v: jnp.sum(_hilo_split(v)[0] * 2.0
                                   + _hilo_split(v)[1] * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 2.0)  # all tangent via hi
