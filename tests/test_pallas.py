"""Pallas kernel tests (interpreter mode on CPU; the same kernels are
compiled by Mosaic on TPU — verified there by the bench/drive scripts)."""

import jax.numpy as jnp
import numpy as np

import oracles
from dh3d_tpu.ops.pallas.knn_pallas import knn_pallas


def test_knn_pallas_matches_oracle(rng):
    pos = rng.randn(2, 64, 3).astype(np.float32) * 5
    idx, d2 = knn_pallas(jnp.asarray(pos), jnp.asarray(pos), 6,
                         interpret=True)
    oidx, odist = oracles.knn_oracle(pos, 6)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), odist, atol=1e-4)


def test_knn_pallas_cross_cloud(rng):
    q = rng.randn(1, 16, 3).astype(np.float32)
    keys = rng.randn(1, 40, 3).astype(np.float32)
    idx, d2 = knn_pallas(jnp.asarray(q), jnp.asarray(keys), 3,
                         interpret=True)
    d = np.sum((q[0][:, None] - keys[0][None]) ** 2, -1)
    order = np.argsort(d, axis=-1, kind="stable")[:, :3]
    np.testing.assert_array_equal(np.asarray(idx)[0], order)


def test_knn_pallas_unaligned_sizes(rng):
    """M and N not multiples of the tile/lane sizes -> padded path."""
    pos = rng.randn(1, 100, 3).astype(np.float32)
    idx, d2 = knn_pallas(jnp.asarray(pos), jnp.asarray(pos), 4,
                         interpret=True)
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
    pi = fps_pallas(jnp.asarray(pts), 32, interpret=True)
    xi = _fps_xla(jnp.asarray(pts), 32)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
