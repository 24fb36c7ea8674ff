"""Point sampling ops (PointNet++ family), TPU-native.

Ground-truth semantics: `tf_ops/sampling/tf_sampling_g.cu` —
  farthest_point_sample  `:105-170` (seed index 0, iterative max-of-min-dist)
  gather_point           `:172-180`
  prob_sample            `:7-104` (cumsum + inverse-CDF binary search)
Python surface: `tf_ops/sampling/tf_sampling.py:15-74`.

FPS is inherently sequential (m dependent iterations); it is expressed as a
`lax.fori_loop` carrying the [B, N] running min-distance — the same algorithm
as the CUDA kernel, with the inner argmax/min vectorized over the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def farthest_point_sample(points, npoint, impl="auto"):
    """Iterative farthest point sampling.

    Args:
      points: [B, N, 3] coordinates.
      npoint: number of samples m.
      impl: 'auto' (Pallas in-VMEM loop kernel on TPU, lax.fori_loop
        elsewhere), 'pallas', or 'xla'.

    Returns:
      [B, m] int32 indices.  Seeded at index 0 like the reference kernel
      (`tf_sampling_g.cu:114-116`); the next sample is always the point
      maximizing the min distance to all previously chosen ones.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas" and points.shape[-1] == 3:
        from dh3d_tpu.ops.pallas.fps_pallas import fps_pallas

        return fps_pallas(points, npoint)
    return _fps_xla(points, npoint)


@functools.partial(jax.jit, static_argnames=("npoint",))
def _fps_xla(points, npoint):
    B, N, _ = points.shape

    def body(j, carry):
        mindist, idxs, last = carry
        last_xyz = jnp.take_along_axis(points, last[:, None, None], axis=1)
        d = jnp.sum((points - last_xyz) ** 2, axis=-1)  # [B, N]
        mindist = jnp.minimum(mindist, d)
        nxt = jnp.argmax(mindist, axis=-1).astype(jnp.int32)  # [B]
        idxs = idxs.at[:, j].set(nxt)
        return mindist, idxs, nxt

    init_idx = jnp.zeros((B, npoint), jnp.int32)
    init_last = jnp.zeros((B,), jnp.int32)
    mindist = jnp.full((B, N), jnp.inf, points.dtype)
    _, idxs, _ = jax.lax.fori_loop(1, npoint, body, (mindist, init_idx, init_last))
    return idxs


def gather_point(points, idx):
    """points [B, N, C], idx [B, M] -> [B, M, C] (`tf_sampling_g.cu:172-180`)."""
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def prob_sample(inp, inp_r):
    """Inverse-CDF categorical sampling (`tf_sampling_g.cu:7-104`).

    inp: [B, N] unnormalized distribution; inp_r: [B, M] uniforms in [0, sum).
    Returns [B, M] int32 sampled indices.
    """
    cdf = jnp.cumsum(inp, axis=-1)  # [B, N]
    idx = jax.vmap(lambda c, r: jnp.searchsorted(c, r, side="left"))(cdf, inp_r)
    return jnp.clip(idx, 0, inp.shape[-1] - 1).astype(jnp.int32)


def subsample(points, feat, targetnum, kp_idx=None, sorted_order=False):
    """FPS (or provided indices) + gather of xyz and features.

    Mirrors `core/tf_utils.py:86-96`.  kp_idx: [B, M] or [B, M, 1] int.
    `sorted_order=True` returns the FPS selection in ascending-index order
    (preserves the parent's Morton order for the banded kernels; the
    selected SET is identical).
    Returns (xyz_sampled [B,M,3], feat_sampled [B,M,C], kp_indices [B,M]).
    """
    if kp_idx is None:
        kp_indices = farthest_point_sample(points, targetnum)
        if sorted_order:
            kp_indices = jnp.sort(kp_indices, axis=-1)
    else:
        kp_indices = kp_idx.reshape(kp_idx.shape[0], -1)
    return (
        gather_point(points, kp_indices),
        gather_point(feat, kp_indices),
        kp_indices,
    )
