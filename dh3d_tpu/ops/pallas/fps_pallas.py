"""Pallas TPU kernel: farthest point sampling.

The XLA `lax.fori_loop` FPS (ops/sampling.py) is correct but latency-bound:
m=1024 dependent iterations, each a handful of tiny kernels — measured
55 ms at [20, 8192].  Here the whole loop runs inside one kernel with the
running min-distance resident in VMEM, the same structure as the
reference's CUDA kernel (`tf_ops/sampling/tf_sampling_g.cu:105-170`) but
with the VPU doing the N-wide distance/min/argmax work.

Implementation notes (Mosaic constraints): points are passed transposed
[B, 3, N] so each coordinate is a [1, N] lane row; the chosen point's
coordinates are extracted by masked reduction (no dynamic scalar loads);
sample indices accumulate via masked vector writes (no scalar VMEM
stores).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(pts_ref, idx_ref, mind_ref, *, m):
    px = pts_ref[0, 0:1, :]  # [1, N]
    py = pts_ref[0, 1:2, :]
    pz = pts_ref[0, 2:3, :]
    n = px.shape[1]

    point_lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)

    mind_ref[:] = jnp.full((1, n), jnp.inf, jnp.float32)
    idx_ref[0] = jnp.zeros((1, m), jnp.int32)  # seed = index 0 at slot 0

    def body(j, last):
        sel = point_lane == last
        lx = jnp.sum(jnp.where(sel, px, 0.0))
        ly = jnp.sum(jnp.where(sel, py, 0.0))
        lz = jnp.sum(jnp.where(sel, pz, 0.0))
        d = (px - lx) ** 2 + (py - ly) ** 2 + (pz - lz) ** 2  # [1, N]
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        nxt = jnp.argmax(mind[0]).astype(jnp.int32)
        idx_ref[0] = jnp.where(out_lane == j, nxt, idx_ref[0])
        return nxt

    jax.lax.fori_loop(1, m, body, jnp.int32(0))


def fps_pallas(points, npoint, interpret=False):
    """points [B, N, 3] float32 -> [B, npoint] int32 FPS indices."""
    B, N, _ = points.shape
    pts_t = jnp.transpose(points.astype(jnp.float32), (0, 2, 1))  # [B, 3, N]
    kernel = functools.partial(_fps_kernel, m=npoint)
    # output laid out [B, 1, npoint] so the block's trailing dims equal the
    # array dims (Mosaic block-shape constraint); squeezed on return.
    idx = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, npoint), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, N), jnp.float32)],
        interpret=interpret,
    )(pts_t)
    return idx[:, 0]
