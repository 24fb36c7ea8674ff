"""Pallas TPU kernel: farthest point sampling.

The XLA `lax.fori_loop` FPS (ops/sampling.py) is correct but latency-bound:
m=1024 dependent iterations, each a handful of tiny kernels — measured
55 ms at [20, 8192].  Here the whole loop runs inside one kernel with the
running min-distance resident in VMEM, the same structure as the
reference's CUDA kernel (`tf_ops/sampling/tf_sampling_g.cu:105-170`) but
with the VPU doing the N-wide distance/min/argmax work.

All B clouds are processed in ONE kernel instance (grid=(1,)): every
per-iteration op is [B, N]-wide, so the sequential loop's fixed overhead is
amortized across the batch (v1 ran one cloud per grid step: 14 ms; this
version: ~B times less loop overhead).

Mosaic constraints shaping the code: points come in transposed [B*3, N]
(coordinates as lane rows), the chosen points' coordinates are extracted
by masked reduction (no dynamic scalar loads), and sample indices
accumulate via masked vector writes (no scalar VMEM stores).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(pts_ref, idx_ref, mind_ref, idxbuf_ref, *, m, b):
    # pts_ref: [3*B, N], coordinate-major: rows [0,B) = x of every cloud,
    # [B,2B) = y, [2B,3B) = z — contiguous sublane slices (Mosaic does not
    # support strided sublane reads)
    n = pts_ref.shape[1]
    px = pts_ref[0:b, :]  # [B, N]
    py = pts_ref[b:2 * b, :]
    pz = pts_ref[2 * b:3 * b, :]

    point_lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)

    mind_ref[:] = jnp.full((b, n), jnp.inf, jnp.float32)
    idxbuf_ref[:] = jnp.zeros((b, m), jnp.int32)  # seed = index 0 at slot 0

    def body(j, last):
        sel = point_lane == last[:, None]  # [B, N]
        lx = jnp.sum(jnp.where(sel, px, 0.0), axis=1)  # [B]
        ly = jnp.sum(jnp.where(sel, py, 0.0), axis=1)
        lz = jnp.sum(jnp.where(sel, pz, 0.0), axis=1)
        d = (
            (px - lx[:, None]) ** 2
            + (py - ly[:, None]) ** 2
            + (pz - lz[:, None]) ** 2
        )
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        nxt = jnp.argmax(mind, axis=1).astype(jnp.int32)  # [B]
        idxbuf_ref[:] = jnp.where(out_lane == j, nxt[:, None], idxbuf_ref[:])
        return nxt

    jax.lax.fori_loop(1, m, body, jnp.zeros((b,), jnp.int32))
    idx_ref[:] = idxbuf_ref[:]


def fps_pallas(points, npoint, interpret=False):
    """points [B, N, 3] float32 -> [B, npoint] int32 FPS indices.

    Mosaic mis-legalizes sub-tile (smaller than 8x128) vectors, so every
    dim is padded to tile multiples:
      - N -> x128 with copies of point 0 (min-distance 0 from iteration 1
        on, never the argmax while npoint <= true N);
      - B -> x8 with copies of cloud 0 (rows sliced off);
      - npoint -> x128 via extra loop iterations (FPS is prefix-consistent:
        the first `npoint` samples are unchanged by sampling more).
    """
    points = points.astype(jnp.float32)
    B, N, _ = points.shape
    # minimum 256 lanes: Mosaic mis-legalizes the argmax at exactly one
    # 128-lane tile (f32->i32 materialization error, observed on v5e)
    n_pad = (256 - N) if N < 256 else (-N) % 128
    if n_pad:
        points = jnp.concatenate(
            [points,
             jnp.broadcast_to(points[:, :1], (B, n_pad, 3))], axis=1
        )
        N = N + n_pad
    b_pad = (-B) % 8
    if b_pad:
        points = jnp.concatenate(
            [points, jnp.broadcast_to(points[:1], (b_pad, N, 3))], axis=0
        )
    Bp = B + b_pad
    m_p = npoint + ((-npoint) % 128)
    # [3, Bp, N] -> [3Bp, N]: coordinate-major rows
    pts_t = jnp.transpose(points, (2, 0, 1)).reshape(3 * Bp, N)
    kernel = functools.partial(_fps_kernel, m=m_p, b=Bp)
    idx = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((3 * Bp, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bp, m_p), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, m_p), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Bp, N), jnp.float32),
            pltpu.VMEM((Bp, m_p), jnp.int32),
        ],
        interpret=interpret,
    )(pts_t)
    return idx[:B, :npoint]
