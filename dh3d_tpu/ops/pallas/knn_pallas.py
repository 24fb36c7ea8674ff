"""Pallas TPU kernel: exact k-nearest-neighbors by streaming min-extraction.

Why: XLA's `top_k` over wide rows lowers to a full sort on TPU — measured
880 ms for the [20, 8192] k=8 case, 81% of the whole DH3D forward.  For
small k (the model uses k in {8, 16}; interpolation uses 3) an exact
iterative min-extraction on the VPU is orders of magnitude cheaper: k
passes of (row-min, row-argmin, mask) over a VMEM-resident distance tile.

Design (one grid step = one query tile of one cloud):
  grid = (B, M // TQ)
  - keys [N, 3] of the cloud stay in VMEM (N<=16384 -> 192 KB)
  - query tile [TQ, 3]
  - d2 tile [TQ, N] computed on the VPU via 3 broadcast FMA passes
    (exact: (qx-kx)^2 + ... — no matmul-identity cancellation, so the
    self-distance is exactly 0 and lands in slot 0 like the reference,
    `user_ops/kernels/knn_bruteforce_kernel.cc:65-68`)
  - k unrolled iterations: row-argmin over lanes, gather value, mask +inf
Replaces the reference's CUDA block-radix-sort kernel
(`user_ops/kernels/knn_bruteforce_kernel_gpu.cu.cc:46-134`) and removes its
N<=8192 limit (`:213-221`).  Ties resolve to the lowest index (argmin
first occurrence), matching the reference's stable index-order sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _knn_kernel_packed(q_ref, keys_ref, idx_ref, dist_ref, *, k,
                       idx_bits, self_query):
    """Fast variant: value and index packed into one int32 key so each
    extraction is a single min-reduction.  Positive-float bits are
    order-preserving, so clearing the low `idx_bits` mantissa bits and
    packing the lane index there keeps ordering except for distances equal
    to within ~2^-(23-idx_bits) relative (ties then break to the lowest
    index, like the exact kernel).  Distances come back truncated — use
    where only neighbor INDICES matter (the DH3D graph's knn calls).

    Design notes (chip-measured at [20, 8192] k=8, v5e):

    * d2 is built with 3 broadcast-FMA VPU passes, exactly like the
      reference's (q-k)^2 (`knn_bruteforce_kernel.cc:65-68`): the self
      distance is exactly +0.0, so a self query's packed key is its own
      lane index and the lowest-index tie rule seats it at slot 0
      structurally (true duplicates: the lowest-index twin wins, like
      the reference's stable sort).  The matmul identity
      |q|^2 - 2 q.k + |k|^2 on the MXU was tried and REVERTED: at the
      required f32 precision (HIGHEST; the default one-pass bf16 build
      mis-sorts real neighbor gaps) the 6-pass contraction costs ~8.5 ms
      MORE than the FMA build, loses the exact-0 self distance (forcing
      a pin pass), and needs cancellation-avoiding centering.
    * Each extraction pass is ONE subtract + ONE wraparound min: packed
      keys are unique and non-negative, so "strictly greater than the
      previous winner" is equivalent to unsigned wraparound distance
      (key - prev - 1): entries <= prev wrap to the top of the unsigned
      range and can never win.  Mosaic cannot lower unsigned-integer
      reductions, so the min runs in int32 on sign-bit-biased values
      (x ^ INT32_MIN is the order-isomorphic map uint32 -> int32) — and
      because INT32_MIN's low bits are zero, the xor IS the wrapping add
      of INT32_MIN, so the bias folds into the per-row subtrahend:
      rel_biased = key - c with c = prev + 1 - INT32_MIN kept per row.
      The [TQ, N]-wide work per pass is exactly one subtract and one
      min-reduction; all bias bookkeeping (win = min + c,
      c' = win + 1 - INT32_MIN) runs on [TQ] vectors.  prev starts at
      -1 (unsigned 0xFFFFFFFF, i.e. c = INT32_MIN), which makes pass 1
      the plain unsigned minimum with the same code.  vs the round-4
      3-op compare/select extraction + MXU build: 24.8 -> 11.5 ms.

    `self_query` is accepted for API stability but needs no extra work:
    the exact-0 self distance makes the slot-0 contract structural.
    """
    del self_query  # structural under the exact FMA distance build
    tq = q_ref.shape[2]
    n = keys_ref.shape[2]

    d2 = jnp.zeros((tq, n), jnp.float32)
    for d in range(3):
        qcol = q_ref[0, d, :][:, None]  # [TQ, 1]
        krow = keys_ref[0, d, :][None, :]  # [1, N]
        diff = qcol - krow
        d2 = d2 + diff * diff

    lanes = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)
    mask = jnp.int32(~((1 << idx_bits) - 1))
    bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
    keys = jax.lax.bitwise_or(jax.lax.bitwise_and(bits, mask), lanes)

    # c = prev + 1 - INT32_MIN (wrapping), starting from prev = -1:
    # each pass's [TQ, N] work is ONE subtract + ONE min (see docstring)
    bias = jnp.int32(-0x7FFFFFFF)  # 1 - INT32_MIN mod 2^32
    c = jnp.full((tq,), jnp.int32(-0x80000000))
    idxs, dists = [], []
    for _ in range(k):
        prev = jnp.min(keys - c[:, None], axis=1) + c  # winner, unbiased
        amin = jax.lax.bitwise_and(prev, jnp.int32((1 << idx_bits) - 1))
        val = jax.lax.bitcast_convert_type(
            jax.lax.bitwise_and(prev, mask), jnp.float32
        )
        idxs.append(amin)
        dists.append(val)
        c = prev + bias

    idx_ref[0] = jnp.stack(idxs, axis=1)
    dist_ref[0] = jnp.stack(dists, axis=1)


def _knn_kernel(q_ref, keys_ref, idx_ref, dist_ref, *, k):
    # transposed layout: q_ref [1, 3, TQ], keys_ref [1, 3, N] — coordinates
    # as lane rows, so nothing pads a 3-wide lane dim to 128 (VMEM waste)
    tq = q_ref.shape[2]
    n = keys_ref.shape[2]

    d2 = jnp.zeros((tq, n), jnp.float32)
    for d in range(3):
        qcol = q_ref[0, d, :][:, None]  # [TQ, 1]
        krow = keys_ref[0, d, :][None, :]  # [1, N]
        diff = qcol - krow
        d2 = d2 + diff * diff

    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)

    idxs, dists = [], []
    for _ in range(k):
        m = jnp.min(d2, axis=1)  # [TQ]
        amin = jnp.argmin(d2, axis=1).astype(jnp.int32)  # [TQ]
        idxs.append(amin)
        dists.append(m)
        d2 = jnp.where(cols == amin[:, None], jnp.inf, d2)

    idx_ref[0] = jnp.stack(idxs, axis=1)
    dist_ref[0] = jnp.stack(dists, axis=1)


def _win_start(i, tq, W, NQ, NK):
    """Morton-band window start for query tile i — MUST match
    `banded_pallas._fwd_start` (with _ALIGN=128) so that banded-knn
    neighbor indices are in-band by construction for the banded
    neighborhood ops."""
    center = (2 * i * tq + tq) * NK // (2 * NQ)
    start = jnp.clip(center - W // 2, 0, NK - W)
    return (start // 128) * 128


def _knn_kernel_banded(q_ref, keys_ref, idx_ref, dist_ref, *, k, W,
                       NQ, NK, packed, idx_bits):
    """Banded (approximate) kNN: candidates restricted to the Morton
    window of W key rows around the query tile.  With Morton-sorted
    clouds ~96% of true k=8 neighbors lie within a 512-row window
    (docs/PERF_NOTES.md); the remaining slots take the nearest in-band
    candidates instead — and every returned index is in-band by
    construction, which lets the banded neighborhood kernels skip their
    out-of-band correction entirely."""
    i = pl.program_id(1)
    tq = q_ref.shape[2]
    start = _win_start(i, tq, W, NQ, NK)

    d2 = jnp.zeros((tq, W), jnp.float32)
    for d in range(3):
        qcol = q_ref[0, d, :][:, None]
        krow = keys_ref[0, d, pl.ds(start, W)][None, :]
        diff = qcol - krow
        d2 = d2 + diff * diff

    lanes = jax.lax.broadcasted_iota(jnp.int32, (tq, W), 1)
    if packed:
        mask = jnp.int32(~((1 << idx_bits) - 1))
        bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
        keys = jax.lax.bitwise_or(jax.lax.bitwise_and(bits, mask), lanes)
        # fused strict-greater extraction (see _knn_kernel_packed): keys
        # are unique and non-negative, so each pass is one biased
        # subtract + one signed min (the unsigned wraparound trick with
        # the sign-bit bias folded into the per-row subtrahend)
        bias = jnp.int32(-0x7FFFFFFF)  # 1 - INT32_MIN mod 2^32
        c = jnp.full((tq,), jnp.int32(-0x80000000))
        idxs, dists = [], []
        for _ in range(k):
            mk = jnp.min(keys - c[:, None], axis=1) + c
            amin = jax.lax.bitwise_and(mk, jnp.int32((1 << idx_bits) - 1))
            val = jax.lax.bitcast_convert_type(
                jax.lax.bitwise_and(mk, mask), jnp.float32)
            idxs.append(amin + start)
            dists.append(val)
            c = mk + bias
    else:
        idxs, dists = [], []
        for _ in range(k):
            m = jnp.min(d2, axis=1)
            amin = jnp.argmin(d2, axis=1).astype(jnp.int32)
            idxs.append(amin + start)
            dists.append(m)
            d2 = jnp.where(lanes == amin[:, None], jnp.inf, d2)

    idx_ref[0] = jnp.stack(idxs, axis=1)
    dist_ref[0] = jnp.stack(dists, axis=1)


def knn_banded(query, keys, k, window=512, tile_q=256, packed=True,
               interpret=False):
    """Morton-banded approximate kNN (see `_knn_kernel_banded`).

    query [B, N, 3], keys [B, M, 3] MUST be Morton-sorted (same cloud or
    query/key pair sorted along the same curve); N % tile_q == 0,
    window % 128 == 0, window <= M.  Returns (idx [B, N, k] int32 into
    keys, d2 [B, N, k] squared distances ascending).
    """
    query = query.astype(jnp.float32)
    keys = keys.astype(jnp.float32)
    B, N, _ = query.shape
    M = keys.shape[1]
    assert N % tile_q == 0 and window % 128 == 0 and window <= M, (
        N, M, window, tile_q)
    return _knn_banded_call(query, keys, k, window, tile_q, packed,
                            interpret)


@functools.partial(jax.jit, static_argnames=("k", "window", "tile_q",
                                             "packed", "interpret"))
def _knn_banded_call(query, keys, k, window, tile_q, packed, interpret):
    B, N, _ = query.shape
    M = keys.shape[1]
    q_t = jnp.transpose(query, (0, 2, 1))
    keys_t = jnp.transpose(keys, (0, 2, 1))
    idx_bits = max(13, (window - 1).bit_length())
    kernel = functools.partial(
        _knn_kernel_banded, k=k, W=window, NQ=N, NK=M, packed=packed,
        idx_bits=idx_bits)
    idx, d2 = pl.pallas_call(
        kernel,
        grid=(B, N // tile_q),
        in_specs=[
            pl.BlockSpec((1, 3, tile_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, M), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, k), jnp.int32),
            jax.ShapeDtypeStruct((B, N, k), jnp.float32),
        ],
        interpret=interpret,
    )(q_t, keys_t)
    return idx, d2


_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the 16 MB scoped limit


def _knn_kernel_slab(q_ref, keys_ref, vals_ref, idx_ref, *, k, slab):
    """One slab's exact top-k: grid step (b, query-tile i, slab s).

    Same unrolled min/argmin/mask extraction as `_knn_kernel`, over a
    [TQ, slab] distance tile.  Used by the slab-streamed large-k path —
    putting the slab on the GRID keeps the kernel at k unrolled passes
    (a Python loop over slabs inside one kernel multiplies the pass count
    by S and sends Mosaic compile time through the roof; fori_loop
    variants hang the backend compiler outright)."""
    s = pl.program_id(2)
    tq = q_ref.shape[2]
    start = s * slab

    d2 = jnp.zeros((tq, slab), jnp.float32)
    for d in range(3):
        qcol = q_ref[0, d, :][:, None]
        krow = keys_ref[0, d, :][None, :]
        diff = qcol - krow
        d2 = d2 + diff * diff

    lanes = jax.lax.broadcasted_iota(jnp.int32, (tq, slab), 1)
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.min(d2, axis=1)
        amin = jnp.argmin(d2, axis=1).astype(jnp.int32)
        vals.append(m)
        idxs.append(amin + start)
        d2 = jnp.where(lanes == amin[:, None], jnp.inf, d2)

    vals_ref[0, 0] = jnp.stack(vals, axis=1)
    idx_ref[0, 0] = jnp.stack(idxs, axis=1)


def knn_pallas(query, keys, k, tile_q=256, interpret=False, packed=False,
               self_query=False):
    """Exact kNN of `keys` for each `query` point (cross- or self-cloud).

    query: [B, M, 3] float32; keys: [B, N, 3] float32.
    Returns (idx [B, M, k] int32, d2 [B, M, k] float32 SQUARED distances,
    ascending).  Handles arbitrary M/N by padding: keys are padded with a
    far-away sentinel (never selected while k <= true N), queries padded and
    the extra rows sliced off.  The query-tile height adapts so the [TQ, N]
    distance tile stays within the VMEM budget; large k or N beyond the
    budget at TQ=128 routes to the slab-streamed kernel (Mosaic cannot
    lower query tiles narrower than one 128-lane vreg).

    self_query=True declares query IS keys (row m queries lane m): the
    packed kernel then pins each query's own lane into the zero-distance
    bucket, preserving the reference's self-at-slot-0 contract under its
    MXU distance build (`knn_bruteforce_kernel.cc:65-68`).
    """
    query = query.astype(jnp.float32)
    keys = keys.astype(jnp.float32)
    B, M, _ = query.shape
    N = keys.shape[1]

    n_pad = (-N) % 128
    if n_pad:
        keys = jnp.pad(keys, ((0, 0), (0, n_pad), (0, 0)),
                       constant_values=1e30)
        N = N + n_pad

    # large k keeps more live copies of the [TQ, N] distance tile in the
    # unrolled extraction (measured: k=50 at TQ=256, N=4096 hits the 16 MB
    # scoped-vmem limit) — those route to the slab kernel below
    use_slab = k >= 32
    while tile_q > 128 and tile_q * N * 4 > _VMEM_BUDGET:
        tile_q //= 2
    if tile_q * N * 4 > _VMEM_BUDGET:
        use_slab = True  # even a 128-row tile over-budgets: stream keys
    if M < tile_q:
        tile_q = max(8, M)  # single block == array dim: always lowerable
    m_pad = (-M) % tile_q
    if m_pad:
        query = jnp.pad(query, ((0, 0), (0, m_pad), (0, 0)))

    if use_slab:
        # 128-row query tile + 2048-key slabs: the distance tile is 1 MB
        # regardless of N, and the kernel stays at k unrolled passes
        tile_q = min(tile_q, 128)
        m_pad = (-M) % tile_q
        query = query[:, :M]
        if m_pad:
            query = jnp.pad(query, ((0, 0), (0, m_pad), (0, 0)))
        slab = min(2048, N)
        s_pad = (-N) % slab
        if s_pad:  # pad keys to a whole number of slabs (far sentinel)
            keys = jnp.pad(keys, ((0, 0), (0, s_pad), (0, 0)),
                           constant_values=1e30)
        idx, d2 = _knn_slabbed_call(query, keys, k, tile_q, slab,
                                    interpret)
    else:
        idx, d2 = _knn_pallas_call(query, keys, k, tile_q, interpret,
                                   packed, self_query)
    if m_pad:
        idx, d2 = idx[:, :M], d2[:, :M]
    return idx, d2


@functools.partial(jax.jit, static_argnames=("k", "tile_q", "slab",
                                             "interpret"))
def _knn_slabbed_call(query, keys, k, tile_q, slab, interpret):
    """Two stages: per-slab exact top-k on the grid, then an XLA merge.

    The union of per-slab top-k's contains the global top-k, so a stable
    argsort over the S*k candidates is exact.  Candidate order is
    slab-major then rank, so equal distances resolve to the lowest global
    index — the same tie rule as `_knn_kernel` and the reference's stable
    sort (`knn_bruteforce_kernel.cc:65-68`)."""
    B, M, _ = query.shape
    N = keys.shape[1]
    S = N // slab
    q_t = jnp.transpose(query, (0, 2, 1))
    keys_t = jnp.transpose(keys, (0, 2, 1))
    kernel = functools.partial(_knn_kernel_slab, k=k, slab=slab)
    vals, gidx = pl.pallas_call(
        kernel,
        grid=(B, M // tile_q, S),
        in_specs=[
            pl.BlockSpec((1, 3, tile_q), lambda b, i, s: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, slab), lambda b, i, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_q, k), lambda b, i, s: (b, s, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_q, k), lambda b, i, s: (b, s, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, M, k), jnp.float32),
            jax.ShapeDtypeStruct((B, S, M, k), jnp.int32),
        ],
        interpret=interpret,
    )(q_t, keys_t)
    # merge: [B, S, M, k] -> [B, M, S*k] candidates, stable-sorted
    vals = jnp.transpose(vals, (0, 2, 1, 3)).reshape(B, M, S * k)
    gidx = jnp.transpose(gidx, (0, 2, 1, 3)).reshape(B, M, S * k)
    order = jnp.argsort(vals, axis=-1, stable=True)[..., :k]
    d2 = jnp.take_along_axis(vals, order, axis=-1)
    idx = jnp.take_along_axis(gidx, order, axis=-1)
    return idx, d2


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_q", "interpret", "packed", "self_query"),
)
def _knn_pallas_call(query, keys, k, tile_q, interpret, packed=False,
                     self_query=False):
    B, M, _ = query.shape
    N = keys.shape[1]
    grid = (B, M // tile_q)

    q_t = jnp.transpose(query, (0, 2, 1))  # [B, 3, M]
    keys_t = jnp.transpose(keys, (0, 2, 1))  # [B, 3, N]

    if packed:
        idx_bits = max(13, (N - 1).bit_length())
        kernel = functools.partial(_knn_kernel_packed, k=k,
                                   idx_bits=idx_bits,
                                   self_query=self_query)
        idx, d2 = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 3, tile_q), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, N), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_q, k), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_q, k), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, M, k), jnp.int32),
                jax.ShapeDtypeStruct((B, M, k), jnp.float32),
            ],
            interpret=interpret,
        )(q_t, keys_t)
        return idx, d2

    kernel = functools.partial(_knn_kernel, k=k)
    idx, d2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tile_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M, k), jnp.int32),
            jax.ShapeDtypeStruct((B, M, k), jnp.float32),
        ],
        interpret=interpret,
    )(q_t, keys_t)
    return idx, d2
