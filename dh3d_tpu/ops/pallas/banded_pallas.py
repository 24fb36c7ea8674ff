"""Banded neighborhood weighted-sum: the gather-wall kernel.

Problem: every DH3D op that consumes a [B, N, K] neighborhood
(flex_conv moments, flex_avg, conv_pointset, three_interpolate) is
bottlenecked by XLA's per-element gather, which on this TPU sustains
~62 GB/s and is *insensitive to index locality* (measured: random vs
banded vs self indices all ~8.7 ms for a [20,8192,8,128] gather) — it is
descriptor-issue-rate bound, not bandwidth bound.

Fix: sort points along a Morton (Z-order) space-filling curve.  On Oxford
clouds ~91% of k=8 neighbor indices then fall within ±128 rows of the
query and ~96% within ±512 (measured across demo clouds; see
docs/PERF_NOTES.md).  The weighted neighborhood sum

    M[b, n, p, :] = sum_k w[b, n, k, p] * feat[b, nbh[b, n, k], :]

splits into an IN-BAND part — computed by a Pallas kernel as K one-hot
[T, W] x [W, C] matmuls against a contiguous feature window DMA'd into
VMEM (the one-hot rows are exact in bf16, so the MXU does the "gather")
— plus a sparse OUT-OF-BAND correction computed by XLA on a compacted
fixed-capacity list of entries (3-9% of them), with a `lax.cond` fallback
to the dense gather path in the (never-observed) case the capacity
overflows, so the op is exact for any index distribution.

Gradient: a custom VJP runs the transposed banded kernel (the band is
symmetric).  Weights and neighborhood indices get zero cotangents — the
reference CUDA kernels likewise have no position gradient
(`user_ops/kernels/flex_conv_kernel_gpu.cu.cc` implements grads for
theta/bias/features only).

Sizes N (queries) and M (keys) may differ (three_interpolate); the window
start then advances at rate M/N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALIGN = 128  # window starts align to the lane tile; also matches
              # knn_pallas._win_start so banded-knn indices are
              # in-band by construction for these kernels


# KNOWN BACKEND PITFALL (do not feed these kernels mixed tracer/concrete
# operands): when a kernel operand is a jit closure CONSTANT while another
# is traced, XLA cross-program-prefetches the constant into alternate
# memory (layout `...S(1)`) and this backend's Mosaic custom call misreads
# such operands (observed: position rows 1-2 of the flex-moments kernel
# read wrong -> moments p=2/3 off by ~200x, while traced operands are
# exact).  Neither `optimization_barrier` (a layout-propagation boundary)
# nor adding an opaque runtime zero helps — the S(1) promotion happens
# either way.  The op-level dispatchers guard with
# `flex._mixed_tracer_const` and fall back to exact XLA formulations;
# all-traced (production jit) and all-concrete (eager) calls are safe.


def _fwd_start(i, T, W, N, M):
    """Window start (in key rows) for query tile i — static-int math."""
    center = (2 * i * T + T) * M // (2 * N)  # tile center mapped to keys
    start = jnp.clip(center - W // 2, 0, M - W)
    return (start // _ALIGN) * _ALIGN


def _starts_host(N, M, T, W):
    """[N] per-query window start, mirroring `_fwd_start` (host/XLA)."""
    i = jnp.arange(N, dtype=jnp.int32) // T
    center = (2 * i * T + T) * M // (2 * N)
    start = jnp.clip(center - W // 2, 0, M - W)
    return (start // _ALIGN) * _ALIGN


def _fwd_kernel(feat_hbm, idx_ref, w_ref, out_ref, f_win, sem, *,
                T, W, K, P, N, M, C, win_dtype, prec):
    b = pl.program_id(0)
    i = pl.program_id(1)
    start = _fwd_start(i, T, W, N, M)
    cp = pltpu.make_async_copy(feat_hbm.at[b, pl.ds(start, W), :],
                               f_win, sem)
    cp.start()
    cp.wait()
    colw = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
    fw = f_win[:, :]
    # stack the K one-hots into ONE [K*T, W] x [W, C] matmul — K small
    # matmuls underutilize the MXU (measured ~25% faster stacked)
    ohs = []
    for k in range(K):
        rel = idx_ref[0, k, :] - start  # [T]; out-of-band never matches
        ohs.append((colw == rel[:, None]).astype(win_dtype))
    g_all = jnp.dot(jnp.concatenate(ohs, axis=0), fw,
                    preferred_element_type=jnp.float32,
                    precision=prec)  # [K*T, C] == gathered rows
    accs = [jnp.zeros((T, C), jnp.float32) for _ in range(P)]
    for k in range(K):
        g = g_all[k * T:(k + 1) * T]
        for p in range(P):
            accs[p] = accs[p] + w_ref[0, p * K + k, :][:, None] * g
    out_ref[0] = jnp.concatenate(accs, axis=-1)


def _bwd_kernel(dmw_hbm, idx_ref, out_ref, dmw_win, sem, *,
                T, W, WB, K, N, M, C, win_dtype, prec):
    """Transpose: dfeat[j, :] = sum over in-band (n, k) with nbh==j of
    dmw[n, k, :], where dmw[n, k, :] = sum_p w[n,k,p] * dM[n,p,:] is
    pre-contracted OUTSIDE the kernel (an elementwise einsum — no gather),
    so the kernel is K compares + K one-hot matmuls, same shape of work as
    the forward.  Grid tiles run over KEY rows j; the window runs over
    QUERY rows n (width WB = W + 2T, enough to cover every query whose
    forward window contains j, clamped edges included).  The in-band test
    is recomputed per entry from the forward window formula, so fwd/bwd
    agree exactly."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    # reverse window over queries: center j*T mapped back at rate N/M
    center = (2 * j * T + T) * N // (2 * M)
    qstart = jnp.clip(center - WB // 2, 0, N - WB)
    qstart = (qstart // _ALIGN) * _ALIGN
    cp = pltpu.make_async_copy(dmw_hbm.at[b, pl.ds(qstart, WB), :],
                               dmw_win, sem)
    cp.start()
    cp.wait()

    j_ids = j * T + jax.lax.broadcasted_iota(jnp.int32, (T, WB), 0)
    # forward window start of each query column n (absolute):
    n_abs = qstart + jax.lax.broadcasted_iota(jnp.int32, (T, WB), 1)
    fcenter = (2 * (n_abs // T) * T + T) * M // (2 * N)
    fstart = jnp.clip(fcenter - W // 2, 0, M - W)
    fstart = (fstart // _ALIGN) * _ALIGN
    inband = (j_ids >= fstart) & (j_ids < fstart + W)

    out = jnp.zeros((T, C), jnp.float32)
    for k in range(K):
        # slice the QUERY window out of the full [K, N] rows
        # (qstart is _ALIGN=128-aligned, so the lane slice is provable)
        idx_row = idx_ref[0, k, pl.ds(qstart, WB)][None, :]  # [1, WB]
        oh = ((j_ids == idx_row) & inband).astype(win_dtype)
        out = out + jnp.dot(
            oh, dmw_win[:, k * C:(k + 1) * C],
            preferred_element_type=jnp.float32, precision=prec)
    out_ref[0] = out


def _bwd_w1_kernel(dm_hbm, idx_ref, w_ref, out_ref, dm_win, sem, *,
                   T, W, WB, K, N, M, C, win_dtype, prec):
    """Fused P=1 transpose: dfeat[j,:] = sum over in-band (n,k) with
    nbh[n,k]==j of w[n,k] * dm[n,:].

    Equivalent to `_bwd_from_dmw` on dmw[n,k,:] = w[n,k]*dm[n,:], but the
    [B, N, K, C] cotangent never exists in HBM — the per-k scaling happens
    on the VPU against the window already resident in VMEM (K broadcast
    multiplies of [WB, C]).  Covers every production P=1 user of the
    generic kernel: flex_avg, conv_pointset, three_interpolate."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    center = (2 * j * T + T) * N // (2 * M)
    qstart = jnp.clip(center - WB // 2, 0, N - WB)
    qstart = (qstart // _ALIGN) * _ALIGN
    cp = pltpu.make_async_copy(dm_hbm.at[b, pl.ds(qstart, WB), :],
                               dm_win, sem)
    cp.start()

    j_ids = j * T + jax.lax.broadcasted_iota(jnp.int32, (T, WB), 0)
    n_abs = qstart + jax.lax.broadcasted_iota(jnp.int32, (T, WB), 1)
    fcenter = (2 * (n_abs // T) * T + T) * M // (2 * N)
    fstart = jnp.clip(fcenter - W // 2, 0, M - W)
    fstart = (fstart // _ALIGN) * _ALIGN
    inband = (j_ids >= fstart) & (j_ids < fstart + W)

    cp.wait()
    dmw = dm_win[:, :]
    out = jnp.zeros((T, C), jnp.float32)
    for k in range(K):
        idx_row = idx_ref[0, k, pl.ds(qstart, WB)][None, :]  # [1, WB]
        oh = ((j_ids == idx_row) & inband).astype(win_dtype)
        w_col = w_ref[0, k, pl.ds(qstart, WB)]  # [WB] f32
        scaled = (dmw * w_col[:, None]).astype(win_dtype)
        out = out + jnp.dot(oh, scaled,
                            preferred_element_type=jnp.float32,
                            precision=prec)
    out_ref[0] = out


def _bwd_slot_kernel(dval_hbm, slot_hbm, idx_ref, out_ref, dval_win,
                     slot_win, sem1, sem2, *, T, W, WB, K, N, M, C,
                     win_dtype, prec):
    """Fused max-pool transpose: dfeat[j,:] += dval[n,:] wherever
    nbh[n, slot[n,c]] == j (in-band).  Equivalent to `_bwd_from_dmw` on
    dmk[n,k,:] = dval[n,:]*[slot(n,:)==k], without materializing the
    [B, N, K, C] slot-masked cotangent in HBM — the per-channel slot mask
    is applied on the VPU in VMEM (K compare+selects of [WB, C])."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    center = (2 * j * T + T) * N // (2 * M)
    qstart = jnp.clip(center - WB // 2, 0, N - WB)
    qstart = (qstart // _ALIGN) * _ALIGN
    cp1 = pltpu.make_async_copy(dval_hbm.at[b, pl.ds(qstart, WB), :],
                                dval_win, sem1)
    cp1.start()
    cp2 = pltpu.make_async_copy(slot_hbm.at[b, pl.ds(qstart, WB), :],
                                slot_win, sem2)
    cp2.start()

    j_ids = j * T + jax.lax.broadcasted_iota(jnp.int32, (T, WB), 0)
    n_abs = qstart + jax.lax.broadcasted_iota(jnp.int32, (T, WB), 1)
    fcenter = (2 * (n_abs // T) * T + T) * M // (2 * N)
    fstart = jnp.clip(fcenter - W // 2, 0, M - W)
    fstart = (fstart // _ALIGN) * _ALIGN
    inband = (j_ids >= fstart) & (j_ids < fstart + W)

    cp1.wait()
    cp2.wait()
    dval = dval_win[:, :]
    slot = slot_win[:, :]
    out = jnp.zeros((T, C), jnp.float32)
    for k in range(K):
        idx_row = idx_ref[0, k, pl.ds(qstart, WB)][None, :]  # [1, WB]
        oh = ((j_ids == idx_row) & inband).astype(win_dtype)
        masked = jnp.where(slot == k, dval, 0.0).astype(win_dtype)
        out = out + jnp.dot(oh, masked,
                            preferred_element_type=jnp.float32,
                            precision=prec)
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("T", "W", "WB", "M", "fast",
                                             "interpret"))
def _bwd_from_w1(dm, idx_t, w_t, T, W, WB, M, fast, interpret):
    """dm [B, N, C], w_t [B, K, N] -> dfeat [B, M, C] (fused P=1 path)."""
    B, N, C0 = dm.shape
    K = idx_t.shape[1]
    cpad = (-C0) % 128
    if cpad:
        dm = jnp.pad(dm, ((0, 0), (0, 0), (0, cpad)))
    C = C0 + cpad
    win_dtype = jnp.bfloat16 if fast else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    if fast:
        dm = dm.astype(jnp.bfloat16)  # halves the window DMA traffic
    out = pl.pallas_call(
        functools.partial(_bwd_w1_kernel, T=T, W=W, WB=WB, K=K, N=N,
                          M=M, C=C, win_dtype=win_dtype, prec=prec),
        grid=(B, M // T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, K, N), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, N), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((WB, C), dm.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(dm, idx_t, w_t)
    return out[..., :C0]


@functools.partial(jax.jit, static_argnames=("T", "W", "WB", "M", "fast",
                                             "interpret"))
def _bwd_from_slot(dval, slot, idx_t, T, W, WB, M, fast, interpret):
    """dval/slot [B, N, C] -> dfeat [B, M, C] (fused max-pool path)."""
    B, N, C0 = dval.shape
    K = idx_t.shape[1]
    cpad = (-C0) % 128
    if cpad:
        dval = jnp.pad(dval, ((0, 0), (0, 0), (0, cpad)))
        # padded channels: slot pads with -1 (matches no k, zero grad)
        slot = jnp.pad(slot, ((0, 0), (0, 0), (0, cpad)),
                       constant_values=-1)
    C = C0 + cpad
    win_dtype = jnp.bfloat16 if fast else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    if fast:
        dval = dval.astype(jnp.bfloat16)  # halves the window DMA traffic
    out = pl.pallas_call(
        functools.partial(_bwd_slot_kernel, T=T, W=W, WB=WB, K=K, N=N,
                          M=M, C=C, win_dtype=win_dtype, prec=prec),
        grid=(B, M // T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, K, N), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((WB, C), dval.dtype),
                        pltpu.VMEM((WB, C), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(dval, slot, idx_t)
    return out[..., :C0]


def _pad_c(x):
    c = x.shape[-1]
    pad = (-c) % 128
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    return x, c, c + pad


@functools.partial(jax.jit, static_argnames=("P", "T", "W", "fast",
                                             "interpret"))
def _banded_fwd_call(feat, idx_t, w_pk, P, T, W, fast, interpret):
    B, M, C0 = feat.shape
    N = idx_t.shape[-1]
    K = idx_t.shape[1]
    feat, C0, C = _pad_c(feat)
    win_dtype = jnp.bfloat16 if fast else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    if fast:
        feat = feat.astype(jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, W=W, K=K, P=P, N=N, M=M, C=C,
                          win_dtype=win_dtype, prec=prec),
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, K, T), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P * K, T), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, P * C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, P * C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((W, C), win_dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(feat, idx_t, w_pk)
    if C != C0:
        out = out.reshape(B, N, P, C)[..., :C0].reshape(B, N, P * C0)
    return out


@functools.partial(jax.jit, static_argnames=("P", "T", "W", "WB", "M",
                                             "fast", "interpret"))
def _banded_bwd_call(dm, idx_t, weights, P, T, W, WB, M, fast, interpret):
    """dm [B, N, P*C], weights [B, N, K, P] -> dfeat [B, M, C].

    Pre-contracts weights into the cotangent (dmw[n,k,:] = sum_p w*dM —
    an elementwise einsum, no gather) so the kernel does only K compares
    + K one-hot matmuls per tile, like the forward."""
    B, N, PC0 = dm.shape
    C0 = PC0 // P
    # precision only in exact mode: fast mode rounds dmw to bf16 in the
    # kernel anyway, and a 6-pass highest-precision einsum here measured
    # 5.6x on the WHOLE train step (it runs per backward at [B,N,K,C])
    dmw = jnp.einsum("bnkp,bnpc->bnkc", weights,
                     dm.reshape(B, N, P, C0),
                     precision=None if fast else "highest",
                     preferred_element_type=jnp.float32)
    return _bwd_from_dmw(dmw, idx_t, T, W, WB, M, fast, interpret)


@functools.partial(jax.jit, static_argnames=("T", "W", "WB", "M", "fast",
                                             "interpret"))
def _bwd_from_dmw(dmw, idx_t, T, W, WB, M, fast, interpret):
    """Transpose-scatter of a per-(query, k) cotangent:
    dfeat[j, :] = sum over in-band (n, k) with nbh[n,k]==j of dmw[n,k,:].
    dmw [B, N, K, C0] -> dfeat [B, M, C0].  Shared by the weighted-sum
    VJP (dmw = w-contracted dM) and the max-pool VJP (dmw = slot-masked
    dval)."""
    B, N, K, C0 = dmw.shape
    # pad each K-block's C to 128 so in-kernel slices are lane-aligned
    cpad = (-C0) % 128
    if cpad:
        dmw = jnp.pad(dmw, ((0, 0), (0, 0), (0, 0), (0, cpad)))
    C = C0 + cpad
    dmw = dmw.reshape(B, N, K * C)
    win_dtype = jnp.bfloat16 if fast else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    if fast:
        dmw = dmw.astype(jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, W=W, WB=WB, K=K, N=N,
                          M=M, C=C, win_dtype=win_dtype, prec=prec),
        grid=(B, M // T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, K, N), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((WB, K * C), dmw.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(dmw, idx_t)
    return out[..., :C0]


# ------------------ specialized flex-conv moments kernel ------------------
#
# The generic `banded_weighted_sum` accumulates the P weighted copies on the
# VPU (K*P broadcast-FMAs per tile) — measured as over half the kernel time.
# For flex_conv the weights are AFFINE IN THE KEY POSITION:
#     w[n, k, p] = pos_p[nbh[n, k]] - pos_p[nbh[n, 0]]        (p = 1..3)
#     w[n, k, 0] = 1
# so with the neighbor-count matrix  cnt[t, j] = #{k : nbh[t, k] == start+j}
# every moment is a count matmul with position-scaled columns:
#     M_0[t] = cnt[t] @ fw
#     M_p[t] = (cnt[t] * pos'_p) @ fw  -  pos0'_p[t] * M_0[t]
# (pos' = pos - c, centered per tile: the raw coordinates are ~100 m while
# deltas are ~0.5 m, so uncentered products would cancel catastrophically in
# bf16).  The scaled rows are split hi/lo into two bf16 planes — bf16x2
# carries ~16 mantissa bits, enough that the subtraction above is exact to
# ~1e-4 relative — and all 7 planes go through ONE stacked [7T, W] x [W, C]
# MXU matmul.  The P*K VPU accumulation loop disappears entirely.


def _hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _moments_fwd_kernel(feat_hbm, pos_ref, pos0_ref, idx_ref, out_ref,
                        f_win, sem, *, T, W, K, N, C):
    b = pl.program_id(0)
    i = pl.program_id(1)
    start = _fwd_start(i, T, W, N, N)
    cp = pltpu.make_async_copy(feat_hbm.at[b, pl.ds(start, W), :],
                               f_win, sem)
    cp.start()

    colw = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
    cnt = jnp.zeros((T, W), jnp.float32)
    for k in range(K):
        rel = idx_ref[0, k, :] - start  # [T]; out-of-band never matches
        cnt = cnt + (colw == rel[:, None]).astype(jnp.float32)

    planes = [cnt.astype(jnp.bfloat16)]  # counts <= K are exact in bf16
    cs = []
    # one [8, W] dynamic lane slice, then static sublane indexing (a
    # per-row `pos_ref[0, p, pl.ds(...)]` with p > 0 mis-lowers in Mosaic;
    # the sublane dim is padded 3 -> 8 by the caller: sublane-3 operands
    # that are jit CONSTANTS reach the custom call with wrong row strides)
    posw3 = pos_ref[0, :, pl.ds(start, W)]  # [8, W] f32 key positions
    for p in range(3):
        posw = posw3[p]
        c = jnp.mean(posw)  # per-tile center: deltas survive bf16 hi/lo
        cs.append(c)
        s = cnt * (posw - c)[None, :]
        hi, lo = _hi_lo(s)
        planes.append(hi)
        planes.append(lo)

    cp.wait()
    fw = f_win[:, :]
    g = jnp.dot(jnp.concatenate(planes, axis=0), fw,
                preferred_element_type=jnp.float32)  # [7T, C]
    m0 = g[0:T]
    out = [m0]
    pos03 = pos0_ref[0, :, :]  # [8, T] (rows 3.. are padding)
    for p in range(3):
        pos0 = pos03[p] - cs[p]  # [T] centered self positions
        mp = (g[(1 + 2 * p) * T:(2 + 2 * p) * T]
              + g[(2 + 2 * p) * T:(3 + 2 * p) * T]
              - pos0[:, None] * m0)
        out.append(mp)
    out_ref[0] = jnp.concatenate(out, axis=-1)  # [T, 4C] p-major


def _moments_bwd_kernel(dm_hbm, pos_ref, pos0_ref, idx_ref, out_ref,
                        dm_win, sem, *, T, W, WB, K, N, C, lo):
    """Transpose of `_moments_fwd_kernel` w.r.t. features:

      dfeat[j, :] = sum over in-band (n, k) with nbh[n,k]==j of
                    (dM_0[n] + sum_p (pos_p[j] - pos0_p[n]) * dM_p[n])
                  = Rcnt @ A  +  sum_p pos'_p[j] * (Rcnt @ dM_p)
      with  Rcnt[j, n] = #{k : nbh[n, k] == j}  (in-band entries only)
      and   A[n] = dM_0[n] - sum_p pos0'_p[n] * dM_p[n]   (built in-kernel
            at f32, so the pos0/poskey cancellation stays exact).

    A and each dM_p are hi/lo split into bf16 planes -> one stacked
    [T, WB] x [WB, 8C] matmul; centering uses the j-tile's key positions."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    center = (2 * j * T + T) * N // (2 * N)  # == j*T + T//2 (N == M)
    qstart = jnp.clip(center - WB // 2, 0, N - WB)
    qstart = (qstart // _ALIGN) * _ALIGN
    cp = pltpu.make_async_copy(dm_hbm.at[b, pl.ds(qstart, WB), :],
                               dm_win, sem)
    cp.start()

    j_ids = j * T + jax.lax.broadcasted_iota(jnp.int32, (T, WB), 0)
    n_abs = qstart + jax.lax.broadcasted_iota(jnp.int32, (T, WB), 1)
    fcenter = (2 * (n_abs // T) * T + T) // 2
    fstart = jnp.clip(fcenter - W // 2, 0, N - W)
    fstart = (fstart // _ALIGN) * _ALIGN
    inband = (j_ids >= fstart) & (j_ids < fstart + W)

    rcnt = jnp.zeros((T, WB), jnp.float32)
    for k in range(K):
        idx_row = idx_ref[0, k, pl.ds(qstart, WB)][None, :]  # [1, WB]
        rcnt = rcnt + ((j_ids == idx_row) & inband).astype(jnp.float32)
    rcnt = rcnt.astype(jnp.bfloat16)  # counts <= K exact

    cp.wait()
    posj3 = pos_ref[0, :, pl.ds(j * T, T)]     # [3, T] key positions
    pos03 = pos0_ref[0, :, pl.ds(qstart, WB)]  # [3, WB] self positions
    cs = [jnp.mean(posj3[p]) for p in range(3)]
    dm0 = dm_win[:, 0:C]
    a = dm0
    dmps = []
    for p in range(3):
        dmp = dm_win[:, (1 + p) * C:(2 + p) * C]
        dmps.append(dmp)
        pos0 = pos03[p] - cs[p]  # [WB] centered
        a = a - pos0[:, None] * dmp

    planes = []
    if lo:
        for x in (a, *dmps):
            h, l = _hi_lo(x)
            planes.append(h)
            planes.append(l)
    else:
        # single-plane bf16 cotangent (~3e-3 relative on dfeat): gradients
        # tolerate bf16 rounding — this is the same precision class as the
        # forward's own bf16 feature window, at half the matmul/VPU work
        planes = [x.astype(jnp.bfloat16) for x in (a, *dmps)]
    span = 2 if lo else 1
    g = jnp.dot(rcnt, jnp.concatenate(planes, axis=-1),
                preferred_element_type=jnp.float32)  # [T, 4C or 8C]

    def plane(i):
        base = i * span * C
        gp = g[:, base:base + C]
        if lo:
            gp = gp + g[:, base + C:base + 2 * C]
        return gp

    out = plane(0)  # Rcnt @ A
    for p in range(3):
        posj = posj3[p] - cs[p]  # [T] key positions, centered
        out = out + posj[:, None] * plane(1 + p)
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("T", "W", "interpret",
                                             "keep_pad"))
def _moments_fwd_call(feat, pos_t, pos0_t, idx_t, T, W, interpret,
                      keep_pad=False):
    B, N, C0 = feat.shape
    K = idx_t.shape[1]
    feat, C0, C = _pad_c(feat)
    if keep_pad:
        C0 = C  # emit [B, N, 4*Cpad]; the caller pads the weight rows
    feat = feat.astype(jnp.bfloat16)
    # sublane pad 3 -> 8 keeps the position operands on native tile rows
    pos_t = jnp.pad(pos_t, ((0, 0), (0, 5), (0, 0)))
    pos0_t = jnp.pad(pos0_t, ((0, 0), (0, 5), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_moments_fwd_kernel, T=T, W=W, K=K, N=N, C=C),
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, T), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, T), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, 4 * C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, 4 * C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((W, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(feat, pos_t, pos0_t, idx_t)
    if C != C0:
        out = out.reshape(B, N, 4, C)[..., :C0].reshape(B, N, 4 * C0)
    return out


@functools.partial(jax.jit, static_argnames=("T", "W", "WB", "interpret",
                                             "lo"))
def _moments_bwd_call(dm, pos_t, pos0_t, idx_t, T, W, WB, interpret,
                      lo=True):
    B, N, C4 = dm.shape
    C0 = C4 // 4
    K = idx_t.shape[1]
    cpad = (-C0) % 128
    if cpad:
        dm = jnp.pad(dm.reshape(B, N, 4, C0),
                     ((0, 0), (0, 0), (0, 0), (0, cpad))).reshape(B, N, -1)
    C = C0 + cpad
    # sublane pad 3 -> 8 (see _moments_fwd_call)
    pos_t = jnp.pad(pos_t, ((0, 0), (0, 5), (0, 0)))
    pos0_t = jnp.pad(pos0_t, ((0, 0), (0, 5), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_moments_bwd_kernel, T=T, W=W, WB=WB, K=K, N=N,
                          C=C, lo=lo),
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, N), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, N), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, N), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((WB, 4 * C), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(dm, pos_t, pos0_t, idx_t)
    return out[..., :C0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def flex_moments_banded_fast(features, positions, pos0, nbh,
                             tile=256, window=512, interpret=False,
                             keep_pad=False, bwd_lo=True):
    """Flex-conv neighborhood moments on the specialized banded kernel.

    features [B, N, C]; positions [B, N, 3] (same set: N == M); pos0
    [B, N, 3] = positions gathered at nbh[:, :, 0] (the delta origin);
    nbh [B, N, K] int32, every index ASSUMED in-band for its tile window
    (use indices from `knn_pallas.knn_banded` with the same tile/window).
    Returns [B, N, 4*C] p-major moments: [sum_k f, sum_k dx*f, dy*f, dz*f].

    `keep_pad=True` returns the moments at the kernel's lane-padded
    channel count 4*Cpad (Cpad = C rounded up to 128) instead of slicing
    back — callers pad the weight-matrix rows with zeros (exact) and feed
    the padded moments straight into the output matmul, which removes a
    pad + slice + two [B, N, 4*Cpad] layout copies per conv from the hot
    path (measured ~6 ms/step at [20, 8192] x2 convs).

    `bwd_lo` selects the moments-backward cotangent precision: True =
    hi/lo bf16x2 planes (~1e-4 relative), False = single bf16 plane
    (~3e-3 relative, half the backward kernel work; cfg.fast_grads).  A
    static per-call kernel argument — two models traced in one process
    can use different settings without cross-contamination.

    Differentiable in `features`; positions/pos0/nbh get zero cotangent
    (reference parity: the CUDA flex kernels have no position gradient).
    """
    idx_t = jnp.transpose(nbh, (0, 2, 1)).astype(jnp.int32)
    pos_t = jnp.transpose(positions, (0, 2, 1)).astype(jnp.float32)
    pos0_t = jnp.transpose(pos0, (0, 2, 1)).astype(jnp.float32)
    return _moments_fwd_call(features, pos_t, pos0_t, idx_t, tile, window,
                             interpret, keep_pad)


def _moments_vjp_fwd(features, positions, pos0, nbh, tile, window,
                     interpret, keep_pad, bwd_lo):
    out = flex_moments_banded_fast(features, positions, pos0, nbh, tile,
                                   window, interpret, keep_pad, bwd_lo)
    # `features` rides along only for its (static) shape/dtype — residual
    # leaves must be JAX types
    return out, (features, positions, pos0, nbh)


def _moments_vjp_bwd(tile, window, interpret, keep_pad, bwd_lo, res, dm):
    features, positions, pos0, nbh = res
    fdtype = features.dtype
    N = nbh.shape[1]
    idx_t = jnp.transpose(nbh, (0, 2, 1)).astype(jnp.int32)
    pos_t = jnp.transpose(positions, (0, 2, 1)).astype(jnp.float32)
    pos0_t = jnp.transpose(pos0, (0, 2, 1)).astype(jnp.float32)
    WB = window + 2 * tile
    if WB > N:
        WB = N
    dfeat = _moments_bwd_call(dm.astype(jnp.float32), pos_t, pos0_t,
                              idx_t, tile, window, WB, interpret,
                              lo=bwd_lo)
    C0 = features.shape[-1]
    if dfeat.shape[-1] != C0:  # keep_pad: dm was lane-padded
        dfeat = dfeat[..., :C0]
    return (dfeat.astype(fdtype), None, None, None)


flex_moments_banded_fast.defvjp(_moments_vjp_fwd, _moments_vjp_bwd)


# ------------------- out-of-band correction (XLA, exact) -------------------

def _oob_mask(nbh, starts, W):
    s = starts[None, :, None]
    return (nbh < s) | (nbh >= s + W)


def _compact_oob(oob, cap):
    """Fixed-capacity compaction of True entries of oob [B, NK].
    Returns (entries [B, cap] int32 with -1 padding, count [B])."""
    B, NK = oob.shape
    pos = jnp.cumsum(oob, axis=1) - 1
    slot = jnp.where(oob, pos, cap)  # non-oob -> dropped slot
    comp = jnp.full((B, cap + 1), -1, jnp.int32)
    comp = comp.at[
        jnp.arange(B, dtype=jnp.int32)[:, None], slot
    ].set(jnp.broadcast_to(jnp.arange(NK, dtype=jnp.int32), (B, NK)),
          mode="drop")
    return comp[:, :cap], jnp.sum(oob, axis=1)


def _oob_correction_fwd(feat, nbh, w, starts, W, cap):
    """Exact contribution of out-of-band entries to M [B, N, P*C]."""
    B, N, K = nbh.shape
    P = w.shape[-1]
    C = feat.shape[-1]
    oob = _oob_mask(nbh, starts, W).reshape(B, N * K)
    entries, count = _compact_oob(oob, cap)
    valid = entries >= 0
    q = jnp.where(valid, entries // K, 0)
    k = jnp.where(valid, entries % K, 0)
    j = jnp.take_along_axis(nbh.reshape(B, N * K),
                            jnp.where(valid, entries, 0), axis=1)
    f = jnp.take_along_axis(feat, j[..., None], axis=1)  # [B, cap, C]
    ws = jnp.take_along_axis(
        w.reshape(B, N * K, P), jnp.where(valid, entries, 0)[..., None],
        axis=1)  # [B, cap, P]
    ws = ws * valid[..., None]
    contrib = (ws[..., :, None] * f[..., None, :]).reshape(B, -1, P * C)
    corr = jnp.zeros((B, N, P * C), contrib.dtype)
    corr = corr.at[jnp.arange(B)[:, None], q].add(contrib, mode="drop")
    return corr, count


def _oob_correction_bwd(dm, nbh, w, starts, W, cap, M):
    """Exact out-of-band contribution to dfeat [B, M, C]."""
    B, N, K = nbh.shape
    P = w.shape[-1]
    C = dm.shape[-1] // P
    oob = _oob_mask(nbh, starts, W).reshape(B, N * K)
    entries, _ = _compact_oob(oob, cap)
    valid = entries >= 0
    q = jnp.where(valid, entries // K, 0)
    j = jnp.take_along_axis(nbh.reshape(B, N * K),
                            jnp.where(valid, entries, 0), axis=1)
    dmq = jnp.take_along_axis(dm, q[..., None], axis=1)  # [B, cap, P*C]
    ws = jnp.take_along_axis(
        w.reshape(B, N * K, P), jnp.where(valid, entries, 0)[..., None],
        axis=1) * valid[..., None]
    contrib = jnp.einsum("bep,bepc->bec", ws,
                         dmq.reshape(B, -1, P, C),
                         precision="highest")  # [B, cap, C]
    dfeat = jnp.zeros((B, M, C), contrib.dtype)
    dfeat = dfeat.at[jnp.arange(B)[:, None],
                     jnp.where(valid, j, 0)].add(
        contrib * valid[..., None], mode="drop")
    return dfeat


def _dense_fwd(feat, nbh, w):
    f_k = jax.vmap(lambda v, i: v[i])(feat, nbh)  # [B,N,K,C]
    B, N, K, C = f_k.shape
    P = w.shape[-1]
    # precision matters: the TPU default einsum is one-pass bf16, and
    # this dense path is the EXACTNESS fallback (observed 4e-2 abs err
    # without it on hardware)
    return jnp.einsum("bnkp,bnkc->bnpc", w, f_k,
                      precision="highest").reshape(B, N, P * C)


def _dense_bwd(dm, nbh, w, M):
    B, N, K = nbh.shape
    P = w.shape[-1]
    C = dm.shape[-1] // P
    contrib = jnp.einsum("bnkp,bnpc->bnkc", w, dm.reshape(B, N, P, C),
                         precision="highest")
    flat_idx = (nbh + (jnp.arange(B, dtype=nbh.dtype) * M)[:, None, None])
    out = jax.ops.segment_sum(contrib.reshape(-1, C),
                              flat_idx.reshape(-1), num_segments=B * M)
    return out.reshape(B, M, C)


# ------------------------------ public op ------------------------------

@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(3, 4, 5, 6, 7, 8))
def banded_weighted_sum(features, nbh, weights, P=None, tile=256,
                        window=512, fast=True, interpret=False,
                        assume_inband=False):
    """M[b,n,p,:] = sum_k weights[b,n,k,p] * features[b, nbh[b,n,k], :].

    features [B, M, C]; nbh [B, N, K] int32; weights [B, N, K, P].
    Returns [B, N, P*C] (p-major).  Exact for any index distribution
    (in-band Pallas kernel + compacted out-of-band XLA correction with a
    dense fallback on capacity overflow); `fast` rounds the in-band
    feature window to bf16 (~1e-3 relative).  Requires N, M divisible by
    `tile`; intended for Morton-ordered clouds where most neighbor
    indices are near-diagonal (docs/PERF_NOTES.md).

    Differentiable in `features` (transposed banded kernel).  `weights`
    receives ZERO cotangent — reference parity: the CUDA flex kernels
    implement no position gradient either (SURVEY.md §2.1 N2).

    `assume_inband=True` skips the correction entirely — valid ONLY when
    the caller guarantees every index is inside its window (e.g. indices
    from `knn_pallas.knn_banded` with the same tile/window).
    """
    out, _ = _banded_fwd_impl(features, nbh, weights, P, tile, window,
                              fast, interpret, assume_inband)
    return out


def _banded_fwd_impl(features, nbh, weights, P, tile, window, fast,
                     interpret, assume_inband=False):
    B, M, C = features.shape
    N, K = nbh.shape[1], nbh.shape[2]
    P = weights.shape[-1]
    idx_t = jnp.transpose(nbh, (0, 2, 1)).astype(jnp.int32)
    w_pk = jnp.transpose(weights, (0, 3, 2, 1)).reshape(B, P * K, N)
    w_pk = w_pk.astype(jnp.float32)
    inband = _banded_fwd_call(features, idx_t, w_pk, P, tile, window,
                              fast, interpret)
    if assume_inband:
        return inband, (features, nbh, weights)
    starts = _starts_host(N, M, tile, window)
    cap = max(256, (N * K) // 8)
    corr, count = _oob_correction_fwd(features, nbh, weights, starts,
                                      window, cap)
    ok = jnp.all(count <= cap)
    out = jax.lax.cond(
        ok,
        lambda: inband + corr,
        lambda: _dense_fwd(features, nbh, weights),
    )
    return out, (features, nbh, weights)


def _banded_vjp_fwd(features, nbh, weights, P, tile, window, fast,
                    interpret, assume_inband):
    return _banded_fwd_impl(features, nbh, weights, P, tile, window,
                            fast, interpret, assume_inband)


def _banded_vjp_bwd(P, tile, window, fast, interpret, assume_inband,
                    res, dm):
    features, nbh, weights = res
    B, M, C = features.shape
    N, K = nbh.shape[1], nbh.shape[2]
    P = weights.shape[-1]
    idx_t = jnp.transpose(nbh, (0, 2, 1)).astype(jnp.int32)
    WB = window + 2 * tile
    if WB > N:
        WB = N
    dm = dm.astype(jnp.float32)
    if weights.shape[-1] == 1:
        # P=1 (flex_avg / conv_pointset / three_interpolate): fused kernel
        # scales the cotangent window in VMEM — the [B, N, K, C] dmw
        # intermediate never touches HBM
        w_t = jnp.transpose(weights[..., 0], (0, 2, 1)).astype(jnp.float32)
        inband = _bwd_from_w1(dm, idx_t, w_t, tile, window, WB, M, fast,
                              interpret)
    else:
        inband = _banded_bwd_call(dm, idx_t, weights.astype(jnp.float32),
                                  P, tile, window, WB, M, fast, interpret)
    if assume_inband:
        return inband.astype(features.dtype), None, \
            jnp.zeros_like(weights)
    starts = _starts_host(N, M, tile, window)
    cap = max(256, (N * K) // 8)
    oob = _oob_mask(nbh, starts, window)
    count = jnp.sum(oob.reshape(B, -1), axis=1)
    ok = jnp.all(count <= cap)
    dfeat = jax.lax.cond(
        ok,
        lambda: inband + _oob_correction_bwd(dm, nbh, weights, starts,
                                             window, cap, M),
        lambda: _dense_bwd(dm, nbh, weights, M),
    )
    return dfeat.astype(features.dtype), None, jnp.zeros_like(weights)


banded_weighted_sum.defvjp(_banded_vjp_fwd, _banded_vjp_bwd)


# ----------------------------- banded max-pool -----------------------------

_NEG = -3.0e38


def _max_kernel(feat_hbm, idx_ref, out_ref, arg_ref, slot_ref, f_win,
                sem, *, T, W, K, N, M, C, win_dtype, prec):
    """In-band neighborhood max + argmax (global key ids) + arg slot
    (neighborhood position k, used by the VJP).  Ties keep the lowest k,
    like the reference CPU kernel's strict `>` update
    (`flex_pool_kernel.cc:44-49`)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    start = _fwd_start(i, T, W, N, M)
    cp = pltpu.make_async_copy(feat_hbm.at[b, pl.ds(start, W), :],
                               f_win, sem)
    cp.start()
    cp.wait()
    colw = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
    fw = f_win[:, :]
    # one stacked [K*T, W] x [W, C] matmul (see _fwd_kernel)
    ohs = []
    for k in range(K):
        rel_col = (idx_ref[0, k, :] - start)[:, None]  # int32 [T, 1]
        # (bool [:, None] inserts a minor dim on an i1 vector, which
        # Mosaic only supports for 32-bit types — keep the insert on int32)
        ohs.append((colw == rel_col).astype(win_dtype))
    # precision matters in exact mode: the default f32 matmul is one-pass
    # bf16 on the MXU, which rounds the "gathered" values (~8e-3) and
    # flips near-tie argmaxes — wrong VJP routing (caught on hardware)
    g_all = jnp.dot(jnp.concatenate(ohs, axis=0), fw,
                    preferred_element_type=jnp.float32,
                    precision=prec)  # [K*T, C]
    best = jnp.full((T, C), _NEG, jnp.float32)
    arg = jnp.full((T, C), -1, jnp.int32)
    slot = jnp.full((T, C), -1, jnp.int32)
    for k in range(K):
        ids = idx_ref[0, k, :]                    # [T] global key ids
        rel_col = (ids - start)[:, None]
        inband_col = (rel_col >= 0) & (rel_col < W)
        g = jnp.where(inband_col, g_all[k * T:(k + 1) * T], _NEG)
        take = g > best
        arg = jnp.where(take, ids[:, None], arg)
        slot = jnp.where(take, k, slot)
        best = jnp.maximum(best, g)
    out_ref[0] = best
    arg_ref[0] = arg
    slot_ref[0] = slot


@functools.partial(jax.jit, static_argnames=("T", "W", "fast",
                                             "interpret"))
def _banded_max_call(feat, idx_t, T, W, fast, interpret):
    B, M, C0 = feat.shape
    N, K = idx_t.shape[2], idx_t.shape[1]
    feat, C0, C = _pad_c(feat)
    win_dtype = jnp.bfloat16 if fast else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    if fast:
        feat = feat.astype(jnp.bfloat16)
    val, arg, slot = pl.pallas_call(
        functools.partial(_max_kernel, T=T, W=W, K=K, N=N, M=M, C=C,
                          win_dtype=win_dtype, prec=prec),
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, K, T), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, T, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), jnp.float32),
            jax.ShapeDtypeStruct((B, N, C), jnp.int32),
            jax.ShapeDtypeStruct((B, N, C), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((W, C), win_dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(feat, idx_t)
    return val[..., :C0], arg[..., :C0], slot[..., :C0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def banded_max(features, nbh, tile=256, window=512, fast=True,
               interpret=False, assume_inband=False):
    """Neighborhood max-pool via the banded kernel.

    features [B, M, C], nbh [B, N, K] -> (out [B, N, C],
    argmax [B, N, C] int32 global key ids).  Exact for any index
    distribution (out-of-band entries corrected by a scatter-max on the
    compacted list; dense fallback on capacity overflow).  `fast` rounds
    the in-band window to bf16.  On exact float ties between an in-band
    and an out-of-band candidate the in-band one wins (reference takes the
    lowest k) — gradient routing differs only on exact ties.

    VJP scatters the output cotangent to the argmax rows (the reference
    CUDA kernel's atomicAdd scatter, done as a deterministic segment-sum).
    """
    out, _ = _banded_max_impl(features, nbh, tile, window, fast,
                              interpret, assume_inband)
    return out


def _banded_max_impl(features, nbh, tile, window, fast, interpret,
                     assume_inband=False):
    B, M, C = features.shape
    N, K = nbh.shape[1], nbh.shape[2]
    idx_t = jnp.transpose(nbh, (0, 2, 1)).astype(jnp.int32)
    val, arg, slot = _banded_max_call(features, idx_t, tile, window, fast,
                                      interpret)
    if assume_inband:
        # in-band VJP routes through the banded transpose kernel using
        # the slot mask (no giant segment-sum); assume_inband is static,
        # so the bwd knows the residual layout
        return (val, arg), (slot, nbh, features)
    starts = _starts_host(N, M, tile, window)
    cap = max(256, (N * K) // 8)
    oob = _oob_mask(nbh, starts, window).reshape(B, N * K)
    entries, count = _compact_oob(oob, cap)
    valid = entries >= 0
    q = jnp.where(valid, entries // K, 0)
    j = jnp.take_along_axis(nbh.reshape(B, N * K),
                            jnp.where(valid, entries, 0), axis=1)
    f = jnp.take_along_axis(features, j[..., None], axis=1)  # [B,cap,C]
    f = jnp.where(valid[..., None], f, _NEG).astype(jnp.float32)

    def corrected():
        vmax = val.at[jnp.arange(B)[:, None], q].max(f, mode="drop")
        # argmax among oob candidates achieving the final max (lowest id)
        amax = jnp.full_like(arg, jnp.int32(2**31 - 1))
        vq = jnp.take_along_axis(vmax, q[..., None], axis=1)
        cand = jnp.where((f >= vq) & valid[..., None],
                         j[..., None], jnp.int32(2**31 - 1))
        amax = amax.at[jnp.arange(B)[:, None], q].min(cand, mode="drop")
        a = jnp.where(vmax > val, amax, arg)
        return vmax, a

    def dense():
        f_k = jax.vmap(lambda v, i: v[i])(features.astype(jnp.float32),
                                          nbh)  # [B,N,K,C]
        v = jnp.max(f_k, axis=2)
        slot = jnp.argmax(f_k, axis=2)
        a = jnp.take_along_axis(
            nbh[..., None].astype(jnp.int32),
            slot[:, :, None, :].astype(jnp.int32), axis=2)[:, :, 0, :]
        return v, a

    ok = jnp.all(count <= cap)
    v, a = jax.lax.cond(ok, corrected, dense)
    # residual: argmax routes the cotangent; `features` rides along only
    # for its (static) shape/dtype — residual leaves must be JAX types
    return (v, a), (a, nbh, features)


def _banded_max_vjp_fwd(features, nbh, tile, window, fast, interpret,
                        assume_inband):
    return _banded_max_impl(features, nbh, tile, window, fast, interpret,
                            assume_inband)


def _banded_max_vjp_bwd(tile, window, fast, interpret, assume_inband,
                        res, ct):
    arg_or_slot, nbh, features = res
    fdtype = features.dtype
    dval = ct[0]  # cotangent of out; argmax cotangent ignored (int)
    B, M, C = features.shape
    N = arg_or_slot.shape[1]
    if assume_inband:
        # fused transpose: the slot mask (dmk[n,k,:] = dval[n,:] where
        # slot==k) is applied inside the kernel in VMEM — no [B, N, K, C]
        # HBM intermediate
        slot = arg_or_slot
        dval = jnp.where(slot >= 0, dval, 0.0)
        idx_t = jnp.transpose(nbh, (0, 2, 1)).astype(jnp.int32)
        WB = window + 2 * tile
        if WB > N:
            WB = N
        dfeat = _bwd_from_slot(dval.astype(jnp.float32), slot, idx_t,
                               tile, window, WB, M, fast, interpret)
        return dfeat.astype(fdtype), None
    arg = arg_or_slot
    safe_arg = jnp.maximum(arg, 0)
    dval = jnp.where(arg >= 0, dval, 0.0)
    ids = (safe_arg
           + (jnp.arange(B, dtype=jnp.int32) * M)[:, None, None]) * C \
        + jnp.arange(C, dtype=jnp.int32)[None, None, :]
    flat = jax.ops.segment_sum(
        dval.reshape(-1), ids.reshape(-1), num_segments=B * M * C)
    return flat.reshape(B, M, C).astype(fdtype), None


banded_max.defvjp(_banded_max_vjp_fwd, _banded_max_vjp_bwd)


# --------------------- slot-compacted exact correction ---------------------
#
# The lax.cond correction above is exact but executes both branches on this
# backend (docs/PERF_NOTES.md) and its compaction scatter is issue-bound.
# The *planned* path below makes banded ops exact for arbitrary indices with
# NO cond and NO scatter anywhere:
#
#   1. oob_plan() compacts the out-of-band entries once per neighborhood
#      (shared by every op on that level) by SORTING flattened entry ids —
#      ascending (n, k) order is query-tile-major, so each output tile's
#      entries form one contiguous run of the compacted list.
#   2. Per op, XLA gathers the cap source rows and forms per-entry
#      contributions; a small Pallas kernel then DELIVERS them: each output
#      tile DMAs a fixed-width window of the compacted list starting at its
#      (data-dependent, SMEM-prefetched) run offset and multiplies a
#      [T, WE] one-hot (qrow == row) against the [WE, P*C] window on the
#      MXU.  Every entry lands in exactly one row, so even the f32 path is
#      exact (the 3-pass f32 matmul decomposition is linear per term).
#   3. The transpose (VJP) uses a second ordering of the same list sorted
#      by SOURCE row, delivered by the same kernel into dfeat tiles.
#
# Capacity: `cap` (total) and `we` (per-tile window) are static; entries
# beyond either are dropped and counted in plan.overflow (observable by the
# caller; zero across all demo clouds at cap=N*K/8, we=640 — per-tile p99.9
# is 380 of 640).


@jax.tree_util.register_pytree_node_class
class OobPlan:
    """Compacted out-of-band entry plan for one neighborhood level.

    Array fields are [B, ...] (safe inside jit / custom_vjp residuals):
      e          [B, cap] int32   flattened (n*K + k) entry id, ascending
                                  (query-tile-major); invalid slots -> 0
      qrow       [B, cap] int32   query row n per slot; invalid -> 2**30
      src        [B, cap] int32   source key row nbh[n, k]; invalid -> 0
      valid      [B, cap] bool
      win_start  [B, NT] int32    per-query-tile window start into the list
      s_src      [B, cap] int32   src sorted ascending (transpose ordering);
                                  invalid -> 2**30
      perm12     [B, cap] int32   slot index (fwd order) per transpose slot
      win_start2 [B, MT] int32    per-key-tile window start (transpose)
      overflow   [B] int32        entries dropped by cap/window limits
      we         int (STATIC)     per-tile delivery window width the plan's
                                  win_start clamps were built for — the
                                  planned ops read it so plan geometry and
                                  kernel WE can never diverge
    """

    _FIELDS = ("e", "qrow", "src", "valid", "win_start", "s_src",
               "perm12", "win_start2", "overflow")

    def __init__(self, e, qrow, src, valid, win_start, s_src, perm12,
                 win_start2, overflow, we=640):
        self.e = e
        self.qrow = qrow
        self.src = src
        self.valid = valid
        self.win_start = win_start
        self.s_src = s_src
        self.perm12 = perm12
        self.win_start2 = win_start2
        self.overflow = overflow
        self.we = int(we)

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self._FIELDS), self.we

    @classmethod
    def tree_unflatten(cls, we, children):
        return cls(*children, we=we)


_SENT = jnp.int32(2 ** 30)  # sentinel row id: never equals a real row


def _count_windows(rows, valid, n_rows, tile, cap, we):
    """Per-tile aligned window starts into a row-sorted compact list, plus
    the count of entries the we-wide window fails to cover.

    Implemented by COUNTING (one compare+reduce against the 32-ish tile
    boundaries) rather than `jnp.searchsorted`: on this backend the
    vmapped searchsorted costs minutes of XLA compile time and ~100 ms of
    runtime, while the equivalent count of `rows < boundary` over a
    row-sorted list is a trivial fused reduction.  `rows` need NOT be
    sorted for the counts themselves — only the caller's delivery order
    must match the cumulative counts (contiguous per-tile runs)."""
    tgt = jnp.arange(0, n_rows, tile, dtype=jnp.int32)
    r = jnp.where(valid, rows, jnp.int32(2 ** 30))
    # lo[b,t] = #entries with row < t*tile; hi adds the tile's own count
    cmp_lo = (r[:, :, None] < tgt[None, None, :]).astype(jnp.int32)
    cmp_hi = (r[:, :, None] < (tgt + tile)[None, None, :]).astype(jnp.int32)
    lo = jnp.sum(cmp_lo, axis=1)
    hi = jnp.sum(cmp_hi, axis=1)
    start = jnp.clip((lo // _ALIGN) * _ALIGN, 0, max(cap - we, 0))
    uncovered = jnp.sum(jnp.maximum(hi - start - we, 0), axis=1)
    return start.astype(jnp.int32), uncovered.astype(jnp.int32)


def oob_plan(nbh, M, tile=256, window=512, cap=None, we=640, scale=1.0):
    """Build the slot-compaction plan for `nbh` [B, N, K] against the
    banded kernels' (tile, window) geometry over M key rows.  Computed
    ONCE per neighborhood level per step and shared by every planned op
    on that level, so its own cost is on the hot path.  TPU-native
    construction notes:

    * Forward list: compacted PER QUERY TILE — each tile's T*K entries
      are already in ascending (n, k) order, so a [B*NT, T*K]-row sort of
      (local id | sentinel) keys compacts them stably; short-row sorts
      compile in seconds and run ~3 ms at [640, 2048], where one global
      [B, N*K] searchsorted-based compaction costs minutes of compile.
      Tile t's entries live at slots [t*we, t*we + we): window starts are
      static and the total capacity is NT*we (per-tile overflow is
      counted, not dropped silently).
    * Transpose list (VJP delivery to source rows): one [B, cap] two-
      operand sort by source row.  Its window starts/overflow come from
      COUNTS alone (`_count_windows`), so a forward-only graph (eval,
      bench fwd) dead-code-eliminates the transpose sort entirely.
    * SECOND-STAGE global compaction: the per-tile lists concatenate to a
      [B, NT*we] array whose valid entries are already ascending within
      each tile segment, so one more short sort compacts them to `cap`
      slots globally.  This matters because every planned op's XLA-side
      correction arrays (feature/weight row gathers, the [B, cap, P*C]
      contribution tensor) scale with cap: the naive NT*we capacity
      (20480 at [8192, K=8]) is ~3x the real out-of-band population
      (measured ceiling 6234 entries on the demo clouds, 2477 on the
      interpolation level), and shrinking it cuts each planned op's
      correction cost proportionally.  Default cap = N*K/8 (512-aligned;
      >=1.3x the demo-cloud ceiling); per-tile window starts into the
      compact list come from counting, and entries beyond any static
      limit are counted in plan.overflow — monitored, never silent.

    `scale` multiplies both the per-tile window (`we`) and the default
    global capacity — the one knob to raise for data whose out-of-band
    population exceeds the demo-cloud-tuned defaults (surfaced by the
    oob_overflow invariant; exposed as `cfg.oob_cap_scale`).
    """
    B, N, K = nbh.shape
    if N % tile:
        raise ValueError(f"oob_plan: N={N} not divisible by tile={tile}")
    NT = N // tile
    seg = tile * K
    we = max(_ALIGN, int(we * scale))
    we = -(-we // _ALIGN) * _ALIGN  # window starts must stay 128-aligned
    we = min(we, -(-seg // _ALIGN) * _ALIGN)  # no wider than one segment
    full = NT * we
    if cap is None:
        cap = max(we, -(-int(N * K // 8 * scale) // 512) * 512)
    cap = min(-(-cap // _ALIGN) * _ALIGN, full)

    starts = _starts_host(N, M, tile, window)
    oob = _oob_mask(nbh, starts, window).reshape(B, NT, seg)
    loc = jnp.arange(seg, dtype=jnp.int32)
    key = jnp.where(oob, loc[None, None], jnp.int32(seg))
    e_loc = jax.lax.sort(key.reshape(B * NT, seg),
                         dimension=1)[:, :we].reshape(B, NT, we)
    valid1 = e_loc < seg
    base = (jnp.arange(NT, dtype=jnp.int32) * seg)[None, :, None]
    e1 = e_loc + base  # global entry ids, ascending within each tile run
    cnt = jnp.sum(oob, axis=2).astype(jnp.int32)  # [B, NT]
    unc1 = jnp.sum(jnp.maximum(cnt - we, 0), axis=1)

    if cap < full:
        # global compaction: tile runs are disjoint ascending ranges, so
        # one sort with invalid slots pushed to the end yields the fully
        # compacted ascending entry list
        key2 = jnp.where(valid1, e1, _SENT).reshape(B, full)
        e2 = jax.lax.sort(key2, dimension=1)[:, :cap]
        valid = e2 < _SENT
        e = jnp.where(valid, e2, 0)
        n_valid1 = jnp.sum(valid1.reshape(B, full), axis=1,
                           dtype=jnp.int32)
        unc_cap = n_valid1 - jnp.sum(valid, axis=1, dtype=jnp.int32)
        unc1 = unc1 + unc_cap
        qrow = jnp.where(valid, e // K, _SENT)
        win_start, unc_win = _count_windows(e // K, valid, N, tile, cap,
                                            we)
        unc1 = unc1 + unc_win
    else:
        valid = valid1.reshape(B, cap)
        e = jnp.where(valid, e1.reshape(B, cap), 0)
        qrow = jnp.where(valid, e // K, _SENT)
        # static per-tile window starts (t*we, already _ALIGN-aligned)
        win_start = jnp.broadcast_to(
            (jnp.arange(NT, dtype=jnp.int32) * we)[None], (B, NT))
    src = jnp.where(
        valid,
        jnp.take_along_axis(nbh.reshape(B, N * K), e, axis=1), 0
    ).astype(jnp.int32)

    # transpose ordering: sorted by source row; dead in fwd-only graphs
    skey = jnp.where(valid, src, _SENT)
    iota = jnp.broadcast_to(jnp.arange(cap, dtype=jnp.int32), (B, cap))
    s_src, perm12 = jax.lax.sort((skey, iota), dimension=1, num_keys=1)
    win_start2, unc2 = _count_windows(src, valid, M, tile, cap, we)

    overflow = unc1 + unc2
    return OobPlan(e, qrow, src, valid, win_start, s_src, perm12,
                   win_start2, overflow, we=we)


def _slot_kernel(contrib_hbm, qrow_ref, off_ref, out_ref, c_win,
                 sem, *, T, WE, PC, win_dtype, prec):
    """Deliver compacted per-entry contributions to their target rows:
    out[t, :] = sum over window slots s with qrow[s] == tile_base + t of
    contrib[s, :].  The window start is this tile's run offset (SMEM);
    re-deriving the _ALIGN floor in-kernel (a no-op on the already-aligned
    values) gives Mosaic the divisibility proof for the slices."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    start = (off_ref[b, i] // _ALIGN) * _ALIGN
    cp = pltpu.make_async_copy(contrib_hbm.at[b, pl.ds(start, WE), :],
                               c_win, sem)
    cp.start()
    q = qrow_ref[0, 0, pl.ds(start, WE)][None, :]  # [1, WE] int32 (VMEM)
    rows = i * T + jax.lax.broadcasted_iota(jnp.int32, (T, WE), 0)
    oh = (q == rows).astype(win_dtype)
    cp.wait()
    out_ref[0] = jnp.dot(oh, c_win[:, :],
                         preferred_element_type=jnp.float32,
                         precision=prec)


@functools.partial(jax.jit, static_argnames=("T", "WE", "n_rows", "fast",
                                             "interpret"))
def _slot_deliver(contrib, qrow, win_start, T, WE, n_rows, fast,
                  interpret):
    """contrib [B, cap, PC], qrow [B, cap] int32 (row-sorted, sentinel for
    empty), win_start [B, n_rows//T] int32 -> [B, n_rows, PC] f32."""
    B, cap, PC0 = contrib.shape
    pad = (-PC0) % 128
    if pad:
        contrib = jnp.pad(contrib, ((0, 0), (0, 0), (0, pad)))
    PC = PC0 + pad
    win_dtype = jnp.bfloat16 if fast else jnp.float32
    # the TPU DEFAULT f32 matmul is one-pass bf16 (see _dense_fwd note) —
    # exact mode needs HIGHEST to keep the delivered f32 terms exact
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    if fast:
        contrib = contrib.astype(jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(_slot_kernel, T=T, WE=WE, PC=PC,
                          win_dtype=win_dtype, prec=prec),
        grid=(B, n_rows // T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, cap), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, T, PC), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_rows, PC), jnp.float32),
        scratch_shapes=[pltpu.VMEM((WE, PC), contrib.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(contrib, qrow[:, None, :], win_start)
    return out[..., :PC0]


def _plan_gather_weights(weights, plan):
    """Per-entry weights [B, cap, P] from dense [B, N, K, P]."""
    B, N, K, P = weights.shape
    w_e = jnp.take_along_axis(
        weights.reshape(B, N * K, P), plan.e[..., None], axis=1)
    return w_e * plan.valid[..., None]


def slot_correction(features, w_e, plan, P, tile, we, n_rows, fast,
                    interpret=False):
    """Exact out-of-band contribution, delivered scatter-free.

    features [B, M, C]; w_e [B, cap, P] per-entry weights (zeroed where
    invalid) -> [B, n_rows, P*C] f32, layout matching the banded kernels
    (p-major, C unpadded)."""
    B, M, C = features.shape
    fc = jnp.take_along_axis(
        features.astype(jnp.float32), plan.src[..., None], axis=1)
    contrib = (w_e.astype(jnp.float32)[..., :, None]
               * fc[..., None, :]).reshape(B, -1, P * C)
    return _slot_deliver(contrib, plan.qrow, plan.win_start, tile, we,
                         n_rows, fast, interpret)


def slot_transpose(dval, plan, tile, we, M, fast, interpret=False):
    """Deliver per-entry cotangents [B, cap, C] to their SOURCE rows
    -> [B, M, C] f32 (the scatter-free transpose of slot_correction)."""
    d2 = jnp.take_along_axis(dval, plan.perm12[..., None], axis=1)
    return _slot_deliver(d2, plan.s_src, plan.win_start2, tile, we, M,
                         fast, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def banded_weighted_sum_planned(features, nbh, weights, plan, tile=256,
                                window=512, we=640, fast=True,
                                interpret=False):
    """Exact banded weighted sum with the slot-compacted correction:
    in-band Pallas kernel + scatter-free out-of-band delivery.  Exact for
    any index distribution up to the plan's static capacity (overflow is
    counted in plan.overflow; zero on real Morton-sorted clouds).

    features [B, M, C]; nbh [B, N, K] int32; weights [B, N, K, P];
    plan = oob_plan(nbh, M, tile, window) -> [B, N, P*C] (p-major).
    `fast` rounds both the in-band window and the correction to bf16
    (consistent ~1e-3 relative); fast=False is exact f32.

    Differentiable in `features` (banded transpose + slot transpose);
    `weights` receives zero cotangent (reference parity — the CUDA flex
    kernels implement no position gradient, SURVEY.md §2.1 N2)."""
    out, _ = _planned_fwd(features, nbh, weights, plan, tile, window, we,
                          fast, interpret)
    return out


def _planned_fwd(features, nbh, weights, plan, tile, window, we, fast,
                 interpret):
    B, M, C = features.shape
    N, K = nbh.shape[1], nbh.shape[2]
    P = weights.shape[-1]
    idx_t = jnp.transpose(nbh, (0, 2, 1)).astype(jnp.int32)
    w_pk = jnp.transpose(weights, (0, 3, 2, 1)).reshape(B, P * K, N)
    inband = _banded_fwd_call(features, idx_t, w_pk.astype(jnp.float32),
                              P, tile, window, fast, interpret)
    w_e = _plan_gather_weights(weights.astype(jnp.float32), plan)
    corr = slot_correction(features, w_e, plan, P, tile, we, N, fast,
                           interpret)
    return inband + corr, (features, nbh, weights, plan)


def _planned_vjp_fwd(features, nbh, weights, plan, tile, window, we, fast,
                     interpret):
    return _planned_fwd(features, nbh, weights, plan, tile, window, we,
                        fast, interpret)


def _planned_vjp_bwd(tile, window, we, fast, interpret, res, dm):
    features, nbh, weights, plan = res
    B, M, C = features.shape
    N, K = nbh.shape[1], nbh.shape[2]
    P = weights.shape[-1]
    idx_t = jnp.transpose(nbh, (0, 2, 1)).astype(jnp.int32)
    WB = window + 2 * tile
    if WB > N:
        WB = N
    dm = dm.astype(jnp.float32)
    if P == 1:
        w_t = jnp.transpose(weights[..., 0], (0, 2, 1)).astype(jnp.float32)
        inband = _bwd_from_w1(dm, idx_t, w_t, tile, window, WB, M, fast,
                              interpret)
    else:
        inband = _banded_bwd_call(dm, idx_t, weights.astype(jnp.float32),
                                  P, tile, window, WB, M, fast, interpret)
    # correction transpose: dfeat[src_e] += sum_p w_e[p] * dM[qrow_e, p, :]
    qsafe = jnp.clip(plan.qrow, 0, N - 1)
    dmq = jnp.take_along_axis(dm, qsafe[..., None], axis=1)  # [B, cap, P*C]
    w_e = _plan_gather_weights(weights.astype(jnp.float32), plan)
    cap = w_e.shape[1]
    dval = jnp.einsum("bep,bepc->bec", w_e, dmq.reshape(B, cap, P, C),
                      preferred_element_type=jnp.float32)
    dcorr = slot_transpose(dval, plan, tile, we, M, fast, interpret)
    dfeat = (inband + dcorr).astype(features.dtype)
    return dfeat, None, jnp.zeros_like(weights), None


banded_weighted_sum_planned.defvjp(_planned_vjp_fwd, _planned_vjp_bwd)


def _seg_head_max(qrow, vals, args, K):
    """Segmented (by contiguous equal qrow runs, length <= K) max-scan that
    leaves each run's (max, argmax-src, head?) at its FIRST slot.  Strict
    `>` keeps the earliest entry on ties — ascending k within a row, like
    the reference kernel (`flex_pool_kernel.cc:44-49`)."""
    B, cap, C = vals.shape
    d = 1
    while d < K:
        q_next = jnp.concatenate(
            [qrow[:, d:], jnp.full((B, d), _SENT, qrow.dtype)], axis=1)
        v_next = jnp.concatenate(
            [vals[:, d:], jnp.full((B, d, C), _NEG, vals.dtype)], axis=1)
        a_next = jnp.concatenate(
            [args[:, d:], jnp.full((B, d, C), -1, args.dtype)], axis=1)
        same = (q_next == qrow)[..., None]
        take = same & (v_next > vals)
        vals = jnp.where(take, v_next, vals)
        args = jnp.where(take, a_next, args)
        d *= 2
    q_prev = jnp.concatenate(
        [jnp.full((B, 1), -1, qrow.dtype), qrow[:, :-1]], axis=1)
    head = (qrow != q_prev) & (qrow != _SENT)
    return vals, args, head


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def banded_max_planned(features, nbh, plan, tile=256, window=512, we=640,
                       fast=True, interpret=False):
    """Exact banded neighborhood max with the slot-compacted correction.

    features [B, M, C], nbh [B, N, K] -> (out [B, N, C], argmax [B, N, C]
    int32 global key ids).  Out-of-band candidates are max-reduced per row
    in the compacted list (runs are contiguous and <= K long), the run
    heads delivered by the slot kernel, and merged with the in-band result
    (in-band wins exact float ties, matching the lowest-k reference rule
    when the in-band candidate comes first)."""
    (out, arg), _ = _max_planned_fwd(features, nbh, plan, tile, window,
                                     we, fast, interpret)
    return out, arg


def _max_planned_fwd(features, nbh, plan, tile, window, we, fast,
                     interpret):
    B, M, C = features.shape
    N, K = nbh.shape[1], nbh.shape[2]
    idx_t = jnp.transpose(nbh, (0, 2, 1)).astype(jnp.int32)
    val, arg, slot = _banded_max_call(features, idx_t, tile, window, fast,
                                      interpret)
    fc = jnp.take_along_axis(
        features.astype(jnp.float32), plan.src[..., None], axis=1)
    fc = jnp.where(plan.valid[..., None], fc, _NEG)
    if fast:
        # consistent with the in-band window rounding
        fc = fc.astype(jnp.bfloat16).astype(jnp.float32)
        fc = jnp.where(plan.valid[..., None], fc, _NEG)
    a0 = jnp.broadcast_to(plan.src[..., None], fc.shape).astype(jnp.int32)
    vmax, amax, head = _seg_head_max(plan.qrow, fc, a0, K)
    if fast and M <= (1 << 16):
        # One-pass bf16 delivery (chip: the f32 3-pass matmul was the
        # single biggest exact-path correction cost, 8.8 ms premium at
        # [20, 8192, 64]).  Every payload channel is EXACTLY
        # bf16-representable — vmax is already bf16-rounded above, the
        # argmax id rides as two 8-bit chunks (< 256: integers exact in
        # bf16), has is 1.0 — and exactly one head slot contributes per
        # (row, channel), so the bf16xbf16->f32 one-hot matmul is exact
        # (each product fits f32; no multi-term accumulation).  Lane
        # width is unchanged: 3C+1 pads to the same 128-multiple as the
        # old 2C+1 for the model's C in {32, 64}.
        alo = (amax & 255).astype(jnp.float32)
        ahi = ((amax >> 8) & 255).astype(jnp.float32)
        contrib = jnp.where(head[..., None],
                            jnp.concatenate([vmax, alo, ahi,
                                             jnp.ones_like(vmax[..., :1])],
                                            axis=-1),
                            0.0)
        deliv = _slot_deliver(contrib, plan.qrow, plan.win_start, tile,
                              we, N, True, interpret)
        corr_v = deliv[..., :C]
        corr_a = (deliv[..., C:2 * C]
                  + 256.0 * deliv[..., 2 * C:3 * C]).astype(jnp.int32)
        has = deliv[..., 3 * C:3 * C + 1] > 0.5
    else:
        contrib = jnp.where(head[..., None],
                            jnp.concatenate([vmax,
                                             amax.astype(jnp.float32),
                                             jnp.ones_like(vmax[..., :1])],
                                            axis=-1),
                            0.0)
        # f32 delivery: argmax ids up to 2**23 stay exact; one term/row
        deliv = _slot_deliver(contrib, plan.qrow, plan.win_start, tile,
                              we, N, False, interpret)
        corr_v = deliv[..., :C]
        corr_a = deliv[..., C:2 * C].astype(jnp.int32)
        has = deliv[..., 2 * C:2 * C + 1] > 0.5
    better = has & (corr_v > val)
    out = jnp.where(better, corr_v, val)
    argout = jnp.where(better, corr_a, arg)
    return (out, argout), (features, nbh, plan, slot, argout, better)


def _max_planned_vjp_fwd(features, nbh, plan, tile, window, we, fast,
                         interpret):
    return _max_planned_fwd(features, nbh, plan, tile, window, we, fast,
                            interpret)


def _max_planned_vjp_bwd(tile, window, we, fast, interpret, res, ct):
    features, nbh, plan, slot, argout, better = res
    dval = ct[0].astype(jnp.float32)
    B, M, C = features.shape
    N, K = nbh.shape[1], nbh.shape[2]
    idx_t = jnp.transpose(nbh, (0, 2, 1)).astype(jnp.int32)
    WB = window + 2 * tile
    if WB > N:
        WB = N
    # in-band-won channels route through the fused slot-mask transpose
    slot_ib = jnp.where(better | (slot < 0), -1, slot)
    d_ib = _bwd_from_slot(jnp.where(better, 0.0, dval), slot_ib, idx_t,
                          tile, window, WB, M, fast, interpret)
    # correction-won channels: per entry e, take dval[qrow_e, c] where the
    # winning argmax id equals this entry's source
    qsafe = jnp.clip(plan.qrow, 0, N - 1)
    dq = jnp.take_along_axis(dval, qsafe[..., None], axis=1)
    aq = jnp.take_along_axis(argout, qsafe[..., None], axis=1)
    bq = jnp.take_along_axis(better, qsafe[..., None], axis=1)
    # duplicate neighbor ids in one row are ALL equal to the winning
    # argmax; the dense grad routes the cotangent once (first argmax
    # slot), so deliver only at the run's first occurrence of each src
    # (runs are contiguous, ascending k, <= K long)
    first = jnp.ones(plan.qrow.shape, bool)
    for d in range(1, K):
        q_prev = jnp.concatenate(
            [jnp.full_like(plan.qrow[:, :d], -1), plan.qrow[:, :-d]],
            axis=1)
        s_prev = jnp.concatenate(
            [jnp.full_like(plan.src[:, :d], -1), plan.src[:, :-d]],
            axis=1)
        first &= ~((q_prev == plan.qrow) & (s_prev == plan.src))
    dcontrib = jnp.where(
        bq & (aq == plan.src[..., None]) & first[..., None]
        & plan.valid[..., None], dq, 0.0)
    d_oob = slot_transpose(dcontrib, plan, tile, we, M, fast, interpret)
    return (d_ib + d_oob).astype(features.dtype), None, None


banded_max_planned.defvjp(_max_planned_vjp_fwd, _max_planned_vjp_bwd)


def _moments_plan_weights(positions, pos0, plan):
    """Per-oob-entry flex-conv moment weights [B, cap, 4]:
    w_e = [1, pos[src_e] - pos0[qrow_e]] (the affine flex weights of
    `flex_conv_kernel.cc:59-60`), zeroed at invalid slots."""
    N = positions.shape[1]
    qsafe = jnp.clip(plan.qrow, 0, N - 1)
    p_src = jnp.take_along_axis(
        positions.astype(jnp.float32), plan.src[..., None], axis=1)
    p_q = jnp.take_along_axis(
        pos0.astype(jnp.float32), qsafe[..., None], axis=1)
    ones = jnp.ones_like(p_src[..., :1])
    w_e = jnp.concatenate([ones, p_src - p_q], axis=-1)  # [B, cap, 4]
    return w_e * plan.valid[..., None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def flex_moments_banded_planned(features, positions, pos0, nbh, plan,
                                tile=256, window=512, we=640, fast=True,
                                interpret=False, bwd_lo=True):
    """EXACT flex-conv moments: the specialized in-band moments kernel
    (`flex_moments_banded_fast`, which contributes zero for any
    out-of-band index) plus the slot-compacted scatter-free delivery of
    the out-of-band entries (`slot_correction`).  Exact neighborhood
    routing for ARBITRARY index distributions up to the plan's static
    capacity (drops are counted in plan.overflow — zero on real
    Morton-sorted clouds); float rounding is the banded kernels' bf16
    window class (`fast=True`, ~1e-4..1e-3 relative) or f32 delivery
    (`fast=False`, correction exact).

    Always returns the kernel's lane-padded channel layout
    [B, N, 4*Cpad] (keep_pad semantics — callers pad the weight rows).

    Differentiable in `features`; positions/pos0/nbh/plan get zero
    cotangent (reference parity: no position gradient in the CUDA flex
    kernels, `flex_conv_kernel_gpu.cu.cc:169-385`)."""
    out, _ = _moments_planned_fwd(features, positions, pos0, nbh, plan,
                                  tile, window, we, fast, interpret,
                                  bwd_lo)
    return out


def _moments_planned_fwd(features, positions, pos0, nbh, plan, tile,
                         window, we, fast, interpret, bwd_lo):
    B, N, C0 = features.shape
    idx_t = jnp.transpose(nbh, (0, 2, 1)).astype(jnp.int32)
    pos_t = jnp.transpose(positions, (0, 2, 1)).astype(jnp.float32)
    pos0_t = jnp.transpose(pos0, (0, 2, 1)).astype(jnp.float32)
    inband = _moments_fwd_call(features, pos_t, pos0_t, idx_t, tile,
                               window, interpret, keep_pad=True)
    w_e = _moments_plan_weights(positions, pos0, plan)
    # pad the correction's feature channels to the kernel's lane-padded
    # count so the two terms share the [B, N, 4*Cpad] layout (the padded
    # channels are zeros -> the correction there is exactly zero)
    featp, _, _ = _pad_c(features)
    corr = slot_correction(featp, w_e, plan, 4, tile, we, N, fast,
                           interpret)
    return inband + corr, (features, positions, pos0, nbh, plan, w_e)


def _moments_planned_vjp_fwd(features, positions, pos0, nbh, plan, tile,
                             window, we, fast, interpret, bwd_lo):
    return _moments_planned_fwd(features, positions, pos0, nbh, plan,
                                tile, window, we, fast, interpret, bwd_lo)


def _moments_planned_vjp_bwd(tile, window, we, fast, interpret, bwd_lo,
                             res, dm):
    features, positions, pos0, nbh, plan, w_e = res
    B, N, C0 = features.shape
    Cp = dm.shape[-1] // 4
    idx_t = jnp.transpose(nbh, (0, 2, 1)).astype(jnp.int32)
    pos_t = jnp.transpose(positions, (0, 2, 1)).astype(jnp.float32)
    pos0_t = jnp.transpose(pos0, (0, 2, 1)).astype(jnp.float32)
    WB = window + 2 * tile
    if WB > N:
        WB = N
    dm = dm.astype(jnp.float32)
    d_ib = _moments_bwd_call(dm, pos_t, pos0_t, idx_t, tile, window, WB,
                             interpret, lo=bwd_lo)  # [B, N, Cp]
    # correction transpose: dfeat[src_e] += sum_p w_e[p] * dM[qrow_e, p, :]
    qsafe = jnp.clip(plan.qrow, 0, N - 1)
    dmq = jnp.take_along_axis(dm, qsafe[..., None], axis=1)
    cap = w_e.shape[1]
    dval = jnp.einsum("bep,bepc->bec", w_e, dmq.reshape(B, cap, 4, Cp),
                      preferred_element_type=jnp.float32)
    d_oob = slot_transpose(dval, plan, tile, we, N, fast, interpret)
    dfeat = (d_ib + d_oob)[..., :C0].astype(features.dtype)
    return dfeat, None, None, None, None


flex_moments_banded_planned.defvjp(_moments_planned_vjp_fwd,
                                   _moments_planned_vjp_bwd)


# ------------------------------ Morton order ------------------------------

def morton_codes(points, bits=10):
    """[B, N, 3] -> [B, N] uint32 Z-order codes (bits per axis <= 10;
    the 30-bit code fits uint32, so this works with x64 disabled)."""
    assert bits <= 10
    lo = jnp.min(points, axis=1, keepdims=True)
    hi = jnp.max(points, axis=1, keepdims=True)
    scale = (2 ** bits - 1) / jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((points - lo) * scale, 0, 2 ** bits - 1).astype(jnp.uint32)

    def spread(x):  # classic 10-bit -> 30-bit interleave in 32 bits
        x = x & jnp.uint32(0x3FF)
        x = (x | (x << 16)) & jnp.uint32(0x30000FF)
        x = (x | (x << 8)) & jnp.uint32(0x300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x30C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x9249249)
        return x

    code = (spread(q[..., 0]) | (spread(q[..., 1]) << jnp.uint32(1))
            | (spread(q[..., 2]) << jnp.uint32(2)))
    return code


def morton_perm(points, bits=10):
    """Permutation sorting each cloud along the Z-order curve.
    Returns (perm [B, N] int32, inv_perm [B, N] int32):
    sorted = x[perm]; original = sorted[inv_perm]."""
    code = morton_codes(points, bits)
    perm = jnp.argsort(code, axis=1).astype(jnp.int32)
    B, N = perm.shape
    inv = jnp.zeros_like(perm)
    inv = inv.at[jnp.arange(B)[:, None], perm].set(
        jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N)))
    return perm, inv
