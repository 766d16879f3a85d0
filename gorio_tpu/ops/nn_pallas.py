"""Pallas TPU kernel: fused brute-force 1-NN correspondence search.

The hot op of the GICP family (SURVEY.md §3.2: `update_correspondences` runs
a kd-tree NN per point per LM iteration; the CUDA backend replaces it with
`brute_force_knn.cu`). The XLA fallback (`registration.knn.nn1`) materializes
(block, M) distance tiles in HBM between fused ops; this kernel tiles both
sides through VMEM, emits one MXU matmul per (query-tile, ref-tile) pair, and
keeps the running (min, argmin) resident in the output block across the ref
grid dimension — no HBM traffic beyond reading the inputs once.

Mask convention: a per-ref additive bias is folded into a 4th coordinate
(sqrt(bias)), so masked refs simply sit far away in the lifted space.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

_TQ = 256  # query tile
_TR = 1024  # ref tile


def _kernel(q_ref, r_ref, idx_ref, d2_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        d2_ref[:] = jnp.full_like(d2_ref, jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    q = q_ref[:]  # (TQ, 4)
    r = r_ref[:]  # (TR, 4)
    qq = jnp.sum(q * q, axis=-1, keepdims=True)  # (TQ, 1)
    rr = jnp.sum(r * r, axis=-1)[None, :]  # (1, TR)
    cross = jnp.dot(q, r.T, preferred_element_type=jnp.float32)  # MXU
    d2 = qq + rr - 2.0 * cross  # (TQ, TR)

    tile_min = jnp.min(d2, axis=1, keepdims=True)  # (TQ, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    tile_arg = jnp.min(
        jnp.where(d2 <= tile_min, col, jnp.int32(2**30)), axis=1, keepdims=True
    )
    upd = tile_min < d2_ref[:]
    d2_ref[:] = jnp.where(upd, tile_min, d2_ref[:])
    idx_ref[:] = jnp.where(upd, j * _TR + tile_arg, idx_ref[:])


@jax.jit
def nn1_pallas(query, ref, ref_bias=None):
    """1-NN of each query in ref. query (N,3), ref (M,3) -> (idx (N,), d2 (N,)).

    f32 compute; N padded to the query tile, M to the ref tile."""
    n = query.shape[0]
    m = ref.shape[0]
    np_ = (-n) % _TQ
    mp_ = (-m) % _TR
    q = jnp.concatenate([query.astype(jnp.float32), jnp.zeros((np_, 3), jnp.float32)], 0)
    r = jnp.concatenate([ref.astype(jnp.float32), jnp.full((mp_, 3), 1e6, jnp.float32)], 0)
    if ref_bias is None:
        bias_col = jnp.zeros((r.shape[0], 1), jnp.float32)
    else:
        b = jnp.concatenate([ref_bias.astype(jnp.float32), jnp.full((mp_,), 1e12, jnp.float32)])
        bias_col = jnp.sqrt(jnp.maximum(b, 0.0))[:, None]
    q = jnp.concatenate([q, jnp.zeros((q.shape[0], 1), jnp.float32)], 1)
    r = jnp.concatenate([r, bias_col], 1)

    grid = (q.shape[0] // _TQ, r.shape[0] // _TR)
    idx, d2 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TQ, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, 4), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.float32),
        ],
    )(q, r)
    return idx[:n, 0], jnp.maximum(d2[:n, 0], 0.0)


def nn1_best(query, ref, ref_mask=None, block: int = 1024):
    """Dispatch: Pallas on TPU, blocked-XLA elsewhere (same results)."""
    from ..registration.knn import nn1

    backend = jax.default_backend()
    if HAVE_PALLAS and backend == "tpu":
        bias = None
        if ref_mask is not None:
            bias = jnp.where(ref_mask, 0.0, 1e12)
        idx, d2 = nn1_pallas(query, ref, bias)
        return idx, d2.astype(query.dtype)
    return nn1(query, ref, ref_mask=ref_mask, block=block)


# ---------------------------------------------------------------------------
# 1-NN + payload select: the GICP linearize feeds the matched target's
# xyz / covariance / cluster / mask straight into the Mahalanobis epilogue.
# Gathering them by idx afterwards costs ~8 HBM gathers (~25% of the
# linearize); selecting DURING the argmin pass replaces them with one
# (TQ,TR)@(TR,P) one-hot matmul per tile pair — MXU work instead of random
# access (the CUDA counterpart fuses the same way,
# `fast_apdgicp/src/fast_gicp/cuda/compute_derivatives.cu:186`).
# ---------------------------------------------------------------------------

_P = 16  # payload columns (xyz 3 + cov6 + cluster 1 + mask 1 + pad)


def _select_kernel(q_ref, r_ref, pay_ref, idx_ref, d2_ref, sel_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        d2_ref[:] = jnp.full_like(d2_ref, jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)
        sel_ref[:] = jnp.zeros_like(sel_ref)

    q = q_ref[:]  # (TQ, 4)
    r = r_ref[:]  # (TR, 4)
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    rr = jnp.sum(r * r, axis=-1)[None, :]
    cross = jnp.dot(q, r.T, preferred_element_type=jnp.float32)  # MXU
    d2 = qq + rr - 2.0 * cross  # (TQ, TR)

    tile_min = jnp.min(d2, axis=1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    tile_arg = jnp.min(
        jnp.where(d2 <= tile_min, col, jnp.int32(2**30)), axis=1, keepdims=True
    )
    onehot = (col == tile_arg).astype(jnp.float32)  # (TQ, TR)
    picked = jnp.dot(onehot, pay_ref[:], preferred_element_type=jnp.float32)  # MXU

    upd = tile_min < d2_ref[:]
    d2_ref[:] = jnp.where(upd, tile_min, d2_ref[:])
    idx_ref[:] = jnp.where(upd, j * _TR + tile_arg, idx_ref[:])
    sel_ref[:] = jnp.where(upd, picked, sel_ref[:])


@jax.jit
def nn1_select_pallas(query, ref, payload, ref_bias=None):
    """1-NN + payload row of the winner. query (N,3), ref (M,3), payload
    (M, P<=16) -> (idx (N,), d2 (N,), sel (N, 16))."""
    n = query.shape[0]
    m = ref.shape[0]
    np_ = (-n) % _TQ
    mp_ = (-m) % _TR
    q = jnp.concatenate([query.astype(jnp.float32), jnp.zeros((np_, 3), jnp.float32)], 0)
    r = jnp.concatenate([ref.astype(jnp.float32), jnp.full((mp_, 3), 1e6, jnp.float32)], 0)
    pay = jnp.concatenate(
        [payload.astype(jnp.float32),
         jnp.zeros((payload.shape[0], _P - payload.shape[1]), jnp.float32)], 1
    )
    pay = jnp.concatenate([pay, jnp.zeros((mp_, _P), jnp.float32)], 0)
    if ref_bias is None:
        bias_col = jnp.zeros((r.shape[0], 1), jnp.float32)
    else:
        b = jnp.concatenate([ref_bias.astype(jnp.float32), jnp.full((mp_,), 1e12, jnp.float32)])
        bias_col = jnp.sqrt(jnp.maximum(b, 0.0))[:, None]
    q = jnp.concatenate([q, jnp.zeros((q.shape[0], 1), jnp.float32)], 1)
    r = jnp.concatenate([r, bias_col], 1)

    grid = (q.shape[0] // _TQ, r.shape[0] // _TR)
    idx, d2, sel = pl.pallas_call(
        _select_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TQ, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, 4), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, _P), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TQ, _P), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((q.shape[0], _P), jnp.float32),
        ],
    )(q, r, pay)
    return idx[:n, 0], jnp.maximum(d2[:n, 0], 0.0), sel[:n]


def nn1_select(query, ref, payload, ref_mask=None, block: int = 1024):
    """1-NN + winner payload row. Pallas fused select on TPU; XLA nn1 + a
    single gather elsewhere (identical results)."""
    from ..registration.knn import nn1

    backend = jax.default_backend()
    if HAVE_PALLAS and backend == "tpu":
        bias = None
        if ref_mask is not None:
            bias = jnp.where(ref_mask, 0.0, 1e12)
        idx, d2, sel = nn1_select_pallas(query, ref, payload, bias)
        return idx, d2.astype(query.dtype), sel.astype(query.dtype)
    idx, d2 = nn1(query, ref, ref_mask=ref_mask, block=block)
    pay = payload.astype(query.dtype)
    sel = pay[idx]
    if pay.shape[1] < _P:
        sel = jnp.concatenate(
            [sel, jnp.zeros((sel.shape[0], _P - pay.shape[1]), query.dtype)], 1
        )
    return idx, d2, sel
