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
