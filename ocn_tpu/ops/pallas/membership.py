"""Pallas TPU kernel: fused row-wise membership / weighted-count.

The CN-extraction hot op (ocn_tpu/ops/frame.py `_rowwise_membership`):
for each candidate id in a (B, Kq) query tile, accumulate the weights of
matching entries of the (B, Ks) per-row id lists —

    out[b, k] = sum_q  w[b, q] * [query[b, k] == ids[b, q]]

The XLA lowering materializes a (B, Kq, Ks) compare/select intermediate in
HBM; this kernel keeps everything in VMEM registers, statically unrolling the
Ks accumulation on the VPU (8x128 lanes).  Grid over B tiles.

This is the Pallas replacement for the reference's packed-int64
searchsorted intersection (reference utils.py:163-183) on the TPU's terms:
no sort, no binary search, pure vector compares.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, ids_ref, w_ref, out_ref, *, ks: int):
    q = q_ref[:]  # (T, Kq) int32
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    # static unroll over the sorted-list width; each step is one broadcast
    # compare + select on the VPU
    for s in range(ks):
        d = ids_ref[:, s][:, None]
        wq = w_ref[:, s][:, None]
        acc = acc + jnp.where(q == d, wq, 0.0)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def membership_counts(
    query_ids: jax.Array,
    ids: jax.Array,
    w: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """(B, Kq) weighted membership counts of query ids in per-row (B, Ks)
    lists.  Equals ops.frame._rowwise_membership when per-row ids are unique;
    duplicate ids accumulate their weights (the Horvitz-Thompson-correct
    behavior for sampled rows)."""
    b, kq = query_ids.shape
    ks = ids.shape[1]
    tile = 256
    grid = (pl.cdiv(b, tile),)
    return pl.pallas_call(
        functools.partial(_kernel, ks=ks),
        out_shape=jax.ShapeDtypeStruct((b, kq), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, kq), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, ks), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, ks), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, kq), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(query_ids, ids, w)
