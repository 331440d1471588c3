"""Full-graph sparse matrix x dense matrix products (encoder hot loop).

Replaces torch_sparse's CUDA `spmm_add / spmm_mean / spmm_max`
(reference model.py:6, used by PureConv at model.py:42-55) with XLA
segment-reduction formulations over the COO view of the graph.  XLA lowers
segment_sum over sorted segment ids to an efficient TPU scatter-reduction and
fuses the value scaling.

Semantics notes (all verified against the reference):
* values weight messages: message m(u<-v) = val(u,v) * x[v].
* `mean` divides by the *structural* row count of un-masked entries
  (torch_sparse spmm_mean divides by rowcount; with DropAdj the reference
  masks nnz away entirely, so the denominator shrinks — we therefore divide
  by the count of entries with val != 0).
* `max` reduces val * x over present entries, empty rows give 0 (torch_scatter
  zero-fills empty segments).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ocn_tpu.sparse.csr import Graph


import functools


# (E, H) intermediates above this many bytes are computed in edge blocks:
# XLA materializes the message tensor val[:,None]*x[col] feeding segment_sum,
# which at ogbl-ppa scale (E=57.6M, H=256, bf16) is a 29 GB allocation — far
# past one chip's HBM (measured OOM 19.2/15.75 GB at half scale).  Blocking
# the edge dimension under lax.scan bounds it to ~block*H*dtype while keeping
# the math exact (per-block sorted segment-sums summed into the (N, H)
# accumulator).  Collab-scale graphs (676 MB) stay on the one-shot path.
_SPMM_BLOCK_BYTES = 1 << 31  # 2 GB


def _blocked_segment_spmm(x, col, row, val, n_nodes):
    """sum_p val[p] * x[col[p]] into rows, lax.scan over edge blocks."""
    e = col.shape[0]
    h = x.shape[-1]
    # the materialized message tensor is in the PROMOTED dtype (bf16 x with
    # f32 val doubles the per-element size vs x.dtype)
    msg_dtype = jnp.promote_types(x.dtype, val.dtype)
    bytes_full = e * h * jnp.dtype(msg_dtype).itemsize
    if bytes_full <= _SPMM_BLOCK_BYTES:
        msg = val[:, None] * x[col]
        return jax.ops.segment_sum(
            msg, row, num_segments=n_nodes, indices_are_sorted=True
        )
    nblk = -(-bytes_full // _SPMM_BLOCK_BYTES)
    blk = -(-e // nblk)
    pad = nblk * blk - e
    # padding rows point at the last node with val 0 — contribute nothing
    colp = jnp.pad(col, (0, pad), constant_values=n_nodes - 1).reshape(nblk, blk)
    rowp = jnp.pad(row, (0, pad), constant_values=n_nodes - 1).reshape(nblk, blk)
    valp = jnp.pad(val, (0, pad)).reshape(nblk, blk)

    def body(acc, inp):
        c, r, v = inp
        msg = v[:, None] * x[c]
        return acc + jax.ops.segment_sum(
            msg, r, num_segments=n_nodes, indices_are_sorted=True
        ), 0

    acc0 = jnp.zeros((n_nodes, h), jnp.promote_types(x.dtype, val.dtype))
    out, _ = jax.lax.scan(body, acc0, (colp, rowp, valp))
    return out.astype(jnp.promote_types(x.dtype, val.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _spmm_sum_sym(x, col, row, val, n_nodes, tpos):
    """Sum-SpMM with a transpose-permutation backward.

    Forward: out[u] = sum_{p: row[p]==u} val[p] * x[col[p]]  — a SORTED
    segment-sum (row is the CSR row expansion), edge-blocked past 2 GB of
    (E, H) intermediate (_blocked_segment_spmm).

    Backward: dx[k] = sum_{p: col[p]==k} val[p] * dout[row[p]].  Re-indexing
    through the transpose permutation q -> tpos[q] turns this into another
    SORTED segment-sum over `row` — no scatter, which on TPU is the
    difference between roofline and ~10x off (measured: 3-layer encoder
    fwd+bwd 288 ms -> see bench notes)."""
    return _blocked_segment_spmm(x, col, row, val, n_nodes)


def _spmm_sum_sym_fwd(x, col, row, val, n_nodes, tpos):
    return _spmm_sum_sym(x, col, row, val, n_nodes, tpos), (x, col, row, val, tpos)


def _spmm_sum_sym_bwd(n_nodes, res, dout):
    x, col, row, val, tpos = res
    # dx[k] = sum over entries q with row[q]==k of val[tpos[q]] * dout[col[q]]
    dx = _blocked_segment_spmm(
        dout, col, row, val[tpos], n_nodes).astype(x.dtype)
    # dval[p] = <x[col[p]], dout[row[p]]> — blocked the same way (two (E, H)
    # gathers feed an edgewise reduce)
    e = col.shape[0]
    h = x.shape[-1]
    # two (E, H) gathered operands live at once here (x[col] and dout[row]),
    # so the per-block budget is halved relative to the forward path
    bytes_dval = 2 * e * h * jnp.dtype(jnp.promote_types(x.dtype, dout.dtype)).itemsize
    if bytes_dval <= _SPMM_BLOCK_BYTES:
        dval = jnp.sum(x[col] * dout[row], axis=-1).astype(val.dtype)
    else:
        nblk = -(-bytes_dval // _SPMM_BLOCK_BYTES)
        blk = -(-e // nblk)
        pad = nblk * blk - e
        colp = jnp.pad(col, (0, pad)).reshape(nblk, blk)
        rowp = jnp.pad(row, (0, pad)).reshape(nblk, blk)
        dv, _ = jax.lax.scan(
            lambda _, inp: (0, jnp.sum(x[inp[0]] * dout[inp[1]], axis=-1)),
            0, (colp, rowp))
        dval = dv.reshape(-1)[:e].astype(val.dtype)
    return dx, None, None, dval, None


_spmm_sum_sym.defvjp(_spmm_sum_sym_fwd, _spmm_sum_sym_bwd)


def _spmm_sum(g: Graph, x: jax.Array) -> jax.Array:
    if g.tpos is not None:
        return _spmm_sum_sym(x, g.col, g.row, g.val, g.n_nodes, g.tpos)
    return _blocked_segment_spmm(x, g.col, g.row, g.val, g.n_nodes)


def spmm(g: Graph, x: jax.Array, aggr: str = "sum") -> jax.Array:
    """aggr over in-neighbors: out[u] = aggr_{(u,v) in E} val * x[v].

    Node-sharded graphs (parallel/sharded_graph.LocalGraph) carry their own
    halo-exchange SpMM; dispatch to it so the encoder modules work unchanged
    on a sharded mesh."""
    own = getattr(g, "sharded_spmm", None)
    if own is not None:
        return own(x, aggr)
    if aggr == "sum":
        return _spmm_sum(g, x)
    msg = g.val[:, None] * x[g.col]
    if aggr == "mean":
        s = _spmm_sum(g, x)
        cnt = jax.ops.segment_sum(
            (g.val != 0).astype(x.dtype), g.row, num_segments=g.n_nodes,
            indices_are_sorted=True,
        )
        return s / jnp.maximum(cnt, 1.0)[:, None]
    if aggr == "max":
        neg = jnp.finfo(x.dtype).min
        masked = jnp.where((g.val != 0)[:, None], msg, neg)
        m = jax.ops.segment_max(masked, g.row, num_segments=g.n_nodes)
        # segment_max fills empty segments with -inf; torch_scatter zero-fills
        return jnp.where(m <= neg, 0.0, m)
    raise ValueError(f"unknown aggr {aggr!r}")


def gcn_norm_conv(g: Graph, x: jax.Array) -> jax.Array:
    """PureConv 'gcn' aggregation (reference model.py:50-55):

        norm = rsqrt(1 + adj.sum(-1));  out = norm * (A @ (norm * x) + norm*x)

    i.e. symmetric degree normalization with an implicit self loop.  The row
    sum uses current values, so maskinput / DropAdj shrink the norm exactly as
    in the reference.
    """
    own = getattr(g, "gcn_norm_conv", None)
    if own is not None:
        return own(x)
    norm = jax.lax.rsqrt(1.0 + g.value_rowsum()).astype(x.dtype)[:, None]
    xn = norm * x
    return norm * (spmm(g, xn, "sum") + xn)


def gcn_selfloop_conv(g: Graph, x: jax.Array) -> jax.Array:
    """PyG GCNConv propagation (reference convdict 'gcn', model.py:58-62):
    D^-1/2 (A + I) D^-1/2 with degrees from (A + I) row sums of values."""
    own = getattr(g, "gcn_selfloop_conv", None)
    if own is not None:
        return own(x)
    deg = g.value_rowsum() + 1.0
    norm = jax.lax.rsqrt(deg).astype(x.dtype)[:, None]
    xn = norm * x
    return norm * (spmm(g, xn, "sum") + xn)
