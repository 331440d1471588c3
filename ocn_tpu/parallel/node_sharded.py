"""Node-sharded SpMM — the building block for graphs beyond one chip's HBM.

BASELINE.json's north star: edge-partitioned adjacency across hosts, boundary
node features exchanged over ICI and overlapped with local aggregation.  This
module implements the first rung of that ladder with `shard_map`:

* node features `x` are sharded over mesh axis "dp" (contiguous node ranges);
* the adjacency is partitioned by DESTINATION row, each device holding the
  CSR slice of its node range (host-side `partition_graph`);
* each device `all_gather`s the source features and runs its local
  segment-sum SpMM over its row range.

The all-gather ships the full feature matrix (the dense-exchange baseline).
The documented next rung replaces it with boundary-only exchange: each
partition's off-range source ids are already counted here
(`boundary_counts`), so features for just those sets can be moved with
`all_to_all`/`ppermute` and the interior SpMM overlapped with the transfer
(pallas_guide.md ring patterns).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ocn_tpu.sparse.csr import Graph


@dataclasses.dataclass
class GraphPartition:
    """Per-device CSR slice: rows [offset, offset+rows_per), arrays padded to
    a common nnz length so the stacked (ndev, m) arrays are rectangular;
    pad entries carry val == 0."""

    row_offsets: np.ndarray      # (ndev,)
    rows_per: int
    col: np.ndarray              # (ndev, m) int32 global source ids
    local_row: np.ndarray        # (ndev, m) int32 row - offset
    val: np.ndarray              # (ndev, m) float32
    boundary_counts: np.ndarray  # (ndev,) distinct off-partition sources


def partition_graph(g: Graph, ndev: int) -> GraphPartition:
    ip = np.asarray(g.indptr)
    true_nnz = int(ip[-1])
    col = np.asarray(g.col)[:true_nnz]
    row = np.asarray(g.row)[:true_nnz]
    val = np.asarray(g.val)[:true_nnz]
    n = g.n_nodes
    rows_per = -(-n // ndev)
    cols, lrows, vals, offs, bnd = [], [], [], [], []
    for d in range(ndev):
        r0, r1 = d * rows_per, min((d + 1) * rows_per, n)
        lo, hi = ip[r0], ip[min(r1, n)]
        cols.append(col[lo:hi])
        lrows.append((row[lo:hi] - r0).astype(np.int32))
        vals.append(val[lo:hi])
        offs.append(r0)
        src = np.unique(col[lo:hi])
        bnd.append(int(((src < r0) | (src >= r1)).sum()))
    m = max(len(c) for c in cols) if cols else 1

    def pad(arrs, fill, dtype):
        return np.stack([
            np.concatenate([a, np.full(m - len(a), fill, dtype)]).astype(dtype)
            for a in arrs
        ])

    return GraphPartition(
        row_offsets=np.asarray(offs, np.int32),
        rows_per=rows_per,
        col=pad(cols, 0, np.int32),
        local_row=pad(lrows, rows_per - 1, np.int32),
        val=pad(vals, 0.0, np.float32),
        boundary_counts=np.asarray(bnd, np.int64),
    )


def make_node_sharded_spmm(mesh: Mesh, part: GraphPartition):
    """Returns (spmm_fn, padded_rows): spmm_fn(x) with x of shape
    (ndev*rows_per, H) sharded P("dp", None) returns the aggregated features
    with the same sharding."""
    rows_per = part.rows_per
    ndev = part.col.shape[0]
    colj = jnp.asarray(part.col)
    lrowj = jnp.asarray(part.local_row)
    valj = jnp.asarray(part.val)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp", None), P("dp", None), P("dp", None)),
        out_specs=P("dp", None),
        check_vma=False,
    )
    def spmm(x_local, cols, lrows, vals):
        # dense-exchange baseline: gather every shard's features over ICI,
        # then local destination-row aggregation
        x_full = jnp.concatenate(jax.lax.all_gather(x_local, "dp"), axis=0)
        msg = vals[0][:, None].astype(x_local.dtype) * x_full[cols[0]]
        return jax.ops.segment_sum(msg, lrows[0], num_segments=rows_per)

    def apply(x):
        return spmm(x, colj, lrowj, valj)

    return apply, rows_per * ndev


@dataclasses.dataclass
class BoundaryPartition:
    """Boundary-only exchange plan: each device ships exactly the feature rows
    its neighbors need (the halo), not the whole shard.  All index arrays are
    host-precomputed from the static graph; the device step is two gathers,
    one `all_to_all`, and two sorted segment-sums — the interior one is
    independent of the exchange, so XLA overlaps it with the transfer (the
    BASELINE.json collective/compute-overlap north star)."""

    rows_per: int
    bmax: int                   # halo rows shipped per (sender, receiver) pair
    send_idx: np.ndarray        # (ndev, ndev, bmax) sender-local row ids
    icol: np.ndarray            # (ndev, imax) interior source ids (local)
    irow: np.ndarray            # (ndev, imax) interior destination rows (local)
    ival: np.ndarray            # (ndev, imax)
    bpos: np.ndarray            # (ndev, jmax) flat inbox positions s*bmax+rank
    brow: np.ndarray            # (ndev, jmax) boundary destination rows
    bval: np.ndarray            # (ndev, jmax)
    halo_fraction: float        # shipped rows / full all-gather rows


def partition_graph_boundary(g: Graph, ndev: int) -> BoundaryPartition:
    ip = np.asarray(g.indptr)
    true_nnz = int(ip[-1])
    col = np.asarray(g.col)[:true_nnz]
    row = np.asarray(g.row)[:true_nnz]
    val = np.asarray(g.val)[:true_nnz]
    n = g.n_nodes
    rows_per = -(-n // ndev)

    needs = [[np.zeros(0, np.int64)] * ndev for _ in range(ndev)]
    interior, boundary = [], []
    for d in range(ndev):
        r0, r1 = d * rows_per, min((d + 1) * rows_per, n)
        lo, hi = ip[r0], ip[min(r1, n)]
        c, r, v = col[lo:hi], (row[lo:hi] - r0).astype(np.int32), val[lo:hi]
        own = (c >= r0) & (c < r0 + rows_per)
        interior.append((c[own] - r0, r[own], v[own]))
        boundary.append((c[~own], r[~own], v[~own]))
        for s in range(ndev):
            if s == d:
                continue
            s0 = s * rows_per
            m = (c >= s0) & (c < s0 + rows_per)
            needs[d][s] = np.unique(c[m])
    bmax = max(1, max(len(needs[d][s]) for d in range(ndev) for s in range(ndev)))
    imax = max(1, max(len(t[0]) for t in interior))
    jmax = max(1, max(len(t[0]) for t in boundary))

    send_idx = np.zeros((ndev, ndev, bmax), np.int32)
    for s in range(ndev):
        for d in range(ndev):
            ids = needs[d][s] - s * rows_per
            send_idx[s, d, : len(ids)] = ids  # pad with sender-local row 0

    icol = np.zeros((ndev, imax), np.int32)
    irow = np.full((ndev, imax), rows_per - 1, np.int32)
    ival = np.zeros((ndev, imax), np.float32)
    bpos = np.zeros((ndev, jmax), np.int32)
    brow = np.full((ndev, jmax), rows_per - 1, np.int32)
    bval = np.zeros((ndev, jmax), np.float32)
    shipped = 0
    for d in range(ndev):
        c, r, v = interior[d]
        icol[d, : len(c)], irow[d, : len(c)], ival[d, : len(c)] = c, r, v
        c, r, v = boundary[d]
        s = c // rows_per
        rank = np.zeros(len(c), np.int64)
        for sd in range(ndev):
            m = s == sd
            if m.any():
                rank[m] = np.searchsorted(needs[d][sd], c[m])
        bpos[d, : len(c)] = (s * bmax + rank).astype(np.int32)
        brow[d, : len(c)], bval[d, : len(c)] = r, v
        shipped += sum(len(needs[d][sd]) for sd in range(ndev))
    halo_fraction = shipped / float(ndev * (ndev - 1) * rows_per) if ndev > 1 else 0.0
    return BoundaryPartition(
        rows_per=rows_per, bmax=bmax, send_idx=send_idx,
        icol=icol, irow=irow, ival=ival, bpos=bpos, brow=brow, bval=bval,
        halo_fraction=halo_fraction,
    )


def make_boundary_spmm(mesh: Mesh, part: BoundaryPartition):
    """Boundary-only exchange SpMM over the "dp" axis.

    Per device: gather the halo rows each peer needs (`send_idx`), exchange
    with ONE `all_to_all` (ships `halo_fraction` of the all-gather bytes),
    aggregate interior entries from the local shard while the exchange is in
    flight, then aggregate boundary entries from the received inbox."""
    rows_per = part.rows_per
    ndev = part.send_idx.shape[0]
    sidx = jnp.asarray(part.send_idx)
    icol = jnp.asarray(part.icol)
    irow = jnp.asarray(part.irow)
    ival = jnp.asarray(part.ival)
    bpos = jnp.asarray(part.bpos)
    brow = jnp.asarray(part.brow)
    bval = jnp.asarray(part.bval)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("dp", None),) + (P("dp", None),) * 7,
        out_specs=P("dp", None),
        check_vma=False,
    )
    def spmm(x_local, sidx_, icol_, irow_, ival_, bpos_, brow_, bval_):
        outbox = x_local[sidx_[0]]                       # (ndev, bmax, H)
        inbox = jax.lax.all_to_all(
            outbox, "dp", split_axis=0, concat_axis=0, tiled=False
        )                                                # (ndev, bmax, H)
        # interior aggregation — independent of the exchange, overlaps it
        acc = jax.ops.segment_sum(
            ival_[0][:, None].astype(x_local.dtype) * x_local[icol_[0]],
            irow_[0], num_segments=rows_per, indices_are_sorted=True,
        )
        halo = inbox.reshape(ndev * part.bmax, -1)
        acc = acc + jax.ops.segment_sum(
            bval_[0][:, None].astype(x_local.dtype) * halo[bpos_[0]],
            brow_[0], num_segments=rows_per, indices_are_sorted=True,
        )
        return acc

    def apply(x):
        return spmm(x, sidx, icol, irow, ival, bpos, brow, bval)

    return apply, rows_per * ndev


def make_ring_spmm(mesh: Mesh, part: GraphPartition):
    """Ring-exchange node-sharded SpMM: feature shards rotate around the
    "dp" ring with `ppermute`; each step every device accumulates the
    contributions whose sources live in the shard it currently holds.  Peak
    memory is O(local shard) instead of O(full x), and XLA can overlap each
    step's transfer with the previous step's aggregation — the
    collective/compute-overlap shape of the BASELINE.json north star
    (pallas_guide.md ring-collective pattern at the XLA level; the Pallas
    RDMA version is the further step)."""
    rows_per = part.rows_per
    ndev = part.col.shape[0]
    colj = jnp.asarray(part.col)
    lrowj = jnp.asarray(part.local_row)
    valj = jnp.asarray(part.val)
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp", None), P("dp", None), P("dp", None)),
        out_specs=P("dp", None),
        check_vma=False,
    )
    def spmm(x_local, cols, lrows, vals):
        me = jax.lax.axis_index("dp")
        cols0, lrows0, vals0 = cols[0], lrows[0], vals[0]

        def body(s, carry):
            buf, acc = carry
            src_dev = (me - s) % ndev  # owner of the shard we hold this step
            r0 = src_dev * rows_per
            in_range = (cols0 >= r0) & (cols0 < r0 + rows_per)
            li = jnp.clip(cols0 - r0, 0, rows_per - 1)
            msg = jnp.where(in_range, vals0, 0.0)[:, None].astype(
                x_local.dtype) * buf[li]
            acc = acc + jax.ops.segment_sum(msg, lrows0, num_segments=rows_per)
            buf = jax.lax.ppermute(buf, "dp", perm)
            return buf, acc

        _, acc = jax.lax.fori_loop(
            0, ndev, body,
            (x_local, jnp.zeros((rows_per, x_local.shape[-1]), x_local.dtype)),
        )
        return acc

    def apply(x):
        return spmm(x, colj, lrowj, valj)

    return apply, rows_per * ndev
