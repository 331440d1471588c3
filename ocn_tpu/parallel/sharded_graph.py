"""Integrated node-sharded training: adjacency, A^2 and features sharded.

Round 1 built the node-sharded SpMM building blocks (parallel/node_sharded.py)
but the Trainer's mesh path still replicated the graph.  This module is the
integration (BASELINE.json north star; no reference counterpart — the
reference is single-GPU, SURVEY.md §2.7):

* node features ``x`` and the adjacency are sharded over mesh axis "dp" in
  contiguous node ranges; the encoder's SpMM runs with the boundary-only halo
  exchange (ONE all_to_all shipping just the rows each peer needs, interior
  aggregation overlapping the transfer — same math as
  node_sharded.make_boundary_spmm, here wired through the unchanged
  GCNEncoder via the LocalGraph dispatch seam in ops/spmm.py);
* the A^2 window table — the LARGEST per-graph array (cap 1024 entries/row:
  ~1.9 GB at collab scale, 8 bytes/entry) — is sharded the same way;
* after the encoder, the (much smaller) hidden-state matrix ``h`` is
  all-gathered once per step (N x hiddim bf16: 121 MB at collab scale vs the
  ~4 GB of sharded graph+feature state), so all CN-frame math stays local;
* CN-frame window gathers against the sharded tables run as
  "owner-gather + reduce-scatter": each device broadcasts its chunk's row
  requests (all_gather of C int32 ids), every device answers the requests
  whose rows it owns from its local CSR shard, and a psum_scatter returns
  each requester its (C, K) windows — ids/weights sum correctly because
  exactly one owner contributes non-zeros;
* maskinput becomes per-device scatters of zeros into the local value arrays
  (positions routed host-side by nnz ownership).

Per-device edge chunks keep the column-normalization granularity of the
replicated path (each chunk's column sums are exact and local); the EMA
inner-product state is updated from device-local chunk sequences and pmean'd,
the same expectation-equivalent treatment as parallel/spmd.py.  Loss parity
with the replicated shard_map DP step is exact when sampling is off
(tests/test_sharded_graph.py).

Scope: frame-based predictors (cn1/5/6/7/8/9 — cn6's A^3 table rides as a
third set of row-range shards since round 5), two_hop_mode="gather",
window_table off, no dual-K split (the GSPMD mesh path supports the split;
here chunk->device assignment is contiguous and the split's degree sort would
unbalance the static per-device small/big chunk counts — round-robin chunk
interleaving is the documented follow-up).  Eval runs on the replicated path.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ocn_tpu.ops.frame import NeighborFrame, _window_slice
from ocn_tpu.sparse.csr import GATHER_PAD, Graph


# --------------------------------------------------------------------------
# local (per-device) graph view for the encoder: halo-exchange SpMM
# --------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LocalGraph:
    """One device's adjacency shard inside shard_map, duck-typing the Graph
    API the encoder touches (ops/spmm.py and nn/conv.py dispatch to the
    ``sharded_spmm`` / ``gcn_*_conv`` methods when present).

    Entry layout follows node_sharded.partition_graph_boundary: entries whose
    source lives on this device ("interior": icol local source ids) and
    entries whose source is remote ("boundary": bpos positions into the halo
    inbox).  Each value array carries ONE trailing pad slot so maskinput
    scatters can route their padding harmlessly.
    """

    sidx: jax.Array   # (ndev, bmax) sender-local rows each peer needs
    icol: jax.Array   # (imax+1,) local source ids
    irow: jax.Array   # (imax+1,) local destination rows (nondecreasing)
    ival: jax.Array   # (imax+1,)
    bpos: jax.Array   # (jmax+1,) halo inbox positions s*bmax+rank
    brow: jax.Array   # (jmax+1,) local destination rows (nondecreasing)
    bval: jax.Array   # (jmax+1,)
    rows_per: int
    ndev: int
    bmax: int
    n_nodes: int
    axis: str = "dp"

    def tree_flatten(self):
        return (
            (self.sidx, self.icol, self.irow, self.ival, self.bpos,
             self.brow, self.bval),
            (self.rows_per, self.ndev, self.bmax, self.n_nodes, self.axis),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # -- halo exchange -----------------------------------------------------
    def _halo(self, x_local: jax.Array) -> jax.Array:
        """Ship the rows each peer needs; returns the (ndev*bmax, H) inbox."""
        outbox = x_local[self.sidx]  # (ndev, bmax, H)
        inbox = jax.lax.all_to_all(
            outbox, self.axis, split_axis=0, concat_axis=0, tiled=False)
        return inbox.reshape(self.ndev * self.bmax, -1)

    # -- Graph API used by encoders -----------------------------------------
    def value_rowsum(self) -> jax.Array:
        s = jax.ops.segment_sum(
            self.ival, self.irow, num_segments=self.rows_per,
            indices_are_sorted=True)
        return s + jax.ops.segment_sum(
            self.bval, self.brow, num_segments=self.rows_per,
            indices_are_sorted=True)

    def drop_edges(self, key, p: float, doscale: bool = True) -> "LocalGraph":
        """Value-space DropAdj on the local shard.  Each device draws from its
        own (device-folded) key — entrywise-independent Bernoulli like the
        replicated path, different stream partitioning."""
        if p < 1e-6:
            return self
        ki, kb = jax.random.split(key)
        scale = 1.0 / (1.0 - p) if doscale else 1.0
        keep_i = jax.random.bernoulli(ki, 1.0 - p, self.ival.shape)
        keep_b = jax.random.bernoulli(kb, 1.0 - p, self.bval.shape)
        return dataclasses.replace(
            self,
            ival=jnp.where(keep_i, self.ival * scale, 0.0),
            bval=jnp.where(keep_b, self.bval * scale, 0.0),
        )

    def sharded_spmm(self, x_local: jax.Array, aggr: str = "sum") -> jax.Array:
        halo = self._halo(x_local)
        mi = self.ival[:, None].astype(x_local.dtype) * x_local[self.icol]
        mb = self.bval[:, None].astype(x_local.dtype) * halo[self.bpos]
        if aggr in ("sum", "mean"):
            s = jax.ops.segment_sum(
                mi, self.irow, num_segments=self.rows_per,
                indices_are_sorted=True,
            ) + jax.ops.segment_sum(
                mb, self.brow, num_segments=self.rows_per,
                indices_are_sorted=True,
            )
            if aggr == "sum":
                return s
            cnt = jax.ops.segment_sum(
                (self.ival != 0).astype(x_local.dtype), self.irow,
                num_segments=self.rows_per, indices_are_sorted=True,
            ) + jax.ops.segment_sum(
                (self.bval != 0).astype(x_local.dtype), self.brow,
                num_segments=self.rows_per, indices_are_sorted=True,
            )
            return s / jnp.maximum(cnt, 1.0)[:, None]
        if aggr == "max":
            neg = jnp.finfo(x_local.dtype).min
            m1 = jax.ops.segment_max(
                jnp.where((self.ival != 0)[:, None], mi, neg), self.irow,
                num_segments=self.rows_per)
            m2 = jax.ops.segment_max(
                jnp.where((self.bval != 0)[:, None], mb, neg), self.brow,
                num_segments=self.rows_per)
            m = jnp.maximum(m1, m2)
            return jnp.where(m <= neg, 0.0, m)
        raise ValueError(f"unknown aggr {aggr!r}")

    def gcn_norm_conv(self, x_local: jax.Array) -> jax.Array:
        # norm*(A @ (norm*x) + norm*x): remote norms ride inside xn's halo
        norm = jax.lax.rsqrt(1.0 + self.value_rowsum()).astype(
            x_local.dtype)[:, None]
        xn = norm * x_local
        return norm * (self.sharded_spmm(xn, "sum") + xn)

    def gcn_selfloop_conv(self, x_local: jax.Array) -> jax.Array:
        deg = self.value_rowsum() + 1.0
        norm = jax.lax.rsqrt(deg).astype(x_local.dtype)[:, None]
        xn = norm * x_local
        return norm * (self.sharded_spmm(xn, "sum") + xn)

    def gcn_enorm_conv(self, x_local: jax.Array) -> jax.Array:
        # PureConvV2 'gcn': enorm = norm[i]*norm[j] edge weights, no self term.
        # Remote source norms arrive through one halo of [x | norm].
        norm = jax.lax.rsqrt(1.0 + self.value_rowsum()).astype(x_local.dtype)
        packed = jnp.concatenate([x_local, norm[:, None]], axis=-1)
        halo = self._halo(packed)
        halo_x, halo_n = halo[:, :-1], halo[:, -1]
        iw = (self.ival * norm[self.irow] * norm[self.icol])[:, None]
        bw = (self.bval * norm[self.brow] * halo_n[self.bpos])[:, None]
        return jax.ops.segment_sum(
            iw.astype(x_local.dtype) * x_local[self.icol], self.irow,
            num_segments=self.rows_per, indices_are_sorted=True,
        ) + jax.ops.segment_sum(
            bw.astype(x_local.dtype) * halo_x[self.bpos], self.brow,
            num_segments=self.rows_per, indices_are_sorted=True,
        )


# --------------------------------------------------------------------------
# local window tables for CN-frame gathers
# --------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LocalWindows:
    """One device's CSR window-table shard: rows [r0, r0+rows_per) with LOCAL
    indptr into the local col/val arrays (global column ids).  Exposes
    ``n_nodes`` so cn_frames can treat it like a Graph; gathers go through
    sharded_gather_neighbors.

    ``ell``: optional (rows_per, ell_k) packed col|val row-range shard of the
    per-refresh ELL window table (sparse/ell.py) — when present it REPLACES
    the CSR col/val arrays as the owner's answer source (pass (1,)-dummies
    for ip/col/val then): one row gather per request instead of a window
    slice, and 1/ndev of the table per device (the same descriptor-rate
    economics as the replicated ELL path, BENCH_NOTES.md round 2)."""

    ip: jax.Array    # (rows_per+1,) local positions
    col: jax.Array   # (m,) global ids, GATHER_PAD tail + 1 mask pad slot
    val: jax.Array   # (m,)
    deg: jax.Array   # (rows_per,)
    r0: jax.Array    # () int32 — this device's first global row
    rows_per: int
    n_nodes: int
    axis: str = "dp"
    ell: Optional[jax.Array] = None  # (rows_per, ell_k) int32 packed
    ell_k: int = 0
    col_bits: int = 0

    def tree_flatten(self):
        return ((self.ip, self.col, self.val, self.deg, self.r0, self.ell),
                (self.rows_per, self.n_nodes, self.axis, self.ell_k,
                 self.col_bits))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # cn_frames probes this Graph attribute on its fast path; window tables
    # never carry a packed col|val array (values mutate under maskinput)
    packed = None


def sharded_gather_neighbors(
    lw: LocalWindows,
    nodes: jax.Array,
    k: int,
    key: Optional[jax.Array] = None,
    sampling: str = "window",
) -> NeighborFrame:
    """gather_neighbors against a row-sharded window table.

    Owner-gather + reduce-scatter: all_gather the (C,) requests of every
    device, answer the ones whose rows this device owns (window slices of the
    LOCAL col/val arrays, same sampling math as ops/frame.gather_neighbors),
    zero elsewhere, then psum_scatter the (ndev*C, K) responses so each
    requester receives exactly its windows (one owner per row => the sum IS
    the owner's answer; invalid lanes carry the usual n_nodes sentinel).

    Sampling keys: requesters may hold different fold-in keys, so the raw
    chunk keys are all_gathered alongside the requests and the owner draws
    each request's offset from ITS requester's key — bit-identical to the
    requester sampling locally.

    With an ELL shard attached (lw.ell) the owner answers from its frozen
    (rows_per, ell_k) table instead: one row gather per request, key ignored
    (offset randomness is per-refresh, like ops/frame.py's ELL branch).
    """
    del sampling  # window sampling only (iid needs per-element gathers)
    nodes = nodes.astype(jnp.int32)
    c = nodes.shape[0]
    all_nodes = jax.lax.all_gather(nodes, lw.axis)  # (ndev, C)
    ndev = all_nodes.shape[0]
    flat = all_nodes.reshape(-1)

    loc = flat - lw.r0
    own = (loc >= 0) & (loc < lw.rows_per) & (flat < lw.n_nodes)
    locc = jnp.clip(loc, 0, lw.rows_per - 1)
    deg = jnp.where(own, lw.deg[locc], 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ndev * c, k), 1)
    capped = deg > k
    w_row = jnp.where(capped, deg.astype(jnp.float32) / k, 1.0)
    valid = lane < jnp.minimum(deg, k)[:, None]

    if lw.ell is not None and k <= lw.ell_k:
        pk = lw.ell[locc]  # (ndev*C, ell_k) — one row gather
        if k < lw.ell_k:
            # leading-k sub-window of the frozen sample (dual-K small body /
            # pad_deg2_dst), same as the replicated ELL branch
            pk = pk[:, :k]
        ids_w = jnp.bitwise_and(pk, (1 << lw.col_bits) - 1)
        vals_w = jnp.right_shift(pk, lw.col_bits).astype(jnp.float32)
    else:
        start = lw.ip[locc]
        if key is not None:
            all_keys = jax.lax.all_gather(key, lw.axis)  # (ndev, key_shape)
            u = jax.vmap(lambda kk: jax.random.uniform(kk, (c,)))(all_keys)
            u = u.reshape(-1)
            woff = jnp.where(
                capped,
                (u * (deg - k + 1).astype(jnp.float32)).astype(jnp.int32), 0)
        else:
            woff = jnp.zeros_like(deg)
        pos0 = jnp.minimum(start + woff, jnp.maximum(lw.col.shape[0] - k, 0))
        ids_w = _window_slice(lw.col, pos0, k)
        vals_w = _window_slice(lw.val, pos0, k)
    ok = own[:, None] & valid
    w = jnp.where(ok, w_row[:, None] * vals_w, 0.0)
    # owner contributes sentinel n_nodes on its invalid lanes; non-owners 0
    ids = jnp.where(own[:, None], jnp.where(valid, ids_w, lw.n_nodes), 0)

    ids_out = jax.lax.psum_scatter(
        ids, lw.axis, scatter_dimension=0, tiled=True)
    w_out = jax.lax.psum_scatter(w, lw.axis, scatter_dimension=0, tiled=True)
    return NeighborFrame(ids=ids_out, w=w_out, n_nodes=lw.n_nodes, pos=None)


# --------------------------------------------------------------------------
# host-side partitioning
# --------------------------------------------------------------------------

def partition_windows(
    g: Graph, ndev: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Split a Graph's CSR window table into per-device row-range shards.

    Returns stacked (wip, wcol, wval, wdeg, wpos0) where wpos0[d] is the
    global nnz offset of device d's shard (for maskinput position routing).
    Arrays are padded to a common length + GATHER_PAD tail + one pad slot for
    mask-scatter padding.
    """
    ip = np.asarray(g.indptr, np.int64)
    true_nnz = int(ip[-1])
    if g.col is not None:
        col = np.asarray(g.col)[:true_nnz]
        val = np.asarray(g.val)[:true_nnz]
    else:
        # gather-only graph (round-4 A^2/A^3 layout: packed col|val only) —
        # unpack host-side; values are small non-negative ints by the
        # packing contract (csr.py)
        pk = np.asarray(g.packed)[:true_nnz].astype(np.int64)
        col = (pk & ((1 << g.col_bits) - 1)).astype(np.int32)
        val = (pk >> g.col_bits).astype(np.float32)
    n = g.n_nodes
    rows_per = -(-n // ndev)
    ips, cols, vals, degs, offs = [], [], [], [], []
    for d in range(ndev):
        r0, r1 = d * rows_per, min((d + 1) * rows_per, n)
        lo, hi = int(ip[r0]), int(ip[r1])
        lip = ip[r0 : r1 + 1] - lo
        if r1 - r0 < rows_per:  # last shard: pad rows with empty windows
            lip = np.concatenate(
                [lip, np.full(rows_per - (r1 - r0), lip[-1], np.int64)])
        ips.append(lip.astype(np.int32))
        cols.append(col[lo:hi])
        vals.append(val[lo:hi])
        deg = (lip[1:] - lip[:-1]).astype(np.int32)
        degs.append(deg)
        offs.append(lo)
    m = max(len(c) for c in cols) + GATHER_PAD + 1  # +1 = mask pad slot

    def pad(arrs, dtype):
        return np.stack([
            np.concatenate([a, np.zeros(m - len(a), dtype)]).astype(dtype)
            for a in arrs
        ])

    return (
        np.stack(ips), pad(cols, np.int32), pad(vals, np.float32),
        np.stack(degs), np.asarray(offs, np.int64),
    )


def boundary_entry_layout(g: Graph, ndev: int) -> dict:
    """For maskinput routing: map each global nnz position to its place in the
    boundary partition's per-device [interior | boundary] entry arrays.

    Must mirror node_sharded.partition_graph_boundary's packing order exactly
    (CSR order filtered by own/~own per device)."""
    ip = np.asarray(g.indptr, np.int64)
    true_nnz = int(ip[-1])
    col = np.asarray(g.col)[:true_nnz]
    n = g.n_nodes
    rows_per = -(-n // ndev)
    dev = np.zeros(true_nnz, np.int32)
    kind = np.zeros(true_nnz, np.int8)   # 0 interior, 1 boundary
    slot = np.zeros(true_nnz, np.int64)
    for d in range(ndev):
        r0, r1 = d * rows_per, min((d + 1) * rows_per, n)
        lo, hi = int(ip[r0]), int(ip[r1])
        c = col[lo:hi]
        own = (c >= r0) & (c < r0 + rows_per)
        dev[lo:hi] = d
        kind[lo:hi] = np.where(own, 0, 1)
        s = np.zeros(hi - lo, np.int64)
        s[own] = np.arange(own.sum())
        s[~own] = np.arange((~own).sum())
        slot[lo:hi] = s
    return {"dev": dev, "kind": kind, "slot": slot, "rows_per": rows_per}


def route_mask_positions(
    layout: dict, wpos0: np.ndarray, positions: np.ndarray,
    ndev: int, cap: int, pad_i: int, pad_b: int, pad_w: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Route global nnz mask positions to per-device scatter index arrays.

    Returns (mi, mb, mw) each (ndev, cap): indices into the padded ival /
    bval / wval arrays; unused lanes point at the trailing pad slot."""
    positions = np.asarray(positions, np.int64)
    dev = layout["dev"][positions]
    kind = layout["kind"][positions]
    slot = layout["slot"][positions]
    wslot = positions - wpos0[dev]
    mi = np.full((ndev, cap), pad_i, np.int32)
    mb = np.full((ndev, cap), pad_b, np.int32)
    mw = np.full((ndev, cap), pad_w, np.int32)
    for d in range(ndev):
        sel = dev == d
        ps, ks, ws = slot[sel], kind[sel], wslot[sel]
        if len(ps) > cap:
            raise ValueError(
                f"mask routing overflow: device {d} owns {len(ps)} masked "
                f"positions > cap {cap}; raise the cap")
        ii = ps[ks == 0]
        bb = ps[ks == 1]
        mi[d, : len(ii)] = ii
        mb[d, : len(bb)] = bb
        mw[d, : len(ws)] = ws
    return mi, mb, mw


def partition_ell(tbl: np.ndarray, ndev: int, rows_per: int) -> np.ndarray:
    """Stack an (N, K) ELL table into (ndev, rows_per, K) row-range shards
    (zero-padded tail rows are masked by `own` in the gather)."""
    n, k = tbl.shape
    pad = ndev * rows_per - n
    if pad:
        tbl = np.concatenate([tbl, np.zeros((pad, k), tbl.dtype)], axis=0)
    return tbl.reshape(ndev, rows_per, k)


def route_ell_mask(
    flat: np.ndarray, cleared: np.ndarray, ndev: int, rows_per: int, k: int,
    cap: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Route global ELL flat mask positions (sparse/ell.py
    mask_ell_flat_positions; -1 = edge outside its row's frozen window) to
    per-device LOCAL flat scatter positions + cleared packed values.

    Unused lanes carry the POSITIVE out-of-bounds sentinel rows_per*k: JAX
    wraps negative indices before OOB handling, so a -1 sentinel would
    scatter into each shard's last flat position (row (d+1)*rows_per-1, lane
    k-1) and silently delete a real neighbor whenever that row's degree >= k
    (round-3 advisor finding, medium).  mode="drop" genuinely drops positive
    OOB indices (tests/test_ell.py::test_sentinel_scatter_is_identity)."""
    flat = np.asarray(flat, np.int64)
    ok = flat >= 0
    rows = flat // k
    dev = np.where(ok, rows // rows_per, 0)
    lflat = flat - dev * (np.int64(rows_per) * k)
    me = np.full((ndev, cap), rows_per * k, np.int32)
    mc = np.zeros((ndev, cap), np.int32)
    for d in range(ndev):
        sel = ok & (dev == d)
        ps, cs = lflat[sel], np.asarray(cleared)[sel]
        if len(ps) > cap:
            raise ValueError(
                f"ELL mask routing overflow: device {d} owns {len(ps)} masked "
                f"positions > cap {cap}; raise the cap")
        me[d, : len(ps)] = ps
        mc[d, : len(ps)] = cs
    return me, mc


# --------------------------------------------------------------------------
# the integrated train step
# --------------------------------------------------------------------------

def make_sharded_graph_train_step(tr, mesh: Mesh, axis: str = "dp"):
    """Build a node-sharded train step for Trainer ``tr`` over ``mesh[axis]``.

    Returns (step, prepare) where
      step(state, pos, neg, masks, key, inv_p, inv_n, ell1, ell2)
        -> (state, loss)
    takes the same host-side batch arrays as Trainer.train_step (mesh mode);
    ``ell1``/``ell2`` are the current refresh's (ndev, rows_per, K) ELL table
    shards when ``tr._use_ell`` (else ignored), ``inv_p``/``inv_n`` the
    original->transmitted score permutations from Trainer.prepare_batch when
    the dual-K split is active (else None).  ``prepare(aux)`` routes maskinput
    positions — aux is None, a (P,) array of global CSR nnz positions, or the
    dict form from prepare_batch carrying CSR + ELL flat positions.

    Production levers supported since round 3 (VERDICT r2 item 1): ELL window
    tables ride as row-range shards REPLACING the per-device CSR window
    shards, and the dual-K occupancy split runs with round-robin
    chunk->device interleaving (each device holds nsp/ndev small + nbp/ndev
    big chunks, so the degree sort cannot unbalance the static per-device
    body sizes).  Scores are all-gathered ((B,) floats — the smallest
    exchange of the step) and the loss is computed on the full batch in
    original order, so per-index pos/neg pairing is exact for every loss in
    the catalog even though pos_i and neg_i may be scored on different
    devices.
    """
    from ocn_tpu.nn.predictors import THREE_HOP
    from ocn_tpu.parallel.node_sharded import partition_graph_boundary
    from ocn_tpu.train import losses as L
    from ocn_tpu.train.loop import TrainState

    cfg = tr.cfg
    assert tr.frame_based, (
        "sharded-graph covers the frame-based predictors (cn1/5/6/7/8/9)")
    assert cfg.two_hop_mode == "gather" and tr.adj2 is not None, (
        "sharded-graph v1 needs the precomputed A^2 ('gather' mode)")
    use3 = cfg.predictor in THREE_HOP
    if use3:
        # cn6: the A^3 table rides as a third set of row-range shards; the
        # cn3 candidate frame shares cn1's src layout, so only the dst-side
        # A^3 row gather (owner-gather like A^2) is new exchange
        assert tr.adj3 is not None, "THREE_HOP needs the precomputed A^3"
    assert not cfg.window_table and not cfg.hoist_frames
    ndev = mesh.shape[axis]
    c = tr._chunk()
    b = cfg.batch_size
    assert b % (ndev * c) == 0, (
        f"batch_size {b} must divide into {ndev} devices x chunk {c}")
    g = tr.g
    use_ell = bool(tr._use_ell)
    split = tr._split
    if split is not None:
        nsp, nsn = split
        assert nsp % ndev == 0 and nsn % ndev == 0, (
            "sharded dual-K needs per-side chunk counts divisible by ndev "
            "(Trainer._split_plan rounds them down)")
        nsp_l, nsn_l = nsp // ndev, nsn // ndev

    # ---- host partitions ---------------------------------------------------
    bp = partition_graph_boundary(g, ndev)
    wdegA = None
    if use_ell:
        # ELL shards replace the CSR window shards: only degrees (capping
        # weights) and row offsets remain per-device; the col/val/ip arrays
        # are 1-wide dummies
        degA_np = np.asarray(tr.g.deg)
        deg2_np = np.asarray(tr.adj2.deg)
        rows_per = bp.rows_per

        def _pad_deg(d):
            pad = ndev * rows_per - d.shape[0]
            return np.concatenate([d, np.zeros(pad, d.dtype)]).reshape(
                ndev, rows_per)

        wdegA = _pad_deg(degA_np.astype(np.int32))
        wdeg2 = _pad_deg(deg2_np.astype(np.int32))
        dummy = np.zeros((ndev, 1), np.int32)
        wipA = wcolA = dummy
        wvalA = np.zeros((ndev, 1), np.float32)
        wip2 = wcol2 = dummy
        wval2 = wvalA
        wpos0A = np.zeros(ndev, np.int64)
        if use3:
            wdeg3 = _pad_deg(np.asarray(tr.adj3.deg).astype(np.int32))
            wip3 = wcol3 = dummy
            wval3 = wvalA
    else:
        wipA, wcolA, wvalA, wdegA, wpos0A = partition_windows(g, ndev)
        wip2, wcol2, wval2, wdeg2, _ = partition_windows(tr.adj2, ndev)
        if use3:
            wip3, wcol3, wval3, wdeg3, _ = partition_windows(tr.adj3, ndev)
    if not use3:
        # dummy third-graph shards keep one shard_map signature either way
        wip3 = wcol3 = np.zeros((ndev, 1), np.int32)
        wval3 = np.zeros((ndev, 1), np.float32)
        wdeg3 = np.zeros((ndev, 1), np.int32)
    layout = boundary_entry_layout(g, ndev)
    rows_per = bp.rows_per

    # value arrays with one trailing pad slot for mask-scatter padding
    def with_pad(a2d, fill=0.0):
        pad = np.full((a2d.shape[0], 1), fill, a2d.dtype)
        return np.concatenate([a2d, pad], axis=1)

    imax = bp.icol.shape[1]
    jmax = bp.bpos.shape[1]
    icol = jnp.asarray(with_pad(bp.icol.astype(np.int32), 0))
    irow = jnp.asarray(with_pad(bp.irow.astype(np.int32), rows_per - 1))
    ival0 = jnp.asarray(with_pad(bp.ival))
    bpos = jnp.asarray(with_pad(bp.bpos.astype(np.int32), 0))
    brow = jnp.asarray(with_pad(bp.brow.astype(np.int32), rows_per - 1))
    bval0 = jnp.asarray(with_pad(bp.bval))
    sidx = jnp.asarray(bp.send_idx)
    wipAj, wcolAj, wvalA0 = jnp.asarray(wipA), jnp.asarray(wcolA), jnp.asarray(wvalA)
    wdegAj = jnp.asarray(wdegA)
    wip2j, wcol2j, wval2j = jnp.asarray(wip2), jnp.asarray(wcol2), jnp.asarray(wval2)
    wdeg2j = jnp.asarray(wdeg2)
    wip3j, wcol3j, wval3j = jnp.asarray(wip3), jnp.asarray(wcol3), jnp.asarray(wval3)
    wdeg3j = jnp.asarray(wdeg3)
    r0s = jnp.asarray((np.arange(ndev) * rows_per).astype(np.int32))[:, None]

    # features: pad node rows to ndev * rows_per
    x = np.asarray(tr.x)
    pad_rows = ndev * rows_per - x.shape[0]
    x_pad = np.concatenate(
        [x, np.zeros((pad_rows,) + x.shape[1:], x.dtype)], axis=0)
    xj = jnp.asarray(x_pad.reshape((ndev, rows_per) + x.shape[1:]))

    # contiguous node ranges own very unequal nnz shares on degree-skewed
    # graphs (BFS/Zipf put hubs early), so one device can own most of a
    # batch's masked positions — size the routing arrays for the worst case
    mask_cap = 2 * b
    pad_i, pad_b, pad_w = imax, jmax, wcolA.shape[1] - 1

    def prepare(aux):
        """Route maskinput positions to per-device scatter arrays.

        Returns (mi, mb, mw, me, mc): interior/boundary value scatters for
        the encoder's LocalGraph, CSR window value scatter (non-ELL), and
        ELL flat-position + cleared-entry scatters (ELL; unused lanes
        carry the positive-OOB sentinel and are dropped).
        """
        csr = ell_flat = ell_cleared = None
        if isinstance(aux, dict):
            csr = aux.get("csr")
            ell_flat = aux.get("ell_flat")
            ell_cleared = aux.get("ell_cleared")
        elif aux is not None:
            csr = aux
        # positive-OOB sentinel (rows_per * k1): negative indices wrap before
        # the drop check and would clobber each shard's last table entry
        no_e = (jnp.asarray(np.full(
                    (ndev, 1), rows_per * tr._sharded_ell_k1(), np.int32)),
                jnp.asarray(np.zeros((ndev, 1), np.int32)))
        if csr is None:
            return (jnp.asarray(np.full((ndev, 1), pad_i, np.int32)),
                    jnp.asarray(np.full((ndev, 1), pad_b, np.int32)),
                    jnp.asarray(np.full((ndev, 1), pad_w, np.int32)),
                    *no_e)
        mi, mb, mw = route_mask_positions(
            layout, wpos0A, np.asarray(csr), ndev, mask_cap,
            pad_i, pad_b, pad_w)
        if use_ell and ell_flat is not None:
            me, mc = route_ell_mask(
                ell_flat, ell_cleared, ndev, rows_per, tr._sharded_ell_k1(),
                mask_cap)
            me, mc = jnp.asarray(me), jnp.asarray(mc)
        else:
            me, mc = no_e
        if use_ell:
            # the CSR window shards are dummies under ELL; drop their scatter
            mw = jnp.asarray(np.full((ndev, 1), 0, np.int32))
        return jnp.asarray(mi), jnp.asarray(mb), mw, me, mc

    tx = tr._make_tx()

    def gather_fn(lw, nodes, k, key):
        return sharded_gather_neighbors(lw, nodes, k, key)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),                     # state
            P(None, axis),           # pos (2, B)
            P(None, axis),           # neg (2, B)
            P(axis), P(axis), P(axis), P(axis), P(axis),  # mask routings
            P(),                     # key
            P(), P(),                # inv_p, inv_n (replicated score perms)
            P(axis), P(axis), P(axis),  # ell1, ell2, ell3 shards
            P(axis),                 # x shards (ndev, rows_per, ...)
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            P(axis), P(axis), P(axis), P(axis),
            P(axis), P(axis), P(axis), P(axis),
            P(axis), P(axis), P(axis), P(axis),
            P(axis),
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def sharded_grads(state, pos, neg, mi, mb, mw, me, mc, key, inv_p, inv_n,
                      ell1, ell2, ell3,
                      x_l, icol_, irow_, ival_, bpos_, brow_, bval_, sidx_,
                      wipA_, wcolA_, wvalA_, wdegA_,
                      wip2_, wcol2_, wval2_, wdeg2_,
                      wip3_, wcol3_, wval3_, wdeg3_, r0_):
        dev = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, dev)
        # maskinput: local scatters of zeros (pad lanes hit the pad slot)
        ival = ival_[0].at[mi[0]].set(0.0)
        bval = bval_[0].at[mb[0]].set(0.0)
        lg = LocalGraph(
            sidx=sidx_[0], icol=icol_[0], irow=irow_[0], ival=ival,
            bpos=bpos_[0], brow=brow_[0], bval=bval,
            rows_per=rows_per, ndev=ndev, bmax=bp.bmax, n_nodes=g.n_nodes,
            axis=axis)
        if use_ell:
            # scatter cleared (id-only) entries at the batch edges' frozen-
            # window positions of the LOCAL table shard (positive-OOB
            # sentinel lanes dropped)
            tbl1 = ell1[0]
            ek = tbl1.shape[-1]
            tbl1 = (tbl1.reshape(-1).at[me[0]].set(mc[0], mode="drop")
                    .reshape(rows_per, ek))
            lwA = LocalWindows(
                ip=wipA_[0], col=wcolA_[0], val=wvalA_[0], deg=wdegA_[0],
                r0=r0_[0, 0], rows_per=rows_per, n_nodes=g.n_nodes, axis=axis,
                ell=tbl1, ell_k=ek, col_bits=g.col_bits)
            lwA2 = LocalWindows(
                ip=wip2_[0], col=wcol2_[0], val=wval2_[0], deg=wdeg2_[0],
                r0=r0_[0, 0], rows_per=rows_per, n_nodes=g.n_nodes, axis=axis,
                ell=ell2[0], ell_k=ell2.shape[-1], col_bits=tr.adj2.col_bits)
            lwA3 = LocalWindows(
                ip=wip3_[0], col=wcol3_[0], val=wval3_[0], deg=wdeg3_[0],
                r0=r0_[0, 0], rows_per=rows_per, n_nodes=g.n_nodes, axis=axis,
                ell=ell3[0], ell_k=ell3.shape[-1],
                col_bits=tr.adj3.col_bits) if use3 else None
        else:
            wvalA_m = wvalA_[0].at[mw[0]].set(0.0)
            lwA = LocalWindows(
                ip=wipA_[0], col=wcolA_[0], val=wvalA_m, deg=wdegA_[0],
                r0=r0_[0, 0], rows_per=rows_per, n_nodes=g.n_nodes, axis=axis)
            lwA2 = LocalWindows(
                ip=wip2_[0], col=wcol2_[0], val=wval2_[0], deg=wdeg2_[0],
                r0=r0_[0, 0], rows_per=rows_per, n_nodes=g.n_nodes, axis=axis)
            lwA3 = LocalWindows(
                ip=wip3_[0], col=wcol3_[0], val=wval3_[0], deg=wdeg3_[0],
                r0=r0_[0, 0], rows_per=rows_per, n_nodes=g.n_nodes,
                axis=axis) if use3 else None

        bl = pos.shape[1]  # local edges per device
        nc = bl // c
        posc = pos.reshape(2, nc, c).transpose(1, 0, 2)
        negc = neg.reshape(2, nc, c).transpose(1, 0, 2)
        k_enc, k_lnk = jax.random.split(key)

        def corrs_for(n_pos, n_neg):
            # maskinput self-path correction applies to positive chunks
            if not cfg.maskinput:
                return None
            return jnp.concatenate(
                [jnp.ones((n_pos, c), tr.dtype),
                 jnp.zeros((n_neg, c), tr.dtype)], axis=0)

        def local_loss(params, ema):
            h_l = tr.encoder.apply(
                {"params": params["encoder"]}, x_l[0], lg, True,
                rngs={"dropout": k_enc})
            # h is the smallest per-node array; gather it once per step
            # (sliced back to n_nodes: the frame matmuls' custom VJPs return
            # n_nodes-row cotangents)
            h = jax.lax.all_gather(h_l, axis, tiled=True)[: g.n_nodes]
            if split is None:
                allc = jnp.concatenate([posc, negc], axis=0)
                validc = jnp.ones((2 * nc, c), tr.dtype)
                out, ema2 = tr._scan_scores(
                    params, ema, state.sched, h, lwA, allc, validc, k_lnk,
                    True, adj2=lwA2, corrs=corrs_for(nc, nc),
                    gather_fn=gather_fn, adj3=lwA3)
                pos_l, neg_l = out[:bl], out[bl:]
            else:
                # dual-K: this device's local chunk layout is
                # [nsp_l small pos | big pos] / [nsn_l small neg | big neg]
                # (round-robin interleave done host-side in prepare_batch);
                # EMA update order per device mirrors the replicated split:
                # [pos_s, neg_s] then [pos_b, neg_b]
                nbp_l, nbn_l = nc - nsp_l, nc - nsn_l
                ema_c = ema
                pos_parts, neg_parts = [], []
                i0 = 0
                if nsp_l + nsn_l > 0:
                    small = jnp.concatenate(
                        [posc[:nsp_l], negc[:nsn_l]], axis=0)
                    out_s, ema_c = tr._scan_scores(
                        params, ema_c, state.sched, h, lwA, small,
                        jnp.ones((nsp_l + nsn_l, c), tr.dtype), k_lnk, True,
                        adj2=lwA2, corrs=corrs_for(nsp_l, nsn_l),
                        k=cfg.k_small, gather_fn=gather_fn, adj3=lwA3)
                    pos_parts.append(out_s[: nsp_l * c])
                    neg_parts.append(out_s[nsp_l * c:])
                    i0 = nsp_l + nsn_l
                if nbp_l + nbn_l > 0:
                    big = jnp.concatenate([posc[nsp_l:], negc[nsn_l:]], axis=0)
                    out_b, ema_c = tr._scan_scores(
                        params, ema_c, state.sched, h, lwA, big,
                        jnp.ones((nbp_l + nbn_l, c), tr.dtype), k_lnk, True,
                        i0=i0, adj2=lwA2, corrs=corrs_for(nbp_l, nbn_l),
                        gather_fn=gather_fn, adj3=lwA3)
                    pos_parts.append(out_b[: nbp_l * c])
                    neg_parts.append(out_b[nbp_l * c:])
                ema2 = ema_c
                pos_l = (pos_parts[0] if len(pos_parts) == 1
                         else jnp.concatenate(pos_parts))
                neg_l = (neg_parts[0] if len(neg_parts) == 1
                         else jnp.concatenate(neg_parts))
            # full-batch loss from all-gathered scores ((B,) floats, the
            # smallest exchange of the step): per-index pos/neg pairing is
            # exact for every loss in the catalog even when pos_i and neg_i
            # land on different devices.  The all_gather transposes to a
            # psum_scatter, so each device's cotangent flows back to exactly
            # its own scores.
            all_pos = jax.lax.all_gather(pos_l, axis, tiled=True)
            all_neg = jax.lax.all_gather(neg_l, axis, tiled=True)
            if inv_p is not None:
                all_pos = all_pos[inv_p]
                all_neg = all_neg[inv_n]
            loss = L.LOSSES[cfg.losstrick](
                all_pos, all_neg, num_neg=1,
                weight=cfg.lossweight, margin=cfg.lossmargin)
            return loss, ema2

        (loss, ema2), grads = jax.value_and_grad(local_loss, has_aux=True)(
            state.params, state.ema)
        # the loss is the full-batch value (identical on every device); each
        # device's grads cover only its own compute path, so the total
        # gradient is the SUM over devices
        grads = jax.lax.psum(grads, axis)
        ema2 = jax.tree_util.tree_map(
            lambda v: v if jnp.issubdtype(v.dtype, jnp.integer)
            else jax.lax.pmean(v, axis),
            ema2)
        return loss, grads, ema2

    @jax.jit
    def step(state, pos, neg, masks, key, inv_p=None, inv_n=None,
             ell1=None, ell2=None, ell3=None):
        mi, mb, mw, me, mc = masks
        if use_ell and ell1 is None:
            raise ValueError(
                "this sharded step was built with ELL tables (tr._use_ell); "
                "pass the current refresh's shards (Trainer._ell)")
        if use_ell and use3 and ell3 is None:
            # without this, the (ndev,1,1) placeholder gives LocalWindows
            # ell_k=1 and sharded_gather_neighbors silently falls through to
            # the 1-wide dummy CSR arrays -> wrong cn3 frames
            raise ValueError(
                "THREE_HOP sharded step with ELL tables needs the A^3 shard "
                "table too (ell3); got None")
        if ell1 is None:
            ell1 = jnp.zeros((ndev, 1, 1), jnp.int32)
            ell2 = jnp.zeros((ndev, 1, 1), jnp.int32)
        if ell3 is None:
            ell3 = jnp.zeros((ndev, 1, 1), jnp.int32)
        loss, grads, ema2 = sharded_grads(
            state, pos, neg, mi, mb, mw, me, mc, key, inv_p, inv_n,
            ell1, ell2, ell3,
            xj, icol, irow, ival0, bpos, brow, bval0, sidx,
            wipAj, wcolAj, wvalA0, wdegAj,
            wip2j, wcol2j, wval2j, wdeg2j,
            wip3j, wcol3j, wval3j, wdeg3j, r0s)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, ema2, state.sched, new_opt), loss

    return step, prepare


# --------------------------------------------------------------------------
# sharded eval: encode + score with the graph still sharded
# --------------------------------------------------------------------------

def make_sharded_encode(tr, mesh: Mesh, g: Graph, x, axis: str = "dp"):
    """Eval-mode encoder over the sharded graph: each device runs the
    halo-exchange SpMM stack on its node-range shard, then one all_gather
    returns the replicated (n_nodes, H) hidden states — the smallest
    per-node array, the only one a >HBM graph ever needs whole (VERDICT r2
    item 1c: a graph too big to replicate can now be EVALUATED, not just
    trained)."""
    from ocn_tpu.parallel.node_sharded import partition_graph_boundary

    ndev = mesh.shape[axis]
    bp = partition_graph_boundary(g, ndev)
    rows_per = bp.rows_per
    xn = np.asarray(x)
    pad_rows = ndev * rows_per - xn.shape[0]
    x_pad = np.concatenate(
        [xn, np.zeros((pad_rows,) + xn.shape[1:], xn.dtype)], axis=0)
    xj = jnp.asarray(x_pad.reshape((ndev, rows_per) + xn.shape[1:]))
    garrs = (
        jnp.asarray(bp.send_idx),
        jnp.asarray(bp.icol.astype(np.int32)),
        jnp.asarray(bp.irow.astype(np.int32)), jnp.asarray(bp.ival),
        jnp.asarray(bp.bpos.astype(np.int32)),
        jnp.asarray(bp.brow.astype(np.int32)), jnp.asarray(bp.bval),
    )

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(),) + (P(axis),) * 8,
        out_specs=P(),
        check_vma=False,
    )
    def enc(params, x_l, sidx, icol, irow, ival, bpos, brow, bval):
        lg = LocalGraph(
            sidx=sidx[0], icol=icol[0], irow=irow[0], ival=ival[0],
            bpos=bpos[0], brow=brow[0], bval=bval[0],
            rows_per=rows_per, ndev=ndev, bmax=bp.bmax, n_nodes=g.n_nodes,
            axis=axis)
        h_l = tr.encoder.apply({"params": params}, x_l[0], lg, False)
        return jax.lax.all_gather(h_l, axis, tiled=True)[: g.n_nodes]

    @jax.jit
    def encode(params):
        return enc(params, xj, *garrs)

    return encode


def make_sharded_score(tr, mesh: Mesh, g: Graph, adj2: Graph, use_ell: bool,
                       axis: str = "dp", adj3: Optional[Graph] = None):
    """Forward-only scorer against sharded window tables (or ELL shards).

    Returns score(params, ema, sched, h, edges, valid, key, ell1, ell2, ell3)
    -> (bs,) scores, where edges is (2, bs) with bs divisible by
    ndev * chunk; ``h`` is the replicated hidden-state matrix from
    make_sharded_encode.  Used by Trainer.evaluate / evaluate_mrr when
    graph_sharding == "node" — eval never replicates the adjacency, A^2/A^3
    or the window tables.  ``adj3``: the THREE_HOP (cn6) A^3 graph, sharded
    like A^2."""
    cfg = tr.cfg
    ndev = mesh.shape[axis]
    c = tr._chunk()
    rows_per = -(-g.n_nodes // ndev)
    use3 = adj3 is not None

    if use_ell:
        def _pad_deg(d):
            d = np.asarray(d, np.int32)
            pad = ndev * rows_per - d.shape[0]
            return np.concatenate([d, np.zeros(pad, np.int32)]).reshape(
                ndev, rows_per)

        wdegA = _pad_deg(g.deg)
        wdeg2 = _pad_deg(adj2.deg)
        dummy = np.zeros((ndev, 1), np.int32)
        wipA = wcolA = wip2 = wcol2 = dummy
        wvalA = wval2 = np.zeros((ndev, 1), np.float32)
        if use3:
            wdeg3 = _pad_deg(adj3.deg)
            wip3 = wcol3 = dummy
            wval3 = wvalA
    else:
        wipA, wcolA, wvalA, wdegA, _ = partition_windows(g, ndev)
        wip2, wcol2, wval2, wdeg2, _ = partition_windows(adj2, ndev)
        if use3:
            wip3, wcol3, wval3, wdeg3, _ = partition_windows(adj3, ndev)
    if not use3:
        wip3 = wcol3 = np.zeros((ndev, 1), np.int32)
        wval3 = np.zeros((ndev, 1), np.float32)
        wdeg3 = np.zeros((ndev, 1), np.int32)
    warrs = tuple(jnp.asarray(a) for a in (
        wipA, wcolA, wvalA, wdegA, wip2, wcol2, wval2, wdeg2,
        wip3, wcol3, wval3, wdeg3))
    r0s = jnp.asarray((np.arange(ndev) * rows_per).astype(np.int32))[:, None]

    def gather_fn(lw, nodes, k, key):
        return sharded_gather_neighbors(lw, nodes, k, key)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(
            P(), P(), P(), P(),          # params, ema, sched, h
            P(None, axis), P(axis),      # edges, valid
            P(),                         # key
            P(axis), P(axis), P(axis),   # ell shards
            P(axis), P(axis), P(axis), P(axis),
            P(axis), P(axis), P(axis), P(axis),
            P(axis), P(axis), P(axis), P(axis),
            P(axis),
        ),
        out_specs=P(axis),
        check_vma=False,
    )
    def score_sm(params, ema, sched, h, edges, valid, key, ell1, ell2, ell3,
                 wipA_, wcolA_, wvalA_, wdegA_,
                 wip2_, wcol2_, wval2_, wdeg2_,
                 wip3_, wcol3_, wval3_, wdeg3_, r0_):
        if use_ell:
            lwA = LocalWindows(
                ip=wipA_[0], col=wcolA_[0], val=wvalA_[0], deg=wdegA_[0],
                r0=r0_[0, 0], rows_per=rows_per, n_nodes=g.n_nodes, axis=axis,
                ell=ell1[0], ell_k=ell1.shape[-1], col_bits=g.col_bits)
            lwA2 = LocalWindows(
                ip=wip2_[0], col=wcol2_[0], val=wval2_[0], deg=wdeg2_[0],
                r0=r0_[0, 0], rows_per=rows_per, n_nodes=g.n_nodes, axis=axis,
                ell=ell2[0], ell_k=ell2.shape[-1], col_bits=adj2.col_bits)
            lwA3 = LocalWindows(
                ip=wip3_[0], col=wcol3_[0], val=wval3_[0], deg=wdeg3_[0],
                r0=r0_[0, 0], rows_per=rows_per, n_nodes=g.n_nodes, axis=axis,
                ell=ell3[0], ell_k=ell3.shape[-1],
                col_bits=adj3.col_bits) if use3 else None
        else:
            lwA = LocalWindows(
                ip=wipA_[0], col=wcolA_[0], val=wvalA_[0], deg=wdegA_[0],
                r0=r0_[0, 0], rows_per=rows_per, n_nodes=g.n_nodes, axis=axis)
            lwA2 = LocalWindows(
                ip=wip2_[0], col=wcol2_[0], val=wval2_[0], deg=wdeg2_[0],
                r0=r0_[0, 0], rows_per=rows_per, n_nodes=g.n_nodes, axis=axis)
            lwA3 = LocalWindows(
                ip=wip3_[0], col=wcol3_[0], val=wval3_[0], deg=wdeg3_[0],
                r0=r0_[0, 0], rows_per=rows_per, n_nodes=g.n_nodes,
                axis=axis) if use3 else None
        bl = edges.shape[1]
        nc = bl // c
        ec = edges.reshape(2, nc, c).transpose(1, 0, 2)
        vc = valid.reshape(nc, c)
        # offset the per-chunk eval keys by this device's global chunk range
        # so every chunk of the split draws a distinct deterministic key
        dev = jax.lax.axis_index(axis)
        out, _ = tr._scan_scores(
            params, ema, sched, h, lwA, ec, vc,
            jax.random.fold_in(key, dev), False,
            adj2=lwA2, gather_fn=gather_fn, adj3=lwA3)
        return out

    @jax.jit
    def score(params, ema, sched, h, edges, valid, key, ell1=None, ell2=None,
              ell3=None):
        if ell1 is None:
            ell1 = jnp.zeros((ndev, 1, 1), jnp.int32)
            ell2 = jnp.zeros((ndev, 1, 1), jnp.int32)
        if ell3 is None:
            ell3 = jnp.zeros((ndev, 1, 1), jnp.int32)
        return score_sm(params, ema, sched, h, edges, valid, key, ell1, ell2,
                        ell3, *warrs, r0s)

    return score
