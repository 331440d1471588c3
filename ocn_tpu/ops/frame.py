"""Candidate-frame common-neighbor extraction — the TPU-native CN kernel layer.

The reference builds, per edge batch, *dynamic-nnz* sparse CN incidence
matrices in one of two ways:

* torch_sparse stack: bit-packed sort-merge intersection on gathered rows
  (`adjoverlap` -> `spmoverlap_`, reference utils.py:146-285) after a
  cuSPARSE SpGEMM `adj2 = spadj @ spadj` (NeighborOverlap_large.py:74).
* pygho stack: `cn1 = Ei (.) Ej`, `Ej2 = Ej @ A`, `cn2 = Ei (.) Ej2`
  (`get_cn1_cn2`, NeighborOverlap_large_ppa.py:147-173).

Neither maps to XLA: shapes are data-dependent and the SpGEMM materializes an
N x N matrix per batch.  The TPU-native formulation used here instead fixes a
**candidate frame**: for a batch of target edges (i, j), the candidate common
neighbors are exactly the (degree-capped, padded-to-K) neighbor list of i.
Every CN matrix of the batch then shares one index array

    ids : (B, K) int32   -- candidate node ids (sorted per row; sentinel = N)

and differs only in its masked value array (B, K):

    cn1.val[b, k] = w_i[b,k] * [ids[b,k] in N(j_b)]                  (1-hop CN)
    cn2.val[b, k] = w_i[b,k] * f(A^2[j_b, ids[b,k]])                 (2-hop CN)

where A^2[j, k] = |N(j) /\\ N(k)| is computed *on the fly* only for the B*K
candidate pairs (an SDDMM against the implicit A^2 — no SpGEMM, no dynamic
shapes), and w_i is the degree-cap importance weight replicating
`sparsesample_reweight` (reference utils.py:109-143).  Masked adjacency
entries (maskinput / DropAdj) carry val == 0 and are excluded by value, which
reproduces the reference's per-batch edge removal exactly.

All downstream predictor math (Hadamard, Gram-Schmidt on the union pattern,
column normalization, cn @ h aggregation) becomes masked dense (B, K) ops —
see ocn_tpu/ops/ortho.py and ocn_tpu/nn/predictors/.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ocn_tpu.sparse.csr import Graph


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NeighborFrame:
    """Padded, per-row-sorted neighbor lists for a batch of nodes.

    ids  : (B, K) int32 — neighbor node ids, ascending per row; invalid lanes
           hold the sentinel ``n_nodes`` so they sort to the end and never
           match a real id in searchsorted lookups.
    w    : (B, K) float32 — entry weights: 0 for invalid/masked lanes, 1 for
           exact lanes, deg/K for degree-capped sampled rows (importance
           reweighting identical to reference utils.py:130).
    """

    ids: jax.Array
    w: jax.Array
    n_nodes: int
    pos: Optional[jax.Array] = None  # (B, K) CSR positions ids were read from

    def tree_flatten(self):
        return (self.ids, self.w, self.pos), (self.n_nodes,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], children[2])

    @property
    def k(self) -> int:
        return self.ids.shape[-1]


def _window_slice(arr: jax.Array, pos0: jax.Array, k: int) -> jax.Array:
    """Gather (B, k) contiguous windows of a 1-D array starting at ``pos0``
    (already clamped to <= len(arr) - k) as a slice-gather: one gather issue
    per row rather than one per element."""
    return jax.vmap(lambda s: jax.lax.dynamic_slice(arr, (s,), (k,)))(pos0)


def gather_neighbors(
    g: Graph,
    nodes: jax.Array,
    k: int,
    key: Optional[jax.Array] = None,
    sampling: str = "window",
    drop: Optional[Tuple[jax.Array, float]] = None,
) -> NeighborFrame:
    """Gather the (<=k)-padded neighbor list of each node in ``nodes``.

    Rows with structural degree <= k are taken exactly; rows with degree > k
    are degree-capped with importance weight deg/k, replicating
    `sparsesample_reweight` (reference utils.py:109-143; the reference
    concedes this approximation via its cndeg/trndeg/tstdeg flags).  With
    ``key=None`` capped rows take their first k entries deterministically.

    ``sampling="window"`` (default, TPU-fast): capped rows take a contiguous
    window of k entries at a uniform offset.  Every entry has inclusion
    probability k/deg, so deg/k-weighted sums stay unbiased (systematic /
    Horvitz-Thompson sampling); only the cross-entry correlation differs from
    the reference's iid draw.  The whole gather then lowers to one
    slice-gather (rows are contiguous in the CSR) — no per-element dynamic
    gathers, no re-sort (windows inherit CSR sortedness).

    ``sampling="iid"``: the reference's with-replacement draw (per-element
    gather positions + a lane re-sort); keep for strict-parity experiments.

    Adjacency values at the gathered positions multiply the weights, so
    entries masked to 0 (maskinput / DropAdj) drop out by value.  Lanes with
    w == 0 may carry arbitrary ids; all consumers are value-masked.

    ``drop=(key, p)``: lane-mask DropAdj — Bernoulli-keep each gathered lane
    with prob 1-p and rescale kept weights by 1/(1-p), WITHOUT mutating the
    graph's value array (which would detach the packed/ELL gather layouts,
    train/loop.py _use_ell).  Same marginal estimator as Graph.drop_edges
    (each adjacency-entry occurrence kept w.p. 1-p, unbiased in the values);
    the deviation is correlation-only: a row gathered twice in one call
    re-draws its lane masks, where the reference's per-call nnz mask is
    shared (PARITY.md §known deviations).
    """
    if drop is not None:
        frame = gather_neighbors(g, nodes, k, key, sampling)
        dkey, p = drop
        keep = jax.random.bernoulli(dkey, 1.0 - p, frame.w.shape)
        return dataclasses.replace(
            frame, w=jnp.where(keep, frame.w * (1.0 / (1.0 - p)), 0.0))
    nodes = nodes.astype(jnp.int32)
    deg = g.deg[nodes]  # (B,)
    start = g.indptr[nodes]  # (B,)
    b = nodes.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    capped = deg > k
    w_row = jnp.where(capped, deg.astype(jnp.float32) / k, 1.0)
    valid = lane < jnp.minimum(deg, k)[:, None]

    if g.ell is not None and sampling == "window" and k <= g.ell_k:
        # ELL fast path (sparse/ell.py): the window sample is FROZEN in a
        # (n_nodes, ell_k) packed table, so this is ONE (B,) row gather —
        # 64 elements per descriptor instead of one (descriptor-rate math in
        # BENCH_NOTES.md round 2).  ``key`` is ignored: offset randomness is
        # per-refresh, drawn when the table was built (PARITY.md deviation).
        # k < ell_k (dual-K small body / pad_deg2_dst) takes the window's
        # leading k lanes — a valid sub-window of the frozen sample.
        pk = g.ell[nodes]
        if k < g.ell_k:
            pk = pk[:, :k]
        ids = jnp.bitwise_and(pk, (1 << g.col_bits) - 1)
        vals = jnp.right_shift(pk, g.col_bits).astype(jnp.float32)
        w = jnp.where(valid, w_row[:, None] * vals, 0.0)
        ids = jnp.where(valid, ids, g.n_nodes)
        pos0 = jnp.minimum(
            start + g.ell_off[nodes], jnp.maximum(g.nnz - k, 0))
        return NeighborFrame(ids=ids, w=w, n_nodes=g.n_nodes,
                             pos=pos0[:, None] + lane)

    if sampling == "window" or key is None:
        if key is not None:
            u = jax.random.uniform(key, (b,))
            woff = jnp.where(
                capped, (u * (deg - k + 1).astype(jnp.float32)).astype(jnp.int32), 0
            )
        else:
            woff = jnp.zeros_like(deg)
        pos0 = jnp.minimum(start + woff, jnp.maximum(g.nnz - k, 0))
        pos = pos0[:, None] + lane
        # window reads lower as a slice-gather (vmapped dynamic_slice -> one
        # gather issue of k contiguous elements per row) instead of the flat
        # elementwise gather (k issues per row).  Measured on chip at
        # (4096, 64): adj 3.1 -> 1.5 ms, adj2 (15M-entry operand) 7.1 -> ~2x
        # (scripts/profile_winslice.py, BENCH_NOTES.md).
        if g.packed is not None:
            # one slice carrying col|val (csr.py): half the gather bytes
            pk = _window_slice(g.packed, pos0, k)
            ids = jnp.bitwise_and(pk, (1 << g.col_bits) - 1)
            vals = jnp.right_shift(pk, g.col_bits).astype(jnp.float32)
        else:
            ids = _window_slice(g.col, pos0, k)
            vals = _window_slice(g.val, pos0, k)
        w = jnp.where(valid, w_row[:, None] * vals, 0.0)
        # invalid suffix lanes read into the next CSR row; sentinel-ize them so
        # rows stay ascending for the searchsorted membership fallback
        ids = jnp.where(valid, ids, g.n_nodes)
        return NeighborFrame(ids=ids, w=w, n_nodes=g.n_nodes, pos=pos)

    # iid with-replacement path (reference-parity sampler)
    exact_off = jnp.minimum(lane, jnp.maximum(deg, 1)[:, None] - 1)
    u = jax.random.uniform(key, (b, k))
    samp_off = jnp.minimum((u * deg[:, None]).astype(jnp.int32), deg[:, None] - 1)
    off = jnp.where(capped[:, None], samp_off, exact_off)
    pos = jnp.minimum(start[:, None] + off, g.nnz - 1)
    if g.packed is not None:
        pk = g.packed[pos]
        ids = jnp.bitwise_and(pk, (1 << g.col_bits) - 1)
        vals = jnp.right_shift(pk, g.col_bits).astype(jnp.float32)
    else:
        ids = g.col[pos]
        vals = g.val[pos]
    w = jnp.where(valid, w_row[:, None] * vals, 0.0)
    ids = jnp.where(valid & (vals != 0), ids, g.n_nodes)
    # keep ids sorted for the searchsorted membership fallback
    order = jnp.argsort(ids, axis=-1)
    ids = jnp.take_along_axis(ids, order, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    pos = jnp.take_along_axis(pos, order, axis=-1)
    return NeighborFrame(ids=ids, w=w, n_nodes=g.n_nodes, pos=pos)


# above this Kq*Ks product the O(Kq*Ks) compare tensor stops paying for itself
_COMPARE_LIMIT = 32768

# tri-state: None = decide from backend at first use
_USE_PALLAS: Optional[bool] = None


def use_pallas_membership() -> bool:
    """Opt-in routing of membership through the Pallas kernel
    (OCN_TPU_PALLAS=1).  Measured on chip at (16384, 64, 64): fused XLA
    compare 1.37 ms vs the statically-unrolled Pallas kernel 3.04 ms — XLA's
    fusion wins, so it is the default; the kernel remains as the
    hand-written reference point (BENCH_NOTES.md)."""
    global _USE_PALLAS
    if _USE_PALLAS is None:
        import os

        env = os.environ.get("OCN_TPU_PALLAS")
        _USE_PALLAS = env not in (None, "0", "false", "")
    return _USE_PALLAS


def _rowwise_membership(
    query_ids: jax.Array, sorted_ids: jax.Array, sorted_w: jax.Array
) -> jax.Array:
    """For each query id, the weight of the matching entry of the sorted row
    (0 if absent).  Shapes: query (B, Kq), sorted (B, Ks) -> (B, Kq).

    The XLA analogue of the packed-int64 `torch.searchsorted` intersection in
    reference utils.py:163-183.  Two lowerings:

    * small K: a dense (B, Kq, Ks) equality-compare + weighted reduce — pure
      VPU element-wise work that XLA fuses, no gathers (TPU gathers on
      per-row dynamic indices are the slow path);
    * large K: vectorized binary search (vmap'd searchsorted).

    The compare path sums weights over *all* matching lanes; rows sampled
    with replacement can hold duplicate ids whose importance weights then
    add, which is the correct estimator (searchsorted keeps only the first).
    """
    kq, ks = query_ids.shape[-1], sorted_ids.shape[-1]
    if kq * ks <= _COMPARE_LIMIT:
        if query_ids.ndim == 2 and use_pallas_membership():
            from ocn_tpu.ops.pallas.membership import membership_counts

            return membership_counts(query_ids, sorted_ids, sorted_w)
        # layout (B, Ks, Kq): the Ks reduction runs over SUBLANES (cheap on
        # the VPU); reducing over the lane dim costs cross-lane shuffles
        eq = sorted_ids[..., :, None] == query_ids[..., None, :]
        return jnp.sum(jnp.where(eq, sorted_w[..., :, None], 0.0), axis=-2)
    # binary-search path: flatten any leading batch dims to (rows, K) —
    # the blocked recursion scorer passes (B, R, K) (query broadcast over
    # the candidate axis)
    lead = jnp.broadcast_shapes(query_ids.shape[:-1], sorted_ids.shape[:-1])
    q = jnp.broadcast_to(query_ids, lead + (kq,)).reshape(-1, kq)
    si = jnp.broadcast_to(sorted_ids, lead + (ks,)).reshape(-1, ks)
    sw = jnp.broadcast_to(sorted_w, lead + (ks,)).reshape(-1, ks)
    idx = jax.vmap(jnp.searchsorted)(si, q)
    idx = jnp.minimum(idx, ks - 1)
    hit = jnp.take_along_axis(si, idx, axis=-1) == q
    wq = jnp.take_along_axis(sw, idx, axis=-1)
    return jnp.where(hit, wq, 0.0).reshape(lead + (kq,))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CNFrame:
    """A batch of CN incidence matrices in the shared candidate frame.

    Represents the sparse (B, n_nodes) matrix whose row b has entries
    ``(ids[b, k], val[b, k])`` for val != 0.  ``ids`` is shared by cn1/cn2/...
    of the same batch, which makes their Hadamard products and pattern unions
    elementwise.
    """

    ids: jax.Array  # (B, K) int32, sentinel n_nodes on empty lanes
    val: jax.Array  # (B, K) float32, 0 == absent
    n_nodes: int

    def tree_flatten(self):
        return (self.ids, self.val), (self.n_nodes,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @property
    def mask(self) -> jax.Array:
        return self.val != 0

    def with_values(self, val: jax.Array) -> "CNFrame":
        return dataclasses.replace(self, val=val)

    # -- the four sparse ops the predictors need ----------------------------
    def col_sum(self) -> jax.Array:
        """Per-node column sums over the batch: cn.sum(dim=0) in the
        reference (model.py:2261).  Returns (n_nodes,)."""
        flat_ids = self.ids.reshape(-1)
        flat_val = self.val.reshape(-1)
        s = jax.ops.segment_sum(flat_val, flat_ids, num_segments=self.n_nodes + 1)
        return s[: self.n_nodes]

    def scale_cols(self, colscale: jax.Array) -> "CNFrame":
        """Multiply each entry by a per-node column factor (column
        normalization, reference model.py:2272).  Sentinel lanes have val == 0
        so the clamped gather is harmless."""
        safe = colscale[jnp.minimum(self.ids, self.n_nodes - 1)]
        return self.with_values(self.val * safe)

    def matmul(self, x: jax.Array) -> jax.Array:
        """cn @ x  ==  spmm_add(cn, x) (reference model.py:2426-2427).

        Gather-then-contract forward; custom backward whose dx accumulation
        is a sort + SORTED segment-sum instead of an unsorted scatter-add
        (TPU scatters run ~10x off roofline; see BENCH_NOTES.md).
        """
        return _frame_matmul(x, self.ids, self.val, self.n_nodes)

    def inner(self, other: "CNFrame") -> jax.Array:
        """<self, other> = sum of elementwise products over the shared
        pattern — `spsphadamard(...).values.sum()` (reference model.py:2243).
        Valid because both frames share ``ids``."""
        return jnp.sum(self.val * other.val)


def pad_features(x: jax.Array) -> jax.Array:
    """Append one zero row so that sentinel id == n_nodes gathers zeros."""
    return jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)


import functools


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FrameIndex:
    """Sorted-domain index of one chunk's flat candidate ids — computed once
    per chunk and shared by every column-sum / frame-matmul of that chunk.

    The reference's per-batch column sums (`cn.sum(dim=0)`, model.py:2261)
    and their gradients would each lower to an unsorted TPU scatter into all
    n_nodes buckets — the slowest op class on TPU (BENCH_NOTES.md).  Sorting
    the B*K flat ids ONCE turns every one of them into a sorted segment-sum
    plus cheap elementwise gathers, and the frame-matmul backward reuses the
    same sort instead of re-sorting inside the VJP.

    perm     : (M,) argsort of flat ids (ascending; sentinel n_nodes last)
    inv_perm : (M,) inverse permutation (entry -> sorted position)
    rank     : (M,) compact column index per sorted position (0..U-1)
    seg      : (M,) sorted ids clamped to n_nodes-1 (frame-matmul dx segments)
    rowidx   : (M,) chunk-row index per sorted position (perm // K)
    rank_inv : (M,) compact column index per ENTRY (rank[inv_perm]) — built
               with one scatter at index time so every entry_col_sum trip
               out of the sorted domain is ONE gather (sums[rank_inv])
               instead of two (sums[rank][inv_perm]); at the ~17 ns/
               descriptor gather floor that removes an M-descriptor op from
               the forward AND the self-adjoint backward of every column-sum
               call (VERDICT r2 item 4; chip A/B in BENCH_NOTES round 3)
    """

    perm: jax.Array
    inv_perm: jax.Array
    rank: jax.Array
    seg: jax.Array
    rowidx: jax.Array
    rank_inv: jax.Array

    def tree_flatten(self):
        return (self.perm, self.inv_perm, self.rank, self.seg, self.rowidx,
                self.rank_inv), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def colsum_out_idx(self) -> jax.Array:
        """Entry-domain output index for entry_col_sum*: the segment-sum
        output is indexed by rank (normal path) or by sorted position
        (OCN_TPU_SEG_SCAN associative-scan path, and the
        OCN_TPU_COLSUM_3TRIP round-2 reference formulation)."""
        if _use_seg_scan() or _use_colsum_3trip():
            return self.inv_perm
        return self.rank_inv


def frame_index(ids: jax.Array, n_nodes: int) -> FrameIndex:
    """Build the shared sorted-domain index for a (B, K) id array."""
    b, k = ids.shape
    flat = ids.reshape(-1)
    m = flat.shape[0]
    perm = jnp.argsort(flat)
    sorted_ids = flat[perm]
    iota = jnp.arange(m, dtype=jnp.int32)
    inv_perm = jnp.zeros((m,), jnp.int32).at[perm].set(iota)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sorted_ids[1:] != sorted_ids[:-1]).astype(jnp.int32)]
    )
    rank = jnp.cumsum(is_start).astype(jnp.int32) - 1
    seg = jnp.minimum(sorted_ids, n_nodes - 1)
    rowidx = (perm // k).astype(jnp.int32)
    rank_inv = jnp.zeros((m,), jnp.int32).at[perm].set(rank)
    return FrameIndex(perm, inv_perm, rank, seg, rowidx, rank_inv)


def _seg_total(sv: jax.Array, rank: jax.Array) -> jax.Array:
    """Per-position segment totals of presorted values — ZERO gathers.

    ``sv`` (M,) or (M, P) values sorted by column id, ``rank`` (M,)
    nondecreasing compact column index.  Replaces the
    ``segment_sum(...)[rank]`` idiom: on TPU the ``[rank]`` expansion is an
    M-descriptor gather (descriptor-rate-bound like every gather,
    BENCH_NOTES.md round 2), while two log-depth associative scans — a
    segmented inclusive sum followed by a backward fill from segment ends —
    are purely elementwise."""
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), rank[1:] != rank[:-1]])
    flag = is_start
    if sv.ndim == 2:
        flag = is_start[:, None]
    flag = jnp.broadcast_to(flag, sv.shape)

    def seg_sum(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av + bv), af | bf

    run, _ = jax.lax.associative_scan(seg_sum, (sv, flag))
    # segment end flags, reversed; fill-backward = fill-forward on reversal
    is_end_rev = jnp.concatenate(
        [jnp.ones((1,), bool), is_start[::-1][:-1]])
    eflag = is_end_rev if sv.ndim == 1 else is_end_rev[:, None]
    eflag = jnp.broadcast_to(eflag, sv.shape)

    def fill(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av), af | bf

    total_rev, _ = jax.lax.associative_scan(fill, (run[::-1], eflag))
    return total_rev[::-1]


_COLSUM_3TRIP: Optional[bool] = None


def _use_colsum_3trip() -> bool:
    """Round-2 reference formulation (sums[rank][inv_perm] — three
    M-descriptor trips per colsum direction) for same-day A/Bs against the
    shipped 2-trip rank_inv path; opt-in via OCN_TPU_COLSUM_3TRIP=1.
    Measured on chip 2026-08-20: colsum fwd 11.82 vs 9.32 ms, ortho f+b
    26.99 vs 21.75 ms (BENCH_NOTES round 3)."""
    global _COLSUM_3TRIP
    if _COLSUM_3TRIP is None:
        import os

        _COLSUM_3TRIP = os.environ.get("OCN_TPU_COLSUM_3TRIP") in ("1", "true")
    return _COLSUM_3TRIP


_SEG_SCAN: Optional[bool] = None


def _use_seg_scan() -> bool:
    """Segmented-scan column sums — opt-in via OCN_TPU_SEG_SCAN=1.

    Measured 2026-08-20 (BENCH_NOTES.md): the gather-free associative-scan
    formulation LOSES 1.2% e2e vs segment_sum + [rank]-gather at bench shapes
    (204.1k vs 206.5k edges/s) and compiles ~3x slower (16 vs 5 min) — the
    log-depth scan passes cost more than the M-descriptor rank gather they
    replace.  Kept as a tested reference point (tests/test_seg_scan.py),
    default OFF."""
    global _SEG_SCAN
    if _SEG_SCAN is None:
        import os

        _SEG_SCAN = os.environ.get("OCN_TPU_SEG_SCAN") in ("1", "true")
    return _SEG_SCAN


@jax.custom_vjp
def entry_col_sum(val: jax.Array, perm, rank, out_idx) -> jax.Array:
    """Per-entry column sums: out[b, k] = sum of val over entries sharing
    ids[b, k] — i.e. the batch column sum S[ids[b,k]] delivered directly at
    each entry (what `scale_cols(f(col_sum()))` consumes), with no n_nodes-
    domain array anywhere.  Linear and SELF-ADJOINT (the matrix [id_p == id_q]
    is symmetric), so the VJP is the same map applied to the cotangent.

    ``out_idx`` is ``FrameIndex.colsum_out_idx``: the per-entry RANK index
    (sums[rank_inv], one gather out) on the default path, or the per-entry
    sorted position under OCN_TPU_SEG_SCAN (the scan's output lives at
    sorted positions).  Round 3 removed the old sums[rank][inv_perm] double
    trip — one M-descriptor gather per direction saved (VERDICT r2 item 4).
    """
    m = val.size
    sv = val.reshape(-1)[perm]
    if _use_seg_scan():
        return _seg_total(sv, rank)[out_idx].reshape(val.shape)
    sums = jax.ops.segment_sum(sv, rank, num_segments=m, indices_are_sorted=True)
    if _use_colsum_3trip():  # out_idx is inv_perm here
        return sums[rank][out_idx].reshape(val.shape)
    return sums[out_idx].reshape(val.shape)


def _entry_col_sum_fwd(val, perm, rank, out_idx):
    return entry_col_sum(val, perm, rank, out_idx), (perm, rank, out_idx)


def _entry_col_sum_bwd(res, g):
    perm, rank, out_idx = res
    return entry_col_sum(g, perm, rank, out_idx), None, None, None


entry_col_sum.defvjp(_entry_col_sum_fwd, _entry_col_sum_bwd)


@jax.custom_vjp
def entry_col_sum_multi(vals: jax.Array, perm, rank, out_idx) -> jax.Array:
    """entry_col_sum over P stacked value planes sharing one id array:
    vals (P, B, K) -> (P, B, K).  One sorted segment-sum pass with (M, P)
    contributions instead of P sequential passes — the cn5 pipeline needs the
    cn1 and cn2 column sums of the same chunk, and their gather/segment trips
    batch for free.  Self-adjoint per plane, like entry_col_sum."""
    p = vals.shape[0]
    m = vals[0].size
    if _use_seg_scan():
        # (M, P) ROW-shaped permutation trips (one descriptor per entry, not
        # per entry*plane) + gather-free segment broadcast (_seg_total)
        sv = vals.reshape(p, -1).T[perm]  # (M, P)
        return _seg_total(sv, rank)[out_idx].T.reshape(vals.shape)
    sv = vals.reshape(p, -1)[:, perm].T  # (M, P)
    sums = jax.ops.segment_sum(sv, rank, num_segments=m, indices_are_sorted=True)
    if _use_colsum_3trip():  # out_idx is inv_perm here
        return sums[rank][out_idx].T.reshape(vals.shape)
    return sums[out_idx].T.reshape(vals.shape)


def _entry_col_sum_multi_fwd(vals, perm, rank, out_idx):
    return entry_col_sum_multi(vals, perm, rank, out_idx), (perm, rank, out_idx)


def _entry_col_sum_multi_bwd(res, g):
    perm, rank, out_idx = res
    return entry_col_sum_multi(g, perm, rank, out_idx), None, None, None


entry_col_sum_multi.defvjp(_entry_col_sum_multi_fwd, _entry_col_sum_multi_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _frame_matmul(x, ids, val, n_nodes):
    rows = x[jnp.minimum(ids, n_nodes - 1)]  # (B, K, H)
    return jnp.einsum(
        "bk,bkh->bh", val, rows, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _frame_matmul_fwd(x, ids, val, n_nodes):
    return _frame_matmul(x, ids, val, n_nodes), (x, ids, val)


def _frame_matmul_bwd(n_nodes, res, dout):
    x, ids, val = res
    b, k = ids.shape
    flat_ids = jnp.minimum(ids, n_nodes - 1).reshape(-1)
    # dx[n] = sum over entries with ids==n of val * dout[row]; run it as a
    # sort + sorted segment-sum (scatter-free)
    perm = jnp.argsort(flat_ids)
    seg = flat_ids[perm]
    rowidx = perm // k
    contrib = (val.reshape(-1)[perm])[:, None] * dout[rowidx]
    dx = jax.ops.segment_sum(
        contrib, seg, num_segments=n_nodes, indices_are_sorted=True
    ).astype(x.dtype)
    # dval[b,k] = <x[ids[b,k]], dout[b]>
    rows = x[jnp.minimum(ids, n_nodes - 1)]
    dval = jnp.einsum(
        "bkh,bh->bk", rows, dout, preferred_element_type=jnp.float32
    ).astype(val.dtype)
    return dx, None, dval


_frame_matmul.defvjp(_frame_matmul_fwd, _frame_matmul_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _frame_matmul_multi(x, ids, vals, n_nodes):
    """P aggregates over ONE row gather: frames sharing an id array (cn1/cn2
    of the same batch, the orthogonalized pair, cn6's triple) each pay the
    (B, K, H) gather once instead of per-matmul — the gather is the measured
    bottleneck (BENCH_NOTES.md: ~31 GB/s bound).

    vals: (P, B, K) stacked value arrays -> returns (P, B, H).
    """
    rows = x[jnp.minimum(ids, n_nodes - 1)]  # (B, K, H) — single gather
    return jnp.einsum(
        "pbk,bkh->pbh", vals, rows, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _frame_matmul_multi_fwd(x, ids, vals, n_nodes):
    return _frame_matmul_multi(x, ids, vals, n_nodes), (x, ids, vals)


def _frame_matmul_multi_bwd(n_nodes, res, dout):
    x, ids, vals = res
    b, k = ids.shape
    flat_ids = jnp.minimum(ids, n_nodes - 1).reshape(-1)
    perm = jnp.argsort(flat_ids)
    seg = flat_ids[perm]
    rowidx = perm // k
    # combined contribution of every plane through the shared gather
    coef = jnp.einsum("pbk,pbh->bkh", vals, dout.astype(jnp.float32))
    contrib = coef.reshape(b * k, -1)[perm]
    dx = jax.ops.segment_sum(
        contrib, seg, num_segments=n_nodes, indices_are_sorted=True
    ).astype(x.dtype)
    rows = x[jnp.minimum(ids, n_nodes - 1)]
    dvals = jnp.einsum(
        "bkh,pbh->pbk", rows, dout, preferred_element_type=jnp.float32
    ).astype(vals.dtype)
    return dx, None, dvals


_frame_matmul_multi.defvjp(_frame_matmul_multi_fwd, _frame_matmul_multi_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _frame_matmul_multi_prep(x, ids, vals, perm, seg, rowidx, n_nodes):
    """_frame_matmul_multi with the flat-id sort precomputed (FrameIndex):
    the backward's dx segment-sum reuses (perm, seg, rowidx) instead of
    re-sorting inside the VJP."""
    rows = x[jnp.minimum(ids, n_nodes - 1)]  # (B, K, H) — single gather
    return jnp.einsum(
        "pbk,bkh->pbh", vals, rows, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _frame_matmul_multi_prep_fwd(x, ids, vals, perm, seg, rowidx, n_nodes):
    out = _frame_matmul_multi_prep(x, ids, vals, perm, seg, rowidx, n_nodes)
    return out, (x, ids, vals, perm, seg, rowidx)


def _frame_matmul_multi_prep_bwd(n_nodes, res, dout):
    x, ids, vals, perm, seg, rowidx = res
    b, k = ids.shape
    coef = jnp.einsum("pbk,pbh->bkh", vals, dout.astype(jnp.float32))
    contrib = coef.reshape(b * k, -1)[perm]
    dx = jax.ops.segment_sum(
        contrib, seg, num_segments=n_nodes, indices_are_sorted=True
    ).astype(x.dtype)
    rows = x[jnp.minimum(ids, n_nodes - 1)]
    dvals = jnp.einsum(
        "bkh,pbh->pbk", rows, dout, preferred_element_type=jnp.float32
    ).astype(vals.dtype)
    return dx, None, dvals, None, None, None


_frame_matmul_multi_prep.defvjp(
    _frame_matmul_multi_prep_fwd, _frame_matmul_multi_prep_bwd
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _frame_matmul_multi_saverows(x, ids, vals, perm, seg, rowidx, n_nodes):
    """_frame_matmul_multi_prep variant that keeps the forward's (B, K, H)
    row gather alive as a VJP residual instead of re-gathering in backward.
    The gather is the measured bottleneck (~30 GB/s random-row bound,
    BENCH_NOTES.md) while re-reading a resident buffer rides the sequential
    HBM roofline; cost is the residual memory (B*K*H, one per link chunk
    across the scan).  Opt-in via OCN_TPU_SAVE_ROWS=1."""
    rows = x[jnp.minimum(ids, n_nodes - 1)]
    return jnp.einsum(
        "pbk,bkh->pbh", vals, rows, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _frame_matmul_multi_saverows_fwd(x, ids, vals, perm, seg, rowidx, n_nodes):
    rows = x[jnp.minimum(ids, n_nodes - 1)]
    out = jnp.einsum(
        "pbk,bkh->pbh", vals, rows, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return out, (rows, jnp.zeros((0,), x.dtype), vals, perm, seg)


def _frame_matmul_multi_saverows_bwd(n_nodes, res, dout):
    rows, xproto, vals, perm, seg = res
    xdtype = xproto.dtype
    b, k = vals.shape[1], vals.shape[2]
    coef = jnp.einsum("pbk,pbh->bkh", vals, dout.astype(jnp.float32))
    contrib = coef.reshape(b * k, -1)[perm]
    dx = jax.ops.segment_sum(
        contrib, seg, num_segments=n_nodes, indices_are_sorted=True
    ).astype(xdtype)
    dvals = jnp.einsum(
        "bkh,pbh->pbk", rows, dout, preferred_element_type=jnp.float32
    ).astype(vals.dtype)
    return dx, None, dvals, None, None, None


_frame_matmul_multi_saverows.defvjp(
    _frame_matmul_multi_saverows_fwd, _frame_matmul_multi_saverows_bwd
)

_SAVE_ROWS: Optional[bool] = None


def _use_save_rows() -> bool:
    """Default ON (part of the measured +9% step win, BENCH_NOTES.md);
    OCN_TPU_SAVE_ROWS=0 restores the recompute-in-backward VJP (lower
    residual memory: one (B, K, H) buffer per link chunk)."""
    global _SAVE_ROWS
    if _SAVE_ROWS is None:
        import os

        _SAVE_ROWS = os.environ.get("OCN_TPU_SAVE_ROWS") not in ("0", "false", "")
    return _SAVE_ROWS


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _frame_matmul_multi_window(x, y, pos, ids, vals, perm, seg, n_nodes):
    """Window-table frame matmul: the candidate ids of a chunk are contiguous
    CSR windows, so with y = stop_gradient(x)[g.col] (ONE CSR-order gather per
    step, hoisted out of the chunk scan) the per-chunk (B, K, H) row gather
    becomes y[pos] — 4096 contiguous 64-row slices instead of 262k random
    rows, the measured ~30 GB/s random-gather bottleneck (BENCH_NOTES.md).

    Gradient routing: out depends on x only through y; callers MUST pass y
    built from stop_gradient(x) so the full, exact cotangent flows through
    this VJP's dx (the sorted-segment formulation, reusing the FrameIndex
    sort) and zero flows through y.

    ``pos`` must be contiguous windows (pos[b, k] == pos[b, 0] + k — the
    "window" sampling mode, the only one the trainer uses); the rows are
    fetched by the Pallas window-DMA kernel (one copy per window) with the
    8-row start alignment absorbed by shifting the VALUE planes, not the
    feature rows (ops/pallas/window_gather.py)."""
    from ocn_tpu.ops.pallas.window_gather import SLACK, pad_vals, window_rows

    k = pos.shape[-1]
    rows, off = window_rows(y, pos[:, 0], k)  # (B, J, H)
    vals_pad = pad_vals(vals, off, k + SLACK)  # (P, B, J)
    return jnp.einsum(
        "pbj,bjh->pbh", vals_pad, rows, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _frame_matmul_multi_window_fwd(x, y, pos, ids, vals, perm, seg, n_nodes):
    out = _frame_matmul_multi_window(x, y, pos, ids, vals, perm, seg, n_nodes)
    return out, (x, y, pos, vals, perm, seg)


def _frame_matmul_multi_window_bwd(n_nodes, res, dout):
    from ocn_tpu.ops.pallas.window_gather import window_rows

    x, y, pos, vals, perm, seg = res
    p, b, k = vals.shape
    coef = jnp.einsum("pbk,pbh->bkh", vals, dout.astype(jnp.float32))
    contrib = coef.reshape(b * k, -1)[perm]
    dx = jax.ops.segment_sum(
        contrib, seg, num_segments=n_nodes, indices_are_sorted=True
    ).astype(x.dtype)
    # dvals is mathematically dead in OCN (CN values never reach params);
    # computed for VJP completeness, DCE'd by XLA when unused.
    rows, off = window_rows(y, pos[:, 0], k)
    dvals_pad = jnp.einsum(
        "bjh,pbh->pbj", rows, dout, preferred_element_type=jnp.float32
    )
    klane = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1) + off[:, None]
    dvals = jnp.take_along_axis(
        dvals_pad, jnp.broadcast_to(klane[None], (p, b, k)), axis=2
    ).astype(vals.dtype)
    return dx, None, None, None, dvals, None, None


_frame_matmul_multi_window.defvjp(
    _frame_matmul_multi_window_fwd, _frame_matmul_multi_window_bwd
)


def matmul_shared(
    frames: "list[CNFrame]",
    x: jax.Array,
    fidx: Optional[FrameIndex] = None,
    y: Optional[jax.Array] = None,
    pos: Optional[jax.Array] = None,
) -> "list[jax.Array]":
    """cn @ x for several frames sharing one id array, one gather total.

    ``y``/``pos``: window-table fast path — y = stop_gradient(x)[g.col]
    hoisted once per step, pos the frames' CSR window positions (requires
    fidx; see _frame_matmul_multi_window)."""
    ids = frames[0].ids
    vals = jnp.stack([f.val for f in frames])
    if y is not None and pos is not None and fidx is not None:
        out = _frame_matmul_multi_window(
            x, y, pos, ids, vals, fidx.perm, fidx.seg, frames[0].n_nodes
        )
    elif fidx is not None:
        fn = _frame_matmul_multi_saverows if _use_save_rows() else _frame_matmul_multi_prep
        out = fn(
            x, ids, vals, fidx.perm, fidx.seg, fidx.rowidx, frames[0].n_nodes
        )
    else:
        out = _frame_matmul_multi(x, ids, vals, frames[0].n_nodes)
    return [out[i] for i in range(len(frames))]


def cn_frames(
    g: Graph,
    tar_ei: jax.Array,
    k: int,
    k2: Optional[int] = None,
    key: Optional[jax.Array] = None,
    count2_chunk: int = 0,
    with_cn2: bool = True,
    cn2_counts: bool = False,
    exact_two_hop: bool = False,
    with_src: bool = False,
    adj2: Optional[Graph] = None,
    self_corr: Optional[jax.Array] = None,
    k2_dst: Optional[int] = None,
    gather_fn=None,
):
    """Build cn1 (and optionally cn2) frames for target edges ``tar_ei`` (2, B).

    cn1[b, k] != 0  iff candidate k is a 1-hop common neighbor of (i, j)
    (reference `adjoverlap(adj, adj, edge)`, utils.py:248-285).

    cn2[b, k] != 0  iff candidate k is a neighbor of i and a 2-hop neighbor of
    j, i.e. A^2[j, k] > 0 (reference `adjoverlap(adj, adj2, edge)` after the
    SpGEMM at NeighborOverlap_large.py:74).  With ``cn2_counts`` the values
    carry the length-2 path count A^2[j, k] itself, matching the pygho stack's
    `spsphadamard(Ei, Ej @ A)` (NeighborOverlap_large_ppa.py:147-173); without
    it they are binary like the torch_sparse stack.
    ``exact_two_hop``: drop candidates that are also 1-hop neighbors of j,
    matching SPD.py's exactly-distance-2 variant (SPD.py:65-95).

    k2 caps the neighbor lists of j and of the candidates; count2 work is
    chunked over the batch when ``count2_chunk`` > 0 to bound the (chunk, K,
    K2) gather footprint.

    ``k2_dst``: separate (usually smaller) cap for the dst frame N(j) in the
    precomputed-A^2 "gather" mode, where N(j) only feeds the cn1 membership —
    on collab-scale graphs 96% of edge destinations have degree <= 16 while
    A^2 rows are fat, so the two caps deserve different widths.  Ignored on
    the SDDMM path (there N(j) anchors the exact 2-hop counts).
    """
    k2 = k2 or k
    # gather_fn overrides the row-window gather (node-sharded tables pass
    # parallel/sharded_graph.sharded_gather_neighbors); everything downstream
    # of the gathered NeighborFrames is local math either way
    gather = gather_fn or gather_neighbors
    keys = jax.random.split(key, 3) if key is not None else (None, None, None)
    src = gather(g, tar_ei[0], k, keys[0])
    kd = k2_dst if (k2_dst and adj2 is not None and with_cn2) else k2
    dst = gather(g, tar_ei[1], kd, keys[1])

    # --- cn1: membership of candidates (N(i)) in N(j) ----------------------
    in_dst = _rowwise_membership(src.ids, dst.ids, dst.w)
    cn1_val = jnp.where((in_dst != 0) & (src.w != 0), src.w, 0.0)
    cn1 = CNFrame(ids=src.ids, val=cn1_val, n_nodes=g.n_nodes)
    if not with_cn2:
        return (cn1, None, src) if with_src else (cn1, None)

    # --- cn2 fast path: membership in a precomputed, row-capped A^2 -------
    if adj2 is not None:
        a2row = gather(adj2, tar_ei[1], k2, keys[2])
        counts = _rowwise_membership(src.ids, a2row.ids, a2row.w)
        if self_corr is not None:
            # maskinput correction: the removed target edge (i, j) contributed
            # one j-i-k path for every candidate k in N(i); the precomputed
            # A^2 still contains it, so subtract it (the reference removes it
            # by recomputing A^2 from the masked adjacency,
            # NeighborOverlap_large.py:56-74).  Other masked batch edges'
            # contributions are statistically negligible and left in.
            counts = jnp.maximum(counts - self_corr[:, None], 0.0)
        if exact_two_hop:
            counts = jnp.where(in_dst != 0, 0.0, counts)
        base = counts if cn2_counts else (counts > 0).astype(jnp.float32)
        cn2_val = jnp.where(src.w != 0, src.w * base, 0.0)
        cn2 = CNFrame(ids=src.ids, val=cn2_val, n_nodes=g.n_nodes)
        return (cn1, cn2, src) if with_src else (cn1, cn2)

    # --- cn2: A^2[j, cand] via on-the-fly SDDMM ----------------------------
    def count2_block(cand_ids: jax.Array, dst_ids: jax.Array, dst_w: jax.Array,
                     sample_key) -> jax.Array:
        """|N(cand) /\\ N(j)| (weighted) for each candidate. cand (C, K)."""
        c, kk = cand_ids.shape
        nbr = gather_neighbors(g, cand_ids.reshape(-1), k2, sample_key)
        nbr_ids = nbr.ids.reshape(c, kk * k2)
        nbr_w = nbr.w.reshape(c, kk * k2)
        # membership of each of the candidates' neighbors in N(j)
        m = _rowwise_membership(nbr_ids, dst_ids, dst_w)
        contrib = jnp.where(m != 0, nbr_w, 0.0)
        return contrib.reshape(c, kk, k2).sum(-1)

    if count2_chunk and count2_chunk < tar_ei.shape[1]:
        b = tar_ei.shape[1]
        nchunk = -(-b // count2_chunk)
        pad = nchunk * count2_chunk - b
        ci = jnp.pad(src.ids, ((0, pad), (0, 0)), constant_values=g.n_nodes)
        di = jnp.pad(dst.ids, ((0, pad), (0, 0)), constant_values=g.n_nodes)
        dw = jnp.pad(dst.w, ((0, pad), (0, 0)))
        ci = ci.reshape(nchunk, count2_chunk, -1)
        di = di.reshape(nchunk, count2_chunk, -1)
        dw = dw.reshape(nchunk, count2_chunk, -1)
        counts = jax.lax.map(
            lambda args: count2_block(args[0], args[1], args[2], keys[2]), (ci, di, dw)
        )
        counts = counts.reshape(nchunk * count2_chunk, -1)[:b]
    else:
        counts = count2_block(src.ids, dst.ids, dst.w, keys[2])

    if exact_two_hop:
        counts = jnp.where(in_dst != 0, 0.0, counts)
    base = counts if cn2_counts else (counts > 0).astype(jnp.float32)
    cn2_val = jnp.where(src.w != 0, src.w * base, 0.0)
    cn2 = CNFrame(ids=src.ids, val=cn2_val, n_nodes=g.n_nodes)
    return (cn1, cn2, src) if with_src else (cn1, cn2)


def cn3_frame(
    g: Graph,
    tar_ei: jax.Array,
    src: NeighborFrame,
    k2: int,
    k3: int,
    key: Optional[jax.Array] = None,
    chunk: int = 256,
    counts: bool = False,
    adj3: Optional[Graph] = None,
    gather_fn=None,
) -> CNFrame:
    """3-hop CN frame: cn3[b, k] != 0 iff candidate k (in N(i)) has
    A^3[j_b, k] > 0 (reference cn6 consumes `adjoverlap(adj, adj3, edge)`;
    the registry-only 3-hop predictor, model.py:2447-2954).

    Fast path (``adj3``): one membership lookup against a precomputed
    row-capped A^3 = A^2 @ A (host SpGEMM, native gc_spgemm_csr) — the same
    trick as the cn2 "gather" mode, making cn6 cost the same per chunk as
    cn5.  No maskinput self-path correction is applied to A^3 (third-order
    paths through the removed edge are a vanishing fraction; the SDDMM path
    below remains the exact-on-masked-adjacency fallback).

    Fallback: on-the-fly A^3[j, k] = sum_{m in N(k)} |N(m) /\\ N(j)| with
    degree caps k2 (candidate/dst neighborhoods) and k3 (second-hop lists),
    chunked over the batch — the cubic analogue of the cn2 SDDMM.
    """
    b, k = src.ids.shape
    gather = gather_fn or gather_neighbors
    if adj3 is not None:
        a3row = gather(adj3, tar_ei[1], k2, key)
        counts3 = _rowwise_membership(src.ids, a3row.ids, a3row.w)
        base = counts3 if counts else (counts3 > 0).astype(jnp.float32)
        val = jnp.where(src.w != 0, src.w * base, 0.0)
        return CNFrame(ids=src.ids, val=val, n_nodes=g.n_nodes)
    dstf = gather_neighbors(g, tar_ei[1], k2, None)
    nchunk = -(-b // chunk)
    pad = nchunk * chunk - b
    ci = jnp.pad(src.ids, ((0, pad), (0, 0)), constant_values=g.n_nodes)
    di = jnp.pad(dstf.ids, ((0, pad), (0, 0)), constant_values=g.n_nodes)
    dw = jnp.pad(dstf.w, ((0, pad), (0, 0)))

    def block(args):
        cand_ids, dst_ids, dst_w = args  # (C, K), (C, K2)
        c = cand_ids.shape[0]
        nbr = gather_neighbors(g, cand_ids.reshape(-1), k2, None)  # (C*K, K2)
        nbr2 = gather_neighbors(g, nbr.ids.reshape(-1), k3, None)  # (C*K*K2, K3)
        n2_ids = nbr2.ids.reshape(c, k * k2 * k3)
        n2_w = (nbr2.w.reshape(c, k, k2, k3) * nbr.w.reshape(c, k, k2, 1)).reshape(
            c, k * k2 * k3
        )
        m = _rowwise_membership(n2_ids, dst_ids, dst_w)
        contrib = jnp.where(m != 0, n2_w, 0.0)
        return contrib.reshape(c, k, k2 * k3).sum(-1)

    counts3 = jax.lax.map(
        block,
        (
            ci.reshape(nchunk, chunk, -1),
            di.reshape(nchunk, chunk, -1),
            dw.reshape(nchunk, chunk, -1),
        ),
    ).reshape(nchunk * chunk, -1)[:b]
    base = counts3 if counts else (counts3 > 0).astype(jnp.float32)
    val = jnp.where(src.w != 0, src.w * base, 0.0)
    return CNFrame(ids=src.ids, val=val, n_nodes=g.n_nodes)


def cn_residual_frames(
    g: Graph,
    tar_ei: jax.Array,
    k: int,
    key: Optional[jax.Array] = None,
    drop: Optional[Tuple[jax.Array, float]] = None,
    with_src: bool = False,
):
    """CN set plus both residual sets for the incomplete-CN predictors.

    Reference `adjoverlap(adj, adj, tar_ei, calresadj=True)` ->
    `spmoverlap_notoverlap_` (utils.py:210-244):
        cn   = N(i) /\\ N(j)     (src frame)
        res1 = N(i) \\ N(j)      (src frame)
        res2 = N(j) \\ N(i)      (dst frame)
    The two residual patterns are provably disjoint as (B, n_nodes) sparse
    matrices, which the incomplete predictors' union/Hadamard steps rely on.

    ``with_src`` also returns the raw src NeighborFrame (same ids as
    cn/res1) — the cn3 predictor builds its 2-hop frames on it so every
    src-side frame of one forward shares ONE id array (lane-aligned
    Gram-Schmidt + one shared frame_index/matmul gather).
    """
    keys = jax.random.split(key, 2) if key is not None else (None, None)
    # lane-mask DropAdj (see gather_neighbors): each direction of the
    # symmetric adjacency is a distinct nnz in the reference's DropAdj too,
    # so src and dst draw independent masks
    drops = ((None, None) if drop is None else
             ((jax.random.fold_in(drop[0], 0), drop[1]),
              (jax.random.fold_in(drop[0], 1), drop[1])))
    src = gather_neighbors(g, tar_ei[0], k, keys[0], drop=drops[0])
    dst = gather_neighbors(g, tar_ei[1], k, keys[1], drop=drops[1])
    in_dst = _rowwise_membership(src.ids, dst.ids, dst.w)
    in_src = _rowwise_membership(dst.ids, src.ids, src.w)
    cn = CNFrame(src.ids, jnp.where(in_dst != 0, src.w, 0.0), g.n_nodes)
    res1 = CNFrame(src.ids, jnp.where(in_dst == 0, src.w, 0.0), g.n_nodes)
    res2 = CNFrame(dst.ids, jnp.where(in_src == 0, dst.w, 0.0), g.n_nodes)
    if with_src:
        return cn, res1, res2, src
    return cn, res1, res2

