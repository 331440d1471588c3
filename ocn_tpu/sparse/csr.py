"""Static-shape sparse graph containers for TPU.

The reference (qingpingmo/OCN) keeps the adjacency in `torch_sparse.SparseTensor`
(dynamic-nnz COO/CSR backed by C++/CUDA; see reference utils.py:42-44,
ogbdataset.py:44-45).  Dynamic nnz is hostile to XLA, so the TPU-native design
fixes every shape at trace time:

* ``Graph`` holds the adjacency simultaneously in CSR form (``indptr``/``col``
  for per-edge neighbor-list gathers) and COO form (``row``/``col``/``val`` for
  segment-sum SpMM).  ``nnz`` is a static Python int — one XLA compilation per
  graph, which is the right trade for training loops that run thousands of
  steps on one graph.

* ``val`` is the only piece that changes during training:  target-link removal
  ("maskinput", reference NeighborOverlap_large.py:56-63 rebuilds + re-coalesces
  a SparseTensor per batch) becomes a scatter of zeros into ``val`` at
  precomputed nnz positions (``edge2pos``), and edge dropout (DropAdj,
  reference model.py:211-229 `masked_select_nnz`) becomes elementwise value
  masking.  Entries with ``val == 0`` are treated as absent everywhere.

Host-side construction is NumPy (see ocn_tpu/sparse/build.py); this module is
pure JAX-side containers.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Graph:
    """Symmetric, coalesced adjacency with per-row-sorted columns.

    Fields
    ------
    indptr : (n_nodes+1,) int32 — CSR row pointers.
    col    : (nnz,) int32 — column indices, sorted within each row.
    row    : (nnz,) int32 — COO row indices (expanded indptr).
    val    : (nnz,) float32 — edge values; 0 means "masked out / absent".
    deg    : (n_nodes,) int32 — structural row degrees (nnz per row,
             independent of val masking; matches reference rowcount(),
             utils.py:44).
    n_nodes : static int.

    GATHER-ONLY graphs (round 4, the A^2/A^3 memory plan): when a graph is
    only ever consumed through packed window gathers (the precomputed A^2 /
    A^3 row tables — never SpMM'd, masked, or value-mutated), col/row/val/
    tpos may be None and only indptr/deg/packed ride on device: 4 bytes per
    entry instead of 16-20, which is what lets the ppa preset afford
    adj2_cap=1024 single-chip (graph_from_numpy(gather_only=True)).
    """

    indptr: jax.Array
    col: Optional[jax.Array]
    row: Optional[jax.Array]
    val: Optional[jax.Array]
    deg: jax.Array
    n_nodes: int
    # transpose permutation: tpos[p] = nnz position of entry (col[p], row[p]).
    # Exists for symmetric patterns (all OCN graphs); lets the SpMM backward
    # run as a SORTED segment-sum instead of a scatter (ops/spmm.py).
    tpos: Optional[jax.Array] = None
    # packed[e] = col[e] | (int(val[e]) << col_bits): one int32 carrying both
    # the column id and the (small non-negative integer) value, so neighbor
    # window gathers (ops/frame.py) read ONE array instead of two — half the
    # bytes on the A^2 table, the largest gather operand of the cn5 step
    # (BENCH_NOTES.md).  Built only for graphs whose values are integral and
    # fit the spare bits; any value mutation drops it (see with_values).
    packed: Optional[jax.Array] = None
    col_bits: int = 0
    # ELL window tables (sparse/ell.py): ell[r] holds the packed col|val
    # entries of the CSR window [indptr[r]+ell_off[r], +ell_k) — the per-node
    # neighbor sample FROZEN for a refresh interval.  Per-chunk neighbor
    # gathers then become (B,) ROW gathers of a 2-D table instead of (B, K)
    # flat-position gathers: TPU gathers are descriptor-rate-bound (~17-38
    # ns/descriptor, BENCH_NOTES.md round 2), so one 64-element row per
    # descriptor is ~6x+ cheaper for the same payload.
    ell: Optional[jax.Array] = None      # (n_nodes, ell_k) int32 packed
    ell_off: Optional[jax.Array] = None  # (n_nodes,) int32 window offsets
    ell_k: int = 0

    # -- pytree plumbing (n_nodes is static aux data) ------------------------
    def tree_flatten(self):
        return (
            self.indptr, self.col, self.row, self.val, self.deg, self.tpos,
            self.packed, self.ell, self.ell_off,
        ), (self.n_nodes, self.col_bits, self.ell_k)

    @classmethod
    def tree_unflatten(cls, aux, children):
        indptr, col, row, val, deg, tpos, packed, ell, ell_off = children
        return cls(indptr, col, row, val, deg, aux[0], tpos, packed, aux[1],
                   ell, ell_off, aux[2])

    def with_ell(self, ell: jax.Array, ell_off: jax.Array) -> "Graph":
        """Attach ELL window tables (requires a packed col|val layout)."""
        return dataclasses.replace(
            self, ell=ell, ell_off=ell_off, ell_k=int(ell.shape[1]))

    # -- basic properties ----------------------------------------------------
    @property
    def nnz(self) -> int:
        # gather-only graphs carry packed instead of col (same padded length)
        arr = self.col if self.col is not None else self.packed
        return arr.shape[0]

    def with_values(self, val: jax.Array) -> "Graph":
        # value mutation invalidates the packed col|val array and any ELL
        # window table built from it
        return dataclasses.replace(
            self, val=val, packed=None, col_bits=0,
            ell=None, ell_off=None, ell_k=0)

    def ones_values(self) -> "Graph":
        return self.with_values(jnp.ones_like(self.val))

    # -- value-space adjacency edits ----------------------------------------
    def mask_edges(self, positions: jax.Array) -> "Graph":
        """Zero out ``val`` at the given nnz positions.

        TPU-native equivalent of the reference's per-batch target-link removal
        (NeighborOverlap_large.py:56-63): instead of rebuilding + symmetrizing
        a new SparseTensor per batch, scatter zeros at the (i->j, j->i) nnz
        positions of the masked edges.  ``positions`` typically comes from
        ``edge2pos[perm].ravel()``.

        The packed col|val array survives masking: only the VALUE bits of the
        masked entries are cleared (keeping the column id), so per-row id
        ascending order — which the searchsorted membership fallback relies
        on — is preserved exactly like the plain val scatter.
        """
        out = dataclasses.replace(self, val=self.val.at[positions].set(0.0))
        if self.packed is not None:
            cleared = self.packed[positions] & ((1 << self.col_bits) - 1)
            out = dataclasses.replace(
                out, packed=self.packed.at[positions].set(cleared))
        if self.ell is not None:
            # the ELL table holds copies of these entries; callers that know
            # the masked edges' endpoints re-attach a masked table via
            # sparse/ell.py mask_ell (train/loop.py) — dropping it here keeps
            # a forgotten path from reading unmasked values
            out = dataclasses.replace(out, ell=None, ell_off=None, ell_k=0)
        return out

    def drop_edges(self, key: jax.Array, p: float, doscale: bool = True) -> "Graph":
        """Value-space DropAdj (reference model.py:211-229).

        Bernoulli-keeps each nnz with prob 1-p and rescales kept values by
        1/(1-p) (matching `masked_select_nnz` + `fill_value_(1/(1-p))`).
        """
        if p < 1e-6:
            return self
        keep = jax.random.bernoulli(key, 1.0 - p, (self.nnz,))
        scale = 1.0 / (1.0 - p) if doscale else 1.0
        return self.with_values(jnp.where(keep, self.val * scale, 0.0))

    # -- reductions ----------------------------------------------------------
    def value_rowsum(self) -> jax.Array:
        """Per-row sum of values == adj.sum(dim=-1) in the reference
        (used for the `puregcn` norm, model.py:51)."""
        return jax.ops.segment_sum(self.val, self.row, num_segments=self.n_nodes)


# tail padding so neighbor-window slice-gathers (ops/frame.py) never clamp
# backwards near the end of the nnz arrays; padded entries have val == 0 and
# row/col == 0, so COO segment reductions see only zeros.
GATHER_PAD = 4096


def graph_from_numpy(
    indptr: np.ndarray,
    col: np.ndarray,
    n_nodes: int,
    val: Optional[np.ndarray] = None,
    gather_only: bool = False,
) -> Graph:
    """Lift host CSR arrays (see build.py) onto the default device.

    ``gather_only=True`` (A^2/A^3 memory plan): when the values pack into the
    col|val int32 layout, upload ONLY indptr/deg/packed — 4 bytes per entry
    instead of 16-20 — and leave col/row/val/tpos as None.  Valid for graphs
    consumed exclusively through window gathers (gather_neighbors reads the
    packed plane; no SpMM, no value mutation).  Falls back to the full upload
    when the values do not pack (correctness over memory).
    """
    indptr = np.asarray(indptr, np.int32)
    col = np.asarray(col, np.int32)
    deg = (indptr[1:] - indptr[:-1]).astype(np.int32)
    if val is None:
        val = np.ones_like(col, np.float32)
    nnz = col.shape[0]
    pad = GATHER_PAD
    col = np.concatenate([col, np.zeros(pad, np.int32)])
    val = np.concatenate([np.asarray(val, np.float32), np.zeros(pad, np.float32)])
    # pack col|val into one int32 when values are small non-negative integers
    # (A^2/A^3 path counts, unit adjacency): halves neighbor-gather traffic.
    # Consumers that mutate values get `packed` dropped via with_values.
    packed = None
    col_bits = 0
    vi = val.astype(np.int64)
    if val.size and np.all(val == vi) and vi.min() >= 0:
        col_bits = max(int(n_nodes - 1).bit_length(), 1)
        if vi.max() < (1 << (31 - col_bits)):
            packed = (col.astype(np.int64) | (vi << col_bits)).astype(np.int32)
        else:
            col_bits = 0
    if gather_only and packed is not None:
        return Graph(
            indptr=jnp.asarray(indptr),
            col=None, row=None, val=None,
            deg=jnp.asarray(deg),
            n_nodes=int(n_nodes),
            tpos=None,
            packed=jnp.asarray(packed),
            col_bits=col_bits,
        )
    row = np.repeat(np.arange(n_nodes, dtype=np.int32), deg)
    # transpose permutation (valid when the PATTERN is symmetric, which holds
    # for every graph this framework builds): the inverse of the CSC ordering
    csc = np.lexsort((row, col[:nnz]))
    tpos = np.empty(nnz, np.int32)
    tpos[csc] = np.arange(nnz, dtype=np.int32)
    pattern_symmetric = bool(
        np.array_equal(row[csc], col[:nnz]) and np.array_equal(col[:nnz][csc], row)
    )
    # pad rows with the LAST row id so `row` stays sorted (the zero-valued
    # pad entries then feed sorted segment-sums harmlessly)
    row = np.concatenate([row, np.full(pad, max(n_nodes - 1, 0), np.int32)])
    tpos = np.concatenate([tpos, np.arange(nnz, nnz + pad, dtype=np.int32)])
    return Graph(
        indptr=jnp.asarray(indptr),
        col=jnp.asarray(col),
        row=jnp.asarray(row),
        val=jnp.asarray(val, jnp.float32),
        deg=jnp.asarray(deg),
        n_nodes=int(n_nodes),
        tpos=jnp.asarray(tpos) if pattern_symmetric else None,
        packed=jnp.asarray(packed) if packed is not None else None,
        col_bits=col_bits,
    )
