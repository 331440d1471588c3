"""ELL window tables: per-node neighbor samples in a row-gatherable layout.

Why this exists (BENCH_NOTES.md round 2): TPU gathers are DESCRIPTOR-rate
bound at ~17-38 ns per descriptor, almost independent of payload size.  The
per-chunk candidate-frame gathers (ops/frame.py gather_neighbors) read (B, K)
window positions from flat CSR arrays — B*K one-element descriptors, ~7.6 ms
per gather at bench shapes — three times per chunk.  Laying the SAME windows
out as a 2-D (n_nodes, K) table turns each of those into a (B,) row gather
(64 elements per descriptor): measured >=6x cheaper for identical payload
(scripts/bench_rowgather.py).

The table freezes each row's window offset for a refresh interval (an epoch
by default) instead of redrawing it per chunk.  Only rows with degree > K are
affected (they get a uniform window sample; rows with degree <= K are exact
either way), and the accuracy A/Bs in results/parity_*.jsonl showed window
granularity does not move Hits@K.  The offsets are drawn on the HOST
(draw_offsets) so the trainer can compute maskinput positions in ELL space
without device gathers; the table itself is built ON DEVICE (build_ell) — one
(N, K) flat-position gather per refresh, amortized over an epoch of chunks.

Entries are the packed col|val int32 layout of Graph.packed (csr.py), so
value masking = clearing the high bits, and one table serves both ids and
values.  Reference counterpart: the sparsesample_reweight degree cap
(utils.py:109-143) — same estimator, sampling granularity per-refresh instead
of per-call (PARITY.md §deviations).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ocn_tpu.sparse.csr import Graph


def draw_offsets(deg: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """Uniform window offset per row: 0 for rows with deg <= k, else
    U{0, deg-k} (every entry then has inclusion probability k/deg — the same
    Horvitz-Thompson window sampler as gather_neighbors(sampling="window"))."""
    slack = np.maximum(deg.astype(np.int64) - k, 0)
    off = (rng.random(deg.shape[0]) * (slack + 1)).astype(np.int64)
    return np.minimum(off, slack).astype(np.int32)


@partial(jax.jit, static_argnames=("k",), donate_argnums=())
def build_ell(packed: jax.Array, indptr: jax.Array, off: jax.Array,
              k: int) -> jax.Array:
    """(n_nodes, k) int32 table: row r = packed[indptr[r]+off[r] : ... +k].

    One flat-position gather of n_nodes*k elements per refresh (the very
    descriptor-bound shape this table exists to avoid — paid once per epoch
    instead of 3x per chunk).  Lanes past a row's degree read into the next
    CSR row; consumers mask them with the degree like the CSR window path
    (the GATHER_PAD tail in csr.py keeps end-of-array reads in bounds).
    """
    n = indptr.shape[0] - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, k), 1)
    pos0 = indptr[:-1] + off
    pos = jnp.minimum(pos0[:, None] + lane, packed.shape[0] - 1)
    return packed[pos]


def attach_ell(g: Graph, tbl: jax.Array, off: jax.Array) -> Graph:
    return g.with_ell(tbl, off)


def build_ell_np(packed: np.ndarray, indptr: np.ndarray, off: np.ndarray,
                 k: int) -> np.ndarray:
    """Host (NumPy) build_ell — used by the node-sharded path, where each
    device should only ever hold its (rows_per, k) row-range shard: building
    on host and `device_put`-ing shards avoids materializing the full (N, k)
    table on any one device (the >HBM-graph contract of
    parallel/sharded_graph.py)."""
    n = indptr.shape[0] - 1
    pos0 = indptr[:-1].astype(np.int64) + off.astype(np.int64)
    pos = np.minimum(
        pos0[:, None] + np.arange(k, dtype=np.int64)[None, :],
        packed.shape[0] - 1)
    return packed[pos]


def mask_ell_flat_positions(
    edges: np.ndarray, mask_positions: np.ndarray, indptr: np.ndarray,
    off: np.ndarray, k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """HOST-side: flat ELL positions of the batch's masked edges + the
    cleared packed values to scatter there.

    ``edges`` (2, B) are the batch's positive edges IN THE SAME ORDER as
    ``mask_positions`` (2 CSR positions per edge: u->v then v->u, the
    edge2pos layout).  An edge direction falls inside row r's frozen window
    iff 0 <= csr_pos - indptr[r] - off[r] < k; directions outside the window
    are not in the table and return position -1 (remapped to a positive
    out-of-bounds index by the consumers — apply_ell_mask / route_ell_mask —
    because JAX wraps negative indices before mode="drop" OOB handling).  The cleared value is just the partner's node id (packed entry
    with zero value bits).
    """
    rows = np.stack([edges[0], edges[1]], axis=1).ravel()
    partners = np.stack([edges[1], edges[0]], axis=1).ravel()
    lane = mask_positions.astype(np.int64) - indptr[rows] - off[rows]
    ok = (lane >= 0) & (lane < k) & (mask_positions >= 0)
    flat = np.where(ok, rows.astype(np.int64) * k + lane, -1)
    return flat.astype(np.int32), partners.astype(np.int32)


def apply_ell_mask(tbl: jax.Array, flat_positions: jax.Array,
                   cleared: jax.Array) -> jax.Array:
    """Scatter cleared (id-only) entries at the masked flat positions;
    -1 positions are dropped.  Device-side, inside the train step.

    JAX wraps NEGATIVE indices before the out-of-bounds check (only positive
    OOB indices are dropped by mode="drop"), so -1 sentinels must be remapped
    to the positive OOB value n*k here — otherwise every -1 lane silently
    overwrites entry (n-1, k-1), deleting a real neighbor whenever row n-1
    has degree >= k (round-3 advisor finding)."""
    n, k = tbl.shape
    flat_positions = jnp.where(flat_positions < 0, n * k, flat_positions)
    return (
        tbl.reshape(-1)
        .at[flat_positions]
        .set(cleared, mode="drop")
        .reshape(n, k)
    )
