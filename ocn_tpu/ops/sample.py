"""Degree-capped resampling of CN frames (sparsesample_reweight semantics).

Reference `sparsesample_reweight` (utils.py:109-143): rows of a sparse matrix
with more than `deg` entries are uniformly re-sampled (with replacement) down
to `deg` entries carrying importance weight rowcount/deg; smaller rows are
kept exact with weight 1.  Used by `adjoverlap` for the cndeg / trndeg /
tstdeg caps (utils.py:248-285).

Frame version: rows are edges, entries are the valid lanes of a (B, K) frame.
Output is a fixed (B, R) frame; original lane values are multiplied by the
reweight factor (reference values are always 1 there, so this is a strict
generalization).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ocn_tpu.ops.frame import CNFrame


def sample_frame(cn: CNFrame, r: int, key: Optional[jax.Array]) -> CNFrame:
    """Resample each row of ``cn`` to at most ``r`` lanes.

    With ``key=None`` capped rows take evenly-strided valid lanes
    (deterministic eval path); otherwise uniform with replacement.
    """
    b, k = cn.ids.shape
    valid = cn.mask
    # prefix[b, j] = number of valid lanes at index < j ; total t = prefix[:, -1]
    csum = jnp.cumsum(valid.astype(jnp.int32), axis=-1)
    t = csum[:, -1]
    if r >= k:
        return cn
    # position of the m-th valid lane: first j with csum[j] == m+1
    lane_of = jax.vmap(lambda c, m: jnp.searchsorted(c, m + 1))  # (B,K),(B,R)->(B,R)

    m_keep = jax.lax.broadcasted_iota(jnp.int32, (b, r), 1)
    if key is None:
        stride = jnp.maximum(t[:, None], 1) / r
        m_samp = jnp.minimum((m_keep * stride).astype(jnp.int32), t[:, None] - 1)
    else:
        u = jax.random.uniform(key, (b, r))
        m_samp = jnp.minimum((u * t[:, None]).astype(jnp.int32), t[:, None] - 1)

    capped = t > r
    m = jnp.where(capped[:, None], m_samp, m_keep)
    j = jnp.minimum(lane_of(csum, m), k - 1)
    ids = jnp.take_along_axis(cn.ids, j, axis=-1)
    val = jnp.take_along_axis(cn.val, j, axis=-1)
    keep_ok = m_keep < t[:, None]
    w = jnp.where(capped[:, None], t[:, None].astype(jnp.float32) / r, 1.0)
    val = jnp.where(capped[:, None] | keep_ok, val * w, 0.0)
    ids = jnp.where(val != 0, ids, cn.n_nodes)
    # re-sort lanes by id so sorted-search invariants hold downstream
    order = jnp.argsort(ids, axis=-1)
    ids = jnp.take_along_axis(ids, order, axis=-1)
    val = jnp.take_along_axis(val, order, axis=-1)
    return CNFrame(ids=ids, val=val, n_nodes=cn.n_nodes)
