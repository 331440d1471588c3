"""Bisect the 22 ms 'gathers(x3)+membership(x2)' chunk cost (BENCH_NOTES.md)
into its constituent gathers and memberships.  Small programs; compile cache
makes repeats cheap.

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_gatherbisect.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def timeit(fn, n=20):
    import jax

    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from ocn_tpu.data.loaders import synthetic_dataset
    from ocn_tpu.ops.frame import gather_neighbors, _rowwise_membership
    from ocn_tpu.sparse import build as Bld
    from ocn_tpu.sparse.csr import graph_from_numpy

    B, K = 4096, 64
    ds = synthetic_dataset("collab", seed=0).reorder_bfs()
    g = ds.as_graph()
    N = g.n_nodes
    ip = np.asarray(g.indptr)
    col = np.asarray(g.col)[: int(ip[-1])]
    ip2, col2, val2 = Bld.adj2_csr(ip, col, N, cap=64)
    adj2 = graph_from_numpy(ip2, col2, N, val2)

    rng = np.random.default_rng(0)
    edges = jnp.asarray(rng.integers(0, N, size=(2, B)), jnp.int32)
    key = jax.random.PRNGKey(0)

    runs = []

    def rec(name, fn):
        t = timeit(jax.jit(fn))
        runs.append((name, t))
        print(f"{name:28s} {t:7.2f} ms", flush=True)

    rec("gather src (adj)", lambda: gather_neighbors(g, edges[0], K, key).w.sum())
    rec("gather a2row (adj2)", lambda: gather_neighbors(adj2, edges[1], K, key).w.sum())

    def two(e=edges, k=key):
        s = gather_neighbors(g, e[0], K, k)
        d = gather_neighbors(g, e[1], K, k)
        return s.w.sum() + d.w.sum()

    rec("gather src+dst", two)

    def three(e=edges, k=key):
        s = gather_neighbors(g, e[0], K, k)
        d = gather_neighbors(g, e[1], K, k)
        a = gather_neighbors(adj2, e[1], K, k)
        return s.w.sum() + d.w.sum() + a.w.sum()

    rec("gather x3", three)

    # membership alone on pre-staged arrays
    s0 = jax.block_until_ready(jax.jit(
        lambda: gather_neighbors(g, edges[0], K, key))())
    d0 = jax.block_until_ready(jax.jit(
        lambda: gather_neighbors(g, edges[1], K, key))())
    rec("membership x1 (staged)",
        lambda: _rowwise_membership(s0.ids, d0.ids, d0.w).sum())
    rec("membership x2 (staged)",
        lambda: (_rowwise_membership(s0.ids, d0.ids, d0.w)
                 + _rowwise_membership(s0.ids, d0.ids, d0.w * 2)).sum())

    def g1m1(e=edges, k=key):
        s = gather_neighbors(g, e[0], K, k)
        d = gather_neighbors(g, e[1], K, k)
        return _rowwise_membership(s.ids, d.ids, d.w).sum()

    rec("gather x2 + memb x1", g1m1)

    # ids-only gather (no val gather) — is the val gather half the cost?
    def ids_only(e=edges):
        start = g.indptr[e[0].astype(jnp.int32)]
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
        pos = jnp.minimum(start, jnp.maximum(g.col.shape[0] - K, 0))[:, None] + lane
        return g.col[pos].sum()

    rec("flat window gather(col)", ids_only)

    def vals_only(e=edges):
        start = g.indptr[e[0].astype(jnp.int32)]
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
        pos = jnp.minimum(start, jnp.maximum(g.col.shape[0] - K, 0))[:, None] + lane
        return g.val[pos].sum()

    rec("flat window gather(val)", vals_only)

    # dynamic_slice-per-row variant for comparison
    def dslice(e=edges):
        start = g.indptr[e[0].astype(jnp.int32)]
        def row(s):
            return jax.lax.dynamic_slice(g.col, (s,), (K,))
        return jax.vmap(row)(jnp.minimum(start, g.col.shape[0] - K)).sum()

    rec("vmapped dynamic_slice(col)", dslice)


if __name__ == "__main__":
    main()
