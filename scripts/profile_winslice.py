"""A/B window-gather formulations for gather_neighbors on the real graphs:

  flat      : g.col[pos] elementwise gather (current; 64 issues/row)
  dslice    : vmapped lax.dynamic_slice per plane (1 issue/row/plane)
  packed    : one dynamic_slice on an interleaved (E, 2) int32 [col|val_bits]
              buffer (1 issue/row for BOTH planes)

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_winslice.py
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
    nodes = jnp.asarray(rng.integers(0, N, size=(B,)), jnp.int32)

    for label, gg in (("adj ", g), ("adj2", adj2)):
        e = gg.col.shape[0]
        packed_np = np.empty((e, 2), np.int32)
        packed_np[:, 0] = np.asarray(gg.col)
        packed_np[:, 1] = np.asarray(gg.val).view(np.int32)
        packed = jnp.asarray(packed_np)

        def starts(nd):
            s = gg.indptr[nd]
            return jnp.minimum(s, jnp.maximum(e - K, 0))

        def flat(nd):
            lane = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
            pos = starts(nd)[:, None] + lane
            return gg.col[pos].sum() + gg.val[pos].sum()

        def dslice(nd):
            p0 = starts(nd)
            ids = jax.vmap(lambda s: jax.lax.dynamic_slice(gg.col, (s,), (K,)))(p0)
            vals = jax.vmap(lambda s: jax.lax.dynamic_slice(gg.val, (s,), (K,)))(p0)
            return ids.sum() + vals.sum()

        def packed_slice(nd):
            p0 = starts(nd)
            sl = jax.vmap(
                lambda s: jax.lax.dynamic_slice(packed, (s, 0), (K, 2))
            )(p0)  # (B, K, 2)
            ids = sl[..., 0]
            vals = jax.lax.bitcast_convert_type(sl[..., 1], jnp.float32)
            return ids.sum() + vals.sum()

        def ids_only_dslice(nd):
            p0 = starts(nd)
            ids = jax.vmap(lambda s: jax.lax.dynamic_slice(gg.col, (s,), (K,)))(p0)
            return ids.sum()

        for name, fn in (("flat", flat), ("dslice", dslice),
                         ("packed", packed_slice), ("ids-dslice", ids_only_dslice)):
            print(f"{label} {name:11s} {timeit(lambda: jax.jit(fn)(nodes)):7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
