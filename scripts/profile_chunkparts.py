"""One-chunk component breakdown at bench shapes, on the REAL synthetic
collab graph (BFS-reordered), plus a same-day A/B of the fused-ortho pipeline
(one 3-plane sorted pass) against the old 3-pass one.

Targets the 'frame build ~26 ms / predictor bwd ~15 ms' breakdown from
BENCH_NOTES.md.  Kept to 6 jitted programs — remote compiles cost ~1-3 min
each through the tunnel.

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_chunkparts.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def timeit(fn, n=10):
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
    from ocn_tpu.ops.frame import (
        CNFrame,
        cn_frames,
        frame_index,
        gather_neighbors,
        matmul_shared,
        _rowwise_membership,
    )
    from ocn_tpu.ops import ortho
    from ocn_tpu.sparse import build as Bld
    from ocn_tpu.sparse.csr import graph_from_numpy

    B, K, H = 4096, 64, 256
    ds = synthetic_dataset("collab", seed=0).reorder_bfs()
    g = ds.as_graph()
    N = g.n_nodes
    ip = np.asarray(g.indptr)
    col = np.asarray(g.col)[: int(ip[-1])]
    ip2, col2, val2 = Bld.adj2_csr(ip, col, N, cap=64)
    adj2 = graph_from_numpy(ip2, col2, N, val2)
    print(f"graph N={N} nnz={int(ip[-1])}", flush=True)

    rng = np.random.default_rng(0)
    edges = jnp.asarray(rng.integers(0, N, size=(2, B)), jnp.int32)
    key = jax.random.PRNGKey(0)

    def memb2(e, k):
        s = gather_neighbors(g, e[0], K, k)
        d = gather_neighbors(g, e[1], K, k)
        a = gather_neighbors(adj2, e[1], K, k)
        m1 = _rowwise_membership(s.ids, d.ids, d.w)
        m2 = _rowwise_membership(s.ids, a.ids, a.w)
        return m1.sum() + m2.sum()

    print(f"gathers(x3)+memb(x2)     {timeit(lambda: jax.jit(memb2)(edges, key)):7.2f} ms", flush=True)

    def frames_full(e, k):
        cn1, cn2, src = cn_frames(g, e, k=K, k2=K, key=k, adj2=adj2, with_src=True)
        return cn1.val.sum() + cn2.val.sum()

    print(f"cn_frames(full)          {timeit(lambda: jax.jit(frames_full)(edges, key)):7.2f} ms", flush=True)

    ids_np = rng.integers(0, N, size=(B, K)).astype(np.int32)
    ids = jnp.asarray(ids_np)
    v1 = jnp.asarray((rng.random((B, K)) > 0.5).astype(np.float32))
    v2 = jnp.asarray((rng.random((B, K)) > 0.5).astype(np.float32))

    f_fi = jax.jit(lambda i: frame_index(i, N).rank.sum())
    print(f"frame_index(argsort+inv) {timeit(lambda: f_fi(ids)):7.2f} ms", flush=True)

    fidx = jax.block_until_ready(jax.jit(lambda i: frame_index(i, N))(ids))
    ema0 = jnp.zeros(())
    n0 = jnp.zeros((), jnp.int32)
    x = jnp.asarray(rng.standard_normal((N + 1, H)), jnp.bfloat16)

    def old_ortho(a, b):
        cn1, cn2 = CNFrame(ids, a, N), CNFrame(ids, b, N)
        ncn1 = ortho.colnorm_quirk(cn1, 0.0, fidx)
        inner, _, _ = ortho.ema_inner_product(cn2, ncn1, ema0, n0, True)
        ocn2 = ortho.gram_schmidt(cn2, ncn1, inner)
        return ncn1, ortho.colnorm_plain(ocn2, fidx)

    def new_ortho(a, b):
        cn1, cn2 = CNFrame(ids, a, N), CNFrame(ids, b, N)
        ncn1, ocn2, _, _ = ortho.orthogonalize(cn1, cn2, ema0, n0, True, 0.0, fidx)
        return ncn1, ocn2

    def loss_of(fn):
        def go(a, b, xx):
            ncn1, ocn2 = fn(a, b)
            o1, o2 = matmul_shared([ncn1, ocn2], xx, fidx)
            return o1.astype(jnp.float32).sum() + o2.astype(jnp.float32).sum()
        return go

    for name, fn in (("old3pass", old_ortho), ("fused", new_ortho)):
        f_fb = jax.jit(jax.grad(loss_of(fn), argnums=2))
        print(f"ortho+mm f+b [{name:8s}] {timeit(lambda: jnp.sum(f_fb(v1, v2, x))):7.2f} ms", flush=True)

    def mm(xx):
        o1, o2 = matmul_shared([CNFrame(ids, v1, N), CNFrame(ids, v2, N)], xx, fidx)
        return o1.astype(jnp.float32).sum() + o2.astype(jnp.float32).sum()

    f_mmg = jax.jit(jax.grad(mm))
    print(f"matmul_shared f+b        {timeit(lambda: jnp.sum(f_mmg(x))):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
