"""Kernel microbenchmarks (BASELINE.md: SpMM GB/s vs speed-of-light; plus the
membership kernel Pallas-vs-XLA comparison).  Run solo on the TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_kernels.py
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
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from ocn_tpu.data.loaders import synthetic_dataset
    from ocn_tpu.ops.spmm import spmm

    print(f"backend: {jax.default_backend()}", flush=True)

    # ---- SpMM GB/s (collab-scale) -----------------------------------------
    ds = synthetic_dataset("collab", seed=0,
                           scale=float(os.environ.get("K_SCALE", "1.0")))
    g = ds.as_graph()
    h = int(os.environ.get("K_H", "256"))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (ds.n_nodes, h)).astype(np.float32), jnp.bfloat16)
    e = int(np.asarray(g.indptr)[-1])
    f = jax.jit(lambda xx: jnp.sum(spmm(g, xx, "sum")).astype(jnp.float32))
    dt = timeit(lambda: f(x))
    # traffic: read x rows per edge + write out rows + index arrays
    bytes_moved = e * h * 2 + ds.n_nodes * h * 2 + e * 8
    print(f"spmm_sum N={ds.n_nodes} E={e} H={h}: {dt*1e3:.2f} ms "
          f"-> {bytes_moved/dt/1e9:.1f} GB/s (roofline ~800 GB/s HBM)", flush=True)

    # ---- membership: Pallas kernel vs XLA compare -------------------------
    b, kq, ks, n = 16384, 64, 64, ds.n_nodes
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, n, size=(b, kq)), jnp.int32)
    ids = jnp.asarray(np.sort(rng.integers(0, n, size=(b, ks)), -1), jnp.int32)
    w = jnp.asarray(rng.random((b, ks)).astype(np.float32))

    def xla_memb(qq, ii, ww):
        eq = qq[:, :, None] == ii[:, None, :]
        return jnp.sum(jnp.where(eq, ww[:, None, :], 0.0), axis=-1)

    fx = jax.jit(lambda: jnp.sum(xla_memb(q, ids, w)))
    print(f"membership_xla ({b}x{kq}x{ks}): {timeit(lambda: fx())*1e3:.2f} ms",
          flush=True)
    if jax.default_backend() not in ("cpu",):
        from ocn_tpu.ops.pallas.membership import membership_counts

        fp = jax.jit(lambda: jnp.sum(membership_counts(q, ids, w)))
        print(f"membership_pallas ({b}x{kq}x{ks}): {timeit(lambda: fp())*1e3:.2f} ms",
              flush=True)

    # ---- frame matmul (gather-weighted reduce) ----------------------------
    val = jnp.asarray((rng.random((b, kq)) > 0.5).astype(np.float32))
    from ocn_tpu.ops.frame import CNFrame

    cn = CNFrame(q, val, n)
    fm = jax.jit(lambda: jnp.sum(cn.matmul(x)).astype(jnp.float32))
    dt = timeit(lambda: fm())
    bytes_mm = b * kq * h * 2 + b * h * 2
    print(f"frame_matmul ({b}x{kq}@{h}): {dt*1e3:.2f} ms "
          f"-> {bytes_mm/dt/1e9:.1f} GB/s gather-bound", flush=True)


if __name__ == "__main__":
    main()
