"""Fused-table gather microbench (round 5): are per-call (B,) element
gathers (deg, indptr) and separate (N,K) row-table gathers each paying the
full descriptor rate, and does column-concatenating tables into one wider
row gather collapse that cost?

Times, at B=4096 rows of N=235,868 (collab scale, the chunk shape):
  tbl64          one (N,64) row gather              (the anchor)
  tbl64+deg+ip   row gather + two (B,) element gathers (one gather_neighbors
                 call's actual descriptor trips)
  tbl65          one (N,65) row gather (deg packed as a leading column)
  2x tbl64       two separate row gathers (dst N(j) + A^2[j] pattern)
  tbl128         one (N,128) fused row gather (the same payload, one trip)
  3x tbl64       three separate (cn6's dst: N(j) + A^2[j] + A^3[j])
  tbl144         one (N,144) fused

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_fused_gather.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def chained(f, n=20):
    import jax
    import jax.numpy as jnp

    run = jax.jit(lambda s0, *a: jax.lax.scan(
        lambda s, _: (f(s, *a), 0), s0, None, length=n)[0])
    s = run(jnp.zeros((), jnp.int32))
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s = run(jnp.zeros((), jnp.int32))
    jax.block_until_ready(s)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    n, b = 235_868, 4096
    rng = np.random.default_rng(0)
    t64a = jnp.asarray(rng.integers(0, 2**31, size=(n, 64)), jnp.int32)
    t64b = jnp.asarray(rng.integers(0, 2**31, size=(n, 64)), jnp.int32)
    t64c = jnp.asarray(rng.integers(0, 2**31, size=(n, 16)), jnp.int32)
    t65 = jnp.asarray(rng.integers(0, 2**31, size=(n, 65)), jnp.int32)
    t128 = jnp.concatenate([t64a, t64b], axis=1)
    t144 = jnp.concatenate([t64a, t64b, t64c], axis=1)
    deg = jnp.asarray(rng.integers(0, 64, size=n), jnp.int32)
    ip = jnp.asarray(rng.integers(0, 2**30, size=n), jnp.int32)
    rows0 = jnp.asarray(rng.integers(0, n - 8, size=b), jnp.int32)

    def t(name, f):
        print(f"{name:16s} {chained(f):7.3f} ms", flush=True)

    t("tbl64", lambda s: jax.lax.rem(
        t64a[rows0 + s].ravel()[0], jnp.int32(4)))
    t("tbl64+deg+ip", lambda s: jax.lax.rem(
        t64a[rows0 + s].ravel()[0] + deg[rows0 + s][0] + ip[rows0 + s][0],
        jnp.int32(4)))
    t("tbl65", lambda s: jax.lax.rem(
        t65[rows0 + s].ravel()[0], jnp.int32(4)))
    t("2x tbl64", lambda s: jax.lax.rem(
        t64a[rows0 + s].ravel()[0] + t64b[rows0 + s].ravel()[0],
        jnp.int32(4)))
    t("tbl128", lambda s: jax.lax.rem(
        t128[rows0 + s].ravel()[0], jnp.int32(4)))
    t("3x tbl64/16", lambda s: jax.lax.rem(
        t64a[rows0 + s].ravel()[0] + t64b[rows0 + s].ravel()[0]
        + t64c[rows0 + s].ravel()[0], jnp.int32(4)))
    t("tbl144", lambda s: jax.lax.rem(
        t144[rows0 + s].ravel()[0], jnp.int32(4)))
    # element gathers alone
    t("deg only", lambda s: jax.lax.rem(
        deg[rows0 + s][0], jnp.int32(4)))
    t("deg+ip", lambda s: jax.lax.rem(
        deg[rows0 + s][0] + ip[rows0 + s][0], jnp.int32(4)))


if __name__ == "__main__":
    main()
