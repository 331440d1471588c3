"""Measurement-sanity probe for the tunnel TPU: distinguishes real speedups
from timing artifacts (server-side dedup of identical executions, async
dispatch not reaching the chip, etc.).

  1. bf16 matmul with known FLOPs (8192^3 -> ~200 Tflop/s expected on v5e)
  2. x[ids] feature gather with the SAME ids every call vs a DIFFERENT
     (pre-staged) ids array per call
  3. spmm-like segment-sum from bench_kernels shapes (recorded 27.4 ms r1)

Run solo: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_sanity.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def timeit(fn, argsets, n=20):
    import jax

    jax.block_until_ready(fn(*argsets[0]))
    t0 = time.perf_counter()
    out = None
    for i in range(n):
        out = fn(*argsets[i % len(argsets)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    S = 8192
    a = jnp.asarray(rng.standard_normal((S, S)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((S, S)), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    ms = timeit(mm, [(a, b)], n=10)
    print(f"matmul 8192^3 bf16: {ms:7.2f} ms  {2*S**3/ms*1e-9:.0f} Tflop/s", flush=True)

    B, K, H, N = 4096, 64, 256, 235_868
    x = jnp.asarray(rng.standard_normal((N, H)), jnp.bfloat16)
    same = [(jnp.asarray(rng.integers(0, N, size=(B, K)).astype(np.int32)),)]
    diff = [(jnp.asarray(rng.integers(0, N, size=(B, K)).astype(np.int32)),)
            for _ in range(20)]
    ge = jax.jit(lambda i: x[i])
    ms_same = timeit(ge, same)
    ms_diff = timeit(ge, diff)
    print(f"x[ids] (B,64,H): same-input {ms_same:7.3f} ms  "
          f"diff-input {ms_diff:7.3f} ms  "
          f"({B*K*H*2/ms_diff*1e-6:.1f} GB/s diff)", flush=True)

    M = 262_144
    samew = [(jnp.asarray(rng.integers(0, M - 64, size=B).astype(np.int32)),)]
    diffw = [(jnp.asarray(rng.integers(0, M - 64, size=B).astype(np.int32)),)
             for _ in range(20)]
    flat = jnp.asarray(rng.integers(0, 2**31, size=2_640_000, dtype=np.int64).astype(np.int32))

    def window(p):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, 64), 1)
        return flat[p[:, None] + lane]

    gw = jax.jit(window)
    ms_same = timeit(gw, samew)
    ms_diff = timeit(gw, diffw)
    print(f"flat win (B,64): same-input {ms_same:7.3f} ms  "
          f"diff-input {ms_diff:7.3f} ms", flush=True)

    E = 1_320_000
    col = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
    seg = jnp.asarray(np.sort(rng.integers(0, N, size=E)).astype(np.int32))
    sp = jax.jit(lambda c: jax.ops.segment_sum(
        x[c], seg, num_segments=N, indices_are_sorted=True))
    ms = timeit(sp, [(col,)], n=10)
    print(f"spmm seg-sum E=1.32M H=256: {ms:7.2f} ms  "
          f"{E*H*2/ms*1e-6:.1f} GB/s gathered", flush=True)


if __name__ == "__main__":
    main()
