"""Gather-shape shootout with a CHAINED timing harness.

scripts/bench_timing_probe.py showed block_until_ready does not reliably wait
for independent dispatches through the axon tunnel (8192^3 matmul "finished"
in 1.7 ms; chained calls give the sane 126 Tflop/s).  Every measurement here
therefore threads a data dependency through the loop: a checksum of call i's
output perturbs call i+1's indices, forcing serial on-chip execution.

Shapes (bench scale: N=235,868, E=2.64M directed, B=4096 chunk):
  A. flat-position window gather (B, 64) <- (E,) int32    [current hot path]
  B. row gather (B,) rows of (N, 64) int32                [ELL redesign]
  C. row gather (B,) rows of (N, 16) int32                [ELL small body]
  D. flat-position window gather (B, 16) <- (E,)          [current small body]
  E. feature row gather x[ids] (B, 64, H) bf16            [matmul fwd path]
  F. Pallas window-DMA (B windows of (72, H) bf16)        [window_rows kernel]
  G. 3x(B,64) flat-pos gathers in ONE jit                 [fusion check]
  M. 8192^3 bf16 matmul                                    [sanity anchor]

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_rowgather.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def chained_timeit(f, chk, args, n=20):
    """Time f by running it n times inside ONE jitted lax.scan whose carry is
    a checksum of the previous iteration's output (data dependency => serial
    on-chip execution; one dispatch => tunnel overhead amortized to ~0.1 ms).
    The python-level chk/f split is kept for signature compatibility."""
    import jax
    import jax.numpy as jnp

    def body(s, _):
        out = f(s, *args)
        return chk(out), 0

    run = jax.jit(lambda s0: jax.lax.scan(body, s0, None, length=n)[0])
    s = run(jnp.zeros((), jnp.int32))
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s = run(jnp.zeros((), jnp.int32))
    jax.block_until_ready(s)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    B, K, H = 4096, 64, 256
    N, E = 235_868, 2_640_000
    rng = np.random.default_rng(0)

    flat = jnp.asarray(rng.integers(0, 2**31, size=E, dtype=np.int64).astype(np.int32))
    ell64 = jnp.asarray(rng.integers(0, 2**31, size=(N, 64), dtype=np.int64).astype(np.int32))
    ell16 = jnp.asarray(np.asarray(ell64[:, :16]))
    x = jnp.asarray(rng.standard_normal((N, H)), jnp.bfloat16)
    p0 = jnp.asarray(rng.integers(0, E - 128, size=B, dtype=np.int64).astype(np.int32))
    rows = jnp.asarray(rng.integers(0, N - 8, size=B, dtype=np.int64).astype(np.int32))
    ids = jnp.asarray(rng.integers(0, N - 8, size=(B, K), dtype=np.int64).astype(np.int32))

    chk_i = (lambda o: jax.lax.rem(o.ravel()[0], jnp.int32(4)))
    chk_f = (lambda o: jax.lax.rem(
        o.ravel()[0].astype(jnp.float32).astype(jnp.int32), jnp.int32(4)))

    def window(tbl, p, k):
        lane = jax.lax.broadcasted_iota(jnp.int32, (p.shape[0], k), 1)
        return tbl[p[:, None] + lane]

    fa = (lambda s, t, p: window(t, p + s, K))
    fb = (lambda s, t, r: t[r + s])
    fd = (lambda s, t, p: window(t, p + s, 16))
    fe = (lambda s, t, i: t[i + s])
    fg = (lambda s, t, p1, p2, p3: (
        window(t, p1 + s, K), window(t, p2 + s, K), window(t, p3 + s, K)))
    fg3 = (lambda o: jax.lax.rem(o[0].ravel()[0], jnp.int32(4)))

    ms = chained_timeit(fa, chk_i, (flat, p0))
    print(f"A flat (B,64)<-(E,)    {ms:8.3f} ms  ns/elem {ms*1e6/(B*K):6.1f}", flush=True)
    ms = chained_timeit(fb, chk_i, (ell64, rows))
    print(f"B rows of (N,64)       {ms:8.3f} ms  ns/row  {ms*1e6/B:6.1f}", flush=True)
    ms = chained_timeit(fb, chk_i, (ell16, rows))
    print(f"C rows of (N,16)       {ms:8.3f} ms  ns/row  {ms*1e6/B:6.1f}", flush=True)
    ms = chained_timeit(fd, chk_i, (flat, p0))
    print(f"D flat (B,16)<-(E,)    {ms:8.3f} ms  ns/elem {ms*1e6/(B*16):6.1f}", flush=True)
    ms = chained_timeit(fe, chk_f, (x, ids))
    print(f"E feat x[ids] (B,64,H) {ms:8.3f} ms  {B*K*H*2/ms*1e-6:6.1f} GB/s", flush=True)

    from ocn_tpu.ops.pallas.window_gather import window_rows
    yw = jnp.asarray(rng.standard_normal((E, H)), jnp.bfloat16)
    ff = (lambda s, y, p: window_rows(y, p + s * 8, K)[0])
    ms = chained_timeit(ff, chk_f, (yw, p0))
    print(f"F pallas win (B,72,H)  {ms:8.3f} ms  {B*(K+8)*H*2/ms*1e-6:6.1f} GB/s", flush=True)

    p1 = jnp.asarray(rng.integers(0, E - 128, size=B).astype(np.int32))
    p2 = jnp.asarray(rng.integers(0, E - 128, size=B).astype(np.int32))
    ms = chained_timeit(fg, fg3, (flat, p0, p1, p2))
    print(f"G 3x flat (B,64) 1 jit {ms:8.3f} ms", flush=True)

    S = 4096
    a = jnp.asarray(rng.standard_normal((S, S)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((S, S)), jnp.bfloat16)
    fm = (lambda s, a, b: a @ (b + s.astype(jnp.bfloat16)))
    ms = chained_timeit(fm, chk_f, (a, b), n=10)
    print(f"M matmul 4096^3 bf16   {ms:8.3f} ms  {2*S**3/ms*1e-9:.0f} Tflop/s", flush=True)


if __name__ == "__main__":
    main()
