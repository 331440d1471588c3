"""Does block_until_ready actually block through the axon tunnel?

matmul 8192^3 bf16 is ~1.1 Tflop => ~5.5 ms at v5e peak; anything far below
means the harness isn't waiting.  Three protocols:
  P1 independent calls + block_until_ready(last)     [bench_* harnesses]
  P2 independent calls + device_get(last[0, :8])     [forces a fetch]
  P3 chained calls (out feeds next input) + block    [data-dependency serial]

Run solo: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_timing_probe.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    S = 8192
    a = jnp.asarray(rng.standard_normal((S, S)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((S, S)), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    n = 10

    out = mm(a, b)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(n):
        out = mm(a, b)
    jax.block_until_ready(out)
    t1 = (time.perf_counter() - t0) / n * 1e3
    print(f"P1 block_until_ready : {t1:8.3f} ms/call", flush=True)

    t0 = time.perf_counter()
    for _ in range(n):
        out = mm(a, b)
    np.asarray(jax.device_get(out[0, :8]))
    t2 = (time.perf_counter() - t0) / n * 1e3
    print(f"P2 device_get slice  : {t2:8.3f} ms/call", flush=True)

    t0 = time.perf_counter()
    out = a
    for _ in range(n):
        out = mm(out, b)
    jax.block_until_ready(out)
    t3 = (time.perf_counter() - t0) / n * 1e3
    print(f"P3 chained + block   : {t3:8.3f} ms/call "
          f"({2*S**3/t3*1e-9:.0f} Tflop/s)", flush=True)

    t0 = time.perf_counter()
    out = a
    for _ in range(n):
        out = mm(out, b)
    np.asarray(jax.device_get(out[0, :8]))
    t4 = (time.perf_counter() - t0) / n * 1e3
    print(f"P4 chained + fetch   : {t4:8.3f} ms/call "
          f"({2*S**3/t4*1e-9:.0f} Tflop/s)", flush=True)


if __name__ == "__main__":
    main()
