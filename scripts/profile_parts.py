"""Micro-profiles of the predictor building blocks (scalar outputs only, so
tunnel I/O doesn't pollute timings).  Run on TPU: PYTHONPATH incl .axon_site.
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

    from ocn_tpu.ops.frame import CNFrame
    from ocn_tpu.ops import ortho

    B, K, H, N = 4096, 64, 256, 58967
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, N, size=(B, K)), jnp.int32)
    val = jnp.asarray((rng.random((B, K)) > 0.5).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((N, H)), jnp.bfloat16)
    cn = CNFrame(ids, val, N)
    cn2 = CNFrame(ids, jnp.asarray((rng.random((B, K)) > 0.5).astype(np.float32)), N)

    f_colsum = jax.jit(lambda v: jnp.sum(CNFrame(ids, v, N).col_sum()))
    print(f"colsum_fwd {timeit(lambda: f_colsum(val)):.2f} ms", flush=True)

    f_colsum_g = jax.jit(jax.grad(lambda v: jnp.sum(CNFrame(ids, v, N).col_sum() ** 2)))
    print(f"colsum_fwd+bwd {timeit(lambda: jnp.sum(f_colsum_g(val))):.2f} ms", flush=True)

    f_mm = jax.jit(lambda v, xx: jnp.sum(CNFrame(ids, v, N).matmul(xx)))
    print(f"matmul_fwd {timeit(lambda: f_mm(val, x)):.2f} ms", flush=True)

    f_mm_g = jax.jit(jax.grad(lambda xx, v: jnp.sum(CNFrame(ids, v, N).matmul(xx)).astype(jnp.float32)))
    print(f"matmul_bwd_dx {timeit(lambda: jnp.sum(f_mm_g(x, val))):.2f} ms", flush=True)

    f_ortho = jax.jit(lambda v1, v2: sum(
        jnp.sum(o.val) for o in ortho.orthogonalize(
            CNFrame(ids, v1, N), CNFrame(ids, v2, N),
            jnp.zeros(()), jnp.zeros((), jnp.int32), True)[:2]))
    print(f"ortho_fwd {timeit(lambda: f_ortho(val, cn2.val)):.2f} ms", flush=True)

    def score_like(xx, v1, v2):
        c1, c2 = CNFrame(ids, v1, N), CNFrame(ids, v2, N)
        n1, o2, _, _ = ortho.orthogonalize(c1, c2, jnp.zeros(()), jnp.zeros((), jnp.int32), True)
        return jnp.sum(n1.matmul(xx) + o2.matmul(xx)).astype(jnp.float32)

    f_full = jax.jit(jax.grad(score_like))
    print(f"ortho+2matmul_fwd+bwd {timeit(lambda: jnp.sum(f_full(x, val, cn2.val))):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
