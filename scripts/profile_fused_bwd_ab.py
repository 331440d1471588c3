"""Fused backward-permutation A/B (VERDICT r3 item 8).

The cn5 chunk backward issues TWO M-descriptor [perm] gathers that share the
same FrameIndex sort:

  * _frame_matmul_multi_prep_bwd: contrib (M, H)[perm] -> segment_sum(n_nodes)
  * entry_col_sum_multi VJP:      cot (M, P)[perm] -> sorted segment_sum
                                  -> [rank_inv] out

Descriptor-rate math (BENCH_NOTES round 2: gathers are ~17-38 ns/descriptor,
payload-size independent) says ONE (M, H+P) gather should cost the same as
the (M, H) gather alone — fusing would save one M-descriptor trip per chunk.
This script measures that in isolation with the chained harness before any
custom-VJP surgery:

  sep   contrib(M,H)[perm] + cot(M,P)[perm], each with its segment sum
  fused concat -> one (M, H+P)[perm] -> split -> same segment sums
  mm_only / cs_only   the two halves alone (the saving bound)

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_fused_bwd_ab.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chained_timeit(f, args, n=20):
    import jax
    import jax.numpy as jnp

    def chk(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        return jax.lax.rem(
            leaf.ravel()[0].astype(jnp.float32).astype(jnp.int32),
            jnp.int32(4))

    # big arrays ride as jit ARGUMENTS, never closure constants (closure
    # constants are serialized into the remote-compile upload — HTTP 413)
    run = jax.jit(lambda s0, *a: jax.lax.scan(
        lambda s, _: (chk(f(s, *a)), 0), s0, None, length=n)[0])
    s = run(jnp.zeros((), jnp.int32), *args)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    jax.block_until_ready(run(jnp.zeros((), jnp.int32), *args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    b, k, h, p = 4096, 64, 256, 2
    n_nodes = 235_868
    m = b * k
    rng = np.random.default_rng(0)
    ids = rng.integers(0, n_nodes, size=(b, k))
    flat = ids.reshape(-1)
    perm_np = np.argsort(flat, kind="stable")
    perm = jnp.asarray(perm_np.astype(np.int32))
    seg = jnp.asarray(flat[perm_np].astype(np.int32))
    rank_np = np.zeros(m, np.int32)
    rank_np[1:] = np.cumsum(flat[perm_np][1:] != flat[perm_np][:-1])
    rank = jnp.asarray(rank_np)
    rank_inv = np.zeros(m, np.int32)
    rank_inv[perm_np] = rank_np
    rank_inv = jnp.asarray(rank_inv)

    contrib = jnp.asarray(rng.standard_normal((m, h)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((m, p)), jnp.float32)

    def mm_half(c):
        cc = c[perm]
        return jax.ops.segment_sum(cc, seg, num_segments=n_nodes,
                                   indices_are_sorted=True)

    def cs_half(g):
        sv = g[perm]
        sums = jax.ops.segment_sum(sv, rank, num_segments=m,
                                   indices_are_sorted=True)
        return sums[rank_inv]

    def sep(s, contrib, cot):
        dx = mm_half(contrib + s.astype(jnp.float32))
        dcs = cs_half(cot)
        return dx.ravel()[0] + dcs.ravel()[0]

    def fused(s, contrib, cot):
        both = jnp.concatenate([contrib + s.astype(jnp.float32), cot], axis=1)
        bp = both[perm]  # ONE M-descriptor gather
        cc, sv = bp[:, :h], bp[:, h:]
        dx = jax.ops.segment_sum(cc, seg, num_segments=n_nodes,
                                 indices_are_sorted=True)
        sums = jax.ops.segment_sum(sv, rank, num_segments=m,
                                   indices_are_sorted=True)
        return dx.ravel()[0] + sums[rank_inv].ravel()[0]

    def mm_only(s, contrib, cot):
        return mm_half(contrib + s.astype(jnp.float32)).ravel()[0]

    def cs_only(s, contrib, cot):
        return cs_half(cot + s.astype(jnp.float32)).ravel()[0]

    for name, f in (("mm_only", mm_only), ("cs_only", cs_only),
                    ("sep", sep), ("fused", fused)):
        ms = chained_timeit(f, (contrib, cot))
        print(f"{name:8s} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
