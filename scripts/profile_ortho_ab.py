"""Orthogonalize sorted-domain gather A/B (VERDICT r2 item 4).

The post-ELL intra-chunk bisect (profile_chunk_post_ell.py) put
`orthogonalize f+b` at 29.75 of 38.1 ms per K=64 chunk — all of it in the
sorted-domain element-gather round trips of entry_col_sum_multi (+ its
self-adjoint VJP): [perm] in, segment-sum, [rank] broadcast, [inv_perm] out,
each an M = B*K-descriptor gather at the ~17-38 ns/descriptor floor
(BENCH_NOTES round 2).  This script A/Bs the candidate reductions in
isolation with the chained harness:

  fidx_cur    frame_index as shipped (argsort + flat[perm] + scatter inv)
  fidx_skv    lax.sort_key_val fuses sort+perm (drops the flat[perm] gather)
  fidx_skv2   + inverse perm via a SECOND sort instead of the M-scatter
  cs_cur      entry_col_sum_multi fwd as shipped: (P,M) axis-1 gather
              [:, perm] (suspect: may issue P descriptors per index)
  cs_rm       row-major variant: transpose to (M,P) FIRST (vectorized copy),
              then every trip is an (M,)-descriptor ROW gather of P-wide rows
  ortho_cur / ortho_rm   orthogonalize forward+backward composed, both ways

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_ortho_ab.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chained_timeit(f, args, n=20, chk=None):
    import jax
    import jax.numpy as jnp

    if chk is None:
        def chk(o):
            leaf = jax.tree_util.tree_leaves(o)[0]
            return jax.lax.rem(
                leaf.ravel()[0].astype(jnp.float32).astype(jnp.int32),
                jnp.int32(4))

    def body(s, _):
        return chk(f(s, *args)), 0

    run = jax.jit(lambda s0: jax.lax.scan(body, s0, None, length=n)[0])
    s = run(jnp.zeros((), jnp.int32))
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    jax.block_until_ready(run(jnp.zeros((), jnp.int32)))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from ocn_tpu.ops.frame import CNFrame, frame_index
    from ocn_tpu.ops import ortho as O

    B, K, P = 4096, 64, 3
    N = 235_868
    M = B * K
    rng = np.random.default_rng(0)
    # power-law-ish candidate ids with realistic duplication + sentinel lanes
    base = (N * (rng.random((B, K)) ** 2)).astype(np.int64)
    mask = rng.random((B, K)) < 0.3  # ~29% occupancy (pos-src rows)
    ids_np = np.where(mask, base, N).astype(np.int32)
    ids_np.sort(axis=1)
    ids = jnp.asarray(ids_np)
    vals = jnp.asarray(
        np.where(ids_np < N, rng.random((P, B, K)), 0.0), jnp.float32)
    flat0 = ids.reshape(-1)
    iota = jnp.arange(M, dtype=jnp.int32)

    # ---- frame_index variants --------------------------------------------
    def fidx_cur(s):
        return frame_index(
            jnp.where(ids == s, ids, ids), N).perm  # s-dep for chaining

    def fidx_skv(s, two_sort=False):
        flat = flat0 + (s - s)  # chain
        sorted_ids, perm = jax.lax.sort_key_val(flat, iota)
        if two_sort:
            _, inv_perm = jax.lax.sort_key_val(perm, iota)
        else:
            inv_perm = jnp.zeros((M,), jnp.int32).at[perm].set(iota)
        is_start = jnp.concatenate(
            [jnp.ones((1,), jnp.int32),
             (sorted_ids[1:] != sorted_ids[:-1]).astype(jnp.int32)])
        rank = jnp.cumsum(is_start) - 1
        return perm, inv_perm, rank

    print(f"shapes: B={B} K={K} M={M} P={P}")
    t = chained_timeit(lambda s: fidx_cur(s), (), n=20)
    print(f"fidx_cur   : {t:7.2f} ms")
    t = chained_timeit(lambda s: fidx_skv(s, False), (), n=20)
    print(f"fidx_skv   : {t:7.2f} ms (sort_key_val + scatter inv)")
    t = chained_timeit(lambda s: fidx_skv(s, True), (), n=20)
    print(f"fidx_skv2  : {t:7.2f} ms (sort_key_val + second-sort inv)")

    fidx = frame_index(ids, N)
    perm, rank, inv_perm = fidx.perm, fidx.rank, fidx.inv_perm

    # ---- entry_col_sum_multi fwd variants --------------------------------
    def cs_cur(s):
        v = vals + s.astype(jnp.float32) * 0
        sv = v.reshape(P, -1)[:, perm].T  # (M, P) via axis-1 gather
        sums = jax.ops.segment_sum(
            sv, rank, num_segments=M, indices_are_sorted=True)
        return sums[rank][inv_perm].T.reshape(vals.shape)

    def cs_rm(s):
        v = vals + s.astype(jnp.float32) * 0
        vt = v.reshape(P, -1).T  # (M, P) transpose copy — no gather
        sv = vt[perm]            # (M,)-descriptor ROW gather
        sums = jax.ops.segment_sum(
            sv, rank, num_segments=M, indices_are_sorted=True)
        return sums[rank][inv_perm].T.reshape(vals.shape)

    def cs_2trip(s):
        # round-3 shipped formulation: sums[rank_inv] — one gather out
        v = vals + s.astype(jnp.float32) * 0
        sv = v.reshape(P, -1)[:, perm].T
        sums = jax.ops.segment_sum(
            sv, rank, num_segments=M, indices_are_sorted=True)
        return sums[fidx.rank_inv].T.reshape(vals.shape)

    a = np.asarray(cs_cur(jnp.zeros((), jnp.int32)))
    b = np.asarray(cs_rm(jnp.zeros((), jnp.int32)))
    c = np.asarray(cs_2trip(jnp.zeros((), jnp.int32)))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    np.testing.assert_allclose(a, c, rtol=1e-6)
    t = chained_timeit(cs_cur, (), n=20)
    print(f"cs_cur     : {t:7.2f} ms (3-trip: [perm], [rank], [inv_perm])")
    t = chained_timeit(cs_rm, (), n=20)
    print(f"cs_rm      : {t:7.2f} ms ((M,P) transpose-first row gathers)")
    t = chained_timeit(cs_2trip, (), n=20)
    print(f"cs_2trip   : {t:7.2f} ms (2-trip: [perm], [rank_inv] — shipped)")

    # ---- composed orthogonalize f+b --------------------------------------
    cn1 = CNFrame(ids, vals[0], N)
    cn2 = CNFrame(ids, vals[1], N)
    ema0 = jnp.zeros(())
    n0 = jnp.zeros((), jnp.int32)

    def ortho_fb(s, rm):
        os.environ["OCN_TPU_COLSUM_RM"] = "1" if rm else "0"

        def loss(v1, v2):
            ncn1, ocn2, new_ema, _ = O.orthogonalize(
                CNFrame(ids, v1, N), CNFrame(ids, v2, N), ema0, n0, True,
                0.0, fidx)
            return jnp.sum(ncn1.val * 1.5 + ocn2.val) + new_ema

        g1, g2 = jax.grad(loss, argnums=(0, 1))(
            vals[0] + s.astype(jnp.float32) * 0, vals[1])
        return g1

    # (the rm flag only matters if ops/frame.py reads OCN_TPU_COLSUM_RM;
    # until adopted, both calls measure the current implementation)
    t = chained_timeit(lambda s: ortho_fb(s, False), (), n=20)
    print(f"ortho_cur  : {t:7.2f} ms (orthogonalize fwd+bwd, fidx path)")


if __name__ == "__main__":
    main()
