"""One-hot MXU SpMM experiment (VERDICT r2 item 3) — settle whether the
encoder SpMM's ~17 ns/descriptor gather floor can be beaten by turning row
gathers into MXU contractions against one-hot blocks.

The idea (BENCH_NOTES r1 gather shootout; "block-streaming" note): process
edges in CSC order, where consecutive edges read consecutive source columns.
Chunk the edge list so each chunk of C edges reads from a window of at most S
consecutive rows of x; then

    msgs_chunk = OH @ x[base : base + S]        # (C, S) @ (S, H) on the MXU

with OH[c, s] = val_c * [local_col_c == s] built by an iota compare (pure VPU
elementwise, no gathers; the adjacency values ride inside OH for free).  The
x window is ONE dynamic-slice descriptor per chunk instead of C row
descriptors.  FLOPs = 2*E*S*H ≈ 350 GFLOP at collab scale with S=512 — ~3 ms
at the measured 126 Tflop/s bf16, vs ~22 ms for the E-descriptor gather.

The open question this script answers with numbers: the one-hot gather emits
messages in CSC order, but the output accumulation needs row (CSR) order.
The two routes back — an unsorted segment_sum (TPU scatter) or the static
CSC->CSR permutation (an E-descriptor gather again) — are each measured
against what they replace.  Reference counterpart: torch_sparse spmm_add
(reference model.py:45-49), the encoder hot loop.

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_onehot_spmm.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def chained_timeit(build_fn, n=10):
    """Time build_fn(s) -> int32 checksum via one jitted lax.scan chain
    (independent dispatches do not reliably block through the axon tunnel)."""
    import jax
    import jax.numpy as jnp

    run = jax.jit(lambda s0: jax.lax.scan(
        lambda s, _: (build_fn(s), 0), s0, None, length=n)[0])
    s = run(jnp.zeros((), jnp.int32))
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    jax.block_until_ready(run(jnp.zeros((), jnp.int32)))
    return (time.perf_counter() - t0) / n * 1e3


def greedy_chunks(cols_csc: np.ndarray, c_max: int, s_max: int):
    """Segment the CSC edge list greedily: cut when a chunk reaches c_max
    edges or its column span reaches s_max.  Returns (bases, counts)."""
    e = len(cols_csc)
    bases, counts = [], []
    i = 0
    while i < e:
        base = cols_csc[i]
        # edges j in [i, i+c_max) with col < base + s_max
        hi = min(i + c_max, e)
        j = np.searchsorted(cols_csc[i:hi], base + s_max, side="left") + i
        bases.append(base)
        counts.append(j - i)
        i = j
    return np.asarray(bases, np.int32), np.asarray(counts, np.int32)


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("OCN_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["OCN_BENCH_PLATFORM"])

    from ocn_tpu.data.loaders import synthetic_dataset
    from ocn_tpu.sparse.csr import Graph  # noqa: F401  (dataset dep)

    H = 256
    scale = float(os.environ.get("OCN_BENCH_SCALE", "1.0"))
    ds = synthetic_dataset("collab", seed=0, scale=scale).reorder_bfs()
    g = ds.as_graph()
    ip = np.asarray(g.indptr)
    e = int(ip[-1])
    col = np.asarray(g.col)[:e]
    row = np.asarray(g.row)[:e]
    val = np.asarray(g.val)[:e]
    n = g.n_nodes
    print(f"graph: N={n} E={e} avg_deg={e/n:.1f}", flush=True)

    # CSC order (sort by col, then row)
    order = np.lexsort((row, col))
    cols_csc = col[order]
    rows_csc = row[order]
    vals_csc = val[order]
    inv = np.empty(e, np.int64)
    inv[order] = np.arange(e)  # msgs_csr[p] = msgs_csc[inv[p]]
    perm_csc2csr = inv

    # span stats for plain fixed-C chunks
    for c in (256, 512, 1024):
        nch = -(-e // c)
        pad = nch * c - e
        cs = np.pad(cols_csc, (0, pad), constant_values=n - 1).reshape(nch, c)
        spans = cs[:, -1] - cs[:, 0] + 1
        print(f"fixed C={c}: nchunk={nch} span mean={spans.mean():.0f} "
              f"p99={np.percentile(spans, 99):.0f} max={spans.max()}",
              flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, H)), jnp.bfloat16)
    colj = jnp.asarray(col.astype(np.int32))
    rowj = jnp.asarray(row.astype(np.int32))
    valj = jnp.asarray(val)

    results = {}

    # (1) baseline flat row gather x[col] (CSR order) — the descriptor floor
    def f_gather(s):
        rows_ = x[jnp.minimum(colj + s, n - 1)]
        return rows_.ravel()[0].astype(jnp.float32).astype(jnp.int32) % 4

    results["gather_flat(E rows)"] = chained_timeit(f_gather)
    print("gather_flat:", results["gather_flat(E rows)"], "ms", flush=True)

    # (3) current forward: gather + sorted segment-sum
    def f_current(s):
        msg = valj[:, None] * x[jnp.minimum(colj + s, n - 1)]
        out = jax.ops.segment_sum(
            msg, rowj, num_segments=n, indices_are_sorted=True)
        return out.ravel()[0].astype(jnp.float32).astype(jnp.int32) % 4

    results["fwd_current"] = chained_timeit(f_current)
    print("fwd_current:", results["fwd_current"], "ms", flush=True)

    # one-hot configs: (C, S) pairs
    for c_max, s_max in ((512, 512), (1024, 1024)):
        bases, counts = greedy_chunks(cols_csc, c_max, s_max)
        nch = len(bases)
        padded = nch * c_max
        fill = e / padded
        # build padded per-chunk arrays: locals in [0, s_max), val 0 on pads
        loc = np.zeros((nch, c_max), np.int32)
        vv = np.zeros((nch, c_max), np.float32)
        rr = np.full((nch, c_max), n - 1, np.int32)
        pos = np.zeros((nch, c_max), np.int32)  # CSC position of each lane
        i = 0
        for k in range(nch):
            cnt = counts[k]
            loc[k, :cnt] = cols_csc[i:i + cnt] - bases[k]
            vv[k, :cnt] = vals_csc[i:i + cnt]
            rr[k, :cnt] = rows_csc[i:i + cnt]
            pos[k, :cnt] = np.arange(i, i + cnt)
            i += cnt
        print(f"greedy C={c_max} S={s_max}: nchunk={nch} fill={fill:.2f} "
              f"flops={2 * padded * s_max * H / 1e9:.0f} GFLOP", flush=True)

        basesj = jnp.asarray(bases)
        locj = jnp.asarray(loc)
        vvj = jnp.asarray(vv, jnp.bfloat16)
        xpad = jnp.concatenate(
            [x, jnp.zeros((s_max, H), x.dtype)], axis=0)
        iota_s = jnp.arange(s_max, dtype=jnp.int32)

        grp = max(1, (1 << 25) // (c_max * s_max * 2))  # ~32 MB live one-hot
        ngrp = -(-nch // grp)
        gpad = ngrp * grp - nch
        basesg = jnp.asarray(np.pad(bases, (0, gpad),
                                    constant_values=n)).reshape(ngrp, grp)
        locg = jnp.asarray(np.pad(loc, ((0, gpad), (0, 0)))).reshape(
            ngrp, grp, c_max)
        vvg = jnp.asarray(np.pad(vv, ((0, gpad), (0, 0))),
                          jnp.bfloat16).reshape(ngrp, grp, c_max)

        # (2) one-hot CSC gather -> msgs (nch, C, H), scanned in groups
        def onehot_msgs(s):
            def body(carry, inp):
                bs, lo, vw = inp  # (grp,), (grp,C), (grp,C)
                sl = jax.vmap(
                    lambda b: jax.lax.dynamic_slice(
                        xpad, (b + s, 0), (s_max, H)))(bs)  # (grp,S,H)
                oh = jnp.where(
                    lo[:, :, None] == iota_s[None, None, :], vw[:, :, None],
                    jnp.bfloat16(0))  # (grp, C, S)
                m = jnp.einsum("gcs,gsh->gch", oh, sl,
                               preferred_element_type=jnp.float32)
                return carry + m.astype(jnp.float32).sum(), m.astype(jnp.bfloat16)

            tot, msgs = jax.lax.scan(body, jnp.float32(0), (basesg, locg, vvg))
            return msgs.reshape(ngrp * grp * c_max, H), tot

        def f_onehot_gather(s):
            _, tot = onehot_msgs(s)
            return tot.astype(jnp.int32) % 4

        key = f"onehot_gather C={c_max} S={s_max}"
        results[key] = chained_timeit(f_onehot_gather)
        print(key, ":", results[key], "ms", flush=True)

        # (4) one-hot gather + unsorted segment-sum (scatter-add)
        rrj_flat = jnp.asarray(
            np.pad(rr, ((0, gpad), (0, 0)),
                   constant_values=n - 1).reshape(-1))

        def f_onehot_scatter(s):
            msgs, _ = onehot_msgs(s)
            out = jax.ops.segment_sum(msgs, rrj_flat, num_segments=n)
            return out.ravel()[0].astype(jnp.float32).astype(jnp.int32) % 4

        key = f"fwd_onehot+scatter C={c_max}"
        results[key] = chained_timeit(f_onehot_scatter)
        print(key, ":", results[key], "ms", flush=True)

        # (5) one-hot gather + static CSC->CSR permutation + sorted segsum
        # flat position of CSR entry p inside the padded msgs array
        flatpos = np.zeros(e, np.int64)
        i = 0
        for k in range(nch):
            cnt = counts[k]
            flatpos[i:i + cnt] = k * c_max + np.arange(cnt)
            i += cnt
        perm_j = jnp.asarray(flatpos[perm_csc2csr].astype(np.int32))

        def f_onehot_perm(s):
            msgs, _ = onehot_msgs(s)
            msgs_csr = msgs[perm_j]
            out = jax.ops.segment_sum(
                msgs_csr, rowj, num_segments=n, indices_are_sorted=True)
            return out.ravel()[0].astype(jnp.float32).astype(jnp.int32) % 4

        key = f"fwd_onehot+perm C={c_max}"
        results[key] = chained_timeit(f_onehot_perm)
        print(key, ":", results[key], "ms", flush=True)

        # correctness: one-hot+scatter output vs the current formulation
        # (both at s=0), bf16 message rounding tolerated
        def ref_out():
            msg = valj[:, None] * x[colj]
            return jax.ops.segment_sum(
                msg, rowj, num_segments=n, indices_are_sorted=True)

        def oh_out():
            msgs, _ = jax.jit(onehot_msgs)(jnp.int32(0))
            return jax.ops.segment_sum(msgs, rrj_flat, num_segments=n)

        a = np.asarray(jax.jit(ref_out)(), np.float32)
        b_ = np.asarray(oh_out(), np.float32)
        err = np.max(np.abs(a - b_)) / max(1e-6, np.max(np.abs(a)))
        print(f"  correctness C={c_max}: max rel err {err:.2e}", flush=True)

    print("\nsummary (ms):")
    for k, v in results.items():
        print(f"  {k:34s} {v:8.2f}")


if __name__ == "__main__":
    main()
