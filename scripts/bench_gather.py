"""Row-gather strategy shootout (THE bottleneck: BENCH_NOTES.md records XLA
row gathers at ~30 GB/s vs ~800 GB/s HBM roofline; every hot loop — encoder
SpMM x[col], frame matmul x[ids] — is this gather).

Variants measured on chip, all at (M rows gathered, N table rows, H feat):
  xla        x[idx] baseline (what frame_matmul/spmm do today)
  xla_sorted same but idx pre-sorted on host (locality for free?)
  pallas     per-row DMA pipeline, D outstanding copies (scalar-driven)
  pallas_blk sorted idx + block-resident VMEM one-hot MXU gather

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_gather.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def timeit(fn, *args, n=20):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, N, H = 262144, 235868, 256
    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, N, size=(M,), dtype=np.int32)
    x = jnp.asarray(rng.standard_normal((N, H)), jnp.bfloat16)
    idx = jnp.asarray(idx_np)
    idx_sorted = jnp.asarray(np.sort(idx_np))
    gb = M * H * 2 / 1e9  # bytes gathered

    # reduce to a scalar so tunnel I/O doesn't pollute timing
    @jax.jit
    def g_xla(ix):
        return jnp.sum(x[ix].astype(jnp.float32))

    t = timeit(g_xla, idx)
    print(f"xla        {t:7.2f} ms  {gb / (t / 1e3):6.1f} GB/s", flush=True)
    t = timeit(g_xla, idx_sorted)
    print(f"xla_sorted {t:7.2f} ms  {gb / (t / 1e3):6.1f} GB/s", flush=True)

    # ---- pallas per-row DMA pipeline (flat 1-D view: row slices of a tiled
    # (N, H) bf16 HBM buffer must be 8-sublane aligned, so DMA H-length runs
    # of the flattened array instead) -------------------------------------
    T = 2048          # rows per grid step
    D = 16            # outstanding DMAs
    x_flat = x.reshape(-1)

    def kern(idx_ref, x_hbm, out_ref, sem):
        def start(t):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(idx_ref[t] * H, H)],
                out_ref.at[pl.ds(t * H, H)],
                sem.at[t % D],
            )

        def body(t, _):
            @pl.when(t >= D)
            def _():
                start(t - D).wait()
            start(t).start()
            return 0

        jax.lax.fori_loop(0, T, body, 0)

        def drain(t, _):
            start(t).wait()
            return 0

        jax.lax.fori_loop(T - D, T, drain, 0)

    gather_p = pl.pallas_call(
        kern,
        grid=(M // T,),
        in_specs=[
            pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((T * H,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M * H,), x.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((D,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    @jax.jit
    def g_pallas(ix):
        return jnp.sum(gather_p(ix, x_flat).astype(jnp.float32))

    try:
        t = timeit(g_pallas, idx)
        print(f"pallas     {t:7.2f} ms  {gb / (t / 1e3):6.1f} GB/s", flush=True)
        t = timeit(g_pallas, idx_sorted)
        print(f"pallas_srt {t:7.2f} ms  {gb / (t / 1e3):6.1f} GB/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pallas     FAILED: {type(e).__name__}: {e}", flush=True)

    # ---- window-DMA kernel: gather B contiguous (J, H) windows -----------
    # This is the REAL frame-gather shape: candidate rows per edge are a
    # contiguous CSR window of y = h[g.col].  One 36 KB DMA per window
    # (4096 DMAs/chunk) instead of 262k random row reads.
    E2, B2, K2 = 1320618, 4096, 64
    J = K2 + 8  # 8-aligned start slack
    yt = jnp.asarray(rng.standard_normal((E2, H)), jnp.bfloat16)
    pos0_np = rng.integers(0, E2 - K2, size=(B2,), dtype=np.int32)
    p0_np = np.minimum((pos0_np // 8) * 8, E2 - J).astype(np.int32)
    TW, DW = 128, 8

    def kernw(p0_ref, y_hbm, out_ref, sem):
        base_t = pl.program_id(0) * TW

        def start(t):
            p0 = pl.multiple_of(p0_ref[base_t + t], 8)
            return pltpu.make_async_copy(
                y_hbm.at[pl.ds(p0, J), :],
                out_ref.at[pl.ds(t * J, J), :],
                sem.at[t % DW],
            )

        def body(t, _):
            @pl.when(t >= DW)
            def _():
                start(t - DW).wait()
            start(t).start()
            return 0

        jax.lax.fori_loop(0, TW, body, 0)

        def drain(t, _):
            start(t).wait()
            return 0

        jax.lax.fori_loop(TW - DW, TW, drain, 0)

    gather_w = pl.pallas_call(
        kernw,
        grid=(B2 // TW,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (B2,) starts
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TW * J, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B2 * J, H), yt.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((DW,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    @jax.jit
    def g_window_pallas(p0, ytab):
        return jnp.sum(gather_w(p0, ytab).astype(jnp.float32))

    @jax.jit
    def g_window_xla(pos0, ytab):
        pos = pos0[:, None] + jax.lax.broadcasted_iota(jnp.int32, (B2, K2), 1)
        return jnp.sum(ytab[pos].astype(jnp.float32))

    gbw = B2 * K2 * H * 2 / 1e9
    t = timeit(g_window_xla, jnp.asarray(pos0_np), yt)
    print(f"window_xla {t:7.2f} ms  {gbw / (t / 1e3):6.1f} GB/s", flush=True)
    try:
        t = timeit(g_window_pallas, jnp.asarray(p0_np), yt)
        gbj = B2 * J * H * 2 / 1e9
        print(f"window_dma {t:7.2f} ms  {gbj / (t / 1e3):6.1f} GB/s "
              f"({4096} DMAs x {J*H*2//1024} KB)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"window_dma FAILED: {type(e).__name__}: {e}", flush=True)

    # ---- sorted one-hot MXU gather ----------------------------------------
    # sorted idx tile of TS rows spans a narrow id range; stream the x block
    # covering that range and select rows with a one-hot matmul on the MXU.
    # Block width W must cover the worst tile span: with uniform random ids,
    # span(TS=512 of M=262k sorted draws over N=235k) ~ 512*(N/M) * safety.
    TS, W = 512, 2304  # W covers worst tile span + 16-row base alignment

    def kern2(base_ref, idx_ref, x_hbm, out_ref, xb, sem):
        base = pl.multiple_of(base_ref[pl.program_id(0)], 16)
        copy = pltpu.make_async_copy(x_hbm.at[pl.ds(base, W)], xb, sem)
        copy.start()
        lane = jax.lax.broadcasted_iota(jnp.int32, (TS, W), 1)
        ids = idx_ref[:]  # (TS, 1) VMEM
        copy.wait()
        onehot = (lane + base == ids).astype(jnp.bfloat16)
        out_ref[:] = jnp.dot(
            onehot, xb[:], preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)

    # idx as (TS, 1) VMEM int32 blocks; base per tile in SMEM
    def mk_blk():
        return pl.pallas_call(
            kern2,
            grid=(M // TS,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # full (ntiles,) bases
                pl.BlockSpec((TS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((TS, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, H), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((W, H), x.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )

    base_np = np.minimum(
        (np.sort(idx_np)[::TS].astype(np.int32) // 16) * 16, N - W
    )  # per-tile block base, 16-row aligned for the HBM slice
    span = (np.sort(idx_np).reshape(-1, TS)[:, -1] - base_np).max()
    print(f"onehot tile span max {span} (W={W})", flush=True)
    if span < W:
        ids2 = jnp.asarray(np.sort(idx_np).reshape(-1, TS, 1).reshape(M, 1))
        bases = jnp.asarray(base_np)
        blk = mk_blk()

        @jax.jit
        def g_blk(bs, ix):
            return jnp.sum(blk(bs, ix, x).astype(jnp.float32))

        try:
            t = timeit(g_blk, bases, ids2)
            print(f"onehot_mxu {t:7.2f} ms  {gb / (t / 1e3):6.1f} GB/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"onehot_mxu FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
