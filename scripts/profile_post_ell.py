"""Post-ELL step bisect at bench config (k_small=16, ell_tables, dropouts,
BFS reorder): where do the 0.63 s of a 207k-edges/s step go?

Chained-timing protocol (BENCH_NOTES.md round 2): block_until_ready does not
reliably wait for independent dispatches through the axon tunnel, so every
component is timed inside ONE jitted lax.scan whose carry perturbs the next
iteration's input (serial on-chip execution, one dispatch).  The full step
chains naturally through the donated TrainState.

Measures (6 jitted programs):
  1. full train_step (reference point; should reproduce ~0.63 s)
  2. encoder fwd+bwd (3-layer GCN, E~2.6M nnz SpMM x6)
  3. one spmm fwd+bwd (the encoder's unit cost)
  4. one K=16 link chunk fwd+bwd (frames + cn5 predictor, fixed h)
  5. one K=64 link chunk fwd+bwd
  6. frame-group-4 variants of 4/5 if frame_group > 1

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_post_ell.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def chained(f, n=10):
    """Time f(carry_scalar) -> new_carry_scalar inside one jitted scan."""
    import jax
    import jax.numpy as jnp

    def body(s, _):
        return f(s), 0

    run = jax.jit(lambda s0: jax.lax.scan(body, s0, None, length=n)[0])
    s = run(jnp.zeros((), jnp.float32))
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s = run(jnp.zeros((), jnp.float32))
    jax.block_until_ready(s)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from ocn_tpu.config import Config
    from ocn_tpu.data.loaders import synthetic_dataset
    from ocn_tpu.ops.spmm import spmm
    from ocn_tpu.sparse import build as B
    from ocn_tpu.train.loop import Trainer

    batch = int(os.environ.get("P_BATCH", "65536"))
    chunk = int(os.environ.get("P_CHUNK", "4096"))
    cfg = Config(
        dataset="collab", predictor="cn5", model="gcn", mplayers=3,
        hiddim=256, batch_size=batch, testbs=batch, maskinput=True,
        ln=True, res=True, jk=True, use_xlin=True, tailact=True,
        gnndp=0.25, xdp=0.25, tdp=0.05, gnnedp=0.25, predp=0.3, preedp=0.3,
        pad_deg=64, pad_deg2=64, linkbatchsize=chunk, frame_group=4,
        k_small=16, dtype="bfloat16", ell_tables=True,
    )
    scale = float(os.environ.get("P_SCALE", "1.0"))
    ds = synthetic_dataset("collab", seed=0, scale=scale).reorder_bfs()
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)
    if tr._use_ell:
        tr._refresh_ell(np.random.default_rng(1))
    g = tr.g
    key = jax.random.PRNGKey(0)
    c = tr._chunk()
    nchunk = batch // c
    print(f"N={ds.n_nodes} nnz={int(np.asarray(g.indptr)[-1])} chunk={c} "
          f"nchunk(pos)={nchunk} split={tr._split}", flush=True)

    # ---- 1. full step (chains through donated state) -------------------
    rng = np.random.default_rng(0)
    pos = ds.split_edge["train"]["edge"].T
    idx = rng.permutation(pos.shape[1])[:batch]
    neg = B.negative_sampling(ds.edge_index, ds.n_nodes, batch, rng)
    pe, ne, mp, inv_p, inv_n = tr.prepare_batch(pos[:, idx], neg, idx)
    holder = [state]

    def step():
        s, loss = tr.train_step(holder[0], pe, ne, mp, key, inv_p, inv_n)
        holder[0] = s
        return loss

    jax.block_until_ready(step())
    t0 = time.perf_counter()
    n = 8
    for _ in range(n):
        loss = step()
    jax.block_until_ready(loss)
    step_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"full_step                {step_ms:8.1f} ms "
          f"({2 * batch / step_ms * 1e3:.0f} edges/s)", flush=True)
    state = holder[0]

    # ---- 2. encoder fwd+bwd --------------------------------------------
    params = state.params

    def enc(s):
        x = tr.x + s.astype(tr.x.dtype)

        def loss_fn(x):
            h = tr.encoder.apply({"params": params["encoder"]}, x, g, True,
                                 rngs={"dropout": key})
            return jnp.sum(h).astype(jnp.float32)

        dx = jax.grad(loss_fn)(x)
        return dx.ravel()[0].astype(jnp.float32) * 1e-30

    enc_ms = chained(enc)
    print(f"encoder_fwd+bwd          {enc_ms:8.1f} ms", flush=True)

    # ---- 3. one SpMM fwd+bwd -------------------------------------------
    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((ds.n_nodes, cfg.hiddim)),
        tr.dtype)

    def one_spmm(s):
        x = x0 + s.astype(x0.dtype)

        def loss_fn(x):
            # square so dx = 2*A^T(Ax) depends on x — a plain sum's backward
            # scatter is a constant and XLA folds the whole timing away
            y = spmm(g, x)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        dx = jax.grad(loss_fn)(x)
        return dx.ravel()[0].astype(jnp.float32) * 1e-30

    spmm_ms = chained(one_spmm)
    print(f"spmm_fwd+bwd (x1)        {spmm_ms:8.1f} ms "
          f"(encoder has {4 * cfg.mplayers // 2}x fwd + tpos bwd)", flush=True)

    # ---- 4/5. one chunk fwd+bwd at K=16 and K=64, fixed h ---------------
    h0 = jnp.asarray(
        np.random.default_rng(2).standard_normal((ds.n_nodes, cfg.hiddim)),
        tr.dtype)
    ec = pe[:, :c]
    valid = jnp.ones((c,), tr.dtype)
    corr = jnp.ones((c,), tr.dtype)

    def mk_chunk(kk):
        def run(s):
            h = h0 + s.astype(h0.dtype)

            def loss_fn(h):
                out, _ = tr._score_chunk(
                    params, state.ema, state.sched, h, g, ec, valid, key,
                    True, adj2=tr.adj2, corr=corr, k=kk)
                return jnp.sum(out).astype(jnp.float32)

            dh = jax.grad(loss_fn)(h)
            return dh.ravel()[0].astype(jnp.float32) * 1e-30

        return run

    k16_ms = chained(mk_chunk(cfg.k_small))
    print(f"chunk_fwd+bwd K=16       {k16_ms:8.1f} ms", flush=True)
    k64_ms = chained(mk_chunk(cfg.pad_deg))
    print(f"chunk_fwd+bwd K=64       {k64_ms:8.1f} ms", flush=True)

    if tr._split is not None:
        nsp, nsn = tr._split
        nbig = 2 * nchunk - nsp - nsn
        model = (nsp + nsn) * k16_ms + nbig * k64_ms
        print(f"chunk model: {nsp + nsn}x{k16_ms:.1f} + {nbig}x{k64_ms:.1f} "
              f"= {model:.0f} ms; encoder {enc_ms:.0f} ms; "
              f"sum {model + enc_ms:.0f} vs step {step_ms:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
