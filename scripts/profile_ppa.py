"""ppa FAITHFUL-preset-shape step bisect (round 5, VERDICT r4 item 3).

The r3 bisect behind "encoder-SpMM descriptor-floor-bound at degree 100" was
scale-0.5; this one runs the full N=576k faithful preset shape (README.md:47
of the reference: hiddim 64 / 1 layer / ho stack / linkbatch 512 /
batch 16384, adj2_cap 1024 memory plan) and decomposes the step:

  full_step    train_step wall (the 11.1k edges/s row's program)
  encoder      GCN fwd+bwd (1-layer ho stack, E~57.6M SpMM)
  spmm         one SpMM fwd+bwd (unit cost)
  chunk16/64   one link chunk fwd+bwd at each dual-K width, fixed h
  host_prep    prepare_batch wall (the host staging a double-buffer would
               overlap with device compute)

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_ppa.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def chained(f, n=10, args=()):
    """Time f(carry, *args) inside one jitted scan.  ``args`` ride as jit
    ARGUMENTS so the serialized HLO stays free of the N=576k graph payload
    (closure constants blow the remote-compile HTTP 413 limit — CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    run = jax.jit(lambda s0, *a: jax.lax.scan(
        lambda s, _: (f(s, *a), 0), s0, None, length=n)[0])
    s = run(jnp.zeros((), jnp.float32), *args)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s = run(jnp.zeros((), jnp.float32), *args)
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

    batch = int(os.environ.get("P_BATCH", "16384"))
    chunk = int(os.environ.get("P_CHUNK", "512"))
    scale = float(os.environ.get("P_SCALE", "1.0"))
    maskinput = os.environ.get("P_MASKINPUT", "1") == "1"
    cfg = Config(
        dataset="ppa", predictor="cn5", model="gcn", mplayers=1,
        hiddim=64, batch_size=batch, testbs=batch, maskinput=maskinput,
        encoder_stack="ho", cn2_counts=True, ln=False, res=False, jk=False,
        gnndp=0.1, xdp=0.1, tdp=0.1, gnnedp=0.1, predp=0.1, preedp=0.0,
        pad_deg=64, pad_deg2=64, linkbatchsize=chunk, k_small=16,
        adj2_cap=1024, dtype="bfloat16", ell_tables=True,
    )
    t0 = time.perf_counter()
    ds = synthetic_dataset("ppa", seed=0, scale=scale).reorder_bfs()
    print(f"dataset build {time.perf_counter()-t0:.0f} s", flush=True)
    t0 = time.perf_counter()
    tr = Trainer(cfg, ds)
    print(f"Trainer build (A^2 SpGEMM) {time.perf_counter()-t0:.0f} s",
          flush=True)
    state = tr.init_state(0)
    if tr._use_ell:
        tr._refresh_ell(np.random.default_rng(1))
        g = tr.g.with_ell(tr._ell["tbl1"], tr._ell["off1"])
        tr.adj2 = tr.adj2.with_ell(tr._ell["tbl2"], tr._ell["off2"])
    else:
        g = tr.g
    key = jax.random.PRNGKey(0)
    c = tr._chunk()
    print(f"N={ds.n_nodes} nnz={int(np.asarray(g.indptr)[-1])} chunk={c} "
          f"nchunk(pos)={batch//c} split={tr._split}", flush=True)

    rng = np.random.default_rng(0)
    pos = ds.split_edge["train"]["edge"].T
    idx = rng.permutation(pos.shape[1])[:batch]
    neg = B.negative_sampling(ds.edge_index, ds.n_nodes, batch, rng)

    t0 = time.perf_counter()
    pe, ne, mp, inv_p, inv_n = tr.prepare_batch(pos[:, idx], neg, idx)
    jax.block_until_ready(pe)
    host_ms = (time.perf_counter() - t0) * 1e3
    print(f"host_prep (prepare_batch)  {host_ms:8.1f} ms", flush=True)

    holder = [state]

    def step():
        s, loss = tr.train_step(holder[0], pe, ne, mp, key, inv_p, inv_n)
        holder[0] = s
        return loss

    jax.device_get(step())
    t0 = time.perf_counter()
    n = 6
    for _ in range(n):
        loss = step()
    jax.device_get(loss)
    step_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"full_step                {step_ms:8.1f} ms "
          f"({2 * batch / step_ms * 1e3:.0f} edges/s)", flush=True)
    state = holder[0]
    params = state.params

    def enc(s, penc, gg, xx):
        # ppa features are int32 (embedding path): differentiate the
        # encoder PARAMS, scaling the loss by the carry to chain iterations
        def loss_fn(p):
            h = tr.encoder.apply({"params": p}, xx, gg, True,
                                 rngs={"dropout": key})
            return jnp.sum(h.astype(jnp.float32)) * (1.0 + s * 1e-30)

        gr = jax.grad(loss_fn)(penc)
        leaf = jax.tree_util.tree_leaves(gr)[0]
        return leaf.ravel()[0].astype(jnp.float32) * 1e-30

    print(f"encoder_fwd+bwd          "
          f"{chained(enc, 6, (params['encoder'], g, tr.x)):8.1f} ms",
          flush=True)

    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((ds.n_nodes, cfg.hiddim)),
        tr.dtype)

    def one_spmm(s, xx, gg):
        x = xx + s.astype(xx.dtype)

        def loss_fn(x):
            y = spmm(gg, x)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        dx = jax.grad(loss_fn)(x)
        return dx.ravel()[0].astype(jnp.float32) * 1e-30

    print(f"spmm_fwd+bwd (x1)        "
          f"{chained(one_spmm, 6, (x0, g)):8.1f} ms", flush=True)

    h0 = jnp.asarray(
        np.random.default_rng(2).standard_normal((ds.n_nodes, cfg.hiddim)),
        tr.dtype)
    ec = pe[:, :c]
    valid = jnp.ones((c,), tr.dtype)
    corr = jnp.ones((c,), tr.dtype)

    def mk_chunk(kk):
        def run(s, hh, gg, a2, pp):
            h = hh + s.astype(hh.dtype)

            def loss_fn(h):
                out, _ = tr._score_chunk(
                    pp, state.ema, state.sched, h, gg, ec, valid, key,
                    True, adj2=a2, corr=corr, k=kk)
                return jnp.sum(out).astype(jnp.float32)

            dh = jax.grad(loss_fn)(h)
            return dh.ravel()[0].astype(jnp.float32) * 1e-30

        return run

    cargs = (h0, g, tr.adj2, params)
    k16 = chained(mk_chunk(cfg.k_small), args=cargs)
    k64 = chained(mk_chunk(cfg.pad_deg), args=cargs)
    nsp, nsn = tr._split if tr._split is not None else (0, 0)
    nchunk = batch // c
    small = nsp + nsn
    big = 2 * nchunk - small
    print(f"chunk_fwd+bwd K=16       {k16:8.1f} ms  (x{small} small chunks)",
          flush=True)
    print(f"chunk_fwd+bwd K=64       {k64:8.1f} ms  (x{big} big chunks)",
          flush=True)
    print(f"chunk-side model: {small}x{k16:.1f} + {big}x{k64:.1f} = "
          f"{small*k16 + big*k64:.0f} ms vs step {step_ms:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
