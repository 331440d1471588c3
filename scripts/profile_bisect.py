"""Bisect the train step: encoder-only vs chunks-only vs full, at bench scale.

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_bisect.py
Env: P_SCALE (1.0), P_BATCH (65536), P_CHUNK (4096).
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def timeit(fn, n=3):
    import jax

    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from ocn_tpu.config import Config
    from ocn_tpu.data.loaders import synthetic_dataset
    from ocn_tpu.train.loop import Trainer

    scale = float(os.environ.get("P_SCALE", "1.0"))
    batch = int(os.environ.get("P_BATCH", "65536"))
    chunk = int(os.environ.get("P_CHUNK", "4096"))
    cfg = Config(
        dataset="collab", predictor="cn5", model="gcn", mplayers=3,
        hiddim=256, batch_size=batch, testbs=batch, maskinput=True,
        ln=True, res=True, jk=True, use_xlin=True, tailact=True,
        pad_deg=64, pad_deg2=64, linkbatchsize=chunk, dtype="bfloat16",
    )
    ds = synthetic_dataset("collab", seed=0, scale=scale)
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)
    g = tr.g
    c = tr._chunk()
    nchunk = batch // c
    print(f"N={ds.n_nodes} E={int(np.asarray(g.indptr)[-1])} batch={batch} "
          f"chunk={c} nchunk={nchunk}", flush=True)

    rng = np.random.default_rng(0)
    pos = ds.split_edge["train"]["edge"].T
    idx = rng.permutation(pos.shape[1])[:batch]
    edges = jnp.asarray(pos[:, idx])
    allc = jnp.concatenate([
        edges.reshape(2, nchunk, c).transpose(1, 0, 2)] * 2, axis=0)
    validc = jnp.ones((2 * nchunk, c), tr.dtype)
    key = jax.random.PRNGKey(0)

    # 1. encoder fwd+bwd only
    def enc_loss(params):
        h = tr.encoder.apply({"params": params["encoder"]}, tr.x, g, True,
                             rngs={"dropout": key})
        return jnp.sum(h).astype(jnp.float32)

    f1 = jax.jit(jax.grad(enc_loss))
    print(f"encoder_fwd+bwd {timeit(lambda: jax.tree_util.tree_leaves(f1(state.params))[0])*1e3:.1f} ms", flush=True)

    # 2. chunk scans fwd+bwd with fixed h (no encoder)
    h0 = jnp.zeros((ds.n_nodes, cfg.hiddim), tr.dtype)

    def chunks_loss(params, h):
        out, _ = tr._scan_scores(params, state.ema, state.sched, h, g,
                                 allc, validc, key, True, adj2=tr.adj2)
        return jnp.sum(out).astype(jnp.float32)

    f2 = jax.jit(jax.grad(chunks_loss, argnums=(0, 1)))
    print(f"chunks({2*nchunk}x{c})_fwd+bwd "
          f"{timeit(lambda: jax.tree_util.tree_leaves(f2(state.params, h0))[0])*1e3:.1f} ms", flush=True)

    # 3. full step
    neg = jnp.asarray(rng.integers(0, ds.n_nodes, size=(2, batch)))
    mp = jnp.maximum(tr.edge2pos[jnp.asarray(idx)].reshape(-1), 0)
    holder = [state]

    def step():
        s, loss = tr.train_step(holder[0], edges, neg, mp, key)
        holder[0] = s
        return loss

    dt = timeit(step)
    print(f"train_step {dt*1e3:.1f} ms -> {2*batch/dt:.0f} edges/s", flush=True)


if __name__ == "__main__":
    main()
