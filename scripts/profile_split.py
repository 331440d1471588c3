"""Bisect the dual-K split train step: encoder vs small-body scan vs
big-body scan vs full step, at bench scale.

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_split.py
Env: P_SCALE (1.0), P_BATCH (65536), P_CHUNK (4096), P_KSMALL (16),
P_K2DST (0), P_GROUP (4).
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
    ksmall = int(os.environ.get("P_KSMALL", "16"))
    k2dst = int(os.environ.get("P_K2DST", "0"))
    group = int(os.environ.get("P_GROUP", "4"))
    cfg = Config(
        dataset="collab", predictor="cn5", model="gcn", mplayers=3,
        hiddim=256, batch_size=batch, testbs=batch, maskinput=True,
        ln=True, res=True, jk=True, use_xlin=True, tailact=True,
        pad_deg=64, pad_deg2=64, linkbatchsize=chunk, dtype="bfloat16",
        k_small=ksmall, pad_deg2_dst=k2dst, frame_group=group,
    )
    ds = synthetic_dataset("collab", seed=0, scale=scale).reorder_bfs()
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)
    g = tr.g
    c = tr._chunk()
    nchunk = batch // c
    nsp, nsn = tr._split if tr._split else (0, 0)
    print(f"N={ds.n_nodes} E={int(np.asarray(g.indptr)[-1])} batch={batch} "
          f"chunk={c} nchunk={nchunk} split=({nsp},{nsn}) group={group}",
          flush=True)

    rng = np.random.default_rng(0)
    pos = ds.split_edge["train"]["edge"].T
    from ocn_tpu.sparse import build as B

    neg = B.negative_sampling(ds.edge_index, ds.n_nodes, pos.shape[1], rng)
    idx = rng.permutation(pos.shape[1])[:batch]
    pe, ne, mp, inv_p, inv_n = tr.prepare_batch(pos[:, idx], neg[:, idx], idx)
    key = jax.random.PRNGKey(0)

    # 1. encoder fwd+bwd only
    def enc_loss(params):
        h = tr.encoder.apply({"params": params["encoder"]}, tr.x, g, True,
                             rngs={"dropout": key})
        return jnp.sum(h).astype(jnp.float32)

    f1 = jax.jit(jax.grad(enc_loss))
    print(f"encoder_fwd+bwd "
          f"{timeit(lambda: jax.tree_util.tree_leaves(f1(state.params))[0])*1e3:.1f} ms",
          flush=True)

    # 2/3. each body separately, fwd+bwd with fixed h
    h0 = jnp.zeros((ds.n_nodes, cfg.hiddim), tr.dtype)
    scan_fn = (tr._scan_scores_grouped if group > 1 else tr._scan_scores)
    posc = pe.reshape(2, nchunk, c).transpose(1, 0, 2)
    negc = ne.reshape(2, nchunk, c).transpose(1, 0, 2)

    def body_loss(params, h, edges_c, k):
        valid = jnp.ones((edges_c.shape[0], c), tr.dtype)
        out, _ = scan_fn(params, state.ema, state.sched, h, g,
                         edges_c, valid, key, True, adj2=tr.adj2,
                         corrs=None, k=k)
        return jnp.sum(out).astype(jnp.float32)

    if nsp + nsn:
        small = jnp.concatenate([posc[:nsp], negc[:nsn]], axis=0)
        f2 = jax.jit(jax.grad(body_loss, argnums=(0, 1)), static_argnums=(3,))
        t = timeit(lambda: jax.tree_util.tree_leaves(f2(state.params, h0, small, ksmall))[0])
        print(f"small_body({nsp + nsn}x{c}@K{ksmall})_fwd+bwd {t*1e3:.1f} ms "
              f"({t*1e3/max(1, nsp+nsn):.1f} ms/chunk)", flush=True)
    nbp, nbn = nchunk - nsp, nchunk - nsn
    if nbp + nbn:
        big = jnp.concatenate([posc[nsp:], negc[nsn:]], axis=0)
        f3 = jax.jit(jax.grad(body_loss, argnums=(0, 1)), static_argnums=(3,))
        t = timeit(lambda: jax.tree_util.tree_leaves(f3(state.params, h0, big, cfg.pad_deg))[0])
        print(f"big_body({nbp + nbn}x{c}@K{cfg.pad_deg})_fwd+bwd {t*1e3:.1f} ms "
              f"({t*1e3/max(1, nbp+nbn):.1f} ms/chunk)", flush=True)

    # 4. full step
    holder = [state]

    def step():
        s, loss = tr.train_step(holder[0], pe, ne, mp, key, inv_p, inv_n)
        holder[0] = s
        return loss

    dt = timeit(step)
    print(f"train_step {dt*1e3:.1f} ms -> {2*batch/dt:.0f} edges/s", flush=True)


if __name__ == "__main__":
    main()
