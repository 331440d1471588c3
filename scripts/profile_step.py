"""Per-component timing of the train step on the current backend.

Usage: python scripts/profile_step.py [cpu]
Times, after warmup: dispatch overhead (tiny jit), encoder fwd, cn frame
extraction (cn1 only / cn1+cn2), predictor fwd, full train step.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def timeit(fn, n=5):
    import jax

    fn()  # warm
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    if len(sys.argv) > 1 and sys.argv[1] == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from ocn_tpu.config import Config
    from ocn_tpu.data.loaders import synthetic_dataset
    from ocn_tpu.ops.frame import cn_frames
    from ocn_tpu.train.loop import Trainer

    scale = float(os.environ.get("P_SCALE", "0.25"))
    batch = int(os.environ.get("P_BATCH", "16384"))
    chunk = int(os.environ.get("P_CHUNK", "4096"))
    k = int(os.environ.get("P_K", "64"))

    cfg = Config(
        dataset="collab", predictor="cn5", model="gcn", mplayers=3,
        hiddim=256, batch_size=batch, testbs=batch, maskinput=True,
        ln=True, res=True, jk=True, use_xlin=True, tailact=True,
        pad_deg=k, pad_deg2=k, linkbatchsize=chunk, dtype="bfloat16",
    )
    ds = synthetic_dataset("collab", seed=0, scale=scale)
    print(f"nodes={ds.n_nodes} train_edges={ds.split_edge['train']['edge'].shape[0]}",
          flush=True)
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)
    g = tr.g

    # 0. dispatch overhead
    tiny = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros((8,))
    print(f"dispatch_overhead {timeit(lambda: tiny(x0))*1e3:.2f} ms", flush=True)

    # 1. encoder forward
    enc = jax.jit(lambda p: tr.encoder.apply({"params": p["encoder"]}, tr.x, g, False))
    print(f"encoder_fwd {timeit(lambda: enc(state.params))*1e3:.2f} ms", flush=True)

    edges = jnp.asarray(ds.split_edge["train"]["edge"][:chunk].T)

    # 2. cn1 only
    f1 = jax.jit(lambda e: cn_frames(g, e, k=k, k2=k, with_cn2=False)[0].val)
    print(f"cn1_frame({chunk}) {timeit(lambda: f1(edges))*1e3:.2f} ms", flush=True)

    # 3. cn1 + cn2 (SDDMM count2)
    f2 = jax.jit(lambda e: cn_frames(g, e, k=k, k2=k)[1].val)
    print(f"cn1+cn2_frame({chunk}) {timeit(lambda: f2(edges))*1e3:.2f} ms", flush=True)

    # 4. predictor forward on prebuilt frames
    h = enc(state.params)
    cn1, cn2 = jax.jit(lambda e: cn_frames(g, e, k=k, k2=k))(edges)
    pred = jax.jit(lambda p, hh: tr.predictor.apply(
        {"params": p["predictor"], "ema": state.ema, "sched": state.sched},
        hh, g, cn1, cn2, edges, False))
    print(f"predictor_fwd({chunk}) {timeit(lambda: pred(state.params, h))*1e3:.2f} ms",
          flush=True)

    # 5. full train step
    e = ds.split_edge["train"]["edge"].shape[0]
    rng = np.random.default_rng(0)
    from ocn_tpu.sparse import build as B

    pos = ds.split_edge["train"]["edge"].T
    neg = B.negative_sampling(ds.edge_index, ds.n_nodes, e, rng)
    idx = rng.permutation(e)[:batch]
    pe, ne = jnp.asarray(pos[:, idx]), jnp.asarray(neg[:, idx])
    mp = jnp.maximum(tr.edge2pos[jnp.asarray(idx)].reshape(-1), 0)
    key = jax.random.PRNGKey(0)

    holder = [state]

    def step():
        # train_step donates its state arg; thread the new state through
        s, loss = tr.train_step(holder[0], pe, ne, mp, key)
        holder[0] = s
        return loss

    t = timeit(step, n=3)
    print(f"train_step({batch}) {t*1e3:.2f} ms -> {2*batch/t:.0f} edges/s", flush=True)


if __name__ == "__main__":
    main()
