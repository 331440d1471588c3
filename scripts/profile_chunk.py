"""Decompose one 4096-link scoring chunk at collab scale on the TPU.

PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_chunk.py
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

    from ocn_tpu.config import Config
    from ocn_tpu.data.loaders import synthetic_dataset
    from ocn_tpu.ops.frame import cn_frames
    from ocn_tpu.train.loop import Trainer
    from ocn_tpu.ops import frame as F

    cfg = Config(
        dataset="collab", predictor="cn5", model="gcn", mplayers=3,
        hiddim=256, batch_size=4096, testbs=4096, maskinput=False,
        ln=True, res=True, use_xlin=True, tailact=True,
        pad_deg=64, pad_deg2=64, linkbatchsize=4096, dtype="bfloat16",
    )
    ds = synthetic_dataset("collab", seed=0, scale=1.0)
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)
    g, adj2 = tr.g, tr.adj2
    k = cfg.pad_deg
    rng = np.random.default_rng(0)
    edges = jnp.asarray(ds.split_edge["train"]["edge"][:4096].T)
    h = jnp.asarray(rng.standard_normal((ds.n_nodes, 256)), jnp.bfloat16)
    valid = jnp.ones((4096,), tr.dtype)
    key = jax.random.PRNGKey(0)
    print(f"pallas_membership={F.use_pallas_membership()}", flush=True)

    # 1. frames fwd only
    f_frames = jax.jit(lambda e: sum(
        jnp.sum(c.val) for c in cn_frames(g, e, k=k, k2=k, adj2=adj2)))
    print(f"frames_fwd {timeit(lambda: f_frames(edges)):.2f} ms", flush=True)

    # 1b. frames with XLA membership
    F._USE_PALLAS = False
    f_frames_x = jax.jit(lambda e: sum(
        jnp.sum(c.val) for c in cn_frames(g, e, k=k, k2=k, adj2=adj2)) + 0.0)
    print(f"frames_fwd_xla {timeit(lambda: f_frames_x(edges)):.2f} ms", flush=True)
    F._USE_PALLAS = None

    # 2. predictor apply fwd (training=False)
    cn1, cn2 = jax.jit(lambda e: cn_frames(g, e, k=k, k2=k, adj2=adj2))(edges)
    vars_ = {"params": state.params["predictor"], "ema": state.ema,
             "sched": state.sched}
    f_pred = jax.jit(lambda hh: jnp.sum(tr.predictor.apply(
        vars_, hh, g, cn1, cn2, edges, False)).astype(jnp.float32))
    print(f"pred_fwd {timeit(lambda: f_pred(h)):.2f} ms", flush=True)

    # 3. predictor fwd+bwd wrt h
    f_pred_g = jax.jit(jax.grad(lambda hh: jnp.sum(tr.predictor.apply(
        vars_, hh, g, cn1, cn2, edges, False)).astype(jnp.float32)))
    print(f"pred_fwd+bwd_dh {timeit(lambda: jnp.sum(f_pred_g(h))):.2f} ms", flush=True)

    # 4. full chunk (frames + predictor) fwd+bwd wrt h
    def chunk_loss(hh, e):
        c1, c2 = cn_frames(g, e, k=k, k2=k, adj2=adj2)
        return jnp.sum(tr.predictor.apply(vars_, hh, g, c1, c2, e, False)).astype(jnp.float32)

    f_chunk = jax.jit(jax.grad(chunk_loss))
    print(f"chunk_fwd+bwd_dh {timeit(lambda: jnp.sum(f_chunk(h, edges))):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
