"""Intra-chunk bisect post-ELL: what do the 38 ms (K=64) / 14 ms (K=16) of a
link chunk go to?  Chained-timing protocol (see profile_post_ell.py).

Components (each f+b where it has a backward in the real step):
  frames      cn_frames ELL gathers + membership + self-corr (no h involved)
  frame_index the flat-id sort powering colsums + matmul backward
  ortho       orthogonalize() on fixed frames (colsum_multi + GS + EMA)
  matmul      matmul_shared (the (B,K,H) feature gather + weighted reduce)
  sort_only   jax.lax.sort of the flat ids (the frame_index kernel's core)

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_chunk_post_ell.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def chained(f, n=10):
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
    from ocn_tpu.ops.frame import cn_frames, frame_index, matmul_shared
    from ocn_tpu.ops.ortho import orthogonalize
    from ocn_tpu.train.loop import Trainer

    B = int(os.environ.get("P_CHUNK", "4096"))
    cfg = Config(
        dataset="collab", predictor="cn5", model="gcn", mplayers=3,
        hiddim=256, batch_size=65536, testbs=65536, maskinput=True,
        pad_deg=64, pad_deg2=64, linkbatchsize=B, k_small=16,
        dtype="bfloat16", ell_tables=True,
    )
    ds = synthetic_dataset("collab", seed=0).reorder_bfs()
    tr = Trainer(cfg, ds)
    if tr._use_ell:
        tr._refresh_ell(np.random.default_rng(1))
        g = tr.g.with_ell(tr._ell["tbl1"], tr._ell["off1"])
        adj2 = tr.adj2.with_ell(tr._ell["tbl2"], tr._ell["off2"])
    else:
        g, adj2 = tr.g, tr.adj2
    N = ds.n_nodes
    H = cfg.hiddim
    rng = np.random.default_rng(0)
    edges = jnp.asarray(rng.integers(0, N, size=(2, B)), jnp.int32)
    key = jax.random.PRNGKey(0)
    h0 = jnp.asarray(rng.standard_normal((N, H)), tr.dtype)

    for K in (64, 16):
        print(f"--- K={K}", flush=True)

        def frames_only(s):
            e = jnp.minimum(edges + s.astype(jnp.int32), N - 1)
            cn1, cn2, src = cn_frames(
                g, e, k=K, k2=cfg.pad_deg2, key=key, adj2=adj2,
                with_src=True)
            return (cn1.val.sum() + cn2.val.sum()).astype(jnp.float32) * 1e-30

        t = chained(frames_only)
        print(f"cn_frames(fwd)        {t:7.2f} ms", flush=True)

        cn1, cn2, _src = cn_frames(
            g, edges, k=K, k2=cfg.pad_deg2, key=key, adj2=adj2, with_src=True)
        ids0 = jax.block_until_ready(cn1.ids)
        val1 = cn1.val
        val2 = cn2.val

        def fidx_only(s):
            ids = jnp.minimum(ids0 + s.astype(jnp.int32), N - 1)
            fi = frame_index(ids, N)
            return fi.perm.astype(jnp.float32).ravel()[0] * 1e-30

        print(f"frame_index           {chained(fidx_only):7.2f} ms", flush=True)

        def sort_only(s):
            ids = jnp.minimum(ids0 + s.astype(jnp.int32), N - 1)
            return jax.lax.sort(ids.reshape(-1)).astype(jnp.float32)[0] * 1e-30

        print(f"lax.sort(flat ids)    {chained(sort_only):7.2f} ms", flush=True)

        fidx = frame_index(ids0, N)

        def ortho_only(s):
            c1 = cn1.with_values(val1 + s.astype(val1.dtype))

            def loss(v):
                c1x = cn1.with_values(v)
                ncn1, ocn2, e2, n2 = orthogonalize(
                    c1x, cn2, jnp.zeros(()), jnp.zeros((), jnp.int32), True,
                    0.0, fidx)
                return (ncn1.val.sum() + ocn2.val.sum()).astype(jnp.float32) ** 2

            dv = jax.grad(loss)(c1.val)
            return dv.ravel()[0].astype(jnp.float32) * 1e-30

        print(f"orthogonalize f+b     {chained(ortho_only):7.2f} ms", flush=True)

        def matmul_only(s):
            h = h0 + s.astype(h0.dtype)

            def loss(h):
                a, b = matmul_shared([cn1, cn2], h, fidx)
                return (a.astype(jnp.float32) ** 2).sum() + (
                    b.astype(jnp.float32) ** 2).sum()

            dh = jax.grad(loss)(h)
            return dh.ravel()[0].astype(jnp.float32) * 1e-30

        print(f"matmul_shared f+b     {chained(matmul_only):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
