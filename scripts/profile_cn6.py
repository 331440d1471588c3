"""cn6 component bisect (round 5, VERDICT r4 item 6): price the last 8% gap
to cn5 (182.1k vs 197.2k, vs_defaults 0.923).

Mechanism hypothesis (BENCH_NOTES r4-continuation): the extra cost over a
cn5 chunk is (a) the cn3_frame membership compare (K x k3 per chunk), (b)
the third matmul plane's weighted reduce (the gather is shared), (c) the
5-plane (vs 3-plane) colsum payload in orthogonalize3 — none
descriptor-shaped.  This times each piece head-to-head at the production
chunk shape, dual-K small body (K=16) and big body (K=64).

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_cn6.py
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
    from ocn_tpu.ops import ortho
    from ocn_tpu.ops.frame import (
        cn3_frame, cn_frames, frame_index, matmul_shared,
        _rowwise_membership, gather_neighbors, entry_col_sum_multi,
    )
    from ocn_tpu.train.loop import Trainer

    B = int(os.environ.get("P_CHUNK", "4096"))
    cfg = Config(
        dataset="collab", predictor="cn6", model="gcn", mplayers=3,
        hiddim=256, batch_size=65536, testbs=65536, maskinput=True,
        pad_deg=64, pad_deg2=64, linkbatchsize=B, k_small=16,
        dtype="bfloat16", ell_tables=True,
    )
    ds = synthetic_dataset("collab", seed=0).reorder_bfs()
    tr = Trainer(cfg, ds)
    tr._refresh_ell(np.random.default_rng(1))
    g = tr.g.with_ell(tr._ell["tbl1"], tr._ell["off1"])
    adj2 = tr.adj2.with_ell(tr._ell["tbl2"], tr._ell["off2"])
    adj3 = tr.adj3.with_ell(tr._ell["tbl3"], tr._ell["off3"])
    N = ds.n_nodes
    H = cfg.hiddim
    rng = np.random.default_rng(0)
    edges = jnp.asarray(rng.integers(0, N, size=(2, B)), jnp.int32)
    key = jax.random.PRNGKey(0)
    h0 = jnp.asarray(rng.standard_normal((N, H)), tr.dtype)
    k3w = tr._k3_width()

    for K in (16, 64):
        print(f"--- K={K}", flush=True)
        cn1, cn2, src = cn_frames(
            g, edges, k=K, k2=cfg.pad_deg2, key=key, adj2=adj2,
            with_src=True)
        cn3 = cn3_frame(g, edges, src, k2=k3w, k3=k3w, adj3=adj3)
        ids0 = jax.block_until_ready(cn1.ids)
        fidx = frame_index(ids0, N)
        v1, v2, v3 = cn1.val, cn2.val, cn3.val

        # (a) the cn3_frame membership add-on: A^3 row gather + compare
        def cn3_only(s):
            e = jnp.minimum(edges + s.astype(jnp.int32), N - 1)
            c3 = cn3_frame(g, e, src, k2=k3w, k3=k3w, adj3=adj3)
            return c3.val.sum().astype(jnp.float32) * 1e-30

        print(f"cn3_frame (gather+member) {chained(cn3_only):7.2f} ms",
              flush=True)

        # (b) ortho pair vs triple, f+b — the 5-plane vs 3-plane colsum
        # payload + the extra GS arithmetic
        def mk_ortho(triple):
            def run(s):
                w1 = v1 + s.astype(v1.dtype) * 1e-30

                def loss(w1):
                    c1 = cn1.with_values(w1)
                    if triple:
                        a, b, c, e2, n2 = ortho.orthogonalize3(
                            c1, cn2, cn3, jnp.zeros(()),
                            jnp.zeros((), jnp.int32), True, 0.0, fidx)
                        return (a.val.sum() + b.val.sum()
                                + c.val.sum()).astype(jnp.float32) ** 2
                    a, b, e2, n2 = ortho.orthogonalize(
                        c1, cn2, jnp.zeros(()), jnp.zeros((), jnp.int32),
                        True, 0.0, fidx)
                    return (a.val.sum() + b.val.sum()).astype(
                        jnp.float32) ** 2

                return jax.grad(loss)(v1).ravel()[0].astype(
                    jnp.float32) * 1e-30

            return run

        t2 = chained(mk_ortho(False))
        t3 = chained(mk_ortho(True))
        print(f"orthogonalize  f+b (cn5)  {t2:7.2f} ms", flush=True)
        print(f"orthogonalize3 f+b (cn6)  {t3:7.2f} ms   (delta {t3-t2:+.2f})",
              flush=True)

        # (c) matmul_shared 2 vs 3 planes, f+b — gather shared, reduce extra
        def mk_mm(nf):
            frames = [cn1, cn2, cn3][:nf]

            def run(s):
                h = h0 + s.astype(h0.dtype) * 1e-30

                def loss(h):
                    outs = matmul_shared(frames, h, fidx)
                    return sum(
                        (o.astype(jnp.float32) ** 2).sum() for o in outs)

                dh = jax.grad(loss)(h)
                return dh.ravel()[0].astype(jnp.float32) * 1e-30

            return run

        m2 = chained(mk_mm(2))
        m3 = chained(mk_mm(3))
        print(f"matmul_shared 2-plane f+b {m2:7.2f} ms", flush=True)
        print(f"matmul_shared 3-plane f+b {m3:7.2f} ms   (delta {m3-m2:+.2f})",
              flush=True)


if __name__ == "__main__":
    main()
