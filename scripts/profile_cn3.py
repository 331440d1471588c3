"""cn3 chunk bisect (round 5, VERDICT r4 item 2): where do the ~100 ms of a
production cn3 link chunk go?

cn3 = IncompleteCNPredictor(higher_order=True): per chunk the outer forward
builds 1-hop + 2-hop CN/residual frames, then scores FOUR residual frames
recursively (res1/res2/cn2res1/cn2res2, each (C, resdeg) potential edges) with
a depth-0 forward under stop_gradient — forward-only cost, 4x (C*resdeg)
edges at rec_k width.

Chained-timing protocol (profile_post_ell.py): the body rides a lax.scan so
the tunnel cannot interleave dispatches.

Components:
  outer_fb     full depth=1 chunk, value_and_grad (the real per-chunk cost)
  d0_fb        depth=0 chunk, value_and_grad — NOTE: an explicit depth=0
               with module depth=1 runs at the RECURSION width (rec_k), not
               pad_deg (`k_frame = self.k if depth == self.depth else
               rec_k`), so this row UNDERSTATES the real outer-at-K=64
               cost; outer_fb is the ground truth
  rec_fwd      ONE recursive body: depth-0 fwd at (C*resdeg) edges, rec_k
  rec_frames   frames+membership part of rec_fwd (gathers, no h)
  rec_colnorm  the two n_nodes-domain colnorm scatters of rec_fwd
  rec_colnorm_fidx   same sums in the sorted entry domain (incl. frame_index)
  rec_matmul   the two separate (Br,K,H) frame matmuls (fwd, as in the
               stop-gradient recursion)
  rec_matmul_shared  matmul_shared([.,.]) one-gather variant (incl. fidx)
  rec_mlps     the MLP tail at (Br, H)

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_cn3.py
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
    from ocn_tpu.ops.frame import (
        CNFrame, _rowwise_membership, cn_residual_frames, frame_index,
        gather_neighbors, matmul_shared,
    )
    from ocn_tpu.ops.ortho import colnorm_plain, colnorm_quirk
    from ocn_tpu.ops.frame import entry_col_sum_multi
    from ocn_tpu.train.loop import Trainer

    C = int(os.environ.get("P_CHUNK", "4096"))
    RESDEG = 8      # trainresdeg default
    RECK = int(os.environ.get("P_RECK", "16"))
    cfg = Config(
        dataset="collab", predictor="cn3", model="gcn", mplayers=3,
        hiddim=256, batch_size=65536, testbs=65536, maskinput=True,
        ln=True, res=True, jk=True, use_xlin=True, tailact=True,
        gnndp=0.25, xdp=0.25, tdp=0.05, gnnedp=0.25, predp=0.3, preedp=0.3,
        pad_deg=64, pad_deg2=64, linkbatchsize=C, rec_k=RECK,
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
    state = tr.init_state(0)
    variables = {"params": state.params["predictor"], "ema": state.ema,
                 "sched": state.sched}
    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.standard_normal((N, H)), tr.dtype)
    key = jax.random.PRNGKey(0)
    rngs = {"dropout": key, "sample": key}

    edges = jnp.asarray(rng.integers(0, N, size=(2, C)), jnp.int32)
    Br = C * RESDEG
    redges = jnp.asarray(rng.integers(0, N, size=(2, Br)), jnp.int32)

    def apply_chunk(hh, e, depth):
        out, _ = tr.predictor.apply(
            variables, hh, g, e, True, rngs=rngs, mutable=["ema"],
            depth=depth, adj2=adj2)
        return out

    for name, depth in (("outer_fb", None), ("d0_fb", 0)):
        def fb(s, depth=depth):
            e = jnp.minimum(edges + s.astype(jnp.int32), N - 1)

            def loss(hh):
                return (apply_chunk(hh, e, depth).astype(jnp.float32) ** 2).sum()

            return jax.grad(loss)(h0).ravel()[0].astype(jnp.float32) * 1e-30

        print(f"{name:18s} {chained(fb):8.2f} ms", flush=True)

    def rec_fwd(s):
        e = jnp.minimum(redges + s.astype(jnp.int32), N - 1)
        out = jax.lax.stop_gradient(apply_chunk(h0, e, 0))
        return out.astype(jnp.float32).ravel()[0] * 1e-30

    t_rec = chained(rec_fwd)
    print(f"{'rec_fwd (x4/chunk)':18s} {t_rec:8.2f} ms   (4x = {4*t_rec:.2f})",
          flush=True)

    # blocked depth-0 body (round 5): shared anchor windows, (C, RESDEG)
    from ocn_tpu.nn.predictors.cn_incomplete import IncompleteCNPredictor

    anchors0 = edges[1]
    cands0 = jnp.asarray(
        rng.integers(0, N, size=(C, RESDEG)), jnp.int32)

    def rec_blocked(s):
        a = jnp.minimum(anchors0 + s.astype(jnp.int32), N - 1)
        out, _ = tr.predictor.apply(
            variables, h0, g, a, cands0, True, adj2,
            method=IncompleteCNPredictor._blocked_depth0,
            rngs=rngs, mutable=["ema"])
        return jax.lax.stop_gradient(out).astype(
            jnp.float32).ravel()[0] * 1e-30

    t_blk = chained(rec_blocked)
    print(f"{'rec_blocked':18s} {t_blk:8.2f} ms   (4x = {4*t_blk:.2f})",
          flush=True)

    # ---- components of the recursive body ---------------------------------
    def rec_frames(s):
        e = jnp.minimum(redges + s.astype(jnp.int32), N - 1)
        cn, res1, res2 = cn_residual_frames(g, e, RECK, key)
        src = gather_neighbors(g, e[0], RECK, key)
        a2row = gather_neighbors(adj2, e[1], RECK, key)
        in_a2 = _rowwise_membership(src.ids, a2row.ids, a2row.w)
        return (cn.val.sum() + res1.val.sum() + res2.val.sum()
                + in_a2.sum()).astype(jnp.float32) * 1e-30

    print(f"{'rec_frames':18s} {chained(rec_frames):8.2f} ms", flush=True)

    cn, res1, res2 = cn_residual_frames(g, redges, RECK, key)
    src = gather_neighbors(g, redges[0], RECK, key)
    a2row = gather_neighbors(adj2, redges[1], RECK, key)
    in_a2 = _rowwise_membership(src.ids, a2row.ids, a2row.w)
    cn22 = CNFrame(src.ids, jnp.where(in_a2 != 0, src.w, 0.0), N)
    ids0 = jax.block_until_ready(cn.ids)
    v_cn = cn.val
    v_c22 = cn22.val

    def rec_colnorm(s):
        c1 = cn.with_values(v_cn + s.astype(v_cn.dtype) * 1e-30)
        ncn1 = colnorm_quirk(c1, 1.0)
        ncn22 = colnorm_plain(cn22.with_values(
            jnp.where(cn22.mask | ncn1.mask, v_c22 - 0.1 * ncn1.val, 0.0)))
        return (ncn1.val.sum() + ncn22.val.sum()).astype(jnp.float32) * 1e-30

    print(f"{'rec_colnorm':18s} {chained(rec_colnorm):8.2f} ms", flush=True)

    def rec_colnorm_fidx(s):
        ids = jnp.minimum(ids0 + s.astype(jnp.int32), N - 1)
        fi = frame_index(ids, N)
        c1 = CNFrame(ids, v_cn, N)
        c22 = CNFrame(ids, v_c22, N)
        ncn1 = colnorm_quirk(c1, 1.0, fi)
        ncn22 = colnorm_plain(c22.with_values(
            jnp.where(c22.mask | ncn1.mask, v_c22 - 0.1 * ncn1.val, 0.0)), fi)
        return (ncn1.val.sum() + ncn22.val.sum()).astype(jnp.float32) * 1e-30

    print(f"{'rec_colnorm_fidx':18s} {chained(rec_colnorm_fidx):8.2f} ms",
          flush=True)

    def rec_matmul(s):
        h = h0 + s.astype(h0.dtype) * 1e-30
        a = cn.matmul(h)
        b = cn22.matmul(h)
        return (a.astype(jnp.float32).sum()
                + b.astype(jnp.float32).sum()) * 1e-30

    print(f"{'rec_matmul':18s} {chained(rec_matmul):8.2f} ms", flush=True)

    fidx0 = frame_index(ids0, N)

    def rec_matmul_shared(s):
        h = h0 + s.astype(h0.dtype) * 1e-30
        ids = jnp.minimum(ids0 + s.astype(jnp.int32), N - 1)
        fi = frame_index(ids, N)
        c1 = CNFrame(ids, v_cn, N)
        c22 = CNFrame(ids, v_c22, N)
        a, b = matmul_shared([c1, c22], h, fi)
        return (a.astype(jnp.float32).sum()
                + b.astype(jnp.float32).sum()) * 1e-30

    print(f"{'rec_matmul_shared':18s} {chained(rec_matmul_shared):8.2f} ms",
          flush=True)

    # MLP tail: xcnlin on both planes + xijlin + head at (Br, H) — mirror
    # the TRAINER-built predictor's module flags so params line up
    xcn = jnp.asarray(rng.standard_normal((Br, H)), tr.dtype)
    p = state.params["predictor"]
    pred = tr.predictor

    def rec_mlps(s):
        z = xcn + s.astype(xcn.dtype) * 1e-30
        from ocn_tpu.nn.mlp import CNAggMLP, HeadMLP, XijMLP
        xcnlin = CNAggMLP(pred.hidden, pred.dropout, pred.ln, False)
        xijlin = XijMLP(pred.hidden, pred.dropout, pred.ln, pred.tailact)
        head = HeadMLP(pred.hidden, 1, pred.dropout, pred.ln,
                       pred.twolayerlin)
        a = xcnlin.apply({"params": p["xcnlin"]}, z, False,
                         rngs={"dropout": key})
        b = xcnlin.apply({"params": p["xcnlin"]}, z * 0.5, False,
                         rngs={"dropout": key})
        c = xijlin.apply({"params": p["xijlin"]}, z, False,
                         rngs={"dropout": key})
        out = head.apply({"params": p["head"]}, a + b + c, False,
                         rngs={"dropout": key})
        return out.astype(jnp.float32).ravel()[0] * 1e-30

    print(f"{'rec_mlps':18s} {chained(rec_mlps):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
