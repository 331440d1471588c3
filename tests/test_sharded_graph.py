"""Integrated node-sharded training (parallel/sharded_graph.py): adjacency,
A^2 and features sharded over the virtual 8-CPU mesh.

Parity target: the replicated-graph shard_map DP step (parallel/spmd.py) with
the SAME per-device chunk assignment — the sharded-graph step changes only
WHERE the graph arrays live, so with every stochastic knob off (no dropout,
pad_deg above the max degree, no DropAdj) the loss must match to fp tolerance.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocn_tpu.config import Config
from ocn_tpu.data.loaders import synthetic_dataset
from ocn_tpu.parallel.mesh import make_mesh
from ocn_tpu.train.loop import Trainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _cfg(**kw):
    base = dict(
        dataset="Cora", predictor="cn5", model="puregcn", mplayers=2,
        hiddim=32, batch_size=256, testbs=256, maskinput=True,
        pad_deg=64, pad_deg2=64, linkbatchsize=32, two_hop_mode="gather",
        gnndp=0.0, xdp=0.0, tdp=0.0, gnnedp=0.0, predp=0.0, preedp=0.0,
        reorder="none", ell_tables=False,
    )
    base.update(kw)
    return Config(**base)


def _batch(tr, ds, seed=0):
    rng = np.random.default_rng(seed)
    pos_all = np.asarray(ds.split_edge["train"]["edge"]).T
    idx = rng.permutation(pos_all.shape[1])[: tr.cfg.batch_size]
    pos = pos_all[:, idx]
    neg = np.stack([
        rng.integers(0, ds.n_nodes, size=tr.cfg.batch_size),
        rng.integers(0, ds.n_nodes, size=tr.cfg.batch_size),
    ])
    mp = None
    if tr.edge2pos is not None:
        mp = np.maximum(tr.edge2pos[idx].reshape(-1), 0).astype(np.int32)
    return (jnp.asarray(pos.astype(np.int32)),
            jnp.asarray(neg.astype(np.int32)), mp)


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset("Cora", seed=0, scale=0.2)


def test_sharded_window_gather_matches_replicated(ds):
    """sharded_gather_neighbors == gather_neighbors on every requested row."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from ocn_tpu.ops.frame import gather_neighbors
    from ocn_tpu.parallel.sharded_graph import (
        LocalWindows, partition_windows, sharded_gather_neighbors)

    cfg = _cfg()
    tr = Trainer(cfg, ds)
    mesh = make_mesh(8, 1)
    wip, wcol, wval, wdeg, _ = partition_windows(tr.g, 8)
    rows_per = wdeg.shape[1]
    r0s = jnp.asarray((np.arange(8) * rows_per).astype(np.int32))[:, None]

    rng = np.random.default_rng(0)
    nodes = rng.integers(0, ds.n_nodes, size=8 * 16).astype(np.int32)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp")),
        check_vma=False,
    )
    def run(nodes_l, ip, col, val, deg, r0):
        lw = LocalWindows(ip=ip[0], col=col[0], val=val[0], deg=deg[0],
                          r0=r0[0, 0], rows_per=rows_per,
                          n_nodes=tr.g.n_nodes, axis="dp")
        nf = sharded_gather_neighbors(lw, nodes_l, 8, None)
        return nf.ids, nf.w

    ids_s, w_s = run(jnp.asarray(nodes), jnp.asarray(wip), jnp.asarray(wcol),
                     jnp.asarray(wval), jnp.asarray(wdeg), r0s)
    ref = gather_neighbors(tr.g, jnp.asarray(nodes), 8, None)
    np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ref.ids))
    np.testing.assert_allclose(np.asarray(w_s), np.asarray(ref.w), rtol=1e-6)


def test_sharded_graph_step_matches_replicated_spmd(ds):
    """One train step with sharded adjacency + A^2 + features produces the
    same loss (and the same loss trajectory over 3 steps) as the
    replicated-graph shard_map DP step."""
    from ocn_tpu.parallel.sharded_graph import make_sharded_graph_train_step
    from ocn_tpu.parallel.spmd import make_spmd_train_step

    cfg = _cfg()
    tr = Trainer(cfg, ds)
    mesh = make_mesh(8, 1)
    step_rep = make_spmd_train_step(tr, mesh)
    step_sh, prepare = make_sharded_graph_train_step(tr, mesh)

    state_r = tr.init_state(0)
    state_s = tr.init_state(0)
    key = jax.random.PRNGKey(0)
    for i in range(3):
        pos, neg, mp = _batch(tr, ds, seed=i)
        ki = jax.random.fold_in(key, i)
        state_r, loss_r = step_rep(state_r, pos, neg, jnp.asarray(mp), ki)
        state_s, loss_s = step_sh(state_s, pos, neg, prepare(mp), ki)
        assert np.isfinite(float(loss_r)) and np.isfinite(float(loss_s))
        np.testing.assert_allclose(
            float(loss_s), float(loss_r), rtol=2e-4,
            err_msg=f"step {i}: sharded {float(loss_s)} vs replicated "
                    f"{float(loss_r)}")


def test_dual_k_split_on_gspmd_mesh(ds):
    """The dual-K occupancy split now runs on the GSPMD mesh path (VERDICT r1
    item 3): edges shard WITHIN chunks so the two scan bodies stay one
    program; loss must equal the single-device split trainer bit-for-bit
    (same keys, no device folding under GSPMD)."""
    import jax.numpy as jnp

    kw = dict(k_small=4, small_frac=0.5, small_frac_neg=0.5, pad_deg=8,
              pad_deg2=8, maskinput=True)
    tr_1 = Trainer(_cfg(**kw), ds)
    tr_m = Trainer(_cfg(dp_devices=4, tp_devices=2, **kw), ds)
    assert tr_m._split == tr_1._split is not None
    s1 = tr_1.init_state(0)
    sm = tr_m.init_state(0)
    pos, neg, mp = _batch(tr_1, ds, seed=0)
    pe, ne, mpp, ip, inn = tr_1.prepare_batch(np.asarray(pos), np.asarray(neg))
    mpj = jnp.asarray(mp)
    key = jax.random.PRNGKey(0)
    _, l1 = tr_1.train_step(s1, pe, ne, mpj, key, ip, inn)
    _, lm = tr_m.train_step(sm, pe, ne, mpj, key, ip, inn)
    np.testing.assert_allclose(float(lm), float(l1), rtol=1e-5)


def test_sharded_graph_encoder_convs(ds):
    """Every conv family the encoder offers runs on the sharded graph and
    matches the replicated encoder output on the real node rows."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from ocn_tpu.parallel.node_sharded import partition_graph_boundary
    from ocn_tpu.parallel.sharded_graph import LocalGraph

    mesh = make_mesh(8, 1)
    for model, stack in [("puregcn", "ts"), ("puremean", "ts"),
                         ("puresum", "ts"), ("gcn", "ts"), ("gin", "ts"),
                         ("puregcn", "ho"), ("gcn", "ho")]:
        cfg = _cfg(model=model, encoder_stack=stack, mplayers=2)
        tr = Trainer(cfg, ds)
        bp = partition_graph_boundary(tr.g, 8)
        rows_per = bp.rows_per
        n_pad = 8 * rows_per
        x = np.asarray(tr.x)
        x_pad = np.concatenate(
            [x, np.zeros((n_pad - x.shape[0],) + x.shape[1:], x.dtype)])
        xj = jnp.asarray(x_pad.reshape(8, rows_per, -1))
        state = tr.init_state(0)

        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(),) + (P("dp"),) * 8,
            out_specs=P("dp"),
            check_vma=False,
        )
        def enc(params, x_l, sidx, icol, irow, ival, bpos, brow, bval):
            lg = LocalGraph(
                sidx=sidx[0], icol=icol[0], irow=irow[0], ival=ival[0],
                bpos=bpos[0], brow=brow[0], bval=bval[0],
                rows_per=rows_per, ndev=8, bmax=bp.bmax,
                n_nodes=tr.g.n_nodes, axis="dp")
            return tr.encoder.apply({"params": params}, x_l[0], lg, False)

        h_s = enc(
            state.params["encoder"], xj,
            jnp.asarray(bp.send_idx),
            jnp.asarray(bp.icol.astype(np.int32)),
            jnp.asarray(bp.irow.astype(np.int32)),
            jnp.asarray(bp.ival),
            jnp.asarray(bp.bpos.astype(np.int32)),
            jnp.asarray(bp.brow.astype(np.int32)),
            jnp.asarray(bp.bval),
        )
        h_r = tr.encoder.apply(
            {"params": state.params["encoder"]}, tr.x, tr.g, False)
        np.testing.assert_allclose(
            np.asarray(h_s)[: ds.n_nodes], np.asarray(h_r), rtol=5e-4,
            atol=5e-5, err_msg=f"{model}/{stack}")


def test_graph_sharding_config_path(ds):
    """Config(graph_sharding="node", dp_devices=8) wires the node-sharded
    step into Trainer.train_step/train_epoch — the user-facing integration
    (CLI flag --graph_sharding node)."""
    cfg = _cfg(dp_devices=8, graph_sharding="node")
    tr = Trainer(cfg, ds)
    assert tr._split is None and not tr._use_ell
    state = tr.init_state(0)
    rng = np.random.default_rng(0)
    state, loss = tr.train_epoch(state, rng, epoch=1)
    assert np.isfinite(loss)

    # same config on the replicated GSPMD path: losses agree on the first
    # epoch batch sequence (identical rng stream, stochastic knobs off)
    cfg_r = _cfg(dp_devices=8)
    tr_r = Trainer(cfg_r, ds)
    state_r = tr_r.init_state(0)
    state_r, loss_r = tr_r.train_epoch(state_r, np.random.default_rng(0), 1)
    np.testing.assert_allclose(loss, loss_r, rtol=2e-2)


def _max_degs(tr):
    return (int(np.asarray(tr.g.deg).max()),
            int(np.asarray(tr.adj2.deg).max()))


def test_sharded_ell_exactness(ds):
    """ELL window tables on the node-sharded path (VERDICT r2 item 1a): with
    pad caps above every row degree the frozen tables are exact, so the epoch
    loss must be IDENTICAL with tables on vs off — including maskinput, whose
    ELL-space routing (route_ell_mask + local scatter) is exercised by every
    batch.  The rng stream is ELL-neutral by construction (train/loop.py)."""
    probe = Trainer(_cfg(dp_devices=8, graph_sharding="node"), ds)
    kmax, k2max = _max_degs(probe)
    kw = dict(dp_devices=8, graph_sharding="node",
              pad_deg=kmax + 1, pad_deg2=k2max + 1, linkbatchsize=16)
    losses = {}
    for ell in (False, True):
        tr = Trainer(_cfg(ell_tables=ell, **kw), ds)
        assert tr._use_ell == ell
        state = tr.init_state(0)
        state, losses[ell] = tr.train_epoch(
            state, np.random.default_rng(0), epoch=1)
    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)


def test_sharded_dual_k_matches_single_device(ds):
    """Dual-K occupancy split on the node-sharded path (VERDICT r2 item 1b):
    with the round-robin chunk->device interleave, every chunk's content and
    frame width match the single-device split trainer exactly, and the
    all-gathered scores are re-ordered to original positions — so with a
    state-free predictor (cn7: no EMA) and stochastic knobs off, the sharded
    loss equals the single-device dual-K loss to fp tolerance.  Uses a
    pairing-sensitive loss (auc) so the inverse permutation is actually
    load-bearing."""
    probe = Trainer(_cfg(), ds)
    kmax, k2max = _max_degs(probe)
    kw = dict(predictor="cn7", k_small=8, small_frac=0.5, small_frac_neg=0.5,
              pad_deg=kmax + 1, pad_deg2=k2max + 1, linkbatchsize=32,
              losstrick="auc_loss", ell_tables=True)
    tr_1 = Trainer(_cfg(**kw), ds)
    tr_s = Trainer(_cfg(dp_devices=4, graph_sharding="node", **kw), ds)
    assert tr_1._split == tr_s._split is not None
    s1 = tr_1.init_state(0)
    ss = tr_s.init_state(0)
    rng1, rngs = np.random.default_rng(0), np.random.default_rng(0)
    s1, l1 = tr_1.train_epoch(s1, rng1, epoch=1)
    ss, ls = tr_s.train_epoch(ss, rngs, epoch=1)
    assert np.isfinite(ls)
    np.testing.assert_allclose(ls, l1, rtol=5e-4)


def test_sharded_eval_matches_replicated(ds):
    """Sharded evaluate() (VERDICT r2 item 1c): the adjacency / A^2 / ELL
    tables stay sharded through eval scoring (make_sharded_encode +
    make_sharded_score); only h is gathered.  With exact tables (caps above
    every degree) the scores differ from the replicated path only by the
    halo-exchange SpMM's float reassociation, so Hits@K must agree.

    Column-sum granularity: the sharded scorer normalizes per device-local
    chunk (linkbatchsize), the replicated one per testbs batch — a documented
    deviation (PARITY.md §8) — so the replicated oracle here uses
    testbs == linkbatchsize to make the chunk boundaries identical."""
    probe = Trainer(_cfg(), ds)
    kmax, k2max = _max_degs(probe)
    kw = dict(ell_tables=True, pad_deg=kmax + 1, pad_deg2=k2max + 1,
              linkbatchsize=16)
    tr_s = Trainer(_cfg(dp_devices=8, graph_sharding="node", testbs=128,
                        **kw), ds)
    tr_r = Trainer(_cfg(testbs=16, **kw), ds)
    state = tr_s.init_state(0)
    # one sharded training epoch first: eval must consume the refreshed
    # tables and a real (post-update) state
    state, _ = tr_s.train_epoch(state, np.random.default_rng(0), epoch=1)
    res_s = tr_s.evaluate(state)
    # replicated trainer evaluates the SAME state (params are replicated);
    # its own table refresh draws identical offsets (all zero at these caps)
    tr_r._refresh_ell(np.random.default_rng(1))
    res_r = tr_r.evaluate(state)
    for k in res_s:
        np.testing.assert_allclose(
            res_s[k], res_r[k], atol=1e-9,
            err_msg=f"{k}: sharded {res_s[k]} vs replicated {res_r[k]}")


def test_sharded_production_config_epoch(ds):
    """The full production lever set on the sharded path in one go: ELL
    tables + dual-K split + maskinput, cn5, through the user-facing config.
    Pins that train_epoch runs and the loss is finite with caps that BIND
    (pad_deg below max degree exercises capping + frozen-window sampling)."""
    cfg = _cfg(dp_devices=8, graph_sharding="node", ell_tables=True,
               k_small=8, small_frac=0.5, small_frac_neg=0.5,
               pad_deg=16, pad_deg2=32, linkbatchsize=16)
    tr = Trainer(cfg, ds)
    assert tr._use_ell and tr._split is not None
    state = tr.init_state(0)
    state, loss = tr.train_epoch(state, np.random.default_rng(0), epoch=1)
    assert np.isfinite(loss)


def test_sharded_three_hop_step_matches_replicated(ds):
    """cn6 joins the sharded-graph scope (round 5): the A^3 table rides as a
    third set of row-range shards and cn3_frame's dst row gather goes through
    the owner-gather seam.  Loss trajectory must match the replicated
    shard_map DP step like cn5's does."""
    from ocn_tpu.parallel.sharded_graph import make_sharded_graph_train_step
    from ocn_tpu.parallel.spmd import make_spmd_train_step

    cfg = _cfg(predictor="cn6")
    tr = Trainer(cfg, ds)
    assert tr.adj3 is not None
    mesh = make_mesh(8, 1)
    step_rep = make_spmd_train_step(tr, mesh)
    step_sh, prepare = make_sharded_graph_train_step(tr, mesh)

    state_r = tr.init_state(0)
    state_s = tr.init_state(0)
    key = jax.random.PRNGKey(0)
    for i in range(3):
        pos, neg, mp = _batch(tr, ds, seed=i)
        ki = jax.random.fold_in(key, i)
        state_r, loss_r = step_rep(state_r, pos, neg, jnp.asarray(mp), ki)
        state_s, loss_s = step_sh(state_s, pos, neg, prepare(mp), ki)
        assert np.isfinite(float(loss_r)) and np.isfinite(float(loss_s))
        # tolerance is wider than cn5's 2e-4: the halo-exchange SpMM's float
        # reassociation in h amplifies through cn6's three aggregate planes
        # and deeper head; the MATH parity (frames bit-identical through the
        # owner-gather seam) is pinned separately below
        np.testing.assert_allclose(
            float(loss_s), float(loss_r), rtol=3e-3,
            err_msg=f"step {i}: sharded {float(loss_s)} vs replicated "
                    f"{float(loss_r)}")


def test_sharded_cn3_frame_bit_identical(ds):
    """cn3_frame through the sharded owner-gather seam must be BIT-identical
    to the replicated path — ids and values — including A^3 rows far above
    the k3 cap (first-k windows on both sides with key=None)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from ocn_tpu.ops.frame import cn3_frame, cn_frames
    from ocn_tpu.parallel.sharded_graph import (
        LocalWindows, partition_windows, sharded_gather_neighbors)

    cfg = _cfg(predictor="cn6")
    tr = Trainer(cfg, ds)
    mesh = make_mesh(8, 1)
    wip, wcol, wval, wdeg, _ = partition_windows(tr.adj3, 8)
    rows_per = wdeg.shape[1]
    r0s = jnp.asarray((np.arange(8) * rows_per).astype(np.int32))[:, None]
    k3 = tr._k3_width()

    rng = np.random.default_rng(0)
    edges = rng.integers(0, ds.n_nodes, size=(2, 8 * 16)).astype(np.int32)
    cn1, cn2, src = cn_frames(
        tr.g, jnp.asarray(edges), k=8, k2=cfg.pad_deg2, adj2=tr.adj2,
        with_src=True)
    ref = cn3_frame(tr.g, jnp.asarray(edges), src, k2=k3, k3=16,
                    adj3=tr.adj3)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                  P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp")),
        check_vma=False,
    )
    def run(dst_l, sids_l, svals_l, ip, col, val, deg, r0):
        lw = LocalWindows(ip=ip[0], col=col[0], val=val[0], deg=deg[0],
                          r0=r0[0, 0], rows_per=rows_per,
                          n_nodes=tr.g.n_nodes, axis="dp")
        nf = sharded_gather_neighbors(lw, dst_l, k3, None)
        from ocn_tpu.ops.frame import _rowwise_membership
        counts3 = _rowwise_membership(sids_l, nf.ids, nf.w)
        base = (counts3 > 0).astype(jnp.float32)
        return sids_l, jnp.where(svals_l != 0, svals_l * base, 0.0)

    ids_s, val_s = run(
        jnp.asarray(edges[1]), src.ids, src.w,
        jnp.asarray(wip), jnp.asarray(wcol), jnp.asarray(wval),
        jnp.asarray(wdeg), r0s)
    np.testing.assert_array_equal(np.asarray(ids_s), np.asarray(ref.ids))
    np.testing.assert_array_equal(np.asarray(val_s), np.asarray(ref.val))


def test_sharded_three_hop_eval_scores_match(ds):
    """The sharded forward-only scorer must reproduce the replicated score
    path for cn6.  Column sums are per predictor call, so the replicated
    oracle scores the SAME per-device 1-chunk slices (PARITY.md §8
    granularity rule)."""
    from ocn_tpu.parallel.sharded_graph import (
        make_sharded_encode, make_sharded_score)

    cfg = _cfg(predictor="cn6", eval_sampling=False)
    tr = Trainer(cfg, ds)
    mesh = make_mesh(8, 1)
    state = tr.init_state(0)
    enc = make_sharded_encode(tr, mesh, tr.g, tr.x)
    sc = make_sharded_score(tr, mesh, tr.g, tr.adj2, False, adj3=tr.adj3)
    h_s = enc(state.params["encoder"])
    h_r = tr.encode(state.params, tr.g)
    np.testing.assert_allclose(
        np.asarray(h_s), np.asarray(h_r), rtol=2e-4, atol=2e-5)
    rng = np.random.default_rng(5)
    c = tr._chunk()
    bs = 8 * c
    edges = rng.integers(0, ds.n_nodes, size=(2, bs)).astype(np.int32)
    valid = np.ones((bs,), np.float32)
    key = jax.random.PRNGKey(9)
    s_sh = sc(state.params, state.ema, state.sched, jnp.asarray(h_r),
              jnp.asarray(edges), jnp.asarray(valid), key)
    parts = []
    for d in range(8):  # same chunk slices the 8 devices score
        sl = edges[:, d * c:(d + 1) * c]
        parts.append(np.asarray(tr.score(
            state.params, state.ema, state.sched, jnp.asarray(h_r),
            tr.g, tr.adj2, jnp.asarray(sl),
            jnp.asarray(valid[d * c:(d + 1) * c]), key)))
    s_re = np.concatenate(parts)
    np.testing.assert_allclose(
        np.asarray(s_sh), s_re, rtol=2e-3, atol=2e-4)
