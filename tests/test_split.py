"""Dual-K occupancy split (Config.k_small): correctness of the degree-sorted
two-body link scan.

The split changes WHICH edges share a chunk (degree sort) and the frame width
of the leading chunks — it must not change the math.  Two checks:

* all-small equivalence: with small_frac pinned to 1.0 every chunk runs in
  the small body, so a split trainer at (pad_deg=P, k_small=K) must produce
  EXACTLY the loss of an unsplit trainer at pad_deg=K fed the same pre-sorted
  batches — this exercises the host sort, the inverse-permutation score
  reassembly (under a pairing-sensitive loss), the corrs routing, and the EMA
  threading end to end.
* training sanity: auto-frac split training runs (plain scan and grouped
  scan) with finite, decreasing-ish loss.
"""
import jax
import numpy as np
import pytest

from ocn_tpu.config import Config
from ocn_tpu.data.loaders import synthetic_dataset
from ocn_tpu.train.loop import Trainer


def _cfg(**kw):
    base = dict(
        dataset="Cora", predictor="cn5", model="puregcn", mplayers=1,
        hiddim=32, batch_size=256, testbs=256, maskinput=True,
        pad_deg=8, pad_deg2=8, linkbatchsize=64, count2_chunk=0,
        losstrick="auc_loss",  # pairing-sensitive: catches inv-perm bugs
    )
    base.update(kw)
    return Config(**base)


def _batch(tr, ds, rng):
    e = ds.split_edge["train"]["edge"].shape[0]
    pos = np.asarray(ds.split_edge["train"]["edge"]).T
    from ocn_tpu.sparse import build as B

    neg = B.negative_sampling(ds.edge_index, ds.n_nodes, e, rng)
    idx = rng.permutation(e)[: tr.cfg.batch_size]
    return pos[:, idx], neg[:, idx], idx


def test_split_all_small_matches_presorted_baseline():
    """With every chunk in the small body, the split trainer must reproduce
    an unsplit pad_deg=k_small trainer fed the same pre-sorted batches.  The
    loss must be order-invariant ("simple") because pos and neg are sorted
    independently — pairing itself is covered by the single-chunk test."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.2)
    cfg_a = _cfg(k_small=4, small_frac=1.0, small_frac_neg=1.0,
                 losstrick="simple")
    cfg_b = _cfg(pad_deg=4, losstrick="simple")
    tr_a = Trainer(cfg_a, ds)
    tr_b = Trainer(cfg_b, ds)
    assert tr_a._split == (4, 4)  # 256/64 = 4 chunks per side, all small
    assert tr_b._split is None

    rng = np.random.default_rng(0)
    pos_b, neg_b, idx = _batch(tr_a, ds, rng)
    pe, ne, mp, inv_p, inv_n = tr_a.prepare_batch(pos_b, neg_b, idx)
    assert inv_p is not None and inv_n is not None
    # the sort really reorders something
    assert not np.array_equal(np.asarray(pe), pos_b)

    key = jax.random.PRNGKey(7)
    state_a = tr_a.init_state(0)
    state_b = tr_b.init_state(0)
    _, loss_a = tr_a.train_step(state_a, pe, ne, mp, key, inv_p, inv_n)
    # baseline consumes the SAME sorted arrays without the split machinery
    _, loss_b = tr_b.train_step(state_b, pe, ne, mp, key)
    np.testing.assert_allclose(
        np.asarray(loss_a), np.asarray(loss_b), rtol=1e-6)


def test_split_mixed_bodies_match_uncapped_oracle():
    """Mixed small+big exactness (VERDICT r1 item 4): with BOTH scan bodies
    active in one step and frame widths above every degree, the split must be
    exact — the widths differ but nothing is capped, so padding lanes are the
    only difference and they must contribute zero.  small_frac_neg=0 keeps
    the EMA update order [pos_s, pos_b, neg_b] == the unsplit [pos, neg]
    order, so the comparison is exact rather than EMA-order-perturbed.  The
    genuinely approximate case (a small-body chunk holding deg>k_small rows,
    i.e. boundary spill) is covered by the convergence A/B in
    results/parity_sbm.jsonl (lb256 vs lb256_k16)."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.2)
    nodrop = dict(
        gnndp=0.0, xdp=0.0, tdp=0.0, gnnedp=0.0, predp=0.0, preedp=0.0,
        batch_size=256, testbs=256, linkbatchsize=64, pad_deg2=160,
        losstrick="simple",  # order-invariant: pos/neg sorted independently
    )
    # maxdeg = 37 on this graph: k_small=40 leaves the small body uncapped
    tr_a = Trainer(
        _cfg(k_small=40, pad_deg=64, small_frac=0.5, small_frac_neg=0.0,
             **nodrop), ds)
    tr_b = Trainer(_cfg(pad_deg=64, **nodrop), ds)
    assert tr_a._split == (2, 0)  # 2 of 4 pos chunks small, all neg big

    rng = np.random.default_rng(3)
    pos_b, neg_b, idx = _batch(tr_a, ds, rng)
    pe, ne, mp, inv_p, inv_n = tr_a.prepare_batch(pos_b, neg_b, idx)
    key = jax.random.PRNGKey(11)
    _, loss_a = tr_a.train_step(
        tr_a.init_state(0), pe, ne, mp, key, inv_p, inv_n)
    # baseline consumes the SAME sorted arrays without the split machinery
    _, loss_b = tr_b.train_step(tr_b.init_state(0), pe, ne, mp, key)
    np.testing.assert_allclose(
        np.asarray(loss_a), np.asarray(loss_b), rtol=1e-5)


def test_split_pairing_restored():
    """Exact pairing check under the paired auc loss: one chunk per side (so
    column sums / EMA are permutation-invariant), zero dropout, and frame
    widths above every degree (so no sampling randomness).  The split trainer
    on degree-sorted inputs must then match the unsplit trainer on the
    ORIGINAL order bit-for-bit up to reduction-order noise — any
    inverse-permutation bug would pair different (pos, neg) couples and move
    the auc loss by O(1)."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.2)
    nodrop = dict(
        gnndp=0.0, xdp=0.0, tdp=0.0, gnnedp=0.0, predp=0.0, preedp=0.0,
        batch_size=128, testbs=128, linkbatchsize=128, pad_deg2=160,
        losstrick="auc_loss",
    )
    # maxdeg = 37, max A^2 row degree = 142 on this graph: k_small=40 and
    # pad_deg2=160 leave nothing capped, so no sampling keys are consumed
    tr_a = Trainer(
        _cfg(k_small=40, pad_deg=64, small_frac=1.0, small_frac_neg=1.0,
             **nodrop), ds)
    tr_b = Trainer(_cfg(pad_deg=40, **nodrop), ds)
    assert tr_a._split == (1, 1)

    rng = np.random.default_rng(1)
    pos_b, neg_b, idx = _batch(tr_a, ds, rng)
    pe, ne, mp, inv_p, inv_n = tr_a.prepare_batch(pos_b, neg_b, idx)
    key = jax.random.PRNGKey(3)
    _, loss_a = tr_a.train_step(
        tr_a.init_state(0), pe, ne, mp, key, inv_p, inv_n)
    # baseline scores the ORIGINAL order; single-chunk normalization makes
    # per-edge scores permutation-invariant, so only pairing can differ
    pe0, ne0, mp0, _, _ = tr_b.prepare_batch(pos_b, neg_b, idx)
    _, loss_b = tr_b.train_step(tr_b.init_state(0), pe0, ne0, mp0, key)
    np.testing.assert_allclose(
        np.asarray(loss_a), np.asarray(loss_b), rtol=1e-4)


def test_pad_deg2_dst_exact_when_uncapped():
    """A dst-frame cap above the max degree must not change anything: N(j)
    only feeds the cn1 membership in gather mode, and extra lanes are
    sentinel-padded."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.2)
    nodrop = dict(
        gnndp=0.0, xdp=0.0, tdp=0.0, gnnedp=0.0, predp=0.0, preedp=0.0,
        batch_size=128, testbs=128, linkbatchsize=128,
        pad_deg=40, pad_deg2=160, losstrick="auc_loss",
    )
    tr_a = Trainer(_cfg(pad_deg2_dst=40, **nodrop), ds)  # maxdeg = 37
    tr_b = Trainer(_cfg(**nodrop), ds)
    rng = np.random.default_rng(2)
    pos_b, neg_b, idx = _batch(tr_a, ds, rng)
    pe, ne, mp, _, _ = tr_a.prepare_batch(pos_b, neg_b, idx)
    key = jax.random.PRNGKey(5)
    _, loss_a = tr_a.train_step(tr_a.init_state(0), pe, ne, mp, key)
    _, loss_b = tr_b.train_step(tr_b.init_state(0), pe, ne, mp, key)
    np.testing.assert_allclose(
        np.asarray(loss_a), np.asarray(loss_b), rtol=1e-5)


@pytest.mark.parametrize("group", [1, 2])
def test_split_training_runs(group):
    ds = synthetic_dataset("Cora", seed=0, scale=0.2)
    cfg = _cfg(k_small=4, frame_group=group, epochs=2)
    tr = Trainer(cfg, ds)
    assert tr._split is not None
    nsp, nsn = tr._split
    assert 0 <= nsp <= 4 and 0 <= nsn <= 4
    if group > 1:
        assert (nsp + nsn) % group == 0
    state = tr.init_state(0)
    rng = np.random.default_rng(0)
    losses = []
    for epoch in range(2):
        state, loss = tr.train_epoch(state, rng, epoch)
        assert np.isfinite(loss)
        losses.append(loss)
    res = tr.evaluate(state)
    for k, v in res.items():
        assert all(np.isfinite(x) for x in v)


def test_dual_k_eval_width_invariance():
    """Foundation of dual-K at eval (VERDICT r2 item 7): on a batch whose
    source degrees all fit frame width K, scoring at k=K equals scoring at
    the full pad_deg — the narrower frame only removes masked padding lanes.
    """
    ds = synthetic_dataset("Cora", seed=0, scale=0.2)
    # maxdeg = 37 on this graph: k=40 leaves every row exact
    cfg = _cfg(pad_deg=64, pad_deg2=64, dual_k_eval=False)
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)
    h = tr.encode(state.params, tr.g)
    edges = np.asarray(ds.split_edge["train"]["edge"][:256])
    import jax.numpy as jnp

    chunk = jnp.asarray(edges.T.astype(np.int32))
    valid = jnp.ones((256,), np.float32)
    key = jax.random.PRNGKey(0)
    s_full = tr.score(state.params, state.ema, state.sched, h, tr.g, tr.adj2,
                      chunk, valid, key)
    s_40 = tr.score(state.params, state.ema, state.sched, h, tr.g, tr.adj2,
                    chunk, valid, key, 40)
    np.testing.assert_allclose(
        np.asarray(s_40), np.asarray(s_full), rtol=2e-5, atol=1e-6)


def test_dual_k_eval_end_to_end():
    """evaluate() with dual_k_eval routes the low-degree majority through
    k_small score batches; metrics stay finite and close to the single-width
    path (exact equality is not expected: the degree sort changes which edges
    share a column-normalization batch, like any batch permutation)."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.2)
    kw = dict(k_small=4, pad_deg=8, pad_deg2=8, testbs=64)
    tr_on = Trainer(_cfg(dual_k_eval=True, **kw), ds)
    tr_off = Trainer(_cfg(dual_k_eval=False, **kw), ds)
    state = tr_on.init_state(0)
    r_on = tr_on.evaluate(state)
    r_off = tr_off.evaluate(state)
    for k in r_on:
        assert all(np.isfinite(v) for v in r_on[k])
        np.testing.assert_allclose(r_on[k], r_off[k], atol=0.12,
                                   err_msg=f"{k}: {r_on[k]} vs {r_off[k]}")


def test_split_requires_prepared_inputs():
    ds = synthetic_dataset("Cora", seed=0, scale=0.2)
    tr = Trainer(_cfg(k_small=4), ds)
    state = tr.init_state(0)
    rng = np.random.default_rng(0)
    pos_b, neg_b, idx = _batch(tr, ds, rng)
    import jax.numpy as jnp

    with pytest.raises(ValueError, match="prepare_batch"):
        tr.train_step(
            state, jnp.asarray(pos_b), jnp.asarray(neg_b), None,
            jax.random.PRNGKey(0))


def test_dual_k_eval_uses_scored_graph_degree():
    """Round-3 advisor finding: under use_valedges_as_input the test split is
    scored against full_g (train+valid edges), where a source's degree can
    cross k_small.  The dual-K eval router must use the degree of the graph
    actually being scored — every edge routed to the small (k_small-width)
    body must fit k_small exactly in THAT graph, or it would be silently
    capped and deg/k-reweighted on the test metric."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.2)
    # build the use_valedges full graph the way loaddataset does (synthetic_
    # dataset alone leaves full_edge_index unset)
    from ocn_tpu.sparse import build as B

    full = np.concatenate(
        [np.asarray(ds.split_edge["train"]["edge"]),
         np.asarray(ds.split_edge["valid"]["edge"])], axis=0).T
    ds.full_edge_index = B.symmetrize_edge_index(full, ds.n_nodes)
    k_small = 4
    cfg = _cfg(k_small=k_small, pad_deg=64, pad_deg2=64, testbs=32,
               dual_k_eval=True, use_valedges_as_input=True)
    tr = Trainer(cfg, ds)
    deg_train = tr._deg_np
    deg_full = tr._graph_deg_np(tr.full_g)
    edges = np.asarray(ds.split_edge["test"]["edge"])
    # the scenario must be discriminating: some scored source fits k_small on
    # the train graph but not on the full graph
    crossers = (deg_train[edges[:, 0]] <= k_small) & \
               (deg_full[edges[:, 0]] > k_small)
    assert crossers.any(), "fixture lost its degree-crossing sources"

    routed = []
    orig = tr._score_batches

    def spy(state, h, g, e, adj2=None, k=None, fold0=0):
        routed.append((k, np.asarray(e)))
        return orig(state, h, g, e, adj2, k=k, fold0=fold0)

    tr._score_batches = spy
    state = tr.init_state(0)
    h = tr.encode(state.params, tr.full_g)
    tr._score_split(state, h, tr.full_g, edges, tr.full_adj2)
    small = [e for k, e in routed if k == k_small]
    assert small, "dual-K eval did not engage"
    for e in small:
        assert (deg_full[e[:, 0]] <= k_small).all(), (
            "small body received a source that outgrows k_small on full_g")


def test_split_plan_node_sharding_dp1_falls_back_to_replicated():
    """Round-3 advisor finding: with graph_sharding='node' but dp_devices=1
    no mesh is built and the REPLICATED train path runs, so _split_plan must
    produce the replicated plan (frame_group alignment) — not the
    node-sharded rounding."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.2)
    kw = dict(k_small=4, pad_deg=8, pad_deg2=8, frame_group=3)
    tr_node = Trainer(_cfg(graph_sharding="node", dp_devices=1, **kw), ds)
    tr_repl = Trainer(_cfg(**kw), ds)
    assert tr_node.mesh is None
    assert tr_node._split == tr_repl._split


def test_cn6_split_mixed_bodies_match_uncapped_oracle():
    """Round 4 (VERDICT r3 item 2): the dual-K split covers THREE_HOP/cn6.
    Same exactness contract as the cn5 mixed-bodies test — widths above
    every degree make the split a pure padding change, so the loss matches
    the unsplit trainer bit-for-bit (the cn3 plane rides the shared src
    candidate frame at the body's width)."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.2)
    nodrop = dict(
        predictor="cn6", gnndp=0.0, xdp=0.0, tdp=0.0, gnnedp=0.0, predp=0.0,
        preedp=0.0, batch_size=256, testbs=256, linkbatchsize=64,
        pad_deg2=160, adj3_cap=512, losstrick="simple",
    )
    tr_a = Trainer(
        _cfg(k_small=40, pad_deg=64, small_frac=0.5, small_frac_neg=0.0,
             **nodrop), ds)
    tr_b = Trainer(_cfg(pad_deg=64, **nodrop), ds)
    assert tr_a._split == (2, 0)
    assert tr_b._split is None

    rng = np.random.default_rng(3)
    pos_b, neg_b, idx = _batch(tr_a, ds, rng)
    pe, ne, mp, inv_p, inv_n = tr_a.prepare_batch(pos_b, neg_b, idx)
    key = jax.random.PRNGKey(11)
    _, loss_a = tr_a.train_step(
        tr_a.init_state(0), pe, ne, mp, key, inv_p, inv_n)
    _, loss_b = tr_b.train_step(tr_b.init_state(0), pe, ne, mp, key)
    np.testing.assert_allclose(
        np.asarray(loss_a), np.asarray(loss_b), rtol=1e-5)


def test_cn6_dual_k_eval_runs():
    """cn6 eval rides the dual-K eval split too; metrics stay finite and
    close to the single-width path."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.2)
    kw = dict(predictor="cn6", k_small=4, pad_deg=8, pad_deg2=8, testbs=64,
              adj3_cap=256)
    tr_on = Trainer(_cfg(dual_k_eval=True, **kw), ds)
    tr_off = Trainer(_cfg(dual_k_eval=False, **kw), ds)
    state = tr_on.init_state(0)
    r_on = tr_on.evaluate(state)
    r_off = tr_off.evaluate(state)
    for k in r_on:
        assert all(np.isfinite(v) for v in r_on[k])
        np.testing.assert_allclose(r_on[k], r_off[k], atol=0.12,
                                   err_msg=f"{k}: {r_on[k]} vs {r_off[k]}")


def test_family_split_mixed_bodies_match_uncapped_oracle():
    """Round 5: the dual-K split covers the SELF_BUILDING family (cn2/cn3)
    via the per-call outer-width override.  Same exactness contract as the
    cn5/cn6 mixed-bodies tests: with every width above every degree (and
    resdeg above every residual count, so sample_frame never draws) the
    split is a pure padding change and the loss matches the unsplit
    trainer."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.2)
    # trndeg/tstdeg above the max A^2 row degree (142 on this graph) so
    # sample_frame never DRAWS — capped draws would consume chunk keys that
    # differ between the split and unsplit programs (i0 offsets)
    for pred, extra in (("cn2", {}), ("cn3", {"pad_deg2": 64})):
        nodrop = dict(
            predictor=pred, gnndp=0.0, xdp=0.0, tdp=0.0, gnnedp=0.0,
            predp=0.0, preedp=0.0, batch_size=256, testbs=256,
            linkbatchsize=64, losstrick="simple", depth=1,
            trndeg=160, tstdeg=160, adj2_cap=4096, **extra,
        )
        # maxdeg = 37 (scale 0.2): k_small=40 leaves the small body uncapped;
        # cn3's a2row rides self.k=pad_deg in BOTH bodies (full-width pin)
        tr_a = Trainer(
            _cfg(k_small=40, pad_deg=256, small_frac=0.5,
                 small_frac_neg=0.5, **nodrop), ds)
        tr_b = Trainer(_cfg(pad_deg=256, **nodrop), ds)
        assert tr_a._split == (2, 2), (pred, tr_a._split)
        assert tr_b._split is None

        rng = np.random.default_rng(3)
        pos_b, neg_b, idx = _batch(tr_a, ds, rng)
        pe, ne, mp, inv_p, inv_n = tr_a.prepare_batch(pos_b, neg_b, idx)
        key = jax.random.PRNGKey(11)
        _, loss_a = tr_a.train_step(
            tr_a.init_state(0), pe, ne, mp, key, inv_p, inv_n)
        # baseline consumes the SAME sorted arrays without the split
        # machinery (chunk composition fixes the column-sum granularity;
        # "simple" loss is order-invariant per side).  rtol: the two widths
        # reassociate the same real entries' f32 segment sums differently
        # (padding lanes change the sorted grouping), and the Bayes clamp's
        # sigmoid(5*(prob-3)) amplifies that — measured residue ~2e-4.
        _, loss_b = tr_b.train_step(tr_b.init_state(0), pe, ne, mp, key)
        np.testing.assert_allclose(
            np.asarray(loss_a), np.asarray(loss_b), rtol=1e-3,
            err_msg=pred)


def test_family_split_trains_and_evaluates():
    """cn3 + dual-K (auto fracs, caps binding): finite losses, finite eval
    through the dual-K eval router (max-endpoint-degree routing)."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.2)
    cfg = _cfg(predictor="cn3", k_small=4, pad_deg=16, pad_deg2=16,
               depth=1, trndeg=2, tstdeg=4, testbs=64, epochs=2,
               losstrick="auc_loss")
    tr = Trainer(cfg, ds)
    assert tr._split is not None
    state = tr.init_state(0)
    rng = np.random.default_rng(0)
    for epoch in range(2):
        state, loss = tr.train_epoch(state, rng, epoch)
        assert np.isfinite(loss)
    res = tr.evaluate(state)
    for k, v in res.items():
        assert all(np.isfinite(x) for x in v)
