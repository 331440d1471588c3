"""End-to-end smoke: the minimum slice from SURVEY.md §7.2 — Cora-like graph,
cn5 + puregcn, one jitted train step + Hits@K eval.  Runs on the CPU backend
(BASELINE.json config #1 is the CPU-runnable smoke)."""
import numpy as np
import pytest

from ocn_tpu.config import Config
from ocn_tpu.data.loaders import synthetic_dataset
from ocn_tpu.train.loop import Trainer


def small_cfg(**kw):
    base = dict(
        dataset="Cora", predictor="cn5", model="puregcn", mplayers=1,
        hiddim=32, batch_size=128, testbs=128, epochs=1, runs=1,
        maskinput=True, pad_deg=16, pad_deg2=16, count2_chunk=0,
        gnndp=0.1, predp=0.1, xdp=0.1, tdp=0.1, gnnedp=0.0, preedp=0.0,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def tiny_ds():
    return synthetic_dataset("Cora", seed=0, scale=0.15)  # ~400 nodes


def test_train_and_eval_cn5(tiny_ds):
    cfg = small_cfg()
    tr = Trainer(cfg, tiny_ds)
    state = tr.init_state(0)
    rng = np.random.default_rng(0)
    state, loss0 = tr.train_epoch(state, rng, 1)
    assert np.isfinite(loss0)
    state, loss1 = tr.train_epoch(state, rng, 2)
    assert np.isfinite(loss1)
    # EMA state advanced (one update per pos/neg micro-batch scan step)
    assert int(np.asarray(state.ema["n"])) > 0
    res = tr.evaluate(state)
    for k, (trn, val, tst) in res.items():
        assert 0.0 <= trn <= 1.0 and 0.0 <= val <= 1.0 and 0.0 <= tst <= 1.0


def test_train_cn7(tiny_ds):
    cfg = small_cfg(predictor="cn7", model="puremean", mplayers=2)
    tr = Trainer(cfg, tiny_ds)
    state = tr.init_state(0)
    state, loss = tr.train_epoch(state, np.random.default_rng(0), 1)
    assert np.isfinite(loss)
    res = tr.evaluate(state)
    assert "Hits@20" in res


def test_train_cn2_incomplete(tiny_ds):
    cfg = small_cfg(predictor="cn2", depth=1, trndeg=4, tstdeg=8, pad_deg=16)
    tr = Trainer(cfg, tiny_ds)
    state = tr.init_state(0)
    state, loss = tr.train_epoch(state, np.random.default_rng(0), 1)
    assert np.isfinite(loss)


def test_losses_finite():
    from ocn_tpu.train import losses as L
    import jax.numpy as jnp

    pos = jnp.asarray([0.5, 1.2, -0.3])
    neg = jnp.asarray([-0.5, 0.2, 0.1])
    for name, fn in L.LOSSES.items():
        v = fn(pos, neg, num_neg=1, weight=1.0, margin=1.0)
        assert np.isfinite(float(v)), name


def test_metrics():
    from ocn_tpu.train import metrics as M

    pos = np.array([3.0, 1.0, 0.5])
    neg = np.array([2.0, 0.4, 0.1, 0.05])
    assert M.hits_at_k(pos, neg, 1) == pytest.approx(1 / 3)   # kth = 2.0
    assert M.hits_at_k(pos, neg, 2) == pytest.approx(1.0)     # kth = 0.4
    assert M.hits_at_k(pos, neg, 3) == pytest.approx(1.0)     # kth = 0.1
    assert M.hits_at_k(np.array([0.05]), neg, 3) == 0.0
    with pytest.warns(RuntimeWarning):  # fewer negs than K: loud, not silent
        assert M.hits_at_k(pos, neg, 100) == 1.0
    with pytest.raises(ValueError):  # OGB Evaluator semantics
        M.hits_at_k(pos, neg, 100, strict=True)
    # MRR: pos=1.0 vs its negs row
    p = np.array([1.0])
    n = np.array([[2.0, 0.5, 0.1]])
    # optimistic rank = 1, pessimistic = 1 -> rank 2 -> 1/2
    assert M.mrr(p, n) == pytest.approx(0.5)


def test_train_cn3_higher_order(tiny_ds):
    cfg = small_cfg(predictor="cn3", depth=1, trndeg=4, tstdeg=8, pad_deg=16)
    tr = Trainer(cfg, tiny_ds)
    state = tr.init_state(0)
    state, loss = tr.train_epoch(state, np.random.default_rng(0), 1)
    assert np.isfinite(loss)


def test_train_cn6_three_hop(tiny_ds):
    cfg = small_cfg(predictor="cn6", pad_deg=12, pad_deg2=12, batch_size=64, testbs=64)
    tr = Trainer(cfg, tiny_ds)
    state = tr.init_state(0)
    state, loss = tr.train_epoch(state, np.random.default_rng(0), 1)
    assert np.isfinite(loss)


def test_train_cn1_and_cn9_onehot(tiny_ds):
    for pred in ("cn1", "cn9"):
        cfg = small_cfg(predictor=pred)
        tr = Trainer(cfg, tiny_ds)
        state = tr.init_state(0)
        state, loss = tr.train_epoch(state, np.random.default_rng(0), 1)
        assert np.isfinite(loss), pred


def test_checkpoint_roundtrip(tiny_ds, tmp_path):
    import jax

    cfg = small_cfg()
    tr = Trainer(cfg, tiny_ds)
    state = tr.init_state(0)
    state, _ = tr.train_epoch(state, np.random.default_rng(0), 1)
    from ocn_tpu.train.checkpoint import load_state, save_state

    save_state(str(tmp_path / "ck"), state, 1)
    tr2 = Trainer(cfg, tiny_ds)
    template = tr2.init_state(1)
    restored, step = load_state(str(tmp_path / "ck"), template)
    assert step == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_mrr_eval_citation2_style():
    ds = synthetic_dataset("citation2", seed=0, scale=0.0002)  # ~600 nodes
    cfg = small_cfg(dataset="citation2", encoder_stack="ho", model="puregcn",
                    cn2_counts=True, batch_size=64, testbs=128)
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)
    state, loss = tr.train_epoch(state, np.random.default_rng(0), 1)
    out = tr.evaluate_mrr(state)
    assert 0.0 <= out["valid"] <= 1.0 and 0.0 <= out["test"] <= 1.0


def test_embedding_encoder_ddi_style():
    ds = synthetic_dataset("ddi", seed=0, scale=0.05)  # node-id features
    assert ds.max_x >= 0
    cfg = small_cfg(dataset="ddi", model="puresum", batch_size=64, testbs=64)
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)
    state, loss = tr.train_epoch(state, np.random.default_rng(0), 1)
    assert np.isfinite(loss)


def test_ho_stack_gcn_encoder(tiny_ds):
    cfg = small_cfg(encoder_stack="ho", model="gcn", mplayers=2)
    tr = Trainer(cfg, tiny_ds)
    state = tr.init_state(0)
    state, loss = tr.train_epoch(state, np.random.default_rng(0), 1)
    assert np.isfinite(loss)


def test_hoisted_frames_matches_scan(tiny_ds):
    """hoist_frames=True scores identically to the per-chunk path in eval-free
    training (same seeds, no sampling)."""
    import jax

    losses = []
    for hoist in (False, True):
        cfg = small_cfg(hoist_frames=hoist, gnndp=0.0, predp=0.0, xdp=0.0,
                        tdp=0.0, linkbatchsize=32)
        tr = Trainer(cfg, tiny_ds)
        state = tr.init_state(0)
        state, loss = tr.train_epoch(state, np.random.default_rng(0), 1)
        losses.append(loss)
    assert abs(losses[0] - losses[1]) < 1e-3, losses


def test_cn5_learns_structured_graph():
    """On a stochastic-block-model graph (strong CN signal), cn5 must reach
    much better validation Hits than chance — an end-to-end check that the
    whole pipeline (frames, orthogonalization, training) learns."""
    from ocn_tpu.data.loaders import LinkDataset, randomsplit
    from ocn_tpu.sparse import build as Bb

    rng_np = np.random.default_rng(0)
    n, blocks = 400, 8
    labels = rng_np.integers(0, blocks, size=n)
    same = labels[:, None] == labels[None, :]
    p = np.where(same, 0.25, 0.004)
    dense = (rng_np.random((n, n)) < p)
    dense = np.triu(dense, 1)
    dense = dense | dense.T
    ei = np.stack(np.nonzero(dense))
    split = randomsplit(ei, n, rng_np)
    train_ei = Bb.symmetrize_edge_index(split["train"]["edge"].T, n)
    x = rng_np.standard_normal((n, 16)).astype(np.float32)
    ds = LinkDataset(name="sbm", x=x, max_x=-1, edge_index=train_ei,
                     split_edge=split, n_nodes=n)
    cfg = small_cfg(batch_size=256, testbs=512, hiddim=32, pad_deg=64,
                    pad_deg2=64, gnnlr=0.01, prelr=0.01)
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)
    rng = np.random.default_rng(0)
    for epoch in range(1, 9):
        state, loss = tr.train_epoch(state, rng, epoch)
    res = tr.evaluate(state)
    hits50_valid = res["Hits@50"][1]
    # chance level for Hits@50 with ~|neg| ≈ |pos| ≈ 700 is ~0.07; structured
    # CN signal should push far above it
    assert hits50_valid > 0.30, res


def test_grouped_frames_matches_scan(tiny_ds):
    losses = []
    for group in (1, 2):
        # pad_deg >= max degree so no window sampling -> key streams moot
        cfg = small_cfg(frame_group=group, gnndp=0.0, predp=0.0, xdp=0.0,
                        tdp=0.0, linkbatchsize=32, pad_deg=32, pad_deg2=32)
        tr = Trainer(cfg, tiny_ds)
        state = tr.init_state(0)
        state, loss = tr.train_epoch(state, np.random.default_rng(0), 1)
        losses.append(loss)
    assert abs(losses[0] - losses[1]) < 1e-3, losses


def test_bfs_reorder_preserves_training(tiny_ds):
    ds2 = tiny_ds.reorder_bfs()
    assert ds2.n_nodes == tiny_ds.n_nodes
    assert ds2.edge_index.shape == tiny_ds.edge_index.shape
    # degree multiset preserved
    import collections
    n = tiny_ds.n_nodes
    d1 = collections.Counter(np.bincount(tiny_ds.edge_index[0], minlength=n).tolist())
    d2 = collections.Counter(np.bincount(ds2.edge_index[0], minlength=n).tolist())
    assert d1 == d2
    cfg = small_cfg()
    tr = Trainer(cfg, ds2)
    state = tr.init_state(0)
    state, loss = tr.train_epoch(state, np.random.default_rng(0), 1)
    assert np.isfinite(loss)
    res = tr.evaluate(state)
    assert 0.0 <= res["Hits@100"][1] <= 1.0


def test_use_valedges_eval_path(tiny_ds):
    """use_valedges_as_input: test-split scoring re-encodes with the train+valid
    graph and gathers from its own A^2 (reference NeighborOverlap_large.py:143-145)."""
    import dataclasses as dc

    from ocn_tpu.sparse import build as Bb

    val_ei = tiny_ds.split_edge["valid"]["edge"].T
    full = np.concatenate([tiny_ds.edge_index, val_ei], axis=1)
    ds = dc.replace(
        tiny_ds,
        full_edge_index=Bb.symmetrize_edge_index(full, tiny_ds.n_nodes),
    )
    cfg = small_cfg(use_valedges_as_input=True)
    tr = Trainer(cfg, ds)
    assert tr.full_adj2 is not tr.adj2  # distinct A^2 for the full graph
    state = tr.init_state(0)
    state, _ = tr.train_epoch(state, np.random.default_rng(0), 1)
    res = tr.evaluate(state)
    assert 0.0 <= res["Hits@100"][2] <= 1.0


def test_bench_config_shape_regression(tiny_ds):
    """The exact bench configuration (gin-style encoder opts, bf16,
    frame_group, maskinput, gather mode) trains at small scale — guards the
    headline path against refactor breakage."""
    cfg = small_cfg(
        model="gcn", mplayers=3, hiddim=64, ln=True, res=True, jk=True,
        use_xlin=True, tailact=True, dtype="bfloat16", frame_group=2,
        linkbatchsize=32, batch_size=128, maskinput=True,
    )
    tr = Trainer(cfg, tiny_ds)
    state = tr.init_state(0)
    state, loss = tr.train_epoch(state, np.random.default_rng(0), 1)
    assert np.isfinite(loss)
