"""Edge-case hardening (VERDICT r1 item 8/9/5): loud failures instead of
silent degradation, CLI negation flags, and the cn2/cn3 recursion train-mode
semantics pin."""
import warnings

import numpy as np
import pytest

from ocn_tpu.config import Config
from ocn_tpu.data.loaders import synthetic_dataset
from ocn_tpu.train.loop import Trainer, _largest_divisor_leq


def test_negative_sampling_raises_on_near_complete_graph():
    from ocn_tpu.sparse import build as B

    # complete graph on 4 nodes: no non-edges exist
    n = 4
    ei = np.array([(u, v) for u in range(n) for v in range(n) if u != v]).T
    with pytest.raises(RuntimeError, match="negative_sampling"):
        B.negative_sampling(ei, n, 64, np.random.default_rng(0))


def test_chunk_divisor_warns_on_pathological_batch_size():
    with pytest.warns(RuntimeWarning, match="no divisor"):
        assert _largest_divisor_leq(127, 64) == 1  # prime batch
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert _largest_divisor_leq(8192, 4096) == 4096
        assert _largest_divisor_leq(100, 64) == 50  # >= target/2: fine


def test_cli_negation_flags_override_preset():
    from ocn_tpu.cli import parseargs

    # collab preset pins maskinput=True; --no-maskinput must disable it
    cfg = parseargs(["--preset", "--dataset", "collab", "--no-maskinput"])
    assert cfg.maskinput is False
    assert cfg.use_valedges_as_input is True  # rest of preset intact
    cfg2 = parseargs(["--preset", "--dataset", "collab"])
    assert cfg2.maskinput is True
    cfg3 = parseargs(["--dataset", "Cora", "--maskinput"])
    assert cfg3.maskinput is True


def _rec_cfg(**kw):
    base = dict(
        dataset="Cora", predictor="cn2", model="puregcn", mplayers=1,
        hiddim=16, batch_size=64, testbs=64, depth=1, trndeg=4, tstdeg=4,
        pad_deg=8, pad_deg2=8, linkbatchsize=64,
        gnndp=0.0, xdp=0.0, tdp=0.0, gnnedp=0.0,
    )
    base.update(kw)
    return Config(**base)


def _one_step_loss(cfg, ds, seed=0):
    import jax

    tr = Trainer(cfg, ds)
    state = tr.init_state(seed)
    pos = np.asarray(ds.split_edge["train"]["edge"]).T[:, : cfg.batch_size]
    neg = np.asarray(ds.split_edge["valid"]["edge_neg"]).T[:, : cfg.batch_size]
    pe, ne, mp, ip, inn = tr.prepare_batch(pos, neg)
    _, loss = tr.train_step(state, pe, ne, mp, jax.random.PRNGKey(seed), ip, inn)
    return float(loss)


def test_cn2_recursion_train_mode_pin():
    """The reference scores the stop-gradient recursion with the module in
    TRAIN mode — dropouts stay active inside the recursive scorer
    (model.py:926-946).  Pin: with predictor dropout on, train-mode recursion
    differs from eval-mode recursion under identical keys; with dropout off,
    the flag is a no-op."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.15)

    drop_kw = dict(predp=0.6)
    l_train_rec = _one_step_loss(_rec_cfg(**drop_kw), ds)
    l_eval_rec = _one_step_loss(
        _rec_cfg(recursion_train_mode=False, **drop_kw), ds)
    assert np.isfinite(l_train_rec) and np.isfinite(l_eval_rec)
    assert l_train_rec != pytest.approx(l_eval_rec, abs=1e-7)

    # with dropout off AND no degree capping anywhere (pad_deg/resdeg above
    # the max degree, so no random sampling either), the flag is a no-op
    base_kw = dict(predp=0.0, preedp=0.0, pad_deg=64, pad_deg2=64,
                   trndeg=64, tstdeg=64)
    l_on = _one_step_loss(_rec_cfg(**base_kw), ds)
    l_off = _one_step_loss(_rec_cfg(recursion_train_mode=False, **base_kw), ds)
    assert l_off == pytest.approx(l_on, rel=1e-6)


def test_eval_sampling_random_but_deterministic():
    """Capped eval rows are sampled (reference utils.py:109-143 random in
    eval too) with a fixed chunk-folded key: deterministic across calls,
    different from the first-k window path."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.15)
    kw = dict(
        dataset="Cora", predictor="cn5", model="puregcn", mplayers=1,
        hiddim=16, batch_size=64, testbs=64, pad_deg=4, pad_deg2=4,
        linkbatchsize=64, gnndp=0.0, xdp=0.0, tdp=0.0, gnnedp=0.0,
        predp=0.0, preedp=0.0,
    )
    tr_s = Trainer(Config(**kw), ds)
    tr_w = Trainer(Config(eval_sampling=False, **kw), ds)
    state = tr_s.init_state(0)
    edges = np.asarray(ds.split_edge["valid"]["edge"])[:64]
    h = tr_s.encode(state.params, tr_s.g)
    a = tr_s._score_split(state, h, tr_s.g, edges, tr_s.adj2)
    b = tr_s._score_split(state, h, tr_s.g, edges, tr_s.adj2)
    np.testing.assert_array_equal(a, b)  # deterministic eval
    c = tr_w._score_split(state, h, tr_w.g, edges, tr_w.adj2)
    # pad_deg=4 caps many rows; sampled-vs-first-window must differ somewhere
    assert not np.allclose(a, c)


def test_eval_sampling_incomplete_family():
    """The SELF_BUILDING family (cn2/cn3/cn4) must get eval-time random
    sampling too: its internal sample_frame / gather_neighbors calls draw
    from the "sample" stream the Trainer now threads at eval (VERDICT r4
    weak #2; reference samples via tstdeg at eval, utils.py:109-143).
    Deterministic across calls, different from the first-k/strided path."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.15)
    kw = dict(
        dataset="Cora", predictor="cn2", model="puregcn", mplayers=1,
        hiddim=16, batch_size=64, testbs=64, pad_deg=4, pad_deg2=4,
        linkbatchsize=64, gnndp=0.0, xdp=0.0, tdp=0.0, gnnedp=0.0,
        predp=0.0, preedp=0.0, depth=1, trndeg=2, tstdeg=2,
    )
    tr_s = Trainer(Config(**kw), ds)
    tr_w = Trainer(Config(eval_sampling=False, **kw), ds)
    state = tr_s.init_state(0)
    edges = np.asarray(ds.split_edge["valid"]["edge"])[:64]
    h = tr_s.encode(state.params, tr_s.g)
    a = tr_s._score_split(state, h, tr_s.g, edges, tr_s.adj2)
    b = tr_s._score_split(state, h, tr_s.g, edges, tr_s.adj2)
    np.testing.assert_array_equal(a, b)  # deterministic eval
    c = tr_w._score_split(state, h, tr_w.g, edges, tr_w.adj2)
    assert not np.allclose(a, c)


def test_k3_config_override():
    """Config.k3 overrides cn6's A^3 row-gather width (0 = auto
    min(pad_deg2, 16)); the tbl3 ELL table and the SDDMM fallback's
    second-hop width follow it."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.15)
    kw = dict(
        dataset="Cora", predictor="cn6", model="puregcn", mplayers=1,
        hiddim=16, batch_size=64, testbs=64, pad_deg=8, pad_deg2=8,
        linkbatchsize=64, adj3_cap=64,
    )
    tr_auto = Trainer(Config(**kw), ds)
    assert tr_auto._k3_width() == 8  # min(pad_deg2=8, 16)
    tr_k = Trainer(Config(k3=4, **kw), ds)
    assert tr_k._k3_width() == 4
    if tr_k._use_ell:
        tr_k._refresh_ell(np.random.default_rng(0))
        assert tr_k._ell["tbl3"].shape[-1] == 4


def test_zero_batch_epoch_warns():
    """batch_size > train-edge count makes the drop-tail iterator run ZERO
    batches (reference PermIterator semantics) — train_epoch must say so
    loudly instead of silently never training (round-5 hardening; the
    generic preset fallback for registry-only predictors hits this on
    small stand-ins)."""
    ds = synthetic_dataset("Cora", seed=0, scale=0.15)
    cfg = Config(
        dataset="Cora", predictor="cn5", model="puregcn", mplayers=1,
        hiddim=16, batch_size=65536, testbs=64, pad_deg=8, pad_deg2=8,
        linkbatchsize=64)
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)
    with pytest.warns(RuntimeWarning, match="ZERO batches"):
        _, loss = tr.train_epoch(state, np.random.default_rng(0), 1)
    assert loss == 0.0
