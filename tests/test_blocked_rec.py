"""Blocked depth-0 recursion scorer (round 5): the (B, R) candidate block of
the incomplete family's recursion shares each anchor's window across its R
candidate edges (cn_incomplete._blocked_depth0).

Pins:
1. blocked == generic per-edge depth-0 forward on a deterministic config
   (eval mode, no dropout: windows are first-k, shared trivially), both
   1-hop (cn2) and higher-order (cn3), to float tolerance (the colnorm
   pre-reduction is a reassociation);
2. the full recursive forward (depth=1) which now routes through the
   blocked scorer still trains: finite losses, EMA stepping preserved;
3. capped rows: blocked stays an unbiased window estimator (values finite,
   deg/k weights intact).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocn_tpu.config import Config
from ocn_tpu.data.loaders import synthetic_dataset
from ocn_tpu.nn.predictors.cn_incomplete import IncompleteCNPredictor
from ocn_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def setup():
    ds = synthetic_dataset("Cora", seed=0, scale=0.15)
    cfg = Config(
        dataset="Cora", predictor="cn3", model="puregcn", mplayers=1,
        hiddim=16, batch_size=64, testbs=64, pad_deg=64, pad_deg2=64,
        linkbatchsize=64, gnndp=0.0, xdp=0.0, tdp=0.0, gnnedp=0.0,
        predp=0.0, preedp=0.0, depth=1, trndeg=4, tstdeg=4,
    )
    tr = Trainer(cfg, ds)
    return ds, tr


@pytest.mark.parametrize("higher", [False, True])
def test_blocked_matches_generic_depth0(setup, higher):
    ds, tr = setup
    n = ds.n_nodes
    rng = np.random.default_rng(3)
    b, r = 32, 4
    anchors = jnp.asarray(rng.integers(0, n, size=b), jnp.int32)
    cand = jnp.asarray(rng.integers(0, n, size=(b, r)), jnp.int32)
    pred = IncompleteCNPredictor(
        hidden=16, dropout=0.0, edrop=0.0, k=64, depth=1,
        higher_order=higher)
    x = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
    ei0 = jnp.zeros((2, 8), jnp.int32)
    variables = pred.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sample": jax.random.PRNGKey(2)},
        x, tr.g, ei0, False, adj2=tr.adj2)

    # generic per-edge depth-0 forward (eval mode: deterministic windows)
    ei = jnp.stack([
        jnp.broadcast_to(anchors[:, None], (b, r)).reshape(-1),
        cand.reshape(-1)])
    gen = pred.apply(variables, x, tr.g, ei, False, depth=0,
                     adj2=tr.adj2).reshape(b, r)

    blk = pred.apply(
        variables, x, tr.g, anchors, cand, False, tr.adj2,
        method=IncompleteCNPredictor._blocked_depth0)
    np.testing.assert_allclose(
        np.asarray(blk), np.asarray(gen), rtol=2e-4, atol=2e-5)


def test_recursive_forward_routes_blocked_and_trains(setup):
    ds, tr = setup
    state = tr.init_state(0)
    # snapshot before train_step donates the buffers
    n0 = [np.asarray(v) for v in jax.tree_util.tree_leaves(state.ema)]
    rng = np.random.default_rng(0)
    st = state
    for epoch in range(2):
        st, loss = tr.train_epoch(st, rng, epoch)
        assert np.isfinite(loss)
    # EMA stepping preserved: cn3 steps the shared buffer on the outer call
    # AND inside each of the 4 blocked recursion bodies (train mode)
    n1 = jax.tree_util.tree_leaves(st.ema)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(n0, n1))
    assert changed
    res = tr.evaluate(st)
    for k, v in res.items():
        assert all(np.isfinite(x) for x in v)


def test_blocked_capped_rows_finite(setup):
    """Capped anchors (k < deg): blocked windows keep the deg/k HT weights;
    outputs stay finite and non-degenerate."""
    ds, tr = setup
    n = ds.n_nodes
    rng = np.random.default_rng(5)
    deg = np.asarray(tr.g.deg)
    heavy = np.argsort(deg)[-32:]
    anchors = jnp.asarray(heavy, jnp.int32)
    cand = jnp.asarray(rng.integers(0, n, size=(32, 4)), jnp.int32)
    pred = IncompleteCNPredictor(
        hidden=16, dropout=0.0, edrop=0.0, k=4, depth=1, higher_order=True)
    x = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
    ei0 = jnp.zeros((2, 8), jnp.int32)
    variables = pred.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sample": jax.random.PRNGKey(2)},
        x, tr.g, ei0, False, adj2=tr.adj2)
    blk = pred.apply(
        variables, x, tr.g, anchors, cand, True, tr.adj2,
        method=IncompleteCNPredictor._blocked_depth0,
        rngs={"dropout": jax.random.PRNGKey(3),
              "sample": jax.random.PRNGKey(4)},
        mutable=["ema"])[0]
    assert np.isfinite(np.asarray(blk)).all()
