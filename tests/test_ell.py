"""ELL window tables (sparse/ell.py): the descriptor-rate gather redesign.

TPU gathers are descriptor-rate-bound (BENCH_NOTES.md round 2), so the
per-chunk (B, K) flat-position window gathers are re-laid-out as (B,) row
gathers of frozen (N, K) tables.  The tables must be a pure LAYOUT change:
with matching window offsets the math is bit-identical to the CSR window
path, including maskinput.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocn_tpu.config import Config
from ocn_tpu.data.loaders import synthetic_dataset
from ocn_tpu.ops.frame import gather_neighbors
from ocn_tpu.sparse import build as B
from ocn_tpu.sparse import ell as ELL
from ocn_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset("Cora", seed=0, scale=0.2)


def _cfg(ell, **kw):
    base = dict(
        dataset="Cora", predictor="cn5", model="puregcn", mplayers=1,
        hiddim=32, batch_size=256, testbs=256, maskinput=True,
        pad_deg=64, pad_deg2=192, linkbatchsize=64, adj2_cap=1024,
        gnndp=0.0, xdp=0.0, tdp=0.0, gnnedp=0.0, predp=0.0, preedp=0.0,
        ell_tables=ell,
    )
    base.update(kw)
    return Config(**base)


def _batch(tr, ds, seed=0):
    rng = np.random.default_rng(seed)
    e = ds.split_edge["train"]["edge"].shape[0]
    pos = np.asarray(ds.split_edge["train"]["edge"]).T
    neg = B.negative_sampling(ds.edge_index, ds.n_nodes, e, rng)
    idx = rng.permutation(e)[: tr.cfg.batch_size]
    return tr.prepare_batch(pos[:, idx], neg[:, idx], idx)


def test_gather_equality_zero_offsets(ds):
    """With off == 0 the ELL row gather must reproduce the key=None CSR
    window gather exactly — ids, weights, and feature-window positions —
    including rows with degree > k (capped, deterministic first-k)."""
    g = ds.as_graph()
    k = 8  # well below maxdeg=37: capping binds
    off = np.zeros(g.n_nodes, np.int32)
    tbl = ELL.build_ell(g.packed, g.indptr, jnp.asarray(off), k)
    ge = g.with_ell(tbl, jnp.asarray(off))
    nodes = jnp.asarray(
        np.random.default_rng(1).integers(0, g.n_nodes, 512).astype(np.int32))
    a = gather_neighbors(g, nodes, k, key=None)
    b = gather_neighbors(ge, nodes, k, key=None)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_array_equal(np.asarray(a.w), np.asarray(b.w))
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


def test_subwindow_width(ds):
    """k < ell_k takes the leading lanes of the frozen window (dual-K small
    body / pad_deg2_dst): must equal a fresh k-wide ELL at the same offsets
    for rows that fit, and carry the deg/k reweight for capped rows."""
    g = ds.as_graph()
    off = np.zeros(g.n_nodes, np.int32)
    tbl = ELL.build_ell(g.packed, g.indptr, jnp.asarray(off), 16)
    ge = g.with_ell(tbl, jnp.asarray(off))
    nodes = jnp.asarray(np.arange(300, dtype=np.int32))
    a = gather_neighbors(g, nodes, 4, key=None)
    b = gather_neighbors(ge, nodes, 4, key=None)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_array_equal(np.asarray(a.w), np.asarray(b.w))


@pytest.mark.parametrize("mask", [False, True])
def test_step_exactness_uncapped(ds, mask):
    """On a graph where no cap binds (pad_deg > maxdeg, pad_deg2 > max A^2
    degree), the ELL path must produce the EXACT loss of the plain path for
    the same inputs — window offsets are all zero, so the frozen sample is
    the full row; maskinput must clear the same entries in both layouts."""
    tr_e = Trainer(_cfg(True, maskinput=mask), ds)
    tr_p = Trainer(_cfg(False, maskinput=mask), ds)
    assert tr_e._use_ell
    tr_e._refresh_ell(np.random.default_rng(7))
    pe, ne, mpe, _, _ = _batch(tr_e, ds)
    pp, nn, mpp, _, _ = _batch(tr_p, ds)
    assert isinstance(mpe, dict) and not isinstance(mpp, dict)
    key = jax.random.PRNGKey(3)
    _, le = tr_e.train_step(tr_e.init_state(0), pe, ne, mpe, key)
    _, lp = tr_p.train_step(tr_p.init_state(0), pp, nn, mpp, key)
    np.testing.assert_allclose(float(le), float(lp), rtol=0, atol=0)


def test_mask_positions_host_math(ds):
    """mask_ell_flat_positions: in-window directions map to row*k+lane with
    the partner id as cleared value; out-of-window directions return -1."""
    g = ds.as_graph()
    ip = np.asarray(g.indptr)
    col = np.asarray(g.col)
    edges = np.asarray(ds.split_edge["train"]["edge"]).T[:, :50]
    e2p = np.asarray(B.edge_to_nnz_positions(ip, col, edges))
    mp = np.maximum(e2p.reshape(-1), 0).astype(np.int32)
    k = 8
    off = ELL.draw_offsets(ip[1:] - ip[:-1], k, np.random.default_rng(0))
    flat, cleared = ELL.mask_ell_flat_positions(edges, mp, ip, off, k)
    rows = np.stack([edges[0], edges[1]], 1).ravel()
    partners = np.stack([edges[1], edges[0]], 1).ravel()
    for i in range(flat.shape[0]):
        lane = int(mp[i]) - int(ip[rows[i]]) - int(off[rows[i]])
        if 0 <= lane < k:
            assert flat[i] == rows[i] * k + lane
            # the CSR entry at that position IS the partner column
            assert col[mp[i]] == partners[i] == cleared[i]
        else:
            assert flat[i] == -1


def test_train_epoch_rng_stream_neutral(ds):
    """ell_tables must not shift the main epoch rng stream: the first batch
    of an epoch is identical between ell on/off runs."""
    tr_e = Trainer(_cfg(True), ds)
    tr_p = Trainer(_cfg(False), ds)
    se, le = tr_e.train_epoch(tr_e.init_state(0), np.random.default_rng(5), 1)
    sp, lp = tr_p.train_epoch(tr_p.init_state(0), np.random.default_rng(5), 1)
    np.testing.assert_allclose(float(le), float(lp), rtol=0, atol=0)


def test_split_with_ell_runs(ds):
    cfg = _cfg(True, k_small=8, pad_deg=16, losstrick="simple")
    tr = Trainer(cfg, ds)
    assert tr._split is not None and tr._use_ell
    state = tr.init_state(0)
    state, loss = tr.train_epoch(state, np.random.default_rng(2), 1)
    assert np.isfinite(loss)


def test_cn2_ell_exactness(ds):
    """Round 3 (VERDICT r2 item 5): the self-building family's internal
    gathers ride the ELL tables too.  cn2 has no A^2 graph (only tbl1 is
    built); with preedp=0 (no DropAdj detach) and pad_deg above the max
    degree the table is exact, so the epoch loss must be identical with
    tables on vs off."""
    losses = {}
    for ell in (False, True):
        tr = Trainer(_cfg(ell, predictor="cn2", pad_deg=64, depth=1,
                          trndeg=4, tstdeg=8, linkbatchsize=32), ds)
        assert tr.adj2 is None and tr._use_ell == ell
        state = tr.init_state(0)
        state, losses[ell] = tr.train_epoch(
            state, np.random.default_rng(0), epoch=1)
    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)


def test_cn2_rec_k_width_invariance(ds):
    """rec_k (round 3): the recursion's frame width.  At rec_k >= max degree
    the narrower recursion frame is exact, so the loss must match the
    full-width run; a binding rec_k still trains finitely."""
    kw = dict(predictor="cn2", pad_deg=64, depth=1, trndeg=4, tstdeg=8,
              linkbatchsize=32)
    losses = {}
    for rk in (0, 40, 8):  # maxdeg = 37 on this graph: 40 is exact, 8 binds
        tr = Trainer(_cfg(True, rec_k=rk, **kw), ds)
        state = tr.init_state(0)
        state, losses[rk] = tr.train_epoch(
            state, np.random.default_rng(0), epoch=1)
        assert np.isfinite(losses[rk])
    np.testing.assert_allclose(losses[40], losses[0], rtol=1e-6)
    # the binding cap is an estimator change, not an explosion
    assert abs(losses[8] - losses[0]) < 1.0


def test_sentinel_scatter_is_identity():
    """Round-3 advisor finding: JAX wraps negative indices BEFORE the
    mode="drop" OOB check, so a -1 sentinel scatter would silently clobber
    the table's last entry.  apply_ell_mask must be a bit-identical no-op
    for an all-sentinel (-1) mask, and for the positive-OOB sentinel n*k."""
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(1, 2**30, size=(7, 5), dtype=np.int64)
                      .astype(np.int32))
    for sentinel in (-1, 7 * 5):
        flat = jnp.full((11,), sentinel, jnp.int32)
        out = ELL.apply_ell_mask(tbl, flat, jnp.zeros((11,), jnp.int32))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(tbl))
    # and a mixed mask only touches the requested position
    flat = jnp.asarray(np.array([-1, 12, -1], np.int32))
    out = ELL.apply_ell_mask(tbl, flat, jnp.zeros((3,), jnp.int32))
    want = np.asarray(tbl).copy().reshape(-1)
    want[12] = 0
    np.testing.assert_array_equal(np.asarray(out).reshape(-1), want)


def test_route_ell_mask_sentinel_is_positive_oob():
    """route_ell_mask's unused lanes must carry the positive-OOB sentinel
    rows_per*k (NOT -1): a device scatter with an all-sentinel mask must
    leave the local table shard bit-identical even when every row's degree
    exceeds the table width."""
    from ocn_tpu.parallel.sharded_graph import route_ell_mask

    rows_per, k, ndev, cap = 6, 4, 2, 8
    me, mc = route_ell_mask(
        np.full((10,), -1, np.int64), np.zeros((10,), np.int32),
        ndev, rows_per, k, cap)
    assert (me == rows_per * k).all()
    rng = np.random.default_rng(1)
    shard = jnp.asarray(
        rng.integers(1, 2**30, size=(rows_per, k), dtype=np.int64)
        .astype(np.int32))
    out = (shard.reshape(-1).at[jnp.asarray(me[0])]
           .set(jnp.asarray(mc[0]), mode="drop").reshape(rows_per, k))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(shard))
    # routing a REAL position still lands on the right device/lane
    g = np.array([1 * k + 2, (rows_per + 3) * k + 1], np.int64)  # dev0, dev1
    me, mc = route_ell_mask(g, np.array([7, 9], np.int32),
                            ndev, rows_per, k, cap)
    assert me[0][0] == 1 * k + 2 and mc[0][0] == 7
    assert me[1][0] == 3 * k + 1 and mc[1][0] == 9
    assert (me[0][1:] == rows_per * k).all()


def test_cn3_adj3_ell_gather_exactness(ds):
    """cn6's A^3 table (tbl3): with zero offsets the ELL row gather must
    reproduce the plain (key=None) CSR window gather of adj3 exactly, so
    cn3_frame built against adj3.with_ell is bit-identical — including
    capped rows (both layouts take the first k3 entries)."""
    from ocn_tpu.ops.frame import cn3_frame, cn_frames

    tr = Trainer(_cfg(True, predictor="cn6", pad_deg2=64), ds)
    g, adj3 = tr.g, tr.adj3
    assert adj3 is not None
    k3 = tr._k3_width()
    off = np.zeros(g.n_nodes, np.int32)
    tbl3 = ELL.build_ell(adj3.packed, adj3.indptr, jnp.asarray(off), k3)
    a3e = adj3.with_ell(tbl3, jnp.asarray(off))
    rng = np.random.default_rng(3)
    edges = jnp.asarray(rng.integers(0, g.n_nodes, (2, 64)).astype(np.int32))
    cn1, cn2, src = cn_frames(
        g, edges, k=16, k2=tr.cfg.pad_deg2, adj2=tr.adj2, with_src=True)
    a = cn3_frame(g, edges, src, k2=k3, k3=16, adj3=adj3)
    b = cn3_frame(g, edges, src, k2=k3, k3=16, adj3=a3e)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_array_equal(np.asarray(a.val), np.asarray(b.val))


def test_cn6_refresh_builds_tbl3_and_trains(ds):
    """_refresh_ell must build the A^3 table for cn6 and the train step must
    run with it attached (ell3 in the prepare_batch aux dict)."""
    tr = Trainer(_cfg(True, predictor="cn6", pad_deg2=64), ds)
    assert tr._use_ell
    tr._refresh_ell(np.random.default_rng(7))
    assert "tbl3" in tr._ell and tr._ell["tbl3"].shape == (
        ds.n_nodes, tr._k3_width())
    pe, ne, mpe, ip, inn = _batch(tr, ds)
    assert "ell3" in mpe
    _, loss = tr.train_step(tr.init_state(0), pe, ne, mpe,
                            jax.random.PRNGKey(3), ip, inn)
    assert np.isfinite(float(loss))
