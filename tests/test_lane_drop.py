"""Lane-mask DropAdj (VERDICT r3 item 6): preedp for the incomplete-CN
family applied as Bernoulli lane masks on the gathered windows, keeping the
packed/ELL gather layout attached (value-mutation DropAdj detaches it and
costs the family its ~5.7x fast path — BENCH_NOTES r3).

Contract: same MARGINAL estimator as Graph.drop_edges — every adjacency-entry
occurrence is kept w.p. 1-p with 1/(1-p) rescale, so the expected frame
values (and membership-gated CN/residual values) of the two implementations
are equal.  The correlation structure differs (a row gathered twice re-draws
its masks) — documented in PARITY.md, not tested for.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocn_tpu.config import Config
from ocn_tpu.data.loaders import synthetic_dataset
from ocn_tpu.ops.frame import cn_residual_frames, gather_neighbors
from ocn_tpu.sparse import ell as ELL
from ocn_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset("Cora", seed=0, scale=0.2)


def test_lane_drop_marginal_matches_value_mutation(ds):
    """E[frame values] under lane-mask dropout == E[frame values] under
    Graph.drop_edges, per lane, on the cn/res1/res2 outputs that feed the
    cn2 math.  Deterministic windows (key=None) and k >= max degree keep the
    lane layout identical across draws, so the means are lane-comparable."""
    g = ds.as_graph()
    assert g.packed is not None
    k, p = 40, 0.35  # max degree 37: nothing capped
    edges = jnp.asarray(np.asarray(ds.split_edge["train"]["edge"][:96]).T)

    def lane_path(key):
        cn, r1, r2 = cn_residual_frames(g, edges, k, None, drop=(key, p))
        return cn.val, r1.val, r2.val

    def value_path(key):
        g2 = g.drop_edges(key, p)
        cn, r1, r2 = cn_residual_frames(g2, edges, k, None)
        return cn.val, r1.val, r2.val

    n = 1536
    keys = jax.random.split(jax.random.PRNGKey(0), n)

    def mean_of(fn):
        outs = jax.jit(lambda ks: jax.lax.map(fn, ks))(keys)
        return [np.asarray(o).mean(0) for o in outs]

    m_lane = mean_of(lane_path)
    m_val = mean_of(value_path)
    cn0, r10, r20 = cn_residual_frames(g, edges, k, None)
    for a, b, base, name in zip(
            m_lane, m_val,
            (np.asarray(cn0.val), np.asarray(r10.val), np.asarray(r20.val)),
            ("cn", "res1", "res2")):
        # per-lane: Bernoulli noise se ~ sqrt(p(1-p)/n)*|w|/(1-p) ~ 0.02
        np.testing.assert_allclose(a, b, atol=0.12, err_msg=name)
        # aggregate over all lanes: the two estimators share one mean
        np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.02,
                                   err_msg=name)
        # sanity: dropout really engaged (cn lanes shrink toward (1-p)*base)
        if name == "cn":
            assert a.sum() < 0.9 * base.sum()


def test_lane_drop_rides_the_ell_table(ds):
    """gather_neighbors with drop= must still read the frozen ELL windows:
    the returned ids of kept lanes come from the table (non-zero offsets),
    not from the CSR fallback's offset-0 window."""
    g = ds.as_graph()
    k = 8
    rng = np.random.default_rng(3)
    deg = np.asarray(g.deg)
    off = ELL.draw_offsets(deg, k, rng)
    assert (off > 0).any()
    tbl = ELL.build_ell(g.packed, g.indptr, jnp.asarray(off), k)
    g_ell = g.with_ell(tbl, jnp.asarray(off))
    nodes = jnp.asarray(np.where(deg > k)[0][:64].astype(np.int32))
    assert (off[np.asarray(nodes)] > 0).any()

    plain = gather_neighbors(g_ell, nodes, k, None)
    dropped = gather_neighbors(g_ell, nodes, k, None,
                               drop=(jax.random.PRNGKey(1), 0.3))
    np.testing.assert_array_equal(np.asarray(dropped.ids),
                                  np.asarray(plain.ids))
    w_plain, w_drop = np.asarray(plain.w), np.asarray(dropped.w)
    kept = w_drop != 0
    assert kept.any() and (~kept & (w_plain != 0)).any()
    np.testing.assert_allclose(w_drop[kept], w_plain[kept] / 0.7, rtol=1e-6)


def test_cn2_preedp_trains_with_ell_attached(ds):
    """e2e: cn2 with preedp>0 keeps _use_ell and trains finitely on the
    lane-drop path; lane_dropadj=False (value mutation) also still works."""
    losses = {}
    for lane in (True, False):
        cfg = Config(
            dataset="Cora", predictor="cn2", model="puregcn", mplayers=1,
            hiddim=32, batch_size=256, testbs=256, maskinput=True,
            pad_deg=64, pad_deg2=192, linkbatchsize=32, depth=1, trndeg=4,
            tstdeg=8, preedp=0.4, predp=0.1, gnndp=0.0, xdp=0.0, tdp=0.0,
            gnnedp=0.0, ell_tables=True, lane_dropadj=lane,
        )
        tr = Trainer(cfg, ds)
        assert tr._use_ell
        state = tr.init_state(0)
        state, losses[lane] = tr.train_epoch(
            state, np.random.default_rng(0), epoch=1)
        assert np.isfinite(losses[lane])
    # the two DropAdj implementations share the estimator but draw different
    # streams; both must land in the same loss ballpark
    assert abs(losses[True] - losses[False]) < 1.0
