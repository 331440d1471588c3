"""A^2 precompute ("gather" two-hop mode) vs on-the-fly SDDMM parity."""
import numpy as np
import jax.numpy as jnp

from ocn_tpu.ops.frame import cn_frames
from ocn_tpu.sparse import build as B
from ocn_tpu.sparse.csr import Graph
from tests.test_frame import frame_to_dense, random_graph


def build_adj2(g, cap=0):
    from ocn_tpu.sparse.csr import graph_from_numpy

    ip = np.asarray(g.indptr)
    col = np.asarray(g.col)[: int(ip[-1])]
    ip2, col2, val2 = B.adj2_csr(ip, col, g.n_nodes, cap)
    return graph_from_numpy(ip2, col2, g.n_nodes, val2)


def test_adj2_csr_matches_dense(rng):
    g, dense = random_graph(rng)
    ip, col, val = B.adj2_csr(np.asarray(g.indptr), np.asarray(g.col), g.n_nodes, 0)
    a2 = np.zeros_like(dense)
    for j in range(g.n_nodes):
        a2[j, col[ip[j]:ip[j+1]]] = val[ip[j]:ip[j+1]]
    np.testing.assert_allclose(a2, dense @ dense)


def test_gather_mode_matches_sddmm(rng):
    g, dense = random_graph(rng)
    adj2 = build_adj2(g)
    edges = jnp.asarray(rng.integers(0, g.n_nodes, size=(2, 15)))
    for counts in (False, True):
        _, c_sddmm = cn_frames(g, edges, k=g.n_nodes, cn2_counts=counts)
        _, c_gather = cn_frames(g, edges, k=g.n_nodes, cn2_counts=counts, adj2=adj2)
        np.testing.assert_allclose(
            frame_to_dense(c_gather), frame_to_dense(c_sddmm), err_msg=f"counts={counts}"
        )


def test_gather_mode_maskinput_correction(rng):
    """With the target edge masked, the corrected gather-mode cn2 must match
    the SDDMM mode computed on the masked adjacency for paths through i."""
    g, dense = random_graph(rng, n=25, p=0.3)
    ei = np.stack(np.nonzero(np.triu(dense, 1)))
    target = ei[:, :4]  # mask the first 4 edges; score those same edges
    pos = B.edge_to_nnz_positions(np.asarray(g.indptr), np.asarray(g.col), target)
    gm = g.mask_edges(jnp.asarray(pos.ravel()))
    adj2 = build_adj2(g)  # stale A^2 (built pre-mask, as in training)

    d2 = dense.copy()
    for (u, v) in target.T:
        d2[u, v] = d2[v, u] = 0

    edges = jnp.asarray(target)
    corr = jnp.ones((4,))
    _, got = cn_frames(gm, edges, k=g.n_nodes, cn2_counts=True, adj2=adj2,
                       self_corr=corr)
    # reference semantics: A^2 from the fully masked adjacency
    _, want_exact = cn_frames(gm, edges, k=g.n_nodes, cn2_counts=True)
    got_d = frame_to_dense(got)
    want_d = frame_to_dense(want_exact)
    # the correction removes the dominant j-i-k self-path term exactly; the
    # only residual differences are paths through OTHER masked batch edges
    diff = np.abs(got_d - want_d)
    # each residual difference must be attributable to a masked edge pair
    assert (diff <= 2.0).all()
    # and without any other masked edges (single-edge mask) it is exact:
    pos1 = B.edge_to_nnz_positions(np.asarray(g.indptr), np.asarray(g.col),
                                   target[:, :1])
    gm1 = g.mask_edges(jnp.asarray(pos1.ravel()))
    e1 = jnp.asarray(target[:, :1])
    _, got1 = cn_frames(gm1, e1, k=g.n_nodes, cn2_counts=True, adj2=adj2,
                        self_corr=jnp.ones((1,)))
    _, want1 = cn_frames(gm1, e1, k=g.n_nodes, cn2_counts=True)
    np.testing.assert_allclose(frame_to_dense(got1), frame_to_dense(want1))


def test_cn3_gather_matches_sddmm(rng):
    """cn6's 3-hop frame via precomputed row-capped A^3 == on-the-fly SDDMM."""
    from ocn_tpu.ops.frame import cn3_frame, gather_neighbors
    from ocn_tpu.sparse.csr import graph_from_numpy

    g, dense = random_graph(rng)
    n = g.n_nodes
    ip = np.asarray(g.indptr)
    col = np.asarray(g.col)[: int(ip[-1])]
    ip2, col2, val2 = B.adj2_csr(ip, col, n, 0)
    ip3, col3, val3 = B.spgemm_csr(ip2, col2, val2, ip, col, None, n, 0)
    adj3 = graph_from_numpy(ip3, col3, n, val3)

    edges = jnp.asarray(rng.integers(0, n, size=(2, 12)))
    src = gather_neighbors(g, edges[0], k=n)
    for counts in (False, True):
        c_sddmm = cn3_frame(g, edges, src, k2=n, k3=n, counts=counts)
        c_gather = cn3_frame(g, edges, src, k2=n, k3=n, counts=counts, adj3=adj3)
        np.testing.assert_allclose(
            frame_to_dense(c_gather), frame_to_dense(c_sddmm),
            err_msg=f"counts={counts}")


def test_gather_only_graph_bit_identical(rng):
    """Round 4 (VERDICT r3 item 4, ppa adj2_cap memory plan): a gather-only
    A^2 graph (indptr/deg/packed only — 4 B/entry) must produce bit-identical
    CN frames to the full-layout graph, across window/iid sampling and the
    dual-K sub-width read."""
    from ocn_tpu.ops.frame import gather_neighbors
    from ocn_tpu.sparse.csr import graph_from_numpy

    g, dense = random_graph(rng)
    ip = np.asarray(g.indptr)
    col = np.asarray(g.col)[: int(ip[-1])]
    ip2, col2, val2 = B.adj2_csr(ip, col, g.n_nodes, 0)
    full = graph_from_numpy(ip2, col2, g.n_nodes, val2)
    lean = graph_from_numpy(ip2, col2, g.n_nodes, val2, gather_only=True)
    assert lean.col is None and lean.val is None and lean.row is None
    assert lean.packed is not None
    import jax

    nodes = jnp.asarray(rng.integers(0, g.n_nodes, size=32))
    for kw in (dict(k=8), dict(k=4), dict(k=8, key=jax.random.PRNGKey(0)),
               dict(k=8, key=jax.random.PRNGKey(0), sampling="iid")):
        a = gather_neighbors(full, nodes, **kw)
        b = gather_neighbors(lean, nodes, **kw)
        np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
        np.testing.assert_array_equal(np.asarray(a.w), np.asarray(b.w))
    edges = jnp.asarray(rng.integers(0, g.n_nodes, size=(2, 15)))
    for counts in (False, True):
        _, c_full = cn_frames(g, edges, k=g.n_nodes, cn2_counts=counts,
                              adj2=full)
        _, c_lean = cn_frames(g, edges, k=g.n_nodes, cn2_counts=counts,
                              adj2=lean)
        np.testing.assert_allclose(
            frame_to_dense(c_lean), frame_to_dense(c_full))
