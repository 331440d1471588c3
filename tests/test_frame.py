"""Unit tests for the candidate-frame CN ops against dense NumPy references.

These are the tests the reference never had (SURVEY.md §4): every kernel is
checked against a brute-force dense computation of the same math.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ocn_tpu.sparse.build import csr_from_edge_index, edge_to_nnz_positions
from ocn_tpu.sparse.csr import graph_from_numpy
from ocn_tpu.ops.frame import CNFrame, cn_frames, gather_neighbors
from ocn_tpu.ops import ortho
from ocn_tpu.ops.spmm import spmm, gcn_norm_conv


def random_graph(rng, n=30, p=0.15):
    dense = rng.random((n, n)) < p
    dense = np.triu(dense, 1)
    dense = dense | dense.T
    ei = np.stack(np.nonzero(dense))
    indptr, col = csr_from_edge_index(ei, n, symmetrize=False)
    return graph_from_numpy(indptr, col, n), dense.astype(np.float64)


def frame_to_dense(cn):
    """Materialize a CNFrame as a dense (B, N) matrix, summing duplicates."""
    b, k = cn.ids.shape
    out = np.zeros((b, cn.n_nodes))
    ids = np.asarray(cn.ids)
    val = np.asarray(cn.val)
    for i in range(b):
        for j in range(k):
            if ids[i, j] < cn.n_nodes and val[i, j] != 0:
                out[i, ids[i, j]] += val[i, j]
    return out


def test_gather_exact(rng):
    g, dense = random_graph(rng)
    nodes = jnp.arange(g.n_nodes)
    fr = gather_neighbors(g, nodes, k=g.n_nodes)  # k >= max degree => exact
    got = frame_to_dense(CNFrame(fr.ids, fr.w, g.n_nodes))
    np.testing.assert_allclose(got, dense)


def test_cn1_exact_matches_dense(rng):
    g, dense = random_graph(rng)
    edges = rng.integers(0, g.n_nodes, size=(2, 17))
    cn1, cn2 = cn_frames(g, jnp.asarray(edges), k=g.n_nodes)
    # dense reference: cn1[e, k] = A[i,k]*A[j,k]
    want1 = dense[edges[0]] * dense[edges[1]]
    np.testing.assert_allclose(frame_to_dense(cn1), want1)
    # cn2[e, k] = A[i,k] * (A^2[j,k] > 0)  (binary, torch_sparse-stack style)
    a2 = dense @ dense
    want2 = dense[edges[0]] * (a2[edges[1]] > 0)
    np.testing.assert_allclose(frame_to_dense(cn2), want2)


def test_cn2_counts_and_exact_two_hop(rng):
    g, dense = random_graph(rng)
    edges = rng.integers(0, g.n_nodes, size=(2, 11))
    a2 = dense @ dense
    cn1, cn2 = cn_frames(g, jnp.asarray(edges), k=g.n_nodes, cn2_counts=True)
    want = dense[edges[0]] * a2[edges[1]]
    np.testing.assert_allclose(frame_to_dense(cn2), want)
    # SPD-style exactly-distance-2 (reference SPD.py:65-95): zero where 1-hop
    _, cn2x = cn_frames(
        g, jnp.asarray(edges), k=g.n_nodes, cn2_counts=True, exact_two_hop=True
    )
    wantx = np.where(dense[edges[1]] > 0, 0.0, want)
    np.testing.assert_allclose(frame_to_dense(cn2x), wantx)


def test_cn2_chunked_matches_unchunked(rng):
    g, _ = random_graph(rng)
    edges = jnp.asarray(rng.integers(0, g.n_nodes, size=(2, 13)))
    _, a = cn_frames(g, edges, k=g.n_nodes, cn2_counts=True)
    _, b = cn_frames(g, edges, k=g.n_nodes, cn2_counts=True, count2_chunk=4)
    np.testing.assert_allclose(np.asarray(a.val), np.asarray(b.val))


def test_maskinput_removes_edges(rng):
    g, dense = random_graph(rng)
    ei = np.stack(np.nonzero(np.triu(dense, 1)))
    pos = edge_to_nnz_positions(np.asarray(g.indptr), np.asarray(g.col), ei)
    assert (pos >= 0).all()
    masked = g.mask_edges(jnp.asarray(pos[:3].ravel()))
    d2 = dense.copy()
    for (u, v) in ei[:, :3].T:
        d2[u, v] = d2[v, u] = 0
    edges = jnp.asarray(ei[:, :5])
    cn1, _ = cn_frames(masked, edges, k=g.n_nodes, with_cn2=True)
    want = d2[ei[0, :5]] * d2[ei[1, :5]]
    np.testing.assert_allclose(frame_to_dense(cn1), want)


def test_spmm_aggrs(rng):
    g, dense = random_graph(rng)
    x = rng.standard_normal((g.n_nodes, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(spmm(g, jnp.asarray(x), "sum")), dense @ x, rtol=1e-5, atol=1e-5
    )
    deg = dense.sum(1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(spmm(g, jnp.asarray(x), "mean")),
        (dense @ x) / np.maximum(deg, 1),
        rtol=1e-5, atol=1e-5,
    )
    # max: max over neighbors of x, 0 for empty rows
    want = np.zeros_like(x)
    for u in range(g.n_nodes):
        nbr = np.nonzero(dense[u])[0]
        if len(nbr):
            want[u] = x[nbr].max(0)
    np.testing.assert_allclose(np.asarray(spmm(g, jnp.asarray(x), "max")), want,
                               rtol=1e-5, atol=1e-5)


def test_gcn_norm_conv(rng):
    g, dense = random_graph(rng)
    x = rng.standard_normal((g.n_nodes, 4)).astype(np.float32)
    norm = 1.0 / np.sqrt(1 + dense.sum(1, keepdims=True))
    xn = norm * x
    want = norm * (dense @ xn + xn)
    np.testing.assert_allclose(
        np.asarray(gcn_norm_conv(g, jnp.asarray(x))), want, rtol=1e-5, atol=1e-5
    )


def test_orthogonalize_matches_dense_reference(rng):
    """End-to-end check of the cn5 pipeline vs a dense NumPy re-derivation of
    reference model.py:2261-2423 (incl. the colsum==1 quirk, EMA, max-scale)."""
    g, dense = random_graph(rng)
    edges = rng.integers(0, g.n_nodes, size=(2, 9))
    cn1, cn2 = cn_frames(g, jnp.asarray(edges), k=g.n_nodes)
    d1, d2 = frame_to_dense(cn1), frame_to_dense(cn2)

    # dense reference math
    cs = d1.sum(0)
    cs_rep = np.where(cs == 0, 1.0, cs)
    inv = np.where(cs_rep != 1, 1.0 / cs_rep, 0.0)
    nd1 = d1 * inv
    inner0 = float((d2 * nd1).sum())  # first training batch: ema == inner0
    scale = np.abs(nd1).max()
    nip = inner0 / scale if scale > 0 else inner0
    od2 = d2 - nip * nd1
    cs2 = od2.sum(0)
    od2 = od2 / np.where(cs2 == 0, 1.0, cs2)

    ncn1, ocn2, ema, n = ortho.orthogonalize(
        cn1, cn2, jnp.zeros(()), jnp.zeros((), jnp.int32), training=True
    )
    assert int(n) == 1
    np.testing.assert_allclose(float(ema), inner0, rtol=1e-5)
    np.testing.assert_allclose(frame_to_dense(ncn1), nd1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(frame_to_dense(ocn2), od2, rtol=1e-4, atol=1e-5)

    # eval: stored EMA reused, state unchanged
    _, _, ema2, n2 = ortho.orthogonalize(cn1, cn2, ema, n, training=False)
    assert float(ema2) == float(ema) and int(n2) == 1


def test_frame_matmul_custom_vjp_grads(rng):
    """The sorted-segment backward must match autodiff of the naive einsum."""
    import jax

    n, b, k, h = 50, 7, 5, 8
    ids = jnp.asarray(rng.integers(0, n + 1, size=(b, k)), jnp.int32)  # incl sentinel
    val = jnp.asarray(rng.random((b, k)).astype(np.float32))
    val = jnp.where(ids == n, 0.0, val)
    x = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    cn = CNFrame(ids, val, n)

    def naive(xx, vv):
        rows = xx[jnp.minimum(ids, n - 1)]
        return jnp.sum(jnp.einsum("bk,bkh->bh", vv, rows) ** 2)

    def ours(xx, vv):
        return jnp.sum(CNFrame(ids, vv, n).matmul(xx) ** 2)

    gx0, gv0 = jax.grad(naive, argnums=(0, 1))(x, val)
    gx1, gv1 = jax.grad(ours, argnums=(0, 1))(x, val)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv0), np.asarray(gv1), rtol=1e-4, atol=1e-5)


def test_matmul_shared_matches_individual(rng):
    import jax

    from ocn_tpu.ops.frame import matmul_shared

    n, b, k, h = 40, 6, 4, 8
    ids = jnp.asarray(rng.integers(0, n + 1, size=(b, k)), jnp.int32)
    v1 = jnp.where(ids == n, 0.0, jnp.asarray(rng.random((b, k)), jnp.float32))
    v2 = jnp.where(ids == n, 0.0, jnp.asarray(rng.random((b, k)), jnp.float32))
    x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    f1, f2 = CNFrame(ids, v1, n), CNFrame(ids, v2, n)
    a1, a2 = matmul_shared([f1, f2], x)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(f1.matmul(x)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(f2.matmul(x)), rtol=1e-5)

    # gradient parity vs separate matmuls
    def shared_loss(xx, w1, w2):
        o1, o2 = matmul_shared([CNFrame(ids, w1, n), CNFrame(ids, w2, n)], xx)
        return jnp.sum(o1 ** 2) + jnp.sum(o2 * 3.0)

    def sep_loss(xx, w1, w2):
        o1 = CNFrame(ids, w1, n).matmul(xx)
        o2 = CNFrame(ids, w2, n).matmul(xx)
        return jnp.sum(o1 ** 2) + jnp.sum(o2 * 3.0)

    g0 = jax.grad(shared_loss, argnums=(0, 1, 2))(x, v1, v2)
    g1 = jax.grad(sep_loss, argnums=(0, 1, 2))(x, v1, v2)
    for a, b_ in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_matmul_saverows_matches_prep(rng):
    """The rows-residual VJP (OCN_TPU_SAVE_ROWS path) must equal the
    recompute-in-backward one exactly — same math, different residual set."""
    import jax

    from ocn_tpu.ops.frame import (
        _frame_matmul_multi_prep,
        _frame_matmul_multi_saverows,
        frame_index,
    )

    n, b, k, h, p = 40, 6, 4, 8, 2
    ids = jnp.asarray(rng.integers(0, n + 1, size=(b, k)), jnp.int32)
    vals = jnp.asarray(rng.random((p, b, k)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    fidx = frame_index(ids, n)

    def loss(fn, xx, vv):
        out = fn(xx, ids, vv, fidx.perm, fidx.seg, fidx.rowidx, n)
        return jnp.sum(out ** 2)

    o0 = _frame_matmul_multi_prep(x, ids, vals, fidx.perm, fidx.seg, fidx.rowidx, n)
    o1 = _frame_matmul_multi_saverows(x, ids, vals, fidx.perm, fidx.seg, fidx.rowidx, n)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), rtol=1e-6)
    g0 = jax.grad(lambda xx, vv: loss(_frame_matmul_multi_prep, xx, vv), (0, 1))(x, vals)
    g1 = jax.grad(lambda xx, vv: loss(_frame_matmul_multi_saverows, xx, vv), (0, 1))(x, vals)
    for a, b_ in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6)


def test_gather_packed_matches_unpacked(rng):
    """Graphs with small-integer values carry a packed col|val array
    (csr.py); the one-slice decode path must equal the two-slice one."""
    import jax

    from ocn_tpu.ops.frame import gather_neighbors
    from ocn_tpu.sparse.csr import graph_from_numpy

    n = 50
    deg = rng.integers(0, 12, n)
    ip = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    col = rng.integers(0, n, ip[-1]).astype(np.int32)
    col = np.concatenate(
        [np.sort(col[ip[i]:ip[i + 1]]) for i in range(n)]) if ip[-1] else col
    val = rng.integers(1, 9, ip[-1]).astype(np.float32)
    g = graph_from_numpy(ip, col, n, val)
    assert g.packed is not None
    gu = g.with_values(g.val)  # drops packed, values unchanged
    assert gu.packed is None
    nodes = jnp.asarray(rng.integers(0, n, 16), jnp.int32)
    key = jax.random.PRNGKey(3)
    for k in (4, 8):
        a = gather_neighbors(g, nodes, k, key)
        b = gather_neighbors(gu, nodes, k, key)
        np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
        np.testing.assert_allclose(np.asarray(a.w), np.asarray(b.w))
        np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))

    # maskinput: packed survives mask_edges (value bits cleared, ids kept)
    if int(ip[-1]) >= 4:
        posn = jnp.asarray(rng.choice(int(ip[-1]), 4, replace=False), jnp.int32)
        gm, gum = g.mask_edges(posn), gu.mask_edges(posn)
        assert gm.packed is not None
        am = gather_neighbors(gm, nodes, 8, key)
        bm = gather_neighbors(gum, nodes, 8, key)
        np.testing.assert_array_equal(np.asarray(am.ids), np.asarray(bm.ids))
        np.testing.assert_allclose(np.asarray(am.w), np.asarray(bm.w))


def test_frame_index_entry_col_sum(rng):
    """entry_col_sum == N-domain col_sum gathered at each entry's id, and its
    self-adjoint VJP matches autodiff of the naive formulation."""
    from ocn_tpu.ops.frame import entry_col_sum, frame_index

    n, b, k = 37, 9, 6
    ids = jnp.asarray(rng.integers(0, n + 1, size=(b, k)), jnp.int32)
    val = jnp.asarray(rng.random((b, k)), jnp.float32)
    fidx = frame_index(ids, n)
    got = entry_col_sum(val, fidx.perm, fidx.rank, fidx.colsum_out_idx)

    def naive(v):
        s = jax.ops.segment_sum(v.reshape(-1), ids.reshape(-1), num_segments=n + 1)
        return s[jnp.minimum(ids, n)]  # per-entry column sum (sentinel incl.)

    np.testing.assert_allclose(np.asarray(got), np.asarray(naive(val)), rtol=1e-6)

    co = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)
    g0 = jax.grad(lambda v: jnp.sum(naive(v) * co))(val)
    g1 = jax.grad(
        lambda v: jnp.sum(entry_col_sum(v, fidx.perm, fidx.rank, fidx.colsum_out_idx) * co)
    )(val)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-5, atol=1e-6)


def test_orthogonalize_fidx_matches_plain(rng):
    """The sorted-domain (fidx) pipeline — fused 3-plane column sums and the
    algebraic post-GS renormalization — must match the n_nodes-domain one,
    values and gradients.  Run in float64 so the check is semantic: in fp32
    the reassociated colsum differs by cancellation noise inside 1/colsum,
    which is exactly what this test must NOT hide behind a loose tolerance."""
    from ocn_tpu.ops.frame import frame_index, matmul_shared

    n, b, k, h = 41, 8, 5, 8
    jax.config.update("jax_enable_x64", True)
    try:
        ids = jnp.asarray(rng.integers(0, n + 1, size=(b, k)), jnp.int32)
        v1 = jnp.where(ids == n, 0.0, jnp.asarray(rng.random((b, k)), jnp.float64))
        v2 = jnp.where(ids == n, 0.0,
                       jnp.asarray((rng.random((b, k)) > 0.4).astype(np.float64)))
        x = jnp.asarray(rng.standard_normal((n, h)), jnp.float64)
        ema = jnp.asarray(0.3)
        nn_ = jnp.asarray(2, jnp.int32)
        fidx = frame_index(ids, n)

        def run(w1, w2, xx, use_fidx):
            c1, c2 = CNFrame(ids, w1, n), CNFrame(ids, w2, n)
            ncn1, ocn2, e2, n2 = ortho.orthogonalize(
                c1, c2, ema, nn_, True, 0.0, fidx if use_fidx else None)
            o1, o2 = matmul_shared([ncn1, ocn2], xx, fidx if use_fidx else None)
            return jnp.sum(o1 ** 2) + jnp.sum(o2) + e2

        for a, b_ in zip(
            jax.grad(lambda *a_: run(*a_, True), argnums=(0, 1, 2))(v1, v2, x),
            jax.grad(lambda *a_: run(*a_, False), argnums=(0, 1, 2))(v1, v2, x),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            float(run(v1, v2, x, True)), float(run(v1, v2, x, False)), rtol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_window_matmul_matches_gather(rng):
    """The window-table path (y = stop_grad(x)[g.col], rows = y[pos]) must be
    bit-equivalent to the id-gather path, values and gradients."""
    from ocn_tpu.ops.frame import frame_index, matmul_shared

    g, _ = random_graph(rng, n=40, p=0.2)
    h = 8
    edges = jnp.asarray(rng.integers(0, g.n_nodes, size=(2, 9)))
    src = gather_neighbors(g, edges[0], k=5)
    v1 = jnp.where(src.w != 0, jnp.asarray(rng.random(src.ids.shape), jnp.float32), 0.0)
    v2 = jnp.where(src.w != 0, jnp.asarray(rng.random(src.ids.shape), jnp.float32), 0.0)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, h)), jnp.float32)
    fidx = frame_index(src.ids, g.n_nodes)

    def run(xx, w1, w2, window):
        f1 = CNFrame(src.ids, w1, g.n_nodes)
        f2 = CNFrame(src.ids, w2, g.n_nodes)
        y = jax.lax.stop_gradient(xx)[g.col] if window else None
        o1, o2 = matmul_shared(
            [f1, f2], xx, fidx, y=y, pos=src.pos if window else None)
        return jnp.sum(o1 ** 2) + jnp.sum(o2 * 3.0)

    np.testing.assert_allclose(
        float(run(x, v1, v2, True)), float(run(x, v1, v2, False)), rtol=1e-5)
    g0 = jax.grad(lambda *a: run(*a, True), argnums=(0, 1, 2))(x, v1, v2)
    g1 = jax.grad(lambda *a: run(*a, False), argnums=(0, 1, 2))(x, v1, v2)
    for a, b_ in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_blocked_spmm_matches_oneshot(monkeypatch):
    """Edge-blocked SpMM (large-E path, ops/spmm._blocked_segment_spmm):
    forcing tiny blocks must reproduce the one-shot forward AND both custom
    VJP paths exactly (the blocks are exact partial sums)."""
    import jax
    import jax.numpy as jnp

    import ocn_tpu.ops.spmm as S
    from ocn_tpu.data.loaders import synthetic_dataset

    ds = synthetic_dataset("Cora", seed=0, scale=0.1)
    g = ds.as_graph()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, 16)), jnp.float32)

    def f(x):
        return jnp.sum(S.spmm(g, x) ** 2)

    y0, g0 = jax.value_and_grad(f)(x)
    monkeypatch.setattr(S, "_SPMM_BLOCK_BYTES", 4096)  # force many blocks
    y1, g1 = jax.value_and_grad(f)(x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=2e-5,
                               atol=1e-5)
