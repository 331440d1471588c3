"""Native C++ graphcore vs NumPy fallback parity."""
import os
import subprocess

import numpy as np
import pytest

from ocn_tpu.utils import native

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SO = os.path.join(HERE, "native", "libgraphcore.so")


@pytest.fixture(scope="module")
def lib():
    if not os.path.exists(SO):
        subprocess.run(["make", "-C", os.path.join(HERE, "native")], check=True)
    native._TRIED = False
    native._LIB = None
    l = native.load()
    assert l is not None
    return l


def test_csr_parity(lib, rng):
    n = 200
    ei = rng.integers(0, n, size=(2, 3000)).astype(np.int64)
    from ocn_tpu.sparse.build import symmetrize_edge_index

    ei = symmetrize_edge_index(ei, n)
    # numpy path
    os.environ["OCN_TPU_NO_NATIVE"] = "1"
    native._TRIED = False
    native._LIB = None
    from ocn_tpu.sparse.build import csr_from_edge_index

    ip_np, col_np = csr_from_edge_index(ei, n, symmetrize=False)
    del os.environ["OCN_TPU_NO_NATIVE"]
    native._TRIED = False
    native._LIB = None
    ip_c, col_c = lib.csr_from_edges(ei, n)
    np.testing.assert_array_equal(ip_np, ip_c)
    np.testing.assert_array_equal(col_np, col_c)


def test_edge_positions_parity(lib, rng):
    n = 100
    ei = rng.integers(0, n, size=(2, 800)).astype(np.int64)
    from ocn_tpu.sparse.build import symmetrize_edge_index

    ei = symmetrize_edge_index(ei, n)
    ip, col = lib.csr_from_edges(ei, n)
    edges = ei[:, ::7]
    pos = lib.edge_to_nnz_positions(ip, col, edges)
    assert (pos >= 0).all()
    for k in range(edges.shape[1]):
        u, v = edges[0, k], edges[1, k]
        assert col[pos[k, 0]] == v and ip[u] <= pos[k, 0] < ip[u + 1]
        assert col[pos[k, 1]] == u and ip[v] <= pos[k, 1] < ip[v + 1]


def test_negative_sampling(lib, rng):
    n = 50
    ei = rng.integers(0, n, size=(2, 300)).astype(np.int64)
    from ocn_tpu.sparse.build import symmetrize_edge_index

    ei = symmetrize_edge_index(ei, n)
    keys = np.sort(ei[0] * n + ei[1])
    out = lib.negative_sampling(keys, n, 500, seed=42)
    assert len(out) == 500
    # none of the sampled keys is an existing edge or a self loop
    assert not np.isin(out, keys).any()
    assert (out // n != out % n).all()
