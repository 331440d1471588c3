"""Segmented-scan column sums (ops/frame._seg_total) vs the segment_sum
formulation and a dense oracle — both entry_col_sum paths must agree."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ocn_tpu.ops.frame as F
from ocn_tpu.ops.frame import entry_col_sum, entry_col_sum_multi, frame_index


def dense_oracle(ids, val, n):
    dense = np.zeros(n + 1, np.float64)
    B, K = ids.shape
    for b in range(B):
        for k in range(K):
            dense[int(ids[b, k])] += float(val[b, k])
    return np.array([[dense[int(ids[b, k])] for k in range(K)]
                     for b in range(B)], np.float32)


@pytest.mark.parametrize("seg_scan", [True, False])
def test_entry_col_sum_matches_oracle(monkeypatch, seg_scan):
    monkeypatch.setattr(F, "_SEG_SCAN", seg_scan)
    rng = np.random.default_rng(3)
    B, K, N = 41, 8, 37
    ids = jnp.asarray(rng.integers(0, N, (B, K)), jnp.int32)
    val = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    fi = frame_index(ids, N)
    out = entry_col_sum(val, fi.perm, fi.rank, fi.colsum_out_idx)
    ref = dense_oracle(np.asarray(ids), np.asarray(val), N)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    vals3 = jnp.asarray(rng.standard_normal((3, B, K)), jnp.float32)
    outm = entry_col_sum_multi(vals3, fi.perm, fi.rank, fi.colsum_out_idx)
    for p in range(3):
        np.testing.assert_allclose(
            np.asarray(outm[p]),
            dense_oracle(np.asarray(ids), np.asarray(vals3[p]), N), atol=1e-4)


@pytest.mark.parametrize("seg_scan", [True, False])
def test_entry_col_sum_grad_self_adjoint(monkeypatch, seg_scan):
    """grad of sum(w * colsum(v)) wrt v == colsum(w) (self-adjointness)."""
    monkeypatch.setattr(F, "_SEG_SCAN", seg_scan)
    rng = np.random.default_rng(5)
    B, K, N = 17, 4, 23
    ids = jnp.asarray(rng.integers(0, N, (B, K)), jnp.int32)
    val = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    fi = frame_index(ids, N)
    g = jax.grad(
        lambda v: jnp.sum(w * entry_col_sum(v, fi.perm, fi.rank, fi.colsum_out_idx))
    )(val)
    ref = entry_col_sum(w, fi.perm, fi.rank, fi.colsum_out_idx)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), atol=1e-4)


def test_seg_scan_and_segment_sum_paths_agree(monkeypatch):
    rng = np.random.default_rng(7)
    B, K, N = 64, 16, 101
    ids = jnp.asarray(rng.integers(0, N, (B, K)), jnp.int32)
    vals = jnp.asarray(rng.standard_normal((2, B, K)), jnp.float32)
    fi = frame_index(ids, N)
    monkeypatch.setattr(F, "_SEG_SCAN", True)
    a = entry_col_sum_multi(vals, fi.perm, fi.rank, fi.colsum_out_idx)
    monkeypatch.setattr(F, "_SEG_SCAN", False)
    b = entry_col_sum_multi(vals, fi.perm, fi.rank, fi.colsum_out_idx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
