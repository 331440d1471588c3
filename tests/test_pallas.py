"""Pallas kernel correctness (interpret mode on CPU) vs the XLA formulation."""
import numpy as np
import jax.numpy as jnp
import pytest

from ocn_tpu.ops.pallas.membership import membership_counts


def test_membership_counts_matches_reference(rng):
    b, kq, ks, n = 512, 64, 64, 1000
    q = jnp.asarray(rng.integers(0, n, size=(b, kq)), jnp.int32)
    ids = jnp.asarray(np.sort(rng.integers(0, n, size=(b, ks)), axis=-1), jnp.int32)
    w = jnp.asarray(rng.random((b, ks)).astype(np.float32))
    got = np.asarray(membership_counts(q, ids, w, interpret=True))
    want = np.zeros((b, kq), np.float32)
    qn, idn, wn = np.asarray(q), np.asarray(ids), np.asarray(w)
    for i in range(b):
        for k in range(kq):
            want[i, k] = wn[i][idn[i] == qn[i, k]].sum()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_membership_counts_ragged_tile(rng):
    # B not a multiple of the 256 tile exercises the grid remainder path
    b, kq, ks, n = 300, 16, 32, 77
    q = jnp.asarray(rng.integers(0, n, size=(b, kq)), jnp.int32)
    ids = jnp.asarray(rng.integers(0, n, size=(b, ks)), jnp.int32)
    w = jnp.asarray(np.ones((b, ks), np.float32))
    got = np.asarray(membership_counts(q, ids, w, interpret=True))
    qn, idn = np.asarray(q), np.asarray(ids)
    want = (qn[:, :, None] == idn[:, None, :]).sum(-1).astype(np.float32)
    np.testing.assert_allclose(got, want)
