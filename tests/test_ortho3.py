"""orthogonalize3 — the fused cn6 double-Gram-Schmidt pipeline.

The fused (fidx) path replaces cn6's three sequential colnorm sorted-domain
trips with ONE five-plane entry_col_sum_multi plus algebraic post-projection
column sums (ops/ortho.py).  These tests pin:

1. fused values == the direct n_nodes-domain oracle (float64, tight rtol),
   including engineered quirk columns (colsum exactly 1 -> inv1 = empty_fill)
   and empty columns;
2. fused GRADIENTS (wrt all three value planes) == the oracle's;
3. the shared-EMA-buffer quirk: three sequential steps per training forward
   (reference model.py:2524-2533), BOTH cn3 coefficients aliasing to the
   post-third-step buffer value (innerprod1 returns the buffer tensor
   itself; nip1's division happens after the nip2 call stepped it), eval
   leaves state untouched and feeds the stored value to all three inner
   products;
4. the fused path still matches a from-scratch re-derivation of the unfused
   module math (separate colnorm trips, explicit GS, aliased nips).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocn_tpu.ops import ortho
from ocn_tpu.ops.frame import CNFrame, frame_index, matmul_shared


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _frames(rng, n=37, b=8, k=6, quirk_cols=True, dtype=jnp.float64):
    ids = np.asarray(rng.integers(0, n + 1, size=(b, k)), np.int32)
    v1 = np.where(ids == n, 0.0, rng.random((b, k)))
    v2 = np.where(ids == n, 0.0, (rng.random((b, k)) > 0.4) * rng.random((b, k)))
    v3 = np.where(ids == n, 0.0, (rng.random((b, k)) > 0.5) * rng.random((b, k)))
    if quirk_cols:
        # engineer a column whose cn1 sum is EXACTLY 1 (quirk: inv -> fill)
        ids[0, 0] = 0
        v1[0, 0] = 1.0
        v1[ids == 0] = 0.0
        v1[0, 0] = 1.0
        # and a column present only in cn3 (cn1 colsum == 0 -> s_rep = 1 ->
        # quirk zeroes it too)
        ids[1, 1] = 1
        v1[ids == 1] = 0.0
        v3[1, 1] = 0.7
    f = lambda v: jnp.asarray(v, dtype)
    return (jnp.asarray(ids), f(v1), f(v2), f(v3))


@pytest.mark.parametrize("empty_fill", [0.0, 0.5])
@pytest.mark.parametrize("training", [True, False])
def test_orthogonalize3_fused_matches_direct(rng, training, empty_fill):
    n = 37
    jax.config.update("jax_enable_x64", True)
    try:
        ids, v1, v2, v3 = _frames(rng)
        fidx = frame_index(ids, n)
        ema0 = jnp.asarray(0.3, jnp.float64)
        n0 = jnp.asarray(2, jnp.int32)

        def run(w1, w2, w3, use_fidx):
            c1 = CNFrame(ids, w1, n)
            c2 = CNFrame(ids, w2, n)
            c3 = CNFrame(ids, w3, n)
            ncn1, ocn2, ocn3, e, m = ortho.orthogonalize3(
                c1, c2, c3, ema0, n0, training, empty_fill,
                fidx if use_fidx else None)
            return ncn1, ocn2, ocn3, e, m

        a = run(v1, v2, v3, True)
        b = run(v1, v2, v3, False)
        for fa, fb in zip(a[:3], b[:3]):
            np.testing.assert_allclose(
                np.asarray(fa.val), np.asarray(fb.val), rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(float(a[3]), float(b[3]), rtol=1e-12)
        assert int(a[4]) == int(b[4]) == (5 if training else 2)

        def loss(w1, w2, w3, use_fidx):
            ncn1, ocn2, ocn3, e, _ = run(w1, w2, w3, use_fidx)
            return (jnp.sum(ncn1.val ** 2) + jnp.sum(ocn2.val ** 3)
                    + jnp.sum(ocn3.val ** 2) + jnp.sum(ocn3.val) + e)

        ga = jax.grad(lambda *w: loss(*w, True), argnums=(0, 1, 2))(v1, v2, v3)
        gb = jax.grad(lambda *w: loss(*w, False), argnums=(0, 1, 2))(v1, v2, v3)
        for x, y in zip(ga, gb):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-9, atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_orthogonalize3_matmul_grads(rng):
    """Gradient parity through the full chunk tail (ortho3 + shared matmul),
    the composition the train step differentiates."""
    n, h = 37, 8
    jax.config.update("jax_enable_x64", True)
    try:
        ids, v1, v2, v3 = _frames(rng)
        fidx = frame_index(ids, n)
        x = jnp.asarray(rng.standard_normal((n, h)), jnp.float64)

        def loss(w1, w2, w3, xx, use_fidx):
            c1 = CNFrame(ids, w1, n)
            c2 = CNFrame(ids, w2, n)
            c3 = CNFrame(ids, w3, n)
            ncn1, ocn2, ocn3, e, _ = ortho.orthogonalize3(
                c1, c2, c3, jnp.asarray(0.3, jnp.float64),
                jnp.asarray(1, jnp.int32), True, 0.0,
                fidx if use_fidx else None)
            a1, a2, a3 = matmul_shared(
                [ncn1, ocn2, ocn3], xx, fidx if use_fidx else None)
            return jnp.sum(a1 ** 2) + jnp.sum(a2) + jnp.sum(a3 ** 2) + e

        ga = jax.grad(lambda *w: loss(*w, True), argnums=(0, 1, 2, 3))(
            v1, v2, v3, x)
        gb = jax.grad(lambda *w: loss(*w, False), argnums=(0, 1, 2, 3))(
            v1, v2, v3, x)
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_orthogonalize3_ema_quirk(rng):
    """One training forward steps the shared buffer exactly three times with
    the sequential running-mean recurrence; eval feeds the stored value to
    all three inner products and leaves (ema, n) untouched."""
    n = 23
    ids, v1, v2, v3 = _frames(rng, n=n, quirk_cols=False, dtype=jnp.float32)
    c1, c2, c3 = (CNFrame(ids, v, n) for v in (v1, v2, v3))
    fidx = frame_index(ids, n)
    ncn1, ocn2, ocn3, e, m = ortho.orthogonalize3(
        c1, c2, c3, jnp.zeros(()), jnp.zeros((), jnp.int32), True, 0.0, fidx)
    assert int(m) == 3
    # re-derive the three-step recurrence by hand
    i0 = float(c2.inner(ncn1))
    ema_v = i0  # (1 - 1/1)*0 + 1*i0
    i1 = float(c3.inner(ncn1))
    ema_v = 0.5 * ema_v + 0.5 * i1
    i2 = float(c3.inner(ocn2))
    ema_v = (2.0 / 3.0) * ema_v + (1.0 / 3.0) * i2
    np.testing.assert_allclose(float(e), ema_v, rtol=1e-5)
    # eval: stored value reused, no state mutation
    _, _, _, e2, m2 = ortho.orthogonalize3(
        c1, c2, c3, e, m, False, 0.0, fidx)
    assert float(e2) == float(e) and int(m2) == 3


def test_matches_old_predictor_body(rng):
    """orthogonalize3(fused) must reproduce the unfused module math exactly:
    per-frame colnorm_quirk/colnorm_plain (each its own entry_col_sum trip)
    + explicit GS with sequential shared-EMA steps and the reference's
    aliasing (nip1 == nip2 == post-third-step EMA / scale)."""
    from ocn_tpu.ops.ortho import colnorm_plain, colnorm_quirk

    n = 23
    ids, v1, v2, v3 = _frames(rng, n=n, quirk_cols=False, dtype=jnp.float32)
    c1, c2, c3 = (CNFrame(ids, v, n) for v in (v1, v2, v3))
    fidx = frame_index(ids, n)

    ncn1 = colnorm_quirk(c1, 0.0, fidx)
    scale = jnp.max(jnp.abs(ncn1.val))
    i0 = c2.inner(ncn1)
    ema1 = i0  # ema starts at 0 with n=0: step1 blends with b=1
    nip0 = jnp.where(scale > 0, ema1 / scale, ema1)
    ocn2 = colnorm_plain(c2.with_values(
        jnp.where(c2.mask | ncn1.mask, c2.val - nip0 * ncn1.val, 0.0)), fidx)
    i1 = c3.inner(ncn1)
    ema2 = 0.5 * ema1 + 0.5 * i1
    i2 = c3.inner(ocn2)
    ema3 = (2.0 / 3.0) * ema2 + (1.0 / 3.0) * i2
    # reference aliasing: both coefficients read the post-third-step buffer
    nip1 = jnp.where(scale > 0, ema3 / scale, ema3)
    nip2 = jnp.where(scale > 0, ema3 / scale, ema3)
    ocn3 = colnorm_plain(c3.with_values(
        jnp.where(c3.mask | ncn1.mask | ocn2.mask,
                  c3.val - nip1 * ncn1.val - nip2 * ocn2.val, 0.0)), fidx)

    got = ortho.orthogonalize3(
        c1, c2, c3, jnp.zeros(()), jnp.zeros((), jnp.int32), True, 0.0, fidx)
    np.testing.assert_allclose(
        np.asarray(got[0].val), np.asarray(ncn1.val), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got[1].val), np.asarray(ocn2.val), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(got[2].val), np.asarray(ocn3.val), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(got[3]), float(ema3), rtol=1e-5)
    assert int(got[4]) == 3
