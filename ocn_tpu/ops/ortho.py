"""Column normalization + Gram-Schmidt orthogonalization of CN frames.

This is the paper's core contribution (predictor cn5 "OCN"): decorrelate the
2-hop CN matrix from the 1-hop one before aggregation.  The reference
implements it with dynamic sparse tensors and a `torch.unique` union pattern
(model.py:2261-2423); in the candidate frame both matrices share their index
array, so the whole pipeline is masked elementwise math + two segment-sums.

Every quirk of the reference math is preserved deliberately (SURVEY.md §7.3.4):

* `colnorm_quirk`: after replacing zero column sums by 1, columns whose
  (replaced) sum equals exactly 1 get inverse `empty_fill` — 0.0 for cn1/cn5
  (model.py:617-620, 2263-2266), `args.sum` for cn7/cn8 (model.py:3116-3120).
  This also zeroes real columns whose sum is exactly 1.
* the EMA inner product is a running mean over *training* batches
  (`innerprod1`, model.py:2241-2250): n += 1; m <- (1-1/n) m + (1/n) <cn2,
  ncn1>.  It is carried as explicit state (flax "ema" collection).
* the inner product is divided by max|ncn1| over the batch before the
  projection step (model.py:2370-2376), falling back to the raw value when
  the max is 0.
* the projected cn2 is re-normalized with the *plain* rule (zero sums -> 1,
  no !=1 trick; model.py:2405-2413).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ocn_tpu.ops.frame import CNFrame, FrameIndex, entry_col_sum


def colnorm_quirk(
    cn: CNFrame, empty_fill: float = 0.0, fidx: Optional[FrameIndex] = None
) -> CNFrame:
    """Column-normalize with the reference's cn1 rule (model.py:2261-2272).

    With ``fidx`` the column sums are computed per-entry in the chunk's
    sorted domain (one shared sort, no n_nodes-bucket scatter; see
    FrameIndex) — numerically identical since the scale only ever applies at
    entries whose column is present in the chunk."""
    if fidx is not None:
        s = entry_col_sum(cn.val, fidx.perm, fidx.rank, fidx.colsum_out_idx)
        s_rep = jnp.where(s == 0, 1.0, s)
        inv = jnp.where(s_rep != 1, 1.0 / s_rep, empty_fill)
        return cn.with_values(cn.val * inv)
    s = cn.col_sum()
    s_rep = jnp.where(s == 0, 1.0, s)
    inv = jnp.where(s_rep != 1, 1.0 / s_rep, empty_fill)
    return cn.scale_cols(inv)


def colnorm_plain(cn: CNFrame, fidx: Optional[FrameIndex] = None) -> CNFrame:
    """Column-normalize with the post-projection rule (model.py:2405-2413)."""
    if fidx is not None:
        s = entry_col_sum(cn.val, fidx.perm, fidx.rank, fidx.colsum_out_idx)
        inv = 1.0 / jnp.where(s == 0, 1.0, s)
        return cn.with_values(cn.val * inv)
    s = cn.col_sum()
    inv = 1.0 / jnp.where(s == 0, 1.0, s)
    return cn.scale_cols(inv)


def ema_inner_product(
    cn2: CNFrame, ncn1: CNFrame, ema: jax.Array, n: jax.Array, training: bool
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Running-mean inner product state update (model.py:2241-2250).

    Returns (inner_product_to_use, new_ema, new_n).  In eval the stored value
    is returned unchanged, exactly like the reference buffer.
    """
    if not training:
        return ema, ema, n
    batch_inner = cn2.inner(ncn1)
    new_n = n + 1
    beta = 1.0 / new_n.astype(jnp.float32)
    new_ema = (1.0 - beta) * ema + beta * batch_inner
    return new_ema, new_ema, new_n


def gram_schmidt(
    cn2: CNFrame, ncn1: CNFrame, inner_product: jax.Array
) -> CNFrame:
    """cn2 <- cn2 - (inner/scale) * ncn1 on the union pattern
    (model.py:2343-2391).  Frames share ids, so the union is the elementwise
    combination with mask = mask1 | mask2."""
    scale = jnp.max(jnp.abs(ncn1.val))
    nip = jnp.where(scale > 0, inner_product / scale, inner_product)
    new_val = cn2.val - nip * ncn1.val
    # keep explicit union mask: lanes absent from both stay exactly 0
    union = cn2.mask | ncn1.mask
    return cn2.with_values(jnp.where(union, new_val, 0.0))


def orthogonalize(
    cn1: CNFrame,
    cn2: CNFrame,
    ema: jax.Array,
    n: jax.Array,
    training: bool,
    empty_fill: float = 0.0,
    fidx: Optional[FrameIndex] = None,
) -> Tuple[CNFrame, CNFrame, jax.Array, jax.Array]:
    """Full cn5 pipeline: normalize -> EMA inner product -> Gram-Schmidt ->
    renormalize (model.py:2261-2423).  Returns (ncn1, ocn2, new_ema, new_n).

    With ``fidx`` (valid for frames sharing cn1.ids) the whole pipeline needs
    ONE sorted-domain pass: the cn1/cn2 column sums batch into a single
    two-plane `entry_col_sum_multi`, and the post-projection column sum is an
    elementwise identity of the two —

        colsum(cn2 - nip*ncn1) = colsum(cn2) - nip * inv1(colsum(cn1)) * colsum(cn1)

    because the Gram-Schmidt coefficient and the per-column normalizer are
    constant within a column (reassociation-only float difference).  That
    replaces three segment-sum round trips (+ their VJPs) per chunk by one."""
    if fidx is not None:
        from ocn_tpu.ops.frame import entry_col_sum_multi

        # The post-GS column sum is taken over the union pattern in the
        # direct path (`where(union, ..., 0)` before the segment sum), which
        # zeroes GRADIENTS at lanes absent from both frames even though the
        # values there are 0 either way.  Masking the two GS-sum planes by the
        # raw pattern union reproduces those gradients exactly: wherever the
        # raw and effective unions differ (quirk columns, inv1 == 0) the
        # leaked term carries a factor inv1 == 0.
        u0 = (cn1.val != 0) | (cn2.val != 0)
        es = entry_col_sum_multi(
            jnp.stack([
                cn1.val,
                jnp.where(u0, cn2.val, 0.0),
                jnp.where(u0, cn1.val, 0.0),
            ]),
            fidx.perm, fidx.rank, fidx.colsum_out_idx,
        )
        es1, es2u, es1u = es[0], es[1], es[2]
        # colnorm_quirk on cn1 (model.py:2261-2272)
        s_rep = jnp.where(es1 == 0, 1.0, es1)
        inv1 = jnp.where(s_rep != 1, 1.0 / s_rep, empty_fill)
        ncn1 = cn1.with_values(cn1.val * inv1)
        inner, new_ema, new_n = ema_inner_product(cn2, ncn1, ema, n, training)
        # gram_schmidt (model.py:2343-2391)
        scale = jnp.max(jnp.abs(ncn1.val))
        nip = jnp.where(scale > 0, inner / scale, inner)
        union = cn2.mask | ncn1.mask
        val_o = jnp.where(union, cn2.val - nip * ncn1.val, 0.0)
        # colnorm_plain on the projected frame (model.py:2405-2413), algebraic:
        # colsum(cn2 - nip*ncn1) = colsum(cn2) - nip*inv1*colsum(cn1) because
        # nip and the per-column inv1 are constant within a column
        es_o = es2u - nip * (inv1 * es1u)
        inv2 = 1.0 / jnp.where(es_o == 0, 1.0, es_o)
        ocn2 = cn2.with_values(val_o * inv2)
        return ncn1, ocn2, new_ema, new_n
    ncn1 = colnorm_quirk(cn1, empty_fill, fidx)
    inner, new_ema, new_n = ema_inner_product(cn2, ncn1, ema, n, training)
    ocn2 = gram_schmidt(cn2, ncn1, inner)
    ocn2 = colnorm_plain(ocn2, fidx)
    return ncn1, ocn2, new_ema, new_n


def orthogonalize3(
    cn1: CNFrame,
    cn2: CNFrame,
    cn3: CNFrame,
    ema: jax.Array,
    n: jax.Array,
    training: bool,
    empty_fill: float = 0.0,
    fidx: Optional[FrameIndex] = None,
) -> Tuple[CNFrame, CNFrame, CNFrame, jax.Array, jax.Array]:
    """Full cn6 double-Gram-Schmidt pipeline (reference
    `CNLinkPredictor3hopCNs`, model.py:2447-2954): quirk-normalize cn1,
    project cn2 off it, plain-renormalize, then project cn3 off BOTH and
    plain-renormalize again.  The reference quirks are preserved: all three
    inner products step ONE shared EMA buffer sequentially
    (model.py:2524-2533), both cn3 projections divide by max|ncn1| over
    the batch (model.py:2848-2856), and — the aliasing quirk — BOTH cn3
    coefficients read the buffer AFTER the third update: `innerprod1`
    returns `self.innerprod` (the buffer tensor itself, not a copy), and
    model.py divides `inner_product1` by scale_factor only after the
    `inner_product2` call has stepped the buffer again, so nip1 == nip2 ==
    (EMA after all three steps)/scale during training.  In eval the buffer
    is returned unchanged by every call, so the same "final EMA for both"
    rule holds there too.  Returns (ncn1, ocn2, ocn3, ema, n).

    With ``fidx`` (frames share cn1.ids) the whole pipeline takes ONE
    sorted-domain pass: a five-plane `entry_col_sum_multi` delivers every
    column sum the three normalizations need, and the two post-projection
    sums are algebraic identities of the pre-computed planes —

        colsum(cn2 - nip0*ncn1)             = es2u - nip0*inv1*es1u  (= es_o2)
        colsum(cn3 - nip1*ncn1 - nip2*ocn2) = es3u - nip1*inv1*es1u3
                                                   - nip2*inv2*es_o2

    because the GS coefficients (nip*) are batch scalars and the normalizers
    (inv1, inv2) are constant within a column (reassociation-only float
    difference); colsum(ocn2) == inv2*es_o2 exactly, since ocn2's support is
    always inside union3.  The u2/u3-masked planes reproduce the direct
    path's gradient zeroing at lanes outside each union exactly as in
    `orthogonalize`: reusing es_o2 for the ocn2 term keeps its union2
    gradient structure (a u3-masked cn2 plane would leak gradient at
    v2 == 0 lanes that only cn3 occupies), and the remaining raw-vs-
    effective union differences all carry a factor inv1 == 0.  That replaces
    the separate quirk/plain/plain segment-sum round trips (3 forward +
    3 VJP) by one."""
    if fidx is not None:
        from ocn_tpu.ops.frame import entry_col_sum_multi

        u2 = (cn1.val != 0) | (cn2.val != 0)
        u3 = u2 | (cn3.val != 0)
        es = entry_col_sum_multi(
            jnp.stack([
                cn1.val,
                jnp.where(u2, cn2.val, 0.0),
                jnp.where(u2, cn1.val, 0.0),
                jnp.where(u3, cn3.val, 0.0),
                jnp.where(u3, cn1.val, 0.0),
            ]),
            fidx.perm, fidx.rank, fidx.colsum_out_idx,
        )
        es1, es2u, es1u, es3u, es1u3 = (es[i] for i in range(5))
        # colnorm_quirk on cn1 (model.py:2261-2272 / 2547-2560)
        s_rep = jnp.where(es1 == 0, 1.0, es1)
        inv1 = jnp.where(s_rep != 1, 1.0 / s_rep, empty_fill)
        ncn1 = cn1.with_values(cn1.val * inv1)
        scale = jnp.max(jnp.abs(ncn1.val))
        # first GS step: cn2 off ncn1 (model.py:2637-2726)
        inner0, ema, n = ema_inner_product(cn2, ncn1, ema, n, training)
        nip0 = jnp.where(scale > 0, inner0 / scale, inner0)
        union2 = cn2.mask | ncn1.mask
        val_o2 = jnp.where(union2, cn2.val - nip0 * ncn1.val, 0.0)
        es_o2 = es2u - nip0 * (inv1 * es1u)
        inv2 = 1.0 / jnp.where(es_o2 == 0, 1.0, es_o2)
        ocn2 = cn2.with_values(val_o2 * inv2)
        # second GS step: cn3 off ncn1 AND ocn2 (model.py:2813-2932)
        _, ema, n = ema_inner_product(cn3, ncn1, ema, n, training)
        inner2, ema, n = ema_inner_product(cn3, ocn2, ema, n, training)
        # aliasing quirk: both coefficients read the buffer post-THIRD step
        nip1 = nip2 = jnp.where(scale > 0, inner2 / scale, inner2)
        union3 = cn3.mask | ncn1.mask | ocn2.mask
        val_o3 = jnp.where(
            union3, cn3.val - nip1 * ncn1.val - nip2 * ocn2.val, 0.0)
        es_o3 = es3u - nip1 * (inv1 * es1u3) - nip2 * (inv2 * es_o2)
        inv3 = 1.0 / jnp.where(es_o3 == 0, 1.0, es_o3)
        ocn3 = cn3.with_values(val_o3 * inv3)
        return ncn1, ocn2, ocn3, ema, n
    # direct (n_nodes-domain) path — the testing oracle
    ncn1 = colnorm_quirk(cn1, empty_fill)
    scale = jnp.max(jnp.abs(ncn1.val))
    inner0, ema, n = ema_inner_product(cn2, ncn1, ema, n, training)
    nip0 = jnp.where(scale > 0, inner0 / scale, inner0)
    ocn2 = colnorm_plain(cn2.with_values(jnp.where(
        cn2.mask | ncn1.mask, cn2.val - nip0 * ncn1.val, 0.0)))
    _, ema, n = ema_inner_product(cn3, ncn1, ema, n, training)
    inner2, ema, n = ema_inner_product(cn3, ocn2, ema, n, training)
    nip1 = nip2 = jnp.where(scale > 0, inner2 / scale, inner2)
    union3 = cn3.mask | ncn1.mask | ocn2.mask
    ocn3 = colnorm_plain(cn3.with_values(jnp.where(
        union3, cn3.val - nip1 * ncn1.val - nip2 * ocn2.val, 0.0)))
    return ncn1, ocn2, ocn3, ema, n
