"""Polynomial-basis CN predictors: cn7 ("OCNP"), cn8 and cn9 ablations.

Reference classes (model.py): `CNLinkPredictorbaselearn` (cn7, :3021-3229),
`CNLinkPredictorbaselearnablation` (cn8, :3233-3444),
`CNLinkPredictorbaselearnablationwithoutx` (cn9, :3450-3715), plus the
Chebyshev helpers T0..T10 / `evaluate_polynomial` (:2958-3019).

The "basis" is a diagonal matrix diag(T_p(linspace(-1, 1, N))) applied by
spspmm on the right — i.e. a per-column scaling by the basis value at the
column's node id.  In the candidate frame that is `val *= basis[ids]`.  The
reference hard-codes poly index 0 (T0 == 1, identity basis; its
polyfirst/polysecond flags are parsed but never consumed,
NeighborOverlap_large.py:246-247); here the indices are honest parameters
defaulting to 0.

Faithfully-kept quirks:
* cn7 normalizes cn1 (quirk rule with `empty_fill = args.sum`) but applies the
  basis to the *raw* cn2 — its normalized_cn2 is computed and discarded
  (model.py:3180-3189).
* cn8 discards *both* normalizations (`normalized_cn1 = cn1`, model.py:3340).
* cn9 is cn7 but aggregates one-hot CN rows (spspmm with identity) through
  the first MLP Linear, like cn1; xijlin input is hard-coded 32
  (model.py:3503) — configure hidden sizes accordingly.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ocn_tpu.nn.mlp import CNAggMLP, HeadMLP, XijMLP
from ocn_tpu.ops.frame import CNFrame
from ocn_tpu.ops.ortho import colnorm_quirk
from ocn_tpu.sparse.csr import Graph

# Chebyshev T_0..T_10 closed forms (reference model.py:2958-2992)
CHEBYSHEV = (
    lambda x: jnp.ones_like(x),
    lambda x: x,
    lambda x: 2 * x**2 - 1,
    lambda x: 4 * x**3 - 3 * x,
    lambda x: 8 * x**4 - 8 * x**2 + 1,
    lambda x: 16 * x**5 - 20 * x**3 + 5 * x,
    lambda x: 32 * x**6 - 48 * x**4 + 18 * x**2 - 1,
    lambda x: 64 * x**7 - 112 * x**5 + 56 * x**3 - 7 * x,
    lambda x: 128 * x**8 - 256 * x**6 + 160 * x**4 - 32 * x**2 + 1,
    lambda x: 256 * x**9 - 576 * x**7 + 432 * x**5 - 120 * x**3 + 9 * x,
    lambda x: 512 * x**10 - 1280 * x**8 + 1120 * x**6 - 400 * x**4 + 50 * x**2 - 1,
)


def chebyshev_basis(n_nodes: int, poly_index: int) -> jax.Array:
    """Diagonal of `evaluate_polynomial(n, poly_index)` (model.py:2995-3019)."""
    if not 0 <= poly_index < len(CHEBYSHEV):
        raise ValueError(f"poly_index must be in [0, {len(CHEBYSHEV)-1}]")
    xs = jnp.linspace(-1.0, 1.0, n_nodes)
    return CHEBYSHEV[poly_index](xs)


def apply_basis(cn: CNFrame, basis: jax.Array) -> CNFrame:
    """cn @ diag(basis): per-column scaling in the candidate frame."""
    return cn.scale_cols(basis)


class OCNPPredictor(nn.Module):
    """cn7 / OCNP (reference CNLinkPredictorbaselearn, model.py:3021-3229)."""

    hidden: int
    out: int = 1
    dropout: float = 0.3
    edrop: float = 0.0
    ln: bool = False
    cndeg: int = -1
    use_xlin: bool = False
    tailact: bool = False
    twolayerlin: bool = False
    beta_init: float = 1.0
    empty_fill: float = 1.0        # `args.sum`, default 1 (NeighborOverlap_large.py:245)
    poly_first: int = 0
    poly_second: int = 0
    normalize_cn1: bool = True     # False => cn8 ablation
    normalize_cn2: bool = False    # reference discards cn2 normalization

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        g: Graph,
        cn1: CNFrame,
        cn2: CNFrame,
        tar_ei: jax.Array,
        training: bool = False,
        y=None,
        pos=None,
    ) -> jax.Array:
        det = not training
        beta = self.param("beta", nn.initializers.constant(self.beta_init), (1,))
        alpha = self.param("alpha", nn.initializers.ones, (3,))

        from ocn_tpu.ops.frame import frame_index, matmul_shared

        fidx = frame_index(cn1.ids, g.n_nodes)
        c1 = colnorm_quirk(cn1, self.empty_fill, fidx) if self.normalize_cn1 else cn1
        c2 = colnorm_quirk(cn2, self.empty_fill, fidx) if self.normalize_cn2 else cn2
        c1 = apply_basis(c1, chebyshev_basis(g.n_nodes, self.poly_first))
        c2 = apply_basis(c2, chebyshev_basis(g.n_nodes, self.poly_second))

        a1, a2 = matmul_shared([c1, c2], x, fidx, y=y, pos=pos)
        xcn1 = CNAggMLP(self.hidden, self.dropout, self.ln, False)(a1, det)
        xcn2 = CNAggMLP(self.hidden, self.dropout, self.ln, False)(a2, det)
        xij = XijMLP(self.hidden, self.dropout, self.ln, self.tailact)(
            x[tar_ei[0]] * x[tar_ei[1]], det
        )
        a = jnp.cumprod(jax.nn.sigmoid(alpha))
        z = a[0] * xcn1 + a[1] * xcn2 + beta * xij
        return HeadMLP(
            self.hidden, self.out, self.dropout, self.ln, self.twolayerlin
        )(z, det)


class CN9Predictor(nn.Module):
    """cn9 (reference CNLinkPredictorbaselearnablationwithoutx,
    model.py:3450-3715): cn7's basis pipeline but with one-hot CN aggregation
    (ncn @ I into the first MLP Linear), requiring in_channels == n_nodes."""

    hidden: int
    n_nodes: int
    out: int = 1
    dropout: float = 0.3
    edrop: float = 0.0
    ln: bool = False
    cndeg: int = -1
    use_xlin: bool = False
    tailact: bool = False
    twolayerlin: bool = False
    beta_init: float = 1.0
    empty_fill: float = 1.0
    poly_first: int = 0
    poly_second: int = 0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        g: Graph,
        cn1: CNFrame,
        cn2: CNFrame,
        tar_ei: jax.Array,
        training: bool = False,
        y=None,
        pos=None,
    ) -> jax.Array:
        del y, pos  # one-hot aggregation gathers MLP weight columns, not x
        det = not training
        beta = self.param("beta", nn.initializers.constant(self.beta_init), (1,))
        alpha = self.param("alpha", nn.initializers.ones, (3,))

        from ocn_tpu.ops.frame import frame_index

        fidx = frame_index(cn1.ids, g.n_nodes)
        c1 = colnorm_quirk(cn1, self.empty_fill, fidx)
        c2 = cn2  # normalized_cn2 discarded (model.py:3608-3611)
        c1 = apply_basis(c1, chebyshev_basis(g.n_nodes, self.poly_first))
        c2 = apply_basis(c2, chebyshev_basis(g.n_nodes, self.poly_second))

        def onehot_mlp(cn: CNFrame, name: str) -> jax.Array:
            w = self.param(f"{name}_w1", nn.initializers.lecun_normal(),
                           (self.n_nodes, self.hidden))
            b1 = self.param(f"{name}_b1", nn.initializers.zeros, (self.hidden,))
            cols = w[jnp.minimum(cn.ids, self.n_nodes - 1)]
            h = jnp.einsum("bk,bkh->bh", cn.val, cols,
                           preferred_element_type=jnp.float32).astype(x.dtype) + b1
            h = nn.Dropout(self.dropout, deterministic=det)(h)
            h = nn.relu(h)
            h = nn.Dense(self.hidden)(h)
            if self.ln:
                h = nn.LayerNorm(epsilon=1e-5)(h)
            h = nn.Dropout(self.dropout, deterministic=det)(h)
            h = nn.relu(h)
            return nn.Dense(self.hidden)(h)

        xcn1 = onehot_mlp(c1, "xcn1")
        xcn2 = onehot_mlp(c2, "xcn2")
        xij = XijMLP(self.hidden, self.dropout, self.ln, self.tailact)(
            x[tar_ei[0]] * x[tar_ei[1]], det
        )
        a = jnp.cumprod(jax.nn.sigmoid(alpha))
        z = a[0] * xcn1 + a[1] * xcn2 + beta * xij
        return HeadMLP(
            self.hidden, self.out, self.dropout, self.ln, self.twolayerlin
        )(z, det)
