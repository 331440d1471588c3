"""Orthogonalized-CN predictors: cn5 ("OCN", the headline model) and cn1.

Reference classes: `CNLinkPredictorOringin` (cn5, model.py:2171-2443) and
`CNLinkPredictor` (cn1, model.py:524-840).  Both run the same pipeline

    column-normalize cn1 (quirk rule) -> EMA inner product <cn2, ncn1> ->
    Gram-Schmidt cn2 against ncn1 on the union pattern -> column-normalize

and differ only in how the node dimension is aggregated:

* cn5 aggregates node features: xcn = ncn @ h (spmm_add, model.py:2426-2427).
* cn1 keeps the sparse one-hot CN rows and feeds them to the first Linear of
  its MLPs (model.py:808-827 multiplies by a sparse identity and applies
  `xcn1lin` to the (B, N) sparse matrix).  That is xcn = ncn @ W1^T with W1
  the (hidden, N) first-layer weight — expressible directly in the candidate
  frame as a gather of W1 columns, so cn1 requires in_channels == n_nodes
  exactly as the torch code does.  (The reference's hard-coded
  xijlin-input=64, model.py:577, is likewise kept as `xij_in`.)

The EMA inner-product state (`innerprod` buffer + python counter `n`,
model.py:2238-2250) lives in the flax "ema" collection and is updated only
when training=True, under `mutable=["ema"]`.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ocn_tpu.nn.mlp import CNAggMLP, HeadMLP, XLin, XijMLP
from ocn_tpu.ops.frame import CNFrame
from ocn_tpu.ops.ortho import orthogonalize
from ocn_tpu.sparse.csr import Graph


class OCNPredictor(nn.Module):
    """cn5 / OCN (reference CNLinkPredictorOringin, model.py:2171-2443)."""

    hidden: int
    out: int = 1
    dropout: float = 0.3
    edrop: float = 0.0  # constructed but unused by cn5's forward, kept for parity
    ln: bool = False
    cndeg: int = -1
    use_xlin: bool = False
    tailact: bool = False
    twolayerlin: bool = False
    beta_init: float = 1.0
    empty_fill: float = 0.0  # cn5 fills quirk-empty columns with 0 (model.py:2266)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        g: Graph,
        cn1: CNFrame,
        cn2: CNFrame,
        tar_ei: jax.Array,
        training: bool = False,
        y: Optional[jax.Array] = None,
        pos: Optional[jax.Array] = None,
    ) -> jax.Array:
        det = not training
        beta = self.param("beta", nn.initializers.constant(self.beta_init), (1,))
        alpha = self.param("alpha", nn.initializers.ones, (3,))
        ema = self.variable("ema", "innerprod", lambda: jnp.zeros(()))
        nvar = self.variable("ema", "n", lambda: jnp.zeros((), jnp.int32))

        # one shared sorted-domain index per chunk: column sums become sorted
        # segment-sums and the frame-matmul backward reuses the same sort
        from ocn_tpu.ops.frame import frame_index, matmul_shared

        fidx = frame_index(cn1.ids, g.n_nodes)
        ncn1, ocn2, new_ema, new_n = orthogonalize(
            cn1, cn2, ema.value, nvar.value, training, self.empty_fill, fidx
        )
        if training and not self.is_initializing():
            ema.value = new_ema
            nvar.value = new_n

        # one shared gather for both aggregates (frames share ids); with
        # y/pos the gather reads contiguous CSR windows of the hoisted table
        xcn1, xcn2 = matmul_shared([ncn1, ocn2], x, fidx, y=y, pos=pos)
        xij = XijMLP(self.hidden, self.dropout, self.ln, self.tailact)(
            x[tar_ei[0]] * x[tar_ei[1]], det
        )
        xcn1 = CNAggMLP(self.hidden, self.dropout, self.ln, False)(xcn1, det)
        xcn2 = CNAggMLP(self.hidden, self.dropout, self.ln, False)(xcn2, det)

        a = jnp.cumprod(jax.nn.sigmoid(alpha))
        z = a[0] * xcn1 + a[1] * xcn2 + beta * xij
        return HeadMLP(
            self.hidden, self.out, self.dropout, self.ln, self.twolayerlin
        )(z, det)


class CN1Predictor(nn.Module):
    """cn1 (reference CNLinkPredictor, model.py:524-840).

    Same orthogonalization as cn5 but the CN aggregates stay "one-hot":
    xcn = ncn @ I fed into the first Linear — implemented as a candidate-frame
    gather of that Linear's weight columns.  `xij_in` mirrors the hard-coded
    64-dim xijlin input (model.py:577); pass hidden sizes accordingly.
    """

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

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        g: Graph,
        cn1: CNFrame,
        cn2: CNFrame,
        tar_ei: jax.Array,
        training: bool = False,
        y: Optional[jax.Array] = None,
        pos: Optional[jax.Array] = None,
    ) -> jax.Array:
        del y, pos  # one-hot aggregation gathers MLP weight columns, not x
        det = not training
        beta = self.param("beta", nn.initializers.constant(self.beta_init), (1,))
        alpha = self.param("alpha", nn.initializers.ones, (3,))
        ema = self.variable("ema", "innerprod", lambda: jnp.zeros(()))
        nvar = self.variable("ema", "n", lambda: jnp.zeros((), jnp.int32))

        from ocn_tpu.ops.frame import frame_index

        fidx = frame_index(cn1.ids, g.n_nodes)
        ncn1, ocn2, new_ema, new_n = orthogonalize(
            cn1, cn2, ema.value, nvar.value, training, 0.0, fidx
        )
        if training and not self.is_initializing():
            ema.value = new_ema
            nvar.value = new_n

        def onehot_mlp(cn: CNFrame, name: str) -> jax.Array:
            # first Linear of the CNAggMLP applied to the sparse (B, N) rows:
            # out[b] = sum_k val[b,k] * W[:, ids[b,k]] + b1
            w = self.param(f"{name}_w1", nn.initializers.lecun_normal(),
                           (self.n_nodes, self.hidden))
            b1 = self.param(f"{name}_b1", nn.initializers.zeros, (self.hidden,))
            cols = w[jnp.minimum(cn.ids, self.n_nodes - 1)]  # (B, K, H)
            h = jnp.einsum("bk,bkh->bh", cn.val, cols,
                           preferred_element_type=jnp.float32).astype(x.dtype) + b1
            # remaining layers of the reference xcn1lin (model.py:556-561)
            h = nn.Dropout(self.dropout, deterministic=det)(h)
            h = nn.relu(h)
            h = nn.Dense(self.hidden)(h)
            if self.ln:
                h = nn.LayerNorm(epsilon=1e-5)(h)
            h = nn.Dropout(self.dropout, deterministic=det)(h)
            h = nn.relu(h)
            return nn.Dense(self.hidden)(h)

        xcn1 = onehot_mlp(ncn1, "xcn1")
        xcn2 = onehot_mlp(ocn2, "xcn2")
        xij = XijMLP(self.hidden, self.dropout, self.ln, self.tailact)(
            x[tar_ei[0]] * x[tar_ei[1]], det
        )
        a = jnp.cumprod(jax.nn.sigmoid(alpha))
        z = a[0] * xcn1 + a[1] * xcn2 + beta * xij
        return HeadMLP(
            self.hidden, self.out, self.dropout, self.ln, self.twolayerlin
        )(z, det)
