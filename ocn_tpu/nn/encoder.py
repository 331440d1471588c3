"""GNN encoders (flax linen) — reference GCN/GCN2/GCN3 (model.py:232-511).

One module covers all three reference encoders; the pygho variants differ only
in conv registry (`stack="ho"`) and in that GCN2/GCN3 construct DropAdj but
never apply it in forward (model.py:406) — reproduced via `apply_adjdrop`.

Architecture (verified against model.py:232-323):
* input path: integer features (ppa/ddi) -> Embedding(max_x+1, hidden) with
  orthogonal init + Dropout(dropout); else Dropout(xdp) and, for "pure" convs
  or num_layers==0, Linear(in, hidden) + Dropout(dropout).
* conv stack: pure convs are (hidden -> hidden) with per-layer DropAdj(edrop)
  and a tail Dropout(tdp) after the last conv; non-pure convs interleave
  [LN?, Dropout, ReLU] blocks with Identity after the final conv.  The
  reference's middle-layer out_channels quirk (model.py:292-296) is moot since
  every driver passes hidden == out; we require that equality.
* optional residual (when shapes match) and learned JumpingKnowledge: x =
  sum_l jkparams[l] * x_l with *raw* (not softmaxed) weights (model.py:319-322).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ocn_tpu.nn.conv import make_conv, PureConv, PureConvV2
from ocn_tpu.sparse.csr import Graph


class GCNEncoder(nn.Module):
    hidden: int
    num_layers: int = 1
    dropout: float = 0.3
    ln: bool = False
    res: bool = False
    max_x: int = -1
    conv_fn: str = "gcn"
    jk: bool = False
    edrop: float = 0.0
    xdropout: float = 0.0
    taildropout: float = 0.0
    noinputlin: bool = False
    stack: str = "ts"
    apply_adjdrop: bool = True  # False replicates GCN2/GCN3's unused DropAdj

    @nn.compact
    def __call__(self, x: jax.Array, g: Graph, training: bool = False) -> jax.Array:
        det = not training
        pure = "pure" in self.conv_fn
        # ---- xemb path (model.py:253-262) --------------------------------
        if self.max_x >= 0:
            emb = nn.Embed(
                self.max_x + 1, self.hidden,
                embedding_init=nn.initializers.orthogonal(),
            )
            x = emb(x.astype(jnp.int32))
            x = nn.Dropout(self.dropout, deterministic=det)(x)
        else:
            x = nn.Dropout(self.xdropout, deterministic=det)(x)
            if not self.noinputlin and (pure or self.num_layers == 0):
                x = nn.Dense(self.hidden)(x)
                if self.dropout > 1e-6:
                    x = nn.Dropout(self.dropout, deterministic=det)(x)

        if self.num_layers == 0 or self.conv_fn == "none":
            return x

        jkparams = (
            self.param("jkparams", nn.initializers.normal(1.0), (self.num_layers,))
            if self.jk else None
        )

        def dropadj(gg: Graph, i: int) -> Graph:
            if training and self.apply_adjdrop and self.edrop > 1e-6:
                return gg.drop_edges(self.make_rng("dropout"), self.edrop)
            return gg

        jkx = []
        for i in range(self.num_layers):
            if pure:
                conv = (PureConv if self.stack == "ts" else PureConvV2)(
                    self.conv_fn.removeprefix("pure"))
                x1 = conv(x, dropadj(g, i))
                if i == self.num_layers - 1:
                    x1 = nn.Dropout(self.taildropout, deterministic=det)(x1)
            else:
                conv = make_conv(self.conv_fn, self.hidden, self.stack)
                x1 = conv(x, dropadj(g, i))
                # the reference puts an [LN?, Dropout, ReLU] block after every
                # conv except the last, *except* that a 1-layer stack keeps its
                # block (model.py:288-291 builds lins[0] before the loop)
                if i < self.num_layers - 1 or self.num_layers == 1:
                    if self.ln:
                        x1 = nn.LayerNorm(epsilon=1e-5)(x1)
                    x1 = nn.Dropout(self.dropout, deterministic=det)(x1)
                    x1 = nn.relu(x1)
            if self.res and x1.shape[-1] == x.shape[-1]:
                x = x1 + x
            else:
                x = x1
            if self.jk:
                jkx.append(x)
        if self.jk:
            stacked = jnp.stack(jkx, 0)
            # keep activations in the layer dtype: the f32 jkparams would
            # otherwise promote h to f32 and double every downstream
            # gather's HBM traffic (f32 is still used for the weighted sum)
            x = jnp.sum(stacked * jkparams[:, None, None], axis=0).astype(
                jkx[0].dtype)
        return x
