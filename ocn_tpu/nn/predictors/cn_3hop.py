"""cn6 — 3-hop orthogonalized CN predictor.

Reference `CNLinkPredictor3hopCNs` (model.py:2447-2954).  Takes cn1, cn2, cn3
frames (all on the shared src-candidate layout) and runs a double
Gram-Schmidt:

1. ncn1 = colnorm_quirk(cn1)                               (model.py:2547-2560)
2. EMA <cn2, ncn1>; cn2 <- cn2 - nip*ncn1; plain colnorm   (:2637-2726)
3. EMA <cn3, ncn1>; EMA <cn3, ncn2>                        (:2813-2861)
4. cn3 <- cn3 - nip1*ncn1 - nip2*ncn2; plain colnorm       (:2839-2932)
5. head: lin(a0*xcn1 + a1*xcn2 + a2*xcn3 + beta*xij)       (:2946-2948)

Faithful quirk: all three inner products share ONE running-mean buffer
(`innerprod1` reuses self.innerprod / self.n, model.py:2524-2533), so each
forward steps the same EMA three times, both cn3 projections divide by
max|ncn1| (model.py:2848-2856), and both cn3 coefficients alias to the
buffer's post-third-update value (`innerprod1` returns the buffer tensor
itself; the nip1 division happens after the nip2 call stepped it —
see ops/ortho.orthogonalize3).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ocn_tpu.nn.mlp import CNAggMLP, HeadMLP, XijMLP
from ocn_tpu.ops.frame import CNFrame
from ocn_tpu.sparse.csr import Graph


class OCN3HopPredictor(nn.Module):
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

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        g: Graph,
        cn1: CNFrame,
        cn2: CNFrame,
        cn3: CNFrame,
        tar_ei: jax.Array,
        training: bool = False,
        y=None,
        pos=None,
    ) -> jax.Array:
        det = not training
        beta = self.param("beta", nn.initializers.constant(self.beta_init), (1,))
        alpha = self.param("alpha", nn.initializers.ones, (3,))
        ema = self.variable("ema", "innerprod", lambda: jnp.zeros(()))
        nvar = self.variable("ema", "n", lambda: jnp.zeros((), jnp.int32))

        from ocn_tpu.ops.frame import frame_index, matmul_shared
        from ocn_tpu.ops.ortho import orthogonalize3

        fidx = frame_index(cn1.ids, g.n_nodes)  # shared: all frames use src ids
        # fused double-GS: one 5-plane sorted-domain colsum pass instead of
        # three sequential quirk/plain/plain trips (ops/ortho.orthogonalize3)
        ncn1, ocn2, ocn3, ema_v, n_v = orthogonalize3(
            cn1, cn2, cn3, ema.value, nvar.value, training, 0.0, fidx)

        if training and not self.is_initializing():
            ema.value = ema_v
            nvar.value = n_v

        a1, a2, a3 = matmul_shared([ncn1, ocn2, ocn3], x, fidx, y=y, pos=pos)
        xcn1 = CNAggMLP(self.hidden, self.dropout, self.ln, False)(a1, det)
        xcn2 = CNAggMLP(self.hidden, self.dropout, self.ln, False)(a2, det)
        xcn3 = CNAggMLP(self.hidden, self.dropout, self.ln, False)(a3, det)
        xij = XijMLP(self.hidden, self.dropout, self.ln, self.tailact)(
            x[tar_ei[0]] * x[tar_ei[1]], det
        )
        a = jnp.cumprod(jax.nn.sigmoid(alpha))
        z = a[0] * xcn1 + a[1] * xcn2 + a[2] * xcn3 + beta * xij
        return HeadMLP(
            self.hidden, self.out, self.dropout, self.ln, self.twolayerlin
        )(z, det)
