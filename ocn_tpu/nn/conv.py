"""Graph convolutions (flax linen) over ocn_tpu Graphs.

Mirrors the reference's three conv families:
* `PureConv` — parameter-free aggregation mean/max/sum/gcn (model.py:32-55).
* PyG-`GCNConv`-style convs with an internal Linear, used by the non-"pure"
  registry names gcn/sage/gin/max (model.py:58-82).  `sage`/`gin`/`max` are
  GCNConv with normalize=False, add_self_loops=False and an aggr override,
  i.e. plain aggregation of xW plus bias.
* The pygho variants PureConv2/PureConv3 (model.py:85-142) differ from
  PureConv only in the gcn norm placement: `enorm = norm[i]*norm[j]` edge
  weights *without* the +x self term.  `PureConvV2` implements that.

The reference's fp32 autocast guard around the gcn SpMM (model.py:110-111) is
mirrored by always accumulating SpMM in float32 (ocn_tpu/ops/spmm.py uses
`preferred_element_type` fp32 semantics via segment_sum on fp32 values).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ocn_tpu.ops.spmm import gcn_norm_conv, gcn_selfloop_conv, spmm
from ocn_tpu.sparse.csr import Graph


class PureConv(nn.Module):
    """Parameter-free conv (reference model.py:32-55)."""

    aggr: str = "gcn"

    def __call__(self, x: jax.Array, g: Graph) -> jax.Array:
        if self.aggr in ("mean", "max", "sum"):
            return spmm(g, x, self.aggr)
        if self.aggr == "gcn":
            return gcn_norm_conv(g, x)
        raise ValueError(self.aggr)


class PureConvV2(nn.Module):
    """pygho-stack pure conv (reference PureConv2/3, model.py:98-113):
    identical to PureConv for mean/max/sum; 'gcn' uses enorm edge weights
    with no self term."""

    aggr: str = "gcn"

    def __call__(self, x: jax.Array, g: Graph) -> jax.Array:
        if self.aggr in ("mean", "max", "sum"):
            return spmm(g, x, self.aggr)
        if self.aggr == "gcn":
            own = getattr(g, "gcn_enorm_conv", None)
            if own is not None:  # node-sharded graph: halo-exchanged norms
                return own(x)
            norm = jax.lax.rsqrt(1.0 + g.value_rowsum()).astype(x.dtype)
            gw = g.with_values(g.val * norm[g.row] * norm[g.col])
            return spmm(gw, x, "sum")
        raise ValueError(self.aggr)


class GCNConvLike(nn.Module):
    """PyG GCNConv equivalent (reference convdict entries, model.py:58-71):
    out = prop(A~, x W) + b, where prop is D^-1/2(A+I)D^-1/2 when
    `normalize`, else the raw aggr."""

    features: int
    aggr: str = "sum"
    normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, g: Graph) -> jax.Array:
        x = nn.Dense(self.features, use_bias=False)(x)
        if self.normalize:
            out = gcn_selfloop_conv(g, x)
        else:
            out = spmm(g, x, self.aggr)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return out + bias


class LinConv(nn.Module):
    """pygho non-pure conv (PureConv2 with use_lin, model.py:96):
    aggregation followed by Linear(bias=False) + ReLU."""

    features: int
    aggr: str = "gcn"

    @nn.compact
    def __call__(self, x: jax.Array, g: Graph) -> jax.Array:
        x = PureConvV2(self.aggr)(x, g)
        return nn.relu(nn.Dense(self.features, use_bias=False)(x))


def make_conv(name: str, features: int, stack: str = "ts"):
    """Conv registries.

    stack="ts"  — torch_sparse stack (reference convdict, model.py:58-82).
    stack="ho"  — pygho stack (convdict2/convdict3, model.py:146-191); the
                  reference's convdict2 vs convdict3 differ only in an
                  autocast guard which is moot here, so one registry serves
                  both GCN2 and GCN3.
    Returns None for "none".
    """
    if name == "none":
        return None
    if stack == "ts":
        table = {
            "gcn": lambda: GCNConvLike(features, "sum", normalize=True),
            "gcn_cached": lambda: GCNConvLike(features, "sum", normalize=True),
            "sage": lambda: GCNConvLike(features, "mean", normalize=False),
            "gin": lambda: GCNConvLike(features, "sum", normalize=False),
            "max": lambda: GCNConvLike(features, "max", normalize=False),
            "puremax": lambda: PureConv("max"),
            "puresum": lambda: PureConv("sum"),
            "puremean": lambda: PureConv("mean"),
            "puregcn": lambda: PureConv("gcn"),
        }
    else:
        table = {
            "gcn": lambda: LinConv(features, "gcn"),
            "gcn_cached": lambda: LinConv(features, "gcn"),
            "sage": lambda: LinConv(features, "mean"),
            "gin": lambda: LinConv(features, "sum"),
            "max": lambda: LinConv(features, "max"),
            "puremax": lambda: PureConvV2("max"),
            "puresum": lambda: PureConvV2("sum"),
            "puremean": lambda: PureConvV2("mean"),
            "puregcn": lambda: PureConvV2("gcn"),
        }
    return table[name]()


CONV_NAMES = (
    "gcn", "gcn_cached", "sage", "gin", "max",
    "puremax", "puresum", "puremean", "puregcn", "none",
)
