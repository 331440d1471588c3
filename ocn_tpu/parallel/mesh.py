"""Device-mesh construction for multi-chip training.

The reference is strictly single-GPU (SURVEY.md §2.7: no torch.distributed,
hard-coded cuda:{0,1,2} per driver).  The TPU build scales instead via a
2-D `jax.sharding.Mesh`:

* axis "dp" — edge-batch data parallelism: each device scores a shard of the
  link batch; gradients are summed by XLA (the scaling axis of this workload
  is *edges*, not sequence length — SURVEY.md §2.7).
* axis "tp" — hidden-dimension tensor parallelism for the predictor MLP
  stack: (B, H) activations are sharded over H, letting XLA partition the
  Dense matmuls and ride ICI for the reductions.

Pipeline/sequence/expert parallelism have no analogue in this architecture
(shallow encoder, no sequences, no MoE); dp x tp covers the model family.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = dp * tp
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def edge_sharding(mesh: Mesh) -> NamedSharding:
    """(2, B) edge batches sharded over B."""
    return NamedSharding(mesh, P(None, "dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
