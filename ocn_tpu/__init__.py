"""ocn_tpu — a TPU-native framework for higher-order common-neighbor link
prediction (the OCN/OCNP model family), built on JAX/XLA/Pallas.

Capability-equivalent to the reference qingpingmo/OCN PyTorch-Geometric
codebase, re-designed TPU-first: static-shape candidate-frame CN extraction
instead of dynamic sparse tensors, one jitted train step instead of a Python
per-batch pipeline, `jax.sharding` meshes instead of single-GPU placement.
See SURVEY.md for the reference analysis and README.md for usage.
"""

__version__ = "0.1.0"

from ocn_tpu.config import Config, presets  # noqa: F401
