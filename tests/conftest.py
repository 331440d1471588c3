"""Test configuration: run everything on a virtual 8-device CPU mesh.

The build image's sitecustomize registers the axon TPU PJRT plugin and
imports jax at interpreter startup with JAX_PLATFORMS=axon, so plain env
edits are too late — the platform must be overridden through jax.config
before any backend is initialized.  (SURVEY.md §4: multi-host tests runnable
without a pod via `xla_force_host_platform_device_count`.)
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
