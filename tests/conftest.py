"""Test configuration: run everything on CPU with 8 virtual devices so the
distributed (mesh/shard_map) paths are exercised without TPU hardware —
first-class automated distributed testing (improves on the reference, whose
multi-rank coverage was manual-only; SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var alone is overridden in some environments (the axon TPU plugin
# still grabs the device tunnel); the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
