"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on a fake CPU backend
(``--xla_force_host_platform_device_count``), per the framework test
strategy (SURVEY.md §4): TPU hardware is not required to run the suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the host env pins axon/TPU
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize may have imported jax and registered the TPU backend before
# this file runs, making the env var too late — force via config as well.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
