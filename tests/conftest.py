"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip
sharding paths (mesh tests) execute without TPU hardware - the same pattern
the reference uses to fake hardware at the API boundary
(reference test_model.py:84-122 patches torch device discovery; here we give
JAX a fake 8-device topology instead).
"""

import os

# Must happen before jax initializes a backend. Note: the environment's
# sitecustomize registers a TPU plugin in every process; only the explicit
# config update below reliably selects the CPU backend with virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
# XLA compilation may be routed through a remote compile service in this
# environment; the persistent cache makes reruns cheap.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pathlib import Path

import numpy as np
import pytest


@pytest.fixture
def test_data_directory():
    return Path(__file__).parent / "data"


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def valid_multichannel_nd2_path(test_data_directory):
    path = test_data_directory / "example-multichannel.nd2"
    if not path.exists():
        pytest.skip("example-multichannel.nd2 fixture not present")
    return path


@pytest.fixture
def valid_timelapse_nd2_path(test_data_directory):
    path = test_data_directory / "example-timelapse.nd2"
    if not path.exists():
        pytest.skip("example-timelapse.nd2 fixture not present")
    return path


@pytest.fixture
def valid_zstack_nd2_path(test_data_directory):
    path = test_data_directory / "example-zstack.nd2"
    if not path.exists():
        pytest.skip("example-zstack.nd2 fixture not present")
    return path


@pytest.fixture
def known_metadata(test_data_directory):
    import yaml

    yaml_path = test_data_directory / "known-metadata.yml"
    if not yaml_path.exists():
        pytest.skip("known-metadata.yml fixture not present")
    with yaml_path.open("r") as file:
        return yaml.safe_load(file)
