"""Test harness config: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
``xla_force_host_platform_device_count`` (the TPU-world analog of testing
multi-node on one box — SURVEY.md §4). Must be set before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU-tunnel sitecustomize (/root/.axon_site) registers its backend
# at interpreter start and pins jax_platforms="axon,cpu" via jax.config, so
# the env var alone is not enough — override the config and drop any backend
# set initialized before this conftest ran.
jax.config.update("jax_platforms", "cpu")
from jax.extend.backend import clear_backends  # noqa: E402

clear_backends()

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_key():
    return jax.random.key(0)


@pytest.fixture(params=[2, 3])
def dim(request):
    return request.param


def assert_allclose(a, b, rtol=1e-5, atol=0.0, err_msg=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=rtol, atol=atol, err_msg=err_msg)
