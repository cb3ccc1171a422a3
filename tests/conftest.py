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


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """Release compiled executables after each test module.

    On a 1-CPU box the full suite deterministically segfaults inside
    XLA:CPU's compiler (backend_compile_and_load) at the ~192nd test —
    the same program compiles fine in a fresh process, so the trigger is
    cumulative in-process JIT state, not the program. Dropping the
    executable caches between modules keeps the resident LLVM JIT state
    bounded. (jax.clear_caches is cheap relative to the suite; recompiles
    within a module are unaffected.)
    """
    yield
    jax.clear_caches()


@pytest.fixture
def rng_key():
    return jax.random.key(0)


@pytest.fixture(params=[2, 3])
def dim(request):
    return request.param


def assert_allclose(a, b, rtol=1e-5, atol=0.0, err_msg=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=rtol, atol=atol, err_msg=err_msg)
