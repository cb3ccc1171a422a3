"""nbody_tpu — a TPU-native N-body gravitational simulation engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++/OpenMP/ParlayLib/CUDA suite (mathaiml5/NBody-simulation-parallel): four
algorithm tiers — brute force O(N²), Barnes-Hut octree, Hilbert-BVH, and the
Fast Multipole Method — over a shared 2D/3D particle state with softened
Newtonian gravity, Euler and leapfrog stepping, a cross-algorithm accuracy
oracle, and a benchmark harness. See SURVEY.md for the reference layer map.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: first compiles of the deep tree programs
# take minutes through this environment's remote-compile tunnel; the disk
# cache turns every subsequent process's compile into a sub-second read.
# Only set when the user hasn't configured one, and only for the tunneled
# TPU platform — caching CPU executables AOT-compiled by the remote server
# risks machine-feature mismatches (SIGILL) on the local host.
if (not _os.environ.get("JAX_COMPILATION_CACHE_DIR")
        and not _jax.config.jax_compilation_cache_dir
        and "axon" in _os.environ.get("JAX_PLATFORMS", "")):
    try:
        _cache_dir = _os.path.join(
            _os.path.expanduser("~"), ".cache", "nbody_tpu_jax")
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass

from .config import (
    DEFAULT_GRAVITY,
    DEFAULT_TREE,
    GravityConfig,
    TreeConfig,
)
from .state import System, plummer_system, random_system
from .integrators import euler_step, leapfrog_step, simulate
from .ops.brute_force import (
    brute_force_accelerations,
    brute_force_blocked,
    brute_force_direct,
    kinetic_energy,
    potential_energy,
)
from .simulation import Simulation, available_methods
from .utils.accuracy import (
    accuracy_percentage,
    max_relative_error,
    percentile_relative_error,
    scale_normalized_error,
)

__version__ = "0.1.0"
