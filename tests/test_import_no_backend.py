"""Importing the package must NOT initialize any JAX backend.

The driver's multi-chip dry run does a bare ``import __graft_entry__`` and
only then calls ``dryrun_multichip`` (which self-provisions a virtual CPU
mesh). Any module-scope eager jnp op anywhere in the import graph
initializes the *default* backend — under the axon sitecustomize that is
the real TPU tunnel, which (a) wastes the single TPU client slot, (b) dies
on a libtpu version mismatch on the driver box, and (c) hangs forever when
the relay daemon is down. This exact failure made the MULTICHIP contract
artifact red in rounds 2 AND 3 (``ops/bvh.py`` had a module-scope
``jnp.int32``). Reference parity: the C++ reference has no import-time
device side effects at all (main.cpp:18-60 constructs state lazily).

Runs in a subprocess so this test is immune to conftest's own backend
setup, and imports EVERY nbody_tpu submodule plus ``__graft_entry__`` so a
regression anywhere in the package trips it.
"""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

_PROBE = r"""
import pkgutil
import sys

import nbody_tpu

mods = ["__graft_entry__", "nbody_tpu"]
for info in pkgutil.walk_packages(nbody_tpu.__path__, prefix="nbody_tpu."):
    mods.append(info.name)
for name in mods:
    __import__(name)

import jax._src.xla_bridge as xb
live = list(getattr(xb, "_backends", {}))
assert not live, f"importing {mods} initialized backends: {live}"
print("OK", len(mods))
"""


def test_import_whole_package_initializes_no_backend():
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")
    assert proc.stdout.startswith("OK")
