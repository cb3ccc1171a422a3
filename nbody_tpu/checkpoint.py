"""Checkpoint / resume for simulation state.

The reference has no checkpointing at all — state is regenerated randomly
each run from an unseeded PRNG (``utils.h:108-135``; SURVEY.md §5). Here
simulation state (System + step counter + PRNG key) round-trips through
either:

* **orbax** (preferred when available): async-capable, sharding-aware — the
  right choice for multi-chip runs; or
* a **portable .npz fallback** with the same API, so checkpointing works in
  minimal environments.

Layout: ``<dir>/step_<k>/`` (orbax) or ``<dir>/step_<k>.npz``.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .state import System

try:  # pragma: no cover - environment probe
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # noqa: BLE001
    _HAVE_ORBAX = False


def have_orbax() -> bool:
    return _HAVE_ORBAX


def save_checkpoint(directory: str, system: System, step: int,
                    key: Optional[jax.Array] = None,
                    use_orbax: Optional[bool] = None) -> str:
    """Persist (system, step, key); returns the checkpoint path."""
    use_orbax = _HAVE_ORBAX if use_orbax is None else use_orbax
    os.makedirs(directory, exist_ok=True)
    if use_orbax:
        if not _HAVE_ORBAX:
            raise RuntimeError("orbax requested but not importable")
        path = os.path.join(os.path.abspath(directory), f"step_{step}")
        ckptr = ocp.StandardCheckpointer()
        payload = {
            "positions": system.positions,
            "velocities": system.velocities,
            "masses": system.masses,
            "step": jnp.asarray(step, jnp.int32),
        }
        if key is not None:
            payload["key"] = jax.random.key_data(key)
        ckptr.save(path, payload)
        ckptr.wait_until_finished()
        return path
    path = os.path.join(directory, f"step_{step}.npz")
    payload = {
        "positions": np.asarray(system.positions),
        "velocities": np.asarray(system.velocities),
        "masses": np.asarray(system.masses),
        "step": np.asarray(step, np.int64),
    }
    if key is not None:
        payload["key"] = np.asarray(jax.random.key_data(key))
    np.savez(path, **payload)
    return path


def latest_step(directory: str) -> Optional[int]:
    """Highest checkpointed step in ``directory``, or None."""
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        m = re.fullmatch(r"step_(\d+)(?:\.npz)?", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def load_checkpoint(directory: str, step: Optional[int] = None
                    ) -> Tuple[System, int, Optional[jax.Array]]:
    """Restore (system, step, key) — from orbax or .npz, whichever exists."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    npz = os.path.join(directory, f"step_{step}.npz")
    odir = os.path.join(os.path.abspath(directory), f"step_{step}")
    if os.path.exists(npz):
        data = np.load(npz)
        system = System(positions=jnp.asarray(data["positions"]),
                        velocities=jnp.asarray(data["velocities"]),
                        masses=jnp.asarray(data["masses"]))
        key = (jax.random.wrap_key_data(jnp.asarray(data["key"]))
               if "key" in data else None)
        return system, int(data["step"]), key
    if _HAVE_ORBAX and os.path.isdir(odir):
        ckptr = ocp.StandardCheckpointer()
        data = ckptr.restore(odir)
        system = System(positions=jnp.asarray(data["positions"]),
                        velocities=jnp.asarray(data["velocities"]),
                        masses=jnp.asarray(data["masses"]))
        key = (jax.random.wrap_key_data(jnp.asarray(data["key"]))
               if "key" in data else None)
        return system, int(data["step"]), key
    raise FileNotFoundError(f"no checkpoint for step {step} in {directory}")
