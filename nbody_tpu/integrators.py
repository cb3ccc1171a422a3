"""Time integrators: explicit Euler and kick-drift-kick leapfrog.

The reference defines explicit-Euler helpers ``update_body_velocities`` /
``update_body_positions`` (``methods.cpp:426-450``) that are never called by
any driver (SURVEY.md §3.5). Here stepping is a first-class API:
:func:`euler_step` reproduces those helpers' semantics (v += F/m·dt then
x += v·dt) and :func:`leapfrog_step` adds the symplectic KDK integrator
required by BASELINE.json.

Both steps are pure functions ``(System, forces_fn, dt) -> System`` suitable
for ``jax.jit`` and ``lax.scan``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .state import System

# forces_fn(positions [N,D], masses [N]) -> forces [N,D]
ForcesFn = Callable[[jax.Array, jax.Array], jax.Array]


def euler_step(system: System, forces_fn: ForcesFn, dt) -> System:
    """Explicit Euler: v += F/m·dt; x += v·dt (methods.cpp:426-450 parity)."""
    dt = jnp.asarray(dt, system.positions.dtype)
    forces = forces_fn(system.positions, system.masses)
    new_v = system.velocities + forces / system.masses[:, None] * dt
    new_x = system.positions + new_v * dt
    return system.replace(positions=new_x, velocities=new_v)


def leapfrog_step(system: System, forces_fn: ForcesFn, dt) -> System:
    """Symplectic kick-drift-kick leapfrog (2nd order, time reversible)."""
    dt = jnp.asarray(dt, system.positions.dtype)
    half = dt * 0.5
    a0 = forces_fn(system.positions, system.masses) / system.masses[:, None]
    v_half = system.velocities + a0 * half
    x1 = system.positions + v_half * dt
    a1 = forces_fn(x1, system.masses) / system.masses[:, None]
    v1 = v_half + a1 * half
    return system.replace(positions=x1, velocities=v1)


def simulate(
    system: System,
    forces_fn: ForcesFn,
    dt,
    num_steps: int,
    integrator: str = "leapfrog",
) -> Tuple[System, None]:
    """Run ``num_steps`` under ``lax.scan`` (compiled once, static step count)."""
    step = {"euler": euler_step, "leapfrog": leapfrog_step}[integrator]

    def body(sys, _):
        return step(sys, forces_fn, dt), None

    final, _ = jax.lax.scan(body, system, None, length=num_steps)
    return final, None
