"""Scenario builders: each returns a (System, GravityConfig) pair.

All builders are deterministic given a PRNG key (fixing the reference's
unseeded ``std::random_device`` — SURVEY.md §8.7) and use self-consistent
unit systems stated per scenario.
"""

from __future__ import annotations

import warnings
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import GravityConfig
from ..state import System, plummer_system, random_system


def uniform_random(key: jax.Array, n: int, dim: int = 3,
                   dtype=jnp.float32) -> Tuple[System, GravityConfig]:
    """The reference's benchmark distribution (utils.h:113-115):
    pos ~ U[1, 1e7], vel ~ U[-10, 10], mass ~ U[1, 1e8], G = 4.471e-21."""
    return random_system(key, n, dim=dim, dtype=dtype), GravityConfig()


def plummer_sphere(key: jax.Array, n: int, dim: int = 3,
                   dtype=jnp.float32) -> Tuple[System, GravityConfig]:
    """Plummer model in Hénon units (G = M = 1, E = −1/4); cold start."""
    sys = plummer_system(key, n, dim=dim, dtype=dtype,
                         total_mass=1.0, scale_radius=1.0)
    return sys, GravityConfig(G=1.0, softening=4.0 / n)


def two_body_circular_orbit(dtype=jnp.float64
                            ) -> Tuple[System, GravityConfig]:
    """Equal-mass binary on a circular orbit (G=1, M=1 each, separation 2).

    Circular speed of each body about the barycenter: v² = G·M/(4·r) with
    r = 1 → v = 0.5. Period T = 2π·r/v = 4π. The analytic orbit makes this
    the integrator-accuracy scenario.
    """
    pos = jnp.array([[-1.0, 0.0], [1.0, 0.0]], dtype=dtype)
    vel = jnp.array([[0.0, -0.5], [0.0, 0.5]], dtype=dtype)
    mass = jnp.array([1.0, 1.0], dtype=dtype)
    return (System(positions=pos, velocities=vel, masses=mass),
            GravityConfig(G=1.0, softening=0.0))


def spiral_galaxy(key: jax.Array, n: int,
                  dtype=jnp.float32) -> Tuple[System, GravityConfig]:
    """2D exponential disk with a central mass and circular rotation (G=1).

    A rotating-disk scenario for visual demos and angular-momentum tests:
    the central body holds 80% of the mass; disk bodies start on locally
    circular orbits about the enclosed mass.
    """
    kr, kphi = jax.random.split(key)
    m_total = 1.0
    m_central = 0.8 * m_total
    m_disk = (m_total - m_central) / (n - 1)

    u = jax.random.uniform(kr, (n - 1,), minval=0.02, maxval=0.98)
    r = -jnp.log(1.0 - u)  # exponential profile, scale length 1
    phi = jax.random.uniform(kphi, (n - 1,), minval=0.0,
                             maxval=2.0 * jnp.pi)
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    # Enclosed mass approximation: central + disk fraction within r.
    m_enc = m_central + (n - 1) * m_disk * (1 - jnp.exp(-r) * (1 + r))
    v_circ = jnp.sqrt(m_enc / jnp.maximum(r, 1e-3))
    vx = -v_circ * jnp.sin(phi)
    vy = v_circ * jnp.cos(phi)

    pos = jnp.concatenate([jnp.zeros((1, 2)), jnp.stack([x, y], -1)])
    vel = jnp.concatenate([jnp.zeros((1, 2)), jnp.stack([vx, vy], -1)])
    mass = jnp.concatenate([jnp.array([m_central]),
                            jnp.full((n - 1,), m_disk)])
    sys = System(positions=pos.astype(dtype), velocities=vel.astype(dtype),
                 masses=mass.astype(dtype))
    return sys, GravityConfig(G=1.0, softening=0.05)


# J2000-ish heliocentric elements, circular-orbit approximation.
# Units: AU, solar masses, years → G = 4π².
_PLANETS = [
    # name, a [AU], mass [Msun]
    ("Mercury", 0.387, 1.66e-7),
    ("Venus", 0.723, 2.45e-6),
    ("Earth", 1.000, 3.00e-6),
    ("Mars", 1.524, 3.23e-7),
    ("Jupiter", 5.203, 9.55e-4),
    ("Saturn", 9.537, 2.86e-4),
    ("Uranus", 19.191, 4.37e-5),
    ("Neptune", 30.069, 5.15e-5),
]


def solar_system(dtype=jnp.float64) -> Tuple[System, GravityConfig]:
    """Sun + 8 planets on circular coplanar orbits; AU / Msun / yr units
    (G = 4π², so Earth's period is 1.0 by construction)."""
    if jax.dtypes.canonicalize_dtype(dtype) != jnp.dtype(dtype):
        warnings.warn(
            "solar_system(dtype=float64) with jax_enable_x64 off silently "
            "downcasts to float32; enable x64 or pass dtype=jnp.float32.",
            stacklevel=2)
    g = 4.0 * jnp.pi ** 2
    rows_p, rows_v, rows_m = [[0.0, 0.0, 0.0]], [[0.0, 0.0, 0.0]], [1.0]
    for i, (_, a, m) in enumerate(_PLANETS):
        phi = 2.0 * jnp.pi * i / len(_PLANETS)  # spread phases
        v = float(jnp.sqrt(g / a))
        rows_p.append([a * float(jnp.cos(phi)), a * float(jnp.sin(phi)),
                       0.0])
        rows_v.append([-v * float(jnp.sin(phi)), v * float(jnp.cos(phi)),
                       0.0])
        rows_m.append(m)
    sys = System(positions=jnp.asarray(rows_p, dtype),
                 velocities=jnp.asarray(rows_v, dtype),
                 masses=jnp.asarray(rows_m, dtype))
    return sys, GravityConfig(G=float(g), softening=0.0)
