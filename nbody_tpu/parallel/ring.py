"""Multi-chip ring brute force: shard targets, rotate sources over ICI.

The cross-chip generalization of the CUDA shared-memory tile loop
(``main_cuda.cu:31-53``) and of the reference's thread-local-accumulation
pattern (``methods.cpp:54-92`` — SURVEY.md §2.3): each chip owns a shard of
target bodies and a resident force accumulator; source shards rotate around
the 1-D ICI ring via ``lax.ppermute``, one rotation per step, so after P
steps every chip has accumulated forces from every source shard. No ``psum``
is needed — targets are disjoint, so accumulation is purely local (the
"row-wise no-reduction" shape, ``methods.cpp:98-136``, lifted across chips).

Memory per chip is O(N/P); ICI traffic per step is one shard (N/P bodies),
fully overlappable with the O((N/P)²) local tile compute.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DEFAULT_GRAVITY, GravityConfig
from ..ops.brute_force import _accel_rows
from .mesh import BODY_AXIS, pad_to_multiple

# local_accel(targets_pos [T,D], src_pos [S,D], src_mass [S], softening)
#   -> un-G-scaled acceleration contributions [T, D]
LocalAccelFn = Callable[[jax.Array, jax.Array, jax.Array, float], jax.Array]

_PAD_POS = 2.0e9


def _ring_local(pos_l, mass_l, *, axis_name, num_shards, softening,
                local_accel: LocalAccelFn):
    """Per-shard body: scan over ring rotations, accumulate local forces."""

    def step(carry, _):
        src_pos, src_mass, acc = carry
        acc = acc + local_accel(pos_l, src_pos, src_mass, softening)
        perm = [(i, (i + 1) % num_shards) for i in range(num_shards)]
        src_pos = jax.lax.ppermute(src_pos, axis_name, perm)
        src_mass = jax.lax.ppermute(src_mass, axis_name, perm)
        return (src_pos, src_mass, acc), None

    acc0 = jnp.zeros_like(pos_l)
    (_, _, acc), _ = jax.lax.scan(
        step, (pos_l, mass_l, acc0), None, length=num_shards)
    return acc


def ring_brute_force(
    positions: jax.Array,
    masses: jax.Array,
    config: GravityConfig = DEFAULT_GRAVITY,
    mesh: Optional[Mesh] = None,
    axis_name: str = BODY_AXIS,
    local_accel: Optional[LocalAccelFn] = None,
) -> jax.Array:
    """Per-body forces [N, D] computed over every device in ``mesh``.

    ``local_accel`` is the pluggable per-chip tile engine; by default the
    Pallas rectangular kernel on TPU (ops/pallas_brute.py) and the jnp row
    path elsewhere.
    """
    if mesh is None:
        from .mesh import make_mesh
        mesh = make_mesh(axis_name=axis_name)
    if local_accel is None:
        if jax.default_backend() == "tpu":
            from ..ops.pallas_brute import pallas_local_accel
            local_accel = pallas_local_accel
        else:
            local_accel = _accel_rows
    num_shards = mesh.shape[axis_name]
    n, d = positions.shape

    n_pad = pad_to_multiple(n, num_shards)
    if n_pad != n:
        pad = n_pad - n
        positions = jnp.concatenate(
            [positions, jnp.full((pad, d), _PAD_POS, positions.dtype)])
        masses = jnp.concatenate([masses, jnp.zeros((pad,), masses.dtype)])

    shard = NamedSharding(mesh, P(axis_name, None))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name)),
        out_specs=P(axis_name, None),
        # pallas_call outputs don't carry varying-mesh-axis metadata, so the
        # vma check must be off for Pallas local engines.
        check_vma=False,
    )
    def sharded(pos_l, mass_l):
        acc = _ring_local(
            pos_l, mass_l,
            axis_name=axis_name, num_shards=num_shards,
            softening=config.softening, local_accel=local_accel)
        g = jnp.asarray(config.G, acc.dtype)
        return (g * mass_l)[:, None] * acc

    positions = jax.device_put(positions, shard)
    masses = jax.device_put(masses, NamedSharding(mesh, P(axis_name)))
    forces = jax.jit(sharded)(positions, masses)
    return forces[:n]
