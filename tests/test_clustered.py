"""Tree tiers on strongly clustered (Plummer) distributions.

The grid tree is uniform, so clustering inflates leaf capacity — these
tests pin down that the result stays *correct* (the documented cost is
memory/padding, not accuracy)."""

import jax.numpy as jnp

from nbody_tpu import GravityConfig
from nbody_tpu.models import plummer_sphere
from nbody_tpu.ops.brute_force import brute_force_direct
from nbody_tpu.ops.bvh import bvh_forces
from nbody_tpu.ops.fmm import fmm_forces
from nbody_tpu.ops.grid_tree import barnes_hut_grid, compute_capacity, auto_leaf_level
from nbody_tpu.utils.accuracy import scale_normalized_error


def test_bh_on_plummer(rng_key):
    sys, cfg = plummer_sphere(rng_key, 300, dtype=jnp.float64)
    want = brute_force_direct(sys.positions, sys.masses, cfg)
    got = barnes_hut_grid(sys.positions, sys.masses, cfg, theta=0.5)
    assert float(scale_normalized_error(got, want)) < 4e-2
    # Capacity inflates under clustering but stays bounded for this N.
    L = auto_leaf_level(300, 3)
    assert compute_capacity(sys.positions, L) <= 300


def test_fmm_on_plummer(rng_key):
    sys, cfg = plummer_sphere(rng_key, 300, dtype=jnp.float64)
    want = brute_force_direct(sys.positions, sys.masses, cfg)
    got = fmm_forces(sys.positions, sys.masses, cfg, order=4,
                     leaf_batch=64)
    assert float(scale_normalized_error(got, want)) < 2e-2


def test_bvh_on_plummer(rng_key):
    # The adaptive radix BVH handles clustering natively.
    sys, cfg = plummer_sphere(rng_key, 500, dtype=jnp.float64)
    want = brute_force_direct(sys.positions, sys.masses, cfg)
    got = bvh_forces(sys.positions, sys.masses, cfg, theta=0.25,
                     group_size=16, batch=128)
    assert float(scale_normalized_error(got, want)) < 5e-3
