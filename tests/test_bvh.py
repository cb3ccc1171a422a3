"""Radix-BVH build invariants and force accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import GravityConfig, random_system
from nbody_tpu.ops.brute_force import brute_force_direct
from nbody_tpu.ops.bvh import build_bvh, bvh_forces
from nbody_tpu.ops.keys import MAX_BITS
from nbody_tpu.utils.accuracy import scale_normalized_error


def make_tree(rng_key, n, dim):
    sys = random_system(rng_key, n, dim=dim, dtype=jnp.float64)
    kb = dim * MAX_BITS[dim]
    return sys, build_bvh(sys.positions, sys.masses, kb)


def test_build_invariants(rng_key, dim):
    n = 300
    sys, tree = make_tree(rng_key, n, dim)
    total = float(jnp.sum(sys.masses))

    # Root covers everything, mass conserved, COM correct.
    assert int(tree.range_l[0]) == 0 and int(tree.range_r[0]) == n - 1
    np.testing.assert_allclose(float(tree.node_mass[0]), total, rtol=1e-12)
    com = np.asarray(jnp.sum(sys.masses[:, None] * sys.positions, axis=0)
                     / total)
    np.testing.assert_allclose(np.asarray(tree.node_com[0]), com, rtol=1e-12)

    # Every internal node's children partition its range.
    rl = np.asarray(tree.range_l)
    rr = np.asarray(tree.range_r)
    left = np.asarray(tree.left)
    for i in range(min(n - 1, 64)):
        lc = left[i]
        assert rl[lc] == rl[i], (i, lc)
        # right child = sibling of left: ranges are contiguous
        assert rr[lc] < rr[i]


def test_children_partition_and_aabb(rng_key):
    n = 128
    sys, tree = make_tree(rng_key, n, 2)
    rl = np.asarray(tree.range_l)
    rr = np.asarray(tree.range_r)
    left = np.asarray(tree.left)
    right = np.asarray(tree.right)
    pos = np.asarray(tree.pos_sorted)
    size = np.asarray(tree.node_size)
    for v in range(n - 1):
        # left/right children partition [l, r] contiguously.
        assert rl[left[v]] == rl[v]
        assert rr[right[v]] == rr[v]
        assert rr[left[v]] + 1 == rl[right[v]]
        # node_size is the exact AABB max extent of the covered range.
        span = pos[rl[v]:rr[v] + 1]
        want = (span.max(axis=0) - span.min(axis=0)).max()
        np.testing.assert_allclose(size[v], want, rtol=1e-12)


@pytest.mark.parametrize("n", [64, 256])
def test_bvh_matches_direct(rng_key, dim, n):
    sys = random_system(rng_key, n, dim=dim, dtype=jnp.float64)
    cfg = GravityConfig()
    want = brute_force_direct(sys.positions, sys.masses, cfg)
    got = bvh_forces(sys.positions, sys.masses, cfg, theta=0.25, batch=128)
    err = float(scale_normalized_error(got, want))
    assert err < 5e-3, f"theta=0.25 BVH error too large: {err}"


def test_bvh_theta_zero_exact(rng_key):
    """theta=0 disables the MAC: BVH must equal direct sum exactly."""
    sys = random_system(rng_key, 128, dim=2, dtype=jnp.float64)
    cfg = GravityConfig()
    want = brute_force_direct(sys.positions, sys.masses, cfg)
    got = bvh_forces(sys.positions, sys.masses, cfg, theta=1e-9, batch=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9)


def test_bvh_converges_with_theta(rng_key):
    sys = random_system(rng_key, 200, dim=3, dtype=jnp.float64)
    cfg = GravityConfig()
    want = brute_force_direct(sys.positions, sys.masses, cfg)
    # Small group size: with the dim-tuned default (256) a 200-body system
    # is a single group and every theta degenerates to exact P2P.
    errs = [float(scale_normalized_error(
        bvh_forces(sys.positions, sys.masses, cfg, theta=th, batch=128,
                   group_size=8),
        want)) for th in (0.8, 0.4, 0.2)]
    assert errs[2] < errs[0], errs
    assert errs[2] < 5e-3


def test_duplicate_positions(rng_key):
    """Identical keys exercise the index-tiebreak path (Karras §4)."""
    base = random_system(rng_key, 32, dim=2, dtype=jnp.float64)
    pos = jnp.concatenate([base.positions, base.positions[:8]])
    mass = jnp.concatenate([base.masses, base.masses[:8]])
    cfg = GravityConfig()
    got = bvh_forces(pos, mass, cfg, batch=64)
    want = brute_force_direct(pos, mass, cfg)
    assert np.all(np.isfinite(np.asarray(got)))
    err = float(scale_normalized_error(got, want))
    assert err < 5e-3
