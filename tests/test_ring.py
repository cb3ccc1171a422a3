"""Multi-chip ring brute force on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import GravityConfig, random_system
from nbody_tpu.ops.brute_force import brute_force_direct
from nbody_tpu.parallel.mesh import make_mesh
from nbody_tpu.parallel.ring import ring_brute_force


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n", [256, 300])  # 300 exercises shard padding
def test_ring_matches_direct(rng_key, dim, n):
    sys = random_system(rng_key, n, dim=dim, dtype=jnp.float64)
    cfg = GravityConfig()
    mesh = make_mesh()
    want = brute_force_direct(sys.positions, sys.masses, cfg)
    got = ring_brute_force(sys.positions, sys.masses, cfg, mesh=mesh)
    assert got.shape == (n, dim)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-8)


def test_ring_on_mesh_subset(rng_key):
    # 2- and 4-device meshes (ring length != device count edge cases).
    sys = random_system(rng_key, 128, dim=3, dtype=jnp.float64)
    cfg = GravityConfig()
    want = brute_force_direct(sys.positions, sys.masses, cfg)
    for k in (2, 4):
        mesh = make_mesh(jax.devices()[:k])
        got = ring_brute_force(sys.positions, sys.masses, cfg, mesh=mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-8)


def test_ring_output_stays_sharded(rng_key):
    sys = random_system(rng_key, 256, dim=3, dtype=jnp.float32)
    mesh = make_mesh()
    got = ring_brute_force(sys.positions, sys.masses, mesh=mesh)
    assert len(got.sharding.device_set) == 8


def test_ring_with_pallas_local(rng_key):
    """ppermute ring with the Pallas rectangular tile as the local engine
    (interpret mode on the CPU mesh)."""
    import functools
    from nbody_tpu.ops.pallas_brute import pairwise_accel_pallas
    sys = random_system(rng_key, 256, dim=3, dtype=jnp.float32)
    cfg = GravityConfig()
    want = brute_force_direct(sys.positions, sys.masses, cfg)
    local = functools.partial(pairwise_accel_pallas, block_t=8,
                              block_s=128, interpret=True)
    got = ring_brute_force(
        sys.positions, sys.masses, cfg, mesh=make_mesh(),
        local_accel=lambda t, s, m, soft: local(t, s, m, softening=soft))
    from nbody_tpu.utils.accuracy import scale_normalized_error
    assert float(scale_normalized_error(got, want)) < 1e-4
