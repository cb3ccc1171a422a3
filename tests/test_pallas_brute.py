"""Pallas brute-force kernel vs the jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import GravityConfig, random_system
from nbody_tpu.utils.accuracy import scale_normalized_error
from nbody_tpu.ops.brute_force import brute_force_direct
from nbody_tpu.ops.pallas_brute import brute_force_pallas


@pytest.mark.parametrize("n", [96, 256])
def test_matches_jnp_oracle(rng_key, dim, n):
    sys = random_system(rng_key, n, dim=dim, dtype=jnp.float32)
    cfg = GravityConfig()
    want = brute_force_direct(
        sys.positions.astype(jnp.float64),
        sys.masses.astype(jnp.float64), cfg)
    got = brute_force_pallas(sys.positions, sys.masses, cfg,
                             block_t=64, block_s=128, interpret=True)
    assert got.shape == (n, dim)
    assert float(scale_normalized_error(got, want)) < 1e-4


def test_padding_path(rng_key):
    # N not a multiple of any block size exercises zero-mass far padding.
    sys = random_system(rng_key, 100, dim=3, dtype=jnp.float32)
    cfg = GravityConfig()
    want = brute_force_direct(sys.positions, sys.masses, cfg)
    got = brute_force_pallas(sys.positions, sys.masses, cfg,
                             block_t=64, block_s=64, interpret=True)
    assert float(scale_normalized_error(got, want)) < 1e-3


def test_coincident_bodies(rng_key):
    pos = jnp.array([[1.0, 1.0, 1.0]] * 2 + [[5.0, 1.0, 1.0]],
                    dtype=jnp.float32)
    pos = jnp.concatenate([pos, jax.random.uniform(
        rng_key, (61, 3), minval=10.0, maxval=20.0)], axis=0)
    mass = jnp.ones((64,), jnp.float32)
    cfg = GravityConfig(G=1.0, softening=0.0)
    got = brute_force_pallas(pos, mass, cfg, block_t=64, block_s=64,
                             interpret=True)
    want = brute_force_direct(pos, mass, cfg)
    assert np.all(np.isfinite(np.asarray(got)))
    assert float(scale_normalized_error(got, want)) < 1e-4


def test_2d_matches(rng_key):
    sys = random_system(rng_key, 128, dim=2, dtype=jnp.float32)
    cfg = GravityConfig()
    want = brute_force_direct(sys.positions, sys.masses, cfg)
    got = brute_force_pallas(sys.positions, sys.masses, cfg,
                             block_t=64, block_s=128, interpret=True)
    assert got.shape == (128, 2)
    assert float(scale_normalized_error(got, want)) < 1e-3


@pytest.mark.parametrize("n,block", [(96, 32), (256, 64), (100, 64),
                                     (320, 64), (64, 64)])
def test_symmetric_matches_oracle(rng_key, n, block):
    """Newton-3 round-robin kernel vs f64 oracle: even/odd/single block
    counts, non-divisible N (zero-mass padding), both accumulation sides."""
    sys = random_system(rng_key, n, dim=3, dtype=jnp.float32)
    cfg = GravityConfig()
    want = brute_force_direct(
        sys.positions.astype(jnp.float64),
        sys.masses.astype(jnp.float64), cfg)
    got = brute_force_pallas(sys.positions, sys.masses, cfg, block_t=block,
                             mode="symmetric", s_sub=block, interpret=True)
    assert got.shape == (n, 3)
    assert float(scale_normalized_error(got, want)) < 1e-4


def test_symmetric_2d(rng_key):
    sys = random_system(rng_key, 384, dim=2, dtype=jnp.float32)
    cfg = GravityConfig()
    want = brute_force_direct(sys.positions, sys.masses, cfg)
    got = brute_force_pallas(sys.positions, sys.masses, cfg, block_t=128,
                             mode="symmetric", s_sub=128, interpret=True)
    assert float(scale_normalized_error(got, want)) < 1e-4


def test_symmetric_coincident_guarded(rng_key):
    """softening=0 forces the reference pair guard through the symmetric
    path too (coincident distinct bodies must not produce NaN)."""
    pos = jnp.array([[1.0, 1.0, 1.0]] * 2 + [[5.0, 1.0, 1.0]],
                    dtype=jnp.float32)
    pos = jnp.concatenate([pos, jax.random.uniform(
        rng_key, (61, 3), minval=10.0, maxval=20.0)], axis=0)
    mass = jnp.ones((64,), jnp.float32)
    cfg = GravityConfig(G=1.0, softening=0.0)
    got = brute_force_pallas(pos, mass, cfg, block_t=32, mode="symmetric",
                             s_sub=32, interpret=True)
    want = brute_force_direct(pos, mass, cfg)
    assert np.all(np.isfinite(np.asarray(got)))
    assert float(scale_normalized_error(got, want)) < 1e-4


def test_mxu_mode_tolerance(rng_key):
    """MXU-reduction mode trades ~1e-4 cancellation error for speed."""
    sys = random_system(rng_key, 256, dim=3, dtype=jnp.float32)
    cfg = GravityConfig()
    want = brute_force_direct(sys.positions, sys.masses, cfg)
    got = brute_force_pallas(sys.positions, sys.masses, cfg, block_t=64,
                             block_s=128, mode="mxu", interpret=True)
    assert float(scale_normalized_error(got, want)) < 5e-3


def test_bad_mode_raises(rng_key):
    sys = random_system(rng_key, 64, dim=3)
    with pytest.raises(ValueError):
        brute_force_pallas(sys.positions, sys.masses, mode="fast")


def test_mxu_centered_and_sorted(rng_key):
    """Block-centered mxu reduction stays within its documented ~1e-4
    envelope, with and without Morton pre-sorting."""
    sys = random_system(rng_key, 512, dim=3, dtype=jnp.float32)
    cfg = GravityConfig()
    want = brute_force_direct(
        sys.positions.astype(jnp.float64),
        sys.masses.astype(jnp.float64), cfg)
    for sort in (False, True):
        err = float(scale_normalized_error(
            brute_force_pallas(sys.positions, sys.masses, cfg, block_t=64,
                               block_s=128, mode="mxu", sort=sort,
                               interpret=True), want))
        assert err < 3e-4, (sort, err)


def test_rect_tile_odd_source_count(rng_key):
    """pairwise_accel_pallas with a source count that is NOT a multiple of
    the 2048-lane sub-tile (the ring hands e.g. 12,500-body shards at
    N=1e5 on 8 chips) must round the window up, not crash the
    s_win % s_sub assert (round-2 regression)."""
    from nbody_tpu.ops.pallas_brute import pairwise_accel_pallas
    k1, k2 = jax.random.split(rng_key)
    tgt = random_system(k1, 64, dim=2, dtype=jnp.float32)
    src = random_system(k2, 2500, dim=2, dtype=jnp.float32)
    acc = pairwise_accel_pallas(tgt.positions, src.positions, src.masses,
                                softening=0.0, interpret=True)
    # f64 oracle for the un-G-scaled acceleration on the targets.
    t = np.asarray(tgt.positions, np.float64)
    s = np.asarray(src.positions, np.float64)
    m = np.asarray(src.masses, np.float64)
    diff = s[None, :, :] - t[:, None, :]
    d2 = np.sum(diff * diff, axis=-1)
    w = np.where(d2 < 1e-10, 0.0, m[None, :] * d2 ** -1.5)
    want = np.sum(w[..., None] * diff, axis=1)
    err = float(scale_normalized_error(acc, want))
    assert err < 1e-5, err


def test_precise_small_n_not_overpadded(rng_key):
    """mode='precise' at small N must clamp its blocks near N (round-2 fix:
    N=1000 used to pad to a full 16384² pair grid, ~270× wasted work) and
    still match the direct sum."""
    from nbody_tpu.ops import pallas_brute as pb
    sys = random_system(rng_key, 1000, dim=2, dtype=jnp.float32)
    cfg = GravityConfig()
    got = brute_force_pallas(sys.positions, sys.masses, cfg,
                             mode="precise", interpret=True)
    want = brute_force_direct(sys.positions, sys.masses, cfg)
    err = float(scale_normalized_error(got, want))
    assert err < 1e-5, err


@pytest.mark.parametrize("n,num_segments", [(500, 3), (384, 2), (129, 4)])
def test_segmented_matches_oracle(rng_key, dim, n, num_segments):
    """Watchdog-safe segmented driver ≡ direct sum, incl. non-divisible N
    (the lax.dynamic_slice clamp class of bug is padding-sensitive)."""
    from nbody_tpu.ops.pallas_brute import brute_force_pallas_segmented

    sys = random_system(rng_key, n, dim=dim, dtype=jnp.float32)
    cfg = GravityConfig()
    want = brute_force_direct(
        sys.positions.astype(jnp.float64),
        sys.masses.astype(jnp.float64), cfg)
    got = brute_force_pallas_segmented(sys.positions, sys.masses, cfg,
                                       num_segments=num_segments,
                                       interpret=True)
    assert got.shape == (n, dim)
    assert float(scale_normalized_error(got, want)) < 1e-4


def test_segmented_single_segment_is_symmetric_kernel(rng_key):
    # num_segments=1 delegates to the square Newton-3 kernel (no tiles,
    # no padding reshuffle); oracle-checked since sub-tile widths differ.
    from nbody_tpu.ops.pallas_brute import brute_force_pallas_segmented

    sys = random_system(rng_key, 256, dim=2, dtype=jnp.float32)
    cfg = GravityConfig()
    want = brute_force_direct(
        sys.positions.astype(jnp.float64),
        sys.masses.astype(jnp.float64), cfg)
    got = brute_force_pallas_segmented(sys.positions, sys.masses, cfg,
                                       num_segments=1, interpret=True)
    assert float(scale_normalized_error(got, want)) < 1e-4


@pytest.mark.parametrize("integrator", ["euler", "leapfrog"])
def test_fused_smalln_simulate_matches_scanned(rng_key, integrator):
    """The K-steps-inside-one-kernel integrator (interpret mode) is
    bit-exact vs the scanned integrators.simulate on the same f32 state
    (same op order per step; measured on-chip it is a negative result —
    2.08 µs/step scanned vs 15.8 µs fused at N=1e3 — kept as the
    documented small-N stepping experiment, ROADMAP r5)."""
    from nbody_tpu.config import GravityConfig
    from nbody_tpu.integrators import simulate
    from nbody_tpu.ops.brute_force import brute_force_direct
    from nbody_tpu.ops.pallas_brute import fused_smalln_simulate
    from nbody_tpu.state import random_system
    sys_ = random_system(rng_key, 300, dim=2, dtype=jnp.float32)
    cfg = GravityConfig()
    ref, _ = simulate(sys_, lambda p, m: brute_force_direct(p, m, cfg),
                      1e-6, 8, integrator=integrator)
    pos, vel = fused_smalln_simulate(
        sys_.positions, sys_.velocities, sys_.masses, dt=1e-6, num_steps=8,
        g=float(cfg.G), softening=float(cfg.softening),
        integrator=integrator, interpret=True)
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(ref.positions))
    np.testing.assert_array_equal(np.asarray(vel),
                                  np.asarray(ref.velocities))


def test_fused_smalln_rejects_big_n(rng_key):
    from nbody_tpu.ops.pallas_brute import FUSED_SMALLN_MAX, \
        fused_smalln_simulate
    n = FUSED_SMALLN_MAX + 1
    with pytest.raises(ValueError, match="fused_smalln"):
        fused_smalln_simulate(jnp.zeros((n, 2)), jnp.zeros((n, 2)),
                              jnp.ones((n,)), dt=1e-6, num_steps=1)
