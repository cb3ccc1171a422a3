"""On-backend accuracy smoke test: every registered method vs the oracle.

The CPU test suite runs Pallas in interpret mode and forced-f32 XLA, which
can hide backend-specific numerics (e.g. the TPU bf16 default matmul
precision that silently broke a kernel reduction). This script runs each
registered method ON THE CURRENT BACKEND and gates its scale-normalized
error against the blocked jnp oracle.

Run (TPU):  python tools/tpu_smoke.py [-N 20000] [--dim 2]
Exit code 1 if any method exceeds its error budget.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import nbody_tpu as nb
from nbody_tpu.bench.registry import methods_for_tiers
from nbody_tpu.config import DEFAULT_TREE
from nbody_tpu.ops.brute_force import brute_force_blocked
from nbody_tpu.utils.accuracy import scale_normalized_error

# Per-(method, dim) error budgets (scale-normalized, fp32, vs fp32 oracle),
# set to ~3× the errors measured on the real v5e chip at N=20000
# (2026-08, round 2) so a ≥10× numerics regression on any method fails.
# Measured 2D: BruteForce_Pallas 1.44e-5, BarnesHut_Grid 1.61e-5, Theta05
#   2.04e-5, BVH_Radix 1.44e-5, FMM_Chebyshev 2.10e-5.
# Measured 3D: Pallas 2.06e-5, BH_Grid 7.61e-5, Theta05 3.03e-3, BVH
#   4.76e-4, FMM 2.46e-4. The 3D tree errors are genuinely larger — the
#   metric is a MAX over bodies, and the 3D far-field tail has unlucky
#   bodies near accepted-cell boundaries; CPU f32 reproduces the same
#   values to ~1% (so this is algorithmic, not backend numerics).
BUDGETS = {
    "BruteForce_JNP": {2: 1e-7, 3: 1e-7},  # is a blocking of the oracle
    "BruteForce": {2: 5e-5, 3: 7e-5},
    "BarnesHut_Grid_Theta05": {2: 7e-5, 3: 1e-2},
    "BarnesHut": {2: 5e-5, 3: 2.5e-4},
    # BVH 3D tightened after the quad-build COM fix (bottom-up pairwise
    # mass/COM): measured 4.76e-4 → 2.55e-5 on-chip at N=20000.
    "BVH": {2: 5e-5, 3: 1e-4},
    "FMM": {2: 7e-5, 3: 8e-4},
}


# Budgets for --clustered (60% of bodies in a 1e-4-of-domain core): the
# grid methods take the sparse chunked fallback (ops/sparse_grid.py), BVH
# exercises its overflow escalation. Calibrated ~3× the CPU-f32 errors
# (CPU f32 reproduced on-chip values to ~1% for the uniform budgets);
# confirm on the first on-chip session after the sparse layout landed.
CLUSTERED_BUDGETS = {
    "BruteForce_JNP": {2: 1e-7, 3: 1e-7},
    "BruteForce": {2: 5e-5, 3: 7e-5},
    "BarnesHut_Grid_Theta05": {2: 2e-3, 3: 2e-2},
    "BarnesHut": {2: 5e-4, 3: 2e-3},
    "BVH": {2: 5e-4, 3: 2e-3},
    "FMM": {2: 5e-4, 3: 2e-3},
}


def budget_for(name: str, dim: int, clustered: bool = False) -> float:
    table = CLUSTERED_BUDGETS if clustered else BUDGETS
    for prefix, b in table.items():  # most-specific prefix listed first
        if name.startswith(prefix):
            return b[dim]
    return 1e-4


def clustered_system(key, n: int, dim: int, frac: float = 0.6):
    """frac of the bodies in a core 1e-4 of the domain wide, the rest
    uniform — reference coordinate scale (state.random_system units)."""
    base = nb.random_system(key, n, dim=dim, dtype=jnp.float32)
    nc = int(n * frac)
    lo = jnp.min(base.positions, axis=0)
    hi = jnp.max(base.positions, axis=0)
    center, width = 0.5 * (lo + hi), (hi - lo)
    k1, _ = jax.random.split(key)
    core = center + 1e-4 * width * jax.random.uniform(
        k1, (nc, dim), jnp.float32)
    pos = jnp.concatenate([core, base.positions[nc:]])
    return nb.System(positions=pos, velocities=base.velocities,
                     masses=base.masses)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-N", type=int, default=20000)
    p.add_argument("--dim", type=int, default=2, choices=(2, 3))
    p.add_argument("--clustered", action="store_true",
                   help="60%%-core clustered input: gates the sparse grid "
                        "fallback and the BVH escalation path")
    p.add_argument("--local-far", action="store_true",
                   help="also gate the non-default far_impl variants of "
                        "the BH grid and BVH tiers (grid defaults to "
                        "'local' since round 2, BVH to 'point' — this "
                        "adds the opposite of each)")
    args = p.parse_args()

    cfg = nb.GravityConfig()
    if args.clustered:
        system = clustered_system(jax.random.key(42), args.N, args.dim)
    else:
        system = nb.random_system(jax.random.key(42), args.N, dim=args.dim,
                                  dtype=jnp.float32)
    print(f"backend={jax.default_backend()} N={args.N} dim={args.dim}"
          f"{' clustered' if args.clustered else ''}")
    oracle = brute_force_blocked(system.positions, system.masses, cfg,
                                 block_size=1024)
    import numpy as np
    oracle_h = np.asarray(oracle)

    checks = [(m.name, lambda m=m: m.fn(
        system.positions, system.masses, cfg, DEFAULT_TREE))
        for m in methods_for_tiers("abhf")]
    if args.local_far:
        # The local-expansion far field shares each tier's error budget:
        # the Taylor truncation is gated below the multipole truncation
        # (ops/local_expansion.py), so a budget miss means a real bug.
        # Grid BH defaults to far_impl="local" (measured faster 3D, equal
        # 2D on-chip), BVH to "point" (measured neutral) — gate the
        # non-default impl of each so both code paths stay covered.
        from nbody_tpu.ops.bvh import bvh_forces
        from nbody_tpu.ops.grid_tree import barnes_hut_grid
        checks += [
            ("BarnesHut_Grid+point", lambda: barnes_hut_grid(
                system.positions, system.masses, cfg, theta=cfg.theta,
                far_impl="point")),
            ("BarnesHut_Grid_Theta05+point", lambda: barnes_hut_grid(
                system.positions, system.masses, cfg, theta=0.5,
                far_impl="point")),
            ("BVH_Radix+local", lambda: bvh_forces(
                system.positions, system.masses, cfg, far_impl="local")),
        ]

    failed = []
    for name, run in checks:
        try:
            forces = np.asarray(run())
            err = float(scale_normalized_error(forces, oracle_h))
        except Exception as e:  # noqa: BLE001
            print(f"  {name:<28} ERROR {type(e).__name__}: {e}")
            failed.append(name)
            continue
        base_name = name.replace("+local", "").replace("+point", "")
        b = budget_for(base_name, args.dim, args.clustered)
        ok = err <= b
        print(f"  {name:<28} err={err:.3e}  budget={b:.0e}  "
              f"{'OK' if ok else 'FAIL'}")
        if not ok:
            failed.append(name)

    if failed:
        print("FAILED:", ", ".join(failed))
        return 1
    print("all methods within budget")
    return 0


if __name__ == "__main__":
    sys.exit(main())
