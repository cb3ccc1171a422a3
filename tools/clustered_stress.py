"""Clustered-distribution stress: Plummer N=1e5 3D on the live backend.

The uniform grid tiers' DENSE layout refuses this input
(`check_grid_capacity`: the densest leaf cell holds ~64% of all bodies at
the auto level — VERDICT round-1 weak item 6). Two paths must handle it
in O(N) memory:

* the adaptive Hilbert-radix BVH (auto-escalating traversal capacities,
  subset re-dispatch of overflowed groups), and
* the sparse chunked grid layout (`ops/sparse_grid.py`), reached
  automatically by ``barnes_hut_grid(layout="auto")`` — cell-aligned body
  chunks + windowed ring sources, shapes from an exact probe.

Records wall times and 512-body sampled f64 oracle errors for both, plus
the dense guard's refusal, to ``artifacts/clustered_stress.json``.

Run:  python tools/clustered_stress.py [--n 100000] [--theta 0.25]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)  # the sampled oracle is f64

import jax.numpy as jnp
import numpy as np

import nbody_tpu as nb
from nbody_tpu.models import plummer_sphere
from nbody_tpu.ops.bvh import bvh_forces
from nbody_tpu.ops.grid_tree import (auto_leaf_level, barnes_hut_grid,
                                     compute_capacity)


def sampled_oracle_error(positions, masses, forces, cfg, samples: int = 512):
    """max_i ||F_i - F_i^ref|| / rms(F^ref) over a strided body sample,
    reference in f64 against ALL bodies (exact, O(samples * N))."""
    n = positions.shape[0]
    idx = np.arange(0, n, max(1, n // samples))[:samples]
    p = jnp.asarray(positions, jnp.float64)
    m = jnp.asarray(masses, jnp.float64)
    d = p[idx, None, :] - p[None, :, :]
    r2 = jnp.sum(d * d, axis=-1) + float(cfg.softening) ** 2
    r2 = jnp.where(r2 < 1e-10, jnp.inf, r2)
    w = m[None, :, None] * (r2 ** -1.5)[..., None]
    ref = -jnp.sum(w * d, axis=1) * m[idx, None] * cfg.G
    got = jnp.asarray(forces)[idx].astype(jnp.float64)
    num = jnp.linalg.norm(got - ref, axis=-1)
    scale = jnp.sqrt(jnp.mean(jnp.sum(ref * ref, axis=-1)))
    return float(jnp.max(num) / scale)


def timed(fn):
    """(forces, cached_seconds): run twice, materialize to time (the axon
    relay makes block_until_ready a no-op)."""
    def run():
        out = fn()
        float(jnp.sum(jnp.abs(out)))
        return out
    run()  # compile (+ any BVH escalation recompiles)
    t0 = time.perf_counter()
    out = run()
    return out, time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--theta", type=float, default=0.25)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts",
        "clustered_stress.json"))
    args = ap.parse_args()

    sys, cfg = plummer_sphere(jax.random.key(11), args.n, dim=3,
                              dtype=jnp.float32)
    n, dim = sys.positions.shape

    # 1. The degenerate grid capacity and the DENSE layout's refusal.
    level = auto_leaf_level(n, dim)
    cap = compute_capacity(sys.positions, level)
    try:
        barnes_hut_grid(sys.positions, sys.masses, cfg,
                        theta=args.theta, layout="dense")
        grid_refused = False
    except ValueError as e:
        grid_refused = "bvh_forces" in str(e)

    # 2. The BVH tier (auto-escalating capacities, subset re-dispatch).
    bvh_out, bvh_s = timed(lambda: bvh_forces(
        sys.positions, sys.masses, cfg, theta=args.theta))
    bvh_err = sampled_oracle_error(sys.positions, sys.masses, bvh_out, cfg)

    # 3. The sparse grid fallback through the public driver (layout=auto).
    sp_out, sp_s = timed(lambda: barnes_hut_grid(
        sys.positions, sys.masses, cfg, theta=args.theta))
    sp_err = sampled_oracle_error(sys.positions, sys.masses, sp_out, cfg)

    artifact = {
        "backend": jax.default_backend(),
        "n": n,
        "dim": dim,
        "theta": args.theta,
        "distribution": "plummer (Henon units, a=1)",
        "grid_auto_leaf_level": level,
        "grid_max_leaf_occupancy": int(cap),
        "dense_grid_guard_refused": bool(grid_refused),
        "bvh_time_s": round(bvh_s, 4),
        "bvh_finite": bool(jnp.all(jnp.isfinite(bvh_out))),
        "bvh_sampled_norm_error_vs_f64": bvh_err,
        "sparse_grid_time_s": round(sp_s, 4),
        "sparse_grid_finite": bool(jnp.all(jnp.isfinite(sp_out))),
        "sparse_grid_sampled_norm_error_vs_f64": sp_err,
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))
    assert grid_refused and artifact["bvh_finite"] and bvh_err < 5e-2
    assert artifact["sparse_grid_finite"] and sp_err < 5e-2
    return 0


if __name__ == "__main__":
    import sys as _s
    _s.exit(main())
