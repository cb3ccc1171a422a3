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
import jax.numpy as jnp
import numpy as np

import nbody_tpu as nb
from nbody_tpu.models import plummer_sphere
from nbody_tpu.ops.bvh import bvh_forces
from nbody_tpu.ops.grid_tree import (auto_leaf_level, barnes_hut_grid,
                                     compute_capacity)


def sampled_oracle_error(positions, masses, forces, cfg, samples: int = 512):
    """max_i ||F_i - F_i^ref|| / rms(F^ref) over a strided body sample,
    reference in HOST numpy float64 against ALL bodies (exact,
    O(samples * N)) — numpy rather than jax_enable_x64 so the tool never
    flips process-global x64 (which would change what the TIMED force
    paths compile to on the axon backend; ADVICE r4)."""
    n = positions.shape[0]
    idx = np.arange(0, n, max(1, n // samples))[:samples]
    p = np.asarray(positions, np.float64)
    m = np.asarray(masses, np.float64)
    soft2 = float(cfg.softening) ** 2
    ref = np.zeros((idx.size, p.shape[1]))
    for s0 in range(0, n, 65_536):  # chunked: whole [S, N, D] is ~12 GB at 1e6
        ps = p[s0:s0 + 65_536]
        d = ps[None, :, :] - p[idx, None, :]
        r2 = np.sum(d * d, axis=-1) + soft2
        r2 = np.where(r2 < 1e-10, np.inf, r2)
        w = m[None, s0:s0 + 65_536] * (r2 ** -1.5)
        ref += np.sum(w[..., None] * d, axis=1)
    ref *= m[idx, None] * cfg.G
    got = np.asarray(forces)[idx].astype(np.float64)
    num = np.linalg.norm(got - ref, axis=-1)
    scale = np.sqrt(np.mean(np.sum(ref * ref, axis=-1)))
    return float(np.max(num) / scale)


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
    ap.add_argument("--sparse-tune", action="store_true",
                    help="sweep sparse-grid (chunk_size, window) on-chip")
    ap.add_argument("--skip-sparse", action="store_true",
                    help="skip the sparse-grid leg (its evaluation is ONE "
                         "device dispatch; at Plummer 1e6 theta=0.25 that "
                         "outran the ~30 s TPU watchdog and crashed the "
                         "worker - measured r5)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts",
        "clustered_stress.json"))
    args = ap.parse_args()

    system, cfg = plummer_sphere(jax.random.key(11), args.n, dim=3,
                                 dtype=jnp.float32)
    n, dim = system.positions.shape

    # 1. The degenerate grid capacity and the DENSE layout's refusal.
    level = auto_leaf_level(n, dim)
    cap = compute_capacity(system.positions, level)
    try:
        barnes_hut_grid(system.positions, system.masses, cfg,
                        theta=args.theta, layout="dense")
        grid_refused = False
    except ValueError as e:
        grid_refused = "bvh_forces" in str(e)

    # 2. The BVH tier (auto-escalating capacities, subset re-dispatch).
    bvh_out, bvh_s = timed(lambda: bvh_forces(
        system.positions, system.masses, cfg, theta=args.theta))
    bvh_err = sampled_oracle_error(system.positions, system.masses, bvh_out, cfg)

    # 3. The sparse grid fallback through the public driver (layout=auto).
    sp_s = sp_err = None
    sp_finite = None
    if not args.skip_sparse:
        sp_out, sp_s = timed(lambda: barnes_hut_grid(
            system.positions, system.masses, cfg, theta=args.theta))
        sp_err = sampled_oracle_error(system.positions, system.masses,
                                      sp_out, cfg)
        sp_finite = bool(jnp.all(jnp.isfinite(sp_out)))

    # 3b. Optional (chunk_size, window) tuning sweep for the sparse path —
    # the r4 defaults (64/8) were explicitly untuned (ROADMAP; VERDICT r4
    # weak 2 asked for an on-chip tuning pass).
    tune_rows = []
    if args.sparse_tune:
        from nbody_tpu.ops.sparse_grid import barnes_hut_sparse
        for cs in (64, 128, 256, 512, 1024):
            for wd in (8, 16):
                try:
                    _, t = timed(lambda cs=cs, wd=wd: barnes_hut_sparse(
                        system.positions, system.masses, cfg,
                        theta=args.theta, chunk_size=cs, window=wd))
                except Exception as e:  # noqa: BLE001
                    print(f"sparse chunk={cs} window={wd}: "
                          f"{type(e).__name__}: {e}")
                    continue
                tune_rows.append({"chunk_size": cs, "window": wd,
                                  "time_s": round(t, 4)})
                print(f"sparse chunk={cs:>4} window={wd:>3}: {t:8.3f} s",
                      flush=True)

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
        "sparse_grid_time_s": round(sp_s, 4) if sp_s is not None else None,
        "sparse_grid_finite": sp_finite,
        "sparse_grid_sampled_norm_error_vs_f64": sp_err,
        "sparse_tune": tune_rows or None,
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))
    assert grid_refused and artifact["bvh_finite"] and bvh_err < 5e-2
    if not args.skip_sparse:
        assert artifact["sparse_grid_finite"] and sp_err < 5e-2
    return 0


if __name__ == "__main__":
    import sys as _s
    _s.exit(main())
