"""Grid-BH leaf-level/batch tuner for the θ=0.25 (k=3) wide-ring regime.

Round-2 sweep signals that want explaining (artifacts/results):
  * 2D N=1e5 θ=0.25: 0.219 s vs reference BarnesHut_Parlay 0.116 s.
  * 3D N=5e5 θ=0.25: 9.38 s — slower than N=1e6's 7.21 s (non-monotone),
    suggesting the auto leaf level lands badly between levels.

Sweeps (leaf_level, leaf_batch) around the auto choice on the live
backend and prints a table; feed the winners back into
``auto_leaf_level`` / the sweep notes.

Run:  python tools/bh_tune.py --n 100000 --dim 2 [--theta 0.25]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

import nbody_tpu as nb
from nbody_tpu.ops.grid_tree import (
    auto_leaf_level,
    barnes_hut_grid,
    compute_capacity,
    theta_to_ring,
)


def timed(fn, *args, **kw):
    out = fn(*args, **kw)
    float(jnp.sum(jnp.abs(out)))  # materialize (relay no-op workaround)
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    float(jnp.sum(jnp.abs(out)))
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--theta", type=float, default=0.25)
    ap.add_argument("--levels", default=None,
                    help="comma list; default auto-1..auto+2")
    ap.add_argument("--batches", default="256,512,1024")
    args = ap.parse_args()

    cfg = nb.GravityConfig()
    sys = nb.random_system(jax.random.key(7), args.n, dim=args.dim,
                           dtype=jnp.float32)
    k = theta_to_ring(args.theta)
    auto = auto_leaf_level(args.n, args.dim, k=k)
    levels = ([int(x) for x in args.levels.split(",")] if args.levels
              else [max(1, auto - 1), auto, auto + 1, auto + 2])
    batches = [int(x) for x in args.batches.split(",")]

    print(f"N={args.n} {args.dim}D theta={args.theta} (k={k}) auto_level="
          f"{auto}", flush=True)
    for lvl in levels:
        cap = compute_capacity(sys.positions, lvl)
        ncells = 1 << (args.dim * lvl)
        for b in batches:
            try:
                t = timed(barnes_hut_grid, sys.positions, sys.masses, cfg,
                          theta=args.theta, leaf_level=lvl, capacity=cap,
                          leaf_batch=b)
                print(f"  L={lvl} (cells={ncells}, cap={cap}, occ="
                      f"{args.n / ncells:.1f}) batch={b}: {t:.3f} s",
                      flush=True)
            except Exception as e:  # noqa: BLE001 — tuning probe
                print(f"  L={lvl} batch={b}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
    return 0


if __name__ == "__main__":
    import sys as _s
    _s.exit(main())
