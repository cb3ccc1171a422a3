"""Probe the BH near-field cost vs (leaf_level, leaf_batch, p2p_impl).

The 1e5 3D θ=0.25 near field runs ~18× below the Pallas brute kernel's
pair rate (424 ms for 4.4e9 pair slots) — this sweeps the knobs to find
where the overhead lives. Cached-run timings (min of reps).

Usage: python tools/bh_near_probe.py [--n 100000] [--dim 3] [--theta 0.25]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import nbody_tpu as nb
from nbody_tpu.ops.grid_tree import (auto_leaf_level, build_grid_tree,
                                     compute_capacity,
                                     grid_tree_accel_sorted, theta_to_ring)


def timed(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=3)
    ap.add_argument("--theta", type=float, default=0.25)
    ap.add_argument("--levels", default=None,
                    help="comma list; default auto,auto-1")
    ap.add_argument("--batches", default="512,2048")
    ap.add_argument("--impls", default="jnp")
    args = ap.parse_args()

    cfg = nb.GravityConfig()
    system = nb.random_system(jax.random.key(7), args.n, dim=args.dim,
                              dtype=jnp.float32)
    pos, mass = system.positions, system.masses
    k = theta_to_ring(args.theta)
    L_auto = auto_leaf_level(args.n, args.dim, k=k)
    levels = ([int(x) for x in args.levels.split(",")] if args.levels
              else [L_auto, L_auto - 1])
    soft = float(cfg.softening)
    print(f"backend={jax.default_backend()} N={args.n} dim={args.dim} "
          f"k={k} L_auto={L_auto}")

    for L in levels:
        cap = compute_capacity(pos, L)
        tree = build_grid_tree(pos, mass, leaf_level=L, capacity=cap,
                               quad=True)
        for lb in (int(x) for x in args.batches.split(",")):
            for impl in args.impls.split(","):
                def run():
                    acc = grid_tree_accel_sorted(
                        tree, k=k, softening=soft, multipole="quad",
                        leaf_batch=lb, p2p_impl=impl, _debug_skip="far")
                    return float(jnp.sum(jnp.abs(acc)))
                dt = timed(run)
                print(f"  L={L} cap={cap:4d} batch={lb:5d} impl={impl:5s} "
                      f"near={dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
