"""Accuracy + timing probe for far_impl="local_leaf" (leaf-level cell→cell
far field) vs "local" and "point" on the grid Barnes-Hut tier.

CPU: accuracy only (forced-cpu with --cpu). TPU: accuracy + cached-run
timing. Usage:
    python tools/local_leaf_check.py [-N 20000] [--dim 3] [--theta 0.25]
        [--cpu] [--time]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-N", type=int, default=20000)
    ap.add_argument("--dim", type=int, default=3)
    ap.add_argument("--theta", type=float, default=0.25)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        from jax.extend.backend import clear_backends
        clear_backends()
    import jax
    import jax.numpy as jnp

    import nbody_tpu as nb
    from nbody_tpu.ops.brute_force import brute_force_blocked
    from nbody_tpu.ops.grid_tree import barnes_hut_grid
    from nbody_tpu.utils.accuracy import (accuracy_percentage,
                                          scale_normalized_error)

    cfg = nb.GravityConfig()
    s = nb.random_system(jax.random.key(0), args.N, dim=args.dim,
                         dtype=jnp.float32)
    print(f"backend={jax.default_backend()} N={args.N} dim={args.dim} "
          f"theta={args.theta}")
    ref = brute_force_blocked(s.positions, s.masses, cfg)
    ref = jnp.asarray(ref)
    float(jnp.sum(jnp.abs(ref)))  # materialize

    for impl in ("point", "local", "local_leaf", "hier"):
        f = barnes_hut_grid(s.positions, s.masses, cfg, theta=args.theta,
                            far_impl=impl)
        err = float(scale_normalized_error(f, ref))
        acc = float(accuracy_percentage(f, ref))
        line = f"  far_impl={impl:<11} err={err:.3e} acc={acc:.2f}%"
        if args.time:
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                f = barnes_hut_grid(s.positions, s.masses, cfg,
                                    theta=args.theta, far_impl=impl)
                float(jnp.sum(jnp.abs(f)))
                ts.append(time.perf_counter() - t0)
            line += f"  t={min(ts):.3f}s (min of {args.reps})"
        print(line, flush=True)


if __name__ == "__main__":
    main()
