"""Decision probe for the BVH far_impl default at big N (ROADMAP round-6
lever 3): time bvh_forces with far_impl in {point, local} at the big
matrix cells and bound the accuracy delta with the sampled f64 host
oracle, writing artifacts/bvh_far_impl_bigN.json.

Round-2 measured "local" neutral (±2%) at N ≤ 2e5, so the default stayed
"point"; the round-5 big-N probe showed ~10% wins at 5e6 3D. This tool
produces the per-cell evidence (cached-run seconds + sampled oracle
error per impl) for flipping the default above a size threshold.

Usage: python tools/bvh_far_flip_probe.py --cases 2000000:2,2000000:3 \
           --samples 256            # 0 skips the oracle (timing only)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import nbody_tpu as nb
from nbody_tpu.ops.bvh import bvh_forces
from clustered_stress import sampled_oracle_error

ARTIFACT = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "bvh_far_impl_bigN.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="2000000:2,2000000:3")
    ap.add_argument("--theta", type=float, default=0.25)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--impls", default="point,local")
    args = ap.parse_args()

    cfg = nb.GravityConfig()
    rows = []
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as f:
            rows = json.load(f).get("rows", [])
    print(f"backend={jax.default_backend()} theta={args.theta}")
    for case in args.cases.split(","):
        n_s, d_s = case.split(":")
        n, dim = int(n_s), int(d_s)
        system = nb.random_system(jax.random.key(7), n, dim=dim,
                                  dtype=jnp.float32)
        for impl in args.impls.split(","):
            def run():
                f = bvh_forces(system.positions, system.masses, cfg,
                               theta=args.theta, far_impl=impl)
                float(jnp.sum(jnp.abs(f)))  # materialize (relay no-op BUR)
                return f
            run()  # compile + settle escalation caps
            t0 = time.perf_counter()
            f = run()
            dt = time.perf_counter() - t0
            err = None
            if args.samples:
                err = sampled_oracle_error(system.positions, system.masses,
                                           f, cfg, samples=args.samples)
            row = {"n": n, "dim": dim, "far_impl": impl,
                   "theta": args.theta, "seconds": round(dt, 4),
                   "sampled_oracle_error": err,
                   "checksum": float(jnp.sum(jnp.abs(f)))}
            rows = [r for r in rows  # newest generation wins, keyed
                    if (r["n"], r["dim"], r["far_impl"]) != (n, dim, impl)]
            rows.append(row)
            print(json.dumps(row), flush=True)
    with open(ARTIFACT, "w") as f:
        json.dump({"note": "BVH far_impl decision probe at big N "
                           "(uniform cube, seed 7, cached runs, one v5e "
                           "chip; oracle = sampled host-f64 all-pairs)",
                   "rows": sorted(rows, key=lambda r: (r["n"], r["dim"],
                                                       r["far_impl"]))},
                  f, indent=1)
    print(f"wrote {os.path.normpath(ARTIFACT)}")


if __name__ == "__main__":
    main()
