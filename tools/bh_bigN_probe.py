"""BH hier far field at 5e6-class 3D: the round-5 headline probe.

Round 4's slowest matrix cell was BH 5e6 3D θ=0.25 at 39.9 s — the
hierarchical far field OOMed HBM at L=6 (the sweep's [G, md·(D+1)]
deferred-shell pack outputs), so the driver silently downgraded to the
cell→cell "local" far field. Round 5 removed those outputs entirely
(``defer="gather"``: the traversal gathers each leaf's deferred cells
itself — ops/hier_far.py) and hoisted the sweep out of the per-segment
dispatches. This probe times the production ``barnes_hut_grid`` (which
now defaults to hier at any N) at the requested sizes and writes
``artifacts/bh_bigN.json``.

Run: python tools/bh_bigN_probe.py [--cases 2000000:3,4000000:3,5000000:3]
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

import nbody_tpu as nb
from nbody_tpu.ops.grid_tree import barnes_hut_grid, resolve_bh_params


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="2000000:3,4000000:3,5000000:3")
    ap.add_argument("--theta", type=float, default=0.25)
    ap.add_argument("--far-impl", default=None,
                    help="override far_impl (default: driver resolution)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "bh_bigN.json"))
    args = ap.parse_args()

    cfg = nb.GravityConfig()
    rows = []
    print(f"backend={jax.default_backend()} theta={args.theta}")
    for case in args.cases.split(","):
        n_s, d_s = case.split(":")
        n, dim = int(n_s), int(d_s)
        system = nb.random_system(jax.random.key(42), n, dim=dim,
                                  dtype=jnp.float32)
        rp = resolve_bh_params(n, dim, args.theta, far_impl=args.far_impl)
        print(f"N={n} {dim}D params: {rp}", flush=True)

        def run():
            f = barnes_hut_grid(system.positions, system.masses, cfg,
                                theta=args.theta, far_impl=args.far_impl)
            return float(jnp.sum(jnp.abs(f)))

        t0 = time.perf_counter()
        chk = run()  # compile + warmup
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        chk = run()
        t = time.perf_counter() - t0
        finite = chk > 0 and chk < float("inf")
        rows.append({"n": n, "dim": dim, "theta": args.theta,
                     "hyperparams": rp, "wall_s": round(t, 3),
                     "cold_s": round(t_cold, 1), "finite": finite,
                     "checksum": chk})
        print(f"N={n:>8} {dim}D  {t:8.3f} s cached "
              f"(cold {t_cold:.1f} s)  checksum {chk:.6e}", flush=True)

    artifact = {"backend": jax.default_backend(), "rows": rows,
                "r4_baseline": {"bh_5e6_3d_local_fallback_s": 39.9,
                                "bh_5e6_2d_s": 3.25}}
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
