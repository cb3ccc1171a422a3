"""Attribute the small-N per-step floor (VERDICT r4 weak 5 / next 4).

The two remaining scoreboard losses are the N=1e3 brute cells:
~1.5 ms/step device-resident inside one lax.scan dispatch vs the
reference CUDA kernel's 0.449 ms (`1000,BruteForce_CUDA,2`). The
arithmetic is ~10 µs (5×10⁵ pairs at the measured ~3.9 Tops/s VPU peak),
so something structural eats ~150× that. This tool decomposes it:

* ``trivial``  — scanned Euler whose "force" is one multiply: the pure
  scan-iteration + integrator floor (XLA op scheduling, HBM round trips
  of the tiny state between scan iterations).
* ``jnp`` / ``pallas`` — the production scanned paths (device_step_bench
  adapters): floor + kernel-dispatch structure.
* ``fused``    — the K-step-inside-one-kernel path
  (ops/pallas_brute.fused_smalln_simulate): no per-step XLA ops, no HBM,
  state VMEM-resident. What remains is the pair sweep itself.

Per-step times come from DIFFERENCING two scan lengths ((t(K_hi) −
t(K_lo)) / (K_hi − K_lo)) so the per-dispatch relay RTT (~30-60 ms)
cancels exactly; raw one-dispatch times are recorded too.

Writes ``artifacts/smalln_floor.json``. Run on the live chip:
    python tools/smalln_floor.py [--n 1000] [--dim 2]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import nbody_tpu as nb
from nbody_tpu.integrators import simulate

K_LO, K_HI = 256, 4096


def timed(fn, *args, repeats: int = 5):
    """min-of-repeats cached time — single-shot walls carry several ms of
    relay jitter, which swamps µs-scale differenced signals (a first run
    of this tool read NEGATIVE per-step times at K_HI=256)."""
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(jnp.abs(x))), out)  # warm+materialize
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda x: float(jnp.sum(jnp.abs(x))), out)
        best = min(best, time.perf_counter() - t0)
    return best


def scan_variant(system, cfg, forces_fn, k):
    step_k = jax.jit(functools.partial(
        simulate, forces_fn=forces_fn, dt=1e-6, num_steps=k,
        integrator="euler"))
    return timed(lambda s: step_k(s)[0], system)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "smalln_floor.json"))
    args = ap.parse_args()

    cfg = nb.GravityConfig()
    system = nb.random_system(jax.random.key(42), args.n, dim=args.dim,
                              dtype=jnp.float32)
    results = {"backend": jax.default_backend(), "n": args.n,
               "dim": args.dim, "k_lo": K_LO, "k_hi": K_HI,
               "ref_cuda_step_s_n1e3_2d": 0.000449}

    from nbody_tpu.ops.brute_force import (brute_force_blocked,
                                           brute_force_direct)
    from nbody_tpu.ops.pallas_brute import (brute_force_pallas,
                                            fused_smalln_simulate)

    variants = {
        "trivial": lambda p, m: p * jnp.float32(1e-30),
        "jnp_blocked": lambda p, m: brute_force_blocked(p, m, cfg,
                                                        block_size=1024),
        "jnp_direct": lambda p, m: brute_force_direct(p, m, cfg),
        "pallas": lambda p, m: brute_force_pallas(p, m, cfg,
                                                  mode="symmetric"),
    }
    for name, ffn in variants.items():
        t_lo = scan_variant(system, cfg, ffn, K_LO)
        t_hi = scan_variant(system, cfg, ffn, K_HI)
        per = (t_hi - t_lo) / (K_HI - K_LO)
        results[name] = {"t_scan_lo_s": round(t_lo, 5),
                         "t_scan_hi_s": round(t_hi, 5),
                         "per_step_s": round(per, 8)}
        print(f"{name:<8} per-step {per * 1e6:9.1f} µs  "
              f"(raw {t_lo:.4f}/{t_hi:.4f} s)")

    def fused_k(k):
        return timed(lambda s: fused_smalln_simulate(
            s.positions, s.velocities, s.masses, dt=1e-6, num_steps=k,
            g=float(cfg.G), softening=float(cfg.softening),
            integrator="euler"), system)

    t_lo, t_hi = fused_k(K_LO), fused_k(K_HI)
    per = (t_hi - t_lo) / (K_HI - K_LO)
    results["fused"] = {"t_scan_lo_s": round(t_lo, 5),
                        "t_scan_hi_s": round(t_hi, 5),
                        "per_step_s": round(per, 8)}
    print(f"{'fused':<8} per-step {per * 1e6:9.1f} µs  "
          f"(raw {t_lo:.4f}/{t_hi:.4f} s)")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
