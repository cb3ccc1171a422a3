"""Chunked full-matrix benchmark sweep on the live backend.

Runs the reference matrix (``run_simulations.sh:26-60``: N ∈ {1e3, 1e4,
1e5, 2e5, 5e5, 1e6, 2e6, 5e6} × {2D, 3D}, accuracy-on extra runs for the
first four sizes) with **one subprocess per config**: the axon TPU worker
can crash on very long device programs (CLAUDE.md watchdog gotcha), and a
crash inside an in-process sweep would poison every remaining config.
Chunking loses at most one config; per-method CSV rows are flushed as they
complete, so even a killed config keeps its finished methods.

Run:  python tools/run_full_sweep.py [--results-dir artifacts/results]
      [--timeout 1800] [--tiers abhf] [--sizes 1e3,1e4,...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIZES = (1_000, 10_000, 100_000, 200_000, 500_000,
         1_000_000, 2_000_000, 5_000_000)
ACCURACY_SIZES = SIZES[:4]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", default="artifacts/results")
    ap.add_argument("--tiers", default="abhf")
    ap.add_argument("--timeout", type=float, default=1800.0,
                    help="per-config wall clock cap (seconds)")
    ap.add_argument("--sizes", default=None,
                    help="comma-separated N override")
    ap.add_argument("--dims", default="2,3")
    args = ap.parse_args()

    sizes = (tuple(int(float(s)) for s in args.sizes.split(","))
             if args.sizes else SIZES)
    dims = tuple(int(d) for d in args.dims.split(","))
    # Small sizes first: every (tier, dim, shape-class) compiles once into
    # the persistent cache before the expensive configs run.
    # At N ≥ 1e6 additionally chunk per tier: a hung/crashed tier (e.g. a
    # traversal that trips the TPU watchdog) must not take down the other
    # tiers' rows for that config.
    configs = []
    for n in sorted(sizes):
        for d in dims:
            if n >= 1_000_000:
                configs += [(n, d, False, t) for t in args.tiers]
            else:
                configs.append((n, d, False, args.tiers))
    configs += [(n, d, True, args.tiers) for n in sorted(sizes)
                if n in ACCURACY_SIZES for d in dims]

    os.makedirs(os.path.join(REPO, args.results_dir), exist_ok=True)
    t_start = time.time()

    def run_one(cfg, attempt):
        n, dim, acc, tiers = cfg
        label = f"N={n} dim={dim} accuracy={int(acc)} tiers={tiers}"
        print(f"[attempt {attempt}] {label} "
              f"(t+{time.time() - t_start:.0f}s)", flush=True)
        # Distinct run ids per (accuracy, tier-chunk, attempt): the CSV
        # filename is run_<id>_N_<n>_<dim>D.csv opened "w", so chunks
        # sharing (N, dim) would otherwise overwrite each other. The
        # aggregator merges all CSVs and averages repeats.
        run_id = ("r2acc" if acc else "r2full") + (
            tiers if tiers != args.tiers else "") + (
            f"x{attempt}" if attempt > 1 else "")
        cmd = [sys.executable, "-m", "nbody_tpu.bench.sweep",
               "--sizes", str(n), "--dims", str(dim),
               "--accuracy", "on" if acc else "off",
               "--tiers", tiers,
               "--results-dir", args.results_dir,
               "--run-id", run_id]
        try:
            r = subprocess.run(cmd, cwd=REPO, timeout=args.timeout)
            if r.returncode != 0:
                print(f"  FAILED: exit {r.returncode}", flush=True)
                return f"exit {r.returncode}"
        except subprocess.TimeoutExpired:
            print(f"  TIMEOUT after {args.timeout:.0f}s", flush=True)
            return "timeout"
        return None

    failures = []
    for i, cfg in enumerate(configs):
        print(f"[{i + 1}/{len(configs)}]", end=" ", flush=True)
        why = run_one(cfg, 1)
        if why is not None:
            failures.append((cfg, why))

    # A relay wedge (orphaned compile joined by retries — CLAUDE.md
    # gotchas) self-heals in ~45-60 min; retry failed configs once at the
    # END of the matrix so recovery time has elapsed naturally.
    if failures:
        print(f"\nretrying {len(failures)} failed configs ...", flush=True)
        failures = [(cfg, run_one(cfg, 2)) for cfg, _ in failures]
        failures = [(cfg, why) for cfg, why in failures if why is not None]

    print(f"\nsweep matrix done in {time.time() - t_start:.0f}s; "
          f"{len(failures)} config failures")
    for (n, dim, acc, tiers), why in failures:
        print(f"  N={n} dim={dim} acc={int(acc)} tiers={tiers}: {why}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
