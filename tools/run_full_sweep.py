"""Chunked full-matrix benchmark sweep on the live backend.

Runs the reference matrix (``run_simulations.sh:26-60``: N ∈ {1e3, 1e4,
1e5, 2e5, 5e5, 1e6, 2e6, 5e6} × {2D, 3D}, accuracy-on extra runs for the
first four sizes) as **one subprocess per (config, method)** with
resume-aware multi-pass retries. Why this shape (CLAUDE.md relay gotchas):

- The axon remote-compile service intermittently wedges a fresh program's
  first compile (observed ~50% of fresh fingerprints during a sick phase);
  a hung method must not block the other methods of its config.
- A killed in-flight compile is orphaned server-side, *completes within
  ~45-60 min*, and lands in the cache — so a LATER pass over the same
  chunk loads it instantly. Passes over the whole matrix naturally space
  retries by more than the healing time.
- Per-method CSV rows flush as they complete, and every pass re-scans the
  results directory, so the driver is fully resumable (kill/restart safe).

Run:  python tools/run_full_sweep.py [--results-dir artifacts/results]
      [--passes 4] [--sizes 1e3,1e4,...]
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIZES = (1_000, 10_000, 100_000, 200_000, 500_000,
         1_000_000, 2_000_000, 5_000_000)
ACCURACY_SIZES = SIZES[:4]
BRUTE_GATE = 1_000_000  # main.cpp:24

# TPU-registry methods (bench/registry.py), per-method chunking.
METHODS = (
    ("BruteForce_JNP", "a"),
    ("BruteForce_Pallas", "a"),
    ("BarnesHut_Grid", "b"),
    ("BarnesHut_Grid_Theta05", "b"),
    ("BVH_Radix", "h"),
    ("FMM_Chebyshev", "f"),
)


def completed_rows(results_dir):
    """(method, n, dim, accuracy_present) rows with time >= 0 on disk."""
    done = set()
    for path in glob.glob(os.path.join(results_dir, "*.csv")):
        # The aggregation output lives in the same directory; counting its
        # rows as completed chunks would mask re-runs after a method fix
        # (and double-count on re-aggregation — same bug as analysis.py's
        # load_results, fixed separately).
        if os.path.basename(path) == "aggregated_results.csv":
            continue
        with open(path) as f:
            for row in csv.DictReader(f):
                try:
                    t = float(row["Time(s)"])
                except (KeyError, ValueError, TypeError):
                    continue
                if t < 0:
                    continue
                has_acc = bool(row.get("Accuracy(%)"))
                done.add((row["Method"], int(row["Bodies"]),
                          int(row["Dimension"]), has_acc))
    return done


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", default="artifacts/results")
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--sizes", default=None)
    ap.add_argument("--dims", default="2,3")
    ap.add_argument("--run-prefix", default="r4",
                    help="run-id prefix; files are named "
                         "run_<prefix>{a,f}p<pass>_<method>_N_<n>_<d>D.csv")
    ap.add_argument("--methods", default=None,
                    help="comma list restricting the campaign to these "
                         "registry methods (e.g. a refresh of only the "
                         "tiers whose machinery changed this round)")
    ap.add_argument("--no-brute-large", action="store_true",
                    help="skip the BruteForce_Pallas 2e6/5e6 chunks (the "
                         "reference's '-m a' override rows — its CUDA CSV "
                         "ships {2,5}e6 BruteForce rows past the N>1e6 "
                         "gate, so we match them by default)")
    ap.add_argument("--timeout-small", type=float, default=600.0,
                    help="per-chunk cap, N <= 5e5")
    ap.add_argument("--timeout-large", type=float, default=1800.0,
                    help="per-chunk cap, N > 5e5")
    args = ap.parse_args()

    sizes = (tuple(int(float(s)) for s in args.sizes.split(","))
             if args.sizes else SIZES)
    dims = tuple(int(d) for d in args.dims.split(","))
    methods = METHODS
    if args.methods:
        keep = set(args.methods.split(","))
        unknown = keep - {name for name, _ in METHODS}
        if unknown:
            raise SystemExit(f"unknown --methods: {sorted(unknown)}")
        methods = tuple((n, t) for n, t in METHODS if n in keep)

    chunks = []  # (n, dim, accuracy, method)
    for n in sorted(sizes):
        for d in dims:
            for name, tier in methods:
                if tier == "a" and n > BRUTE_GATE:
                    # Reference CLI gates brute above 1e6 (main.cpp:24) but
                    # its shipped CSV includes CUDA rows at 2e6/5e6 via the
                    # '-m a' override; match with the streaming kernel.
                    if args.no_brute_large or name != "BruteForce_Pallas":
                        continue
                chunks.append((n, d, False, name))
    for n in sorted(sizes):
        if n not in ACCURACY_SIZES:
            continue
        for d in dims:
            for name, tier in methods:
                chunks.append((n, d, True, name))

    results_dir_abs = os.path.join(REPO, args.results_dir)
    os.makedirs(results_dir_abs, exist_ok=True)
    t_start = time.time()

    for pass_no in range(1, args.passes + 1):
        done = completed_rows(results_dir_abs)
        pending = [(n, d, acc, m) for (n, d, acc, m) in chunks
                   if (m, n, d, acc) not in done]
        print(f"\n===== pass {pass_no}: {len(pending)} pending / "
              f"{len(chunks)} chunks (t+{time.time() - t_start:.0f}s)",
              flush=True)
        if not pending:
            break
        for i, (n, d, acc, m) in enumerate(pending):
            label = f"N={n} {d}D acc={int(acc)} {m}"
            print(f"[p{pass_no} {i + 1}/{len(pending)}] {label} "
                  f"(t+{time.time() - t_start:.0f}s)", flush=True)
            run_id = f"{args.run_prefix}{'a' if acc else 'f'}p{pass_no}_{m}"
            cmd = [sys.executable, "-m", "nbody_tpu.bench.sweep",
                   "--sizes", str(n), "--dims", str(d),
                   "--accuracy", "on" if acc else "off",
                   "--methods", m, "--tiers", "abhf",
                   "--results-dir", args.results_dir,
                   "--run-id", run_id]
            timeout = (args.timeout_small if n <= 500_000
                       else args.timeout_large)
            try:
                r = subprocess.run(cmd, cwd=REPO, timeout=timeout)
                if r.returncode != 0:
                    print(f"  FAILED: exit {r.returncode}", flush=True)
            except subprocess.TimeoutExpired:
                print(f"  TIMEOUT after {timeout:.0f}s "
                      f"(orphan will heal; later pass retries)", flush=True)

    done = completed_rows(results_dir_abs)
    missing = [(n, d, acc, m) for (n, d, acc, m) in chunks
               if (m, n, d, acc) not in done]
    print(f"\nsweep matrix done in {time.time() - t_start:.0f}s; "
          f"{len(missing)} chunks still missing")
    for n, d, acc, m in missing:
        print(f"  N={n} {d}D acc={int(acc)} {m}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
