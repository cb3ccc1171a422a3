"""Win/loss audit: our aggregated matrix vs the reference's.

Joins ``artifacts/results/aggregated_results.csv`` (this repo's sweep
aggregate, schema ``Bodies,Method,Dimension,Time(s),Accuracy(%),Runs``)
against the reference's ``analysis/aggregated_results.csv``
(``Bodies,Method,Dimension,Average Runtime (s)`` — the deliverable of
``run_simulations.sh:26-60`` + ``analysis/analyze_results.ipynb``), and
prints one line per matrix cell: our time, the best reference competitor
in the same tier, and the speedup. Cells where we lose are flagged so the
round's "no losing cell without a documented trade" gate is a one-command
check.

Tier mapping (ours -> reference method family):
  BruteForce_JNP / BruteForce_Pallas -> best of BruteForce_* (incl. CUDA)
  BarnesHut_Grid (theta=0.25)        -> best of BarnesHut_* (ref theta=0.25,
                                        main.cpp -t default)
  BarnesHut_Grid_Theta05             -> same family (no exact ref twin; the
                                        ref sweep runs a single theta)
  BVH_Radix                          -> best of BVH_*
  FMM_Chebyshev                      -> best of FMM_*

Run: python tools/compare_vs_baseline.py [--ours PATH] [--ref PATH]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nbody_tpu.bench.analysis import REF_AGGREGATE, load_reference_best

FAMILY = {
    "BruteForce_JNP": "BruteForce",
    "BruteForce_Pallas": "BruteForce",
    "BarnesHut_Grid": "BarnesHut",
    "BarnesHut_Grid_Theta05": "BarnesHut",
    "BVH_Radix": "BVH",
    "FMM_Chebyshev": "FMM",
}


def load_ours(path):
    rows = {}
    with open(path) as f:
        for r in csv.DictReader(f):
            key = (int(r["Bodies"]), r["Method"], int(r["Dimension"]))
            rows[key] = (float(r["Time(s)"]), r.get("Accuracy(%)", ""))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", default=os.path.join(
        REPO, "artifacts", "results", "aggregated_results.csv"))
    ap.add_argument("--ref", default=REF_AGGREGATE)
    args = ap.parse_args()

    ours = load_ours(args.ours)
    # Shared loader (bench/analysis.py): best valid reference time per
    # (Bodies, family, Dimension); {} when the file is unavailable.
    ref = load_reference_best(args.ref)
    if not ref:
        print(f"reference aggregate not readable at {args.ref}; "
              "nothing to compare against")
        return 2

    losses = []
    uncontested = 0
    print(f"{'N':>9} {'D':>2} {'method':<24} {'ours(s)':>10} "
          f"{'ref best(s)':>11} {'ref method':<22} {'speedup':>8}")
    for (n, m, d) in sorted(ours, key=lambda k: (k[0], k[2], k[1])):
        t_ours, _acc = ours[(n, m, d)]
        fam = FAMILY.get(m)
        refkey = (n, fam, d)
        if fam is None or refkey not in ref:
            uncontested += 1
            print(f"{n:>9} {d:>2} {m:<24} {t_ours:>10.4f} "
                  f"{'—':>11} {'(no ref row)':<22} {'—':>8}")
            continue
        t_ref, m_ref = ref[refkey]
        sp = t_ref / t_ours if t_ours > 0 else float("inf")
        flag = "" if sp >= 1.0 else "   *** LOSS ***"
        if sp < 1.0:
            losses.append((n, m, d, t_ours, t_ref, m_ref, sp))
        print(f"{n:>9} {d:>2} {m:<24} {t_ours:>10.4f} "
              f"{t_ref:>11.4f} {m_ref:<22} {sp:>7.2f}x{flag}")

    print(f"\n{len(ours)} cells: {len(ours) - len(losses) - uncontested} "
          f"wins, {len(losses)} losses, {uncontested} uncontested "
          f"(no reference row at that (N, dim)).")
    if losses:
        print("\nLosing cells:")
        for (n, m, d, to, tr, mr, sp) in losses:
            print(f"  N={n} {d}D {m}: {to:.3f}s vs {mr} {tr:.3f}s "
                  f"({sp:.2f}x)")
    return 1 if losses else 0


if __name__ == "__main__":
    raise SystemExit(main())
