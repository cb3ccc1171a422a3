"""Timing/accuracy harness and dual-sink reporting.

Re-expresses the reference driver's per-method block (``main.cpp:126-860``):
``safely_execute`` timing with exception containment (``utils.h:88-104``,
−1 sentinel on failure), accuracy vs a reference force method
(``main.cpp:102-124`` selection), dual-sink logging (human ``.out`` log
mirrored to stdout + machine CSV with schema
``Method,Bodies,Dimension,Time(s)[,Accuracy(%)]`` — ``main.cpp:59-63``), and
3-body validation-force spot printing (``utils.h:139-167``).

Fixes over the reference: timing materializes device values (async dispatch
would otherwise report ~0), NaN forces fail accuracy instead of passing
(SURVEY.md §8.6), and runs are reproducible via seeded PRNG (§8.7).
"""

from __future__ import annotations

import dataclasses
import datetime
import os
import time
from typing import List, Optional, Sequence, TextIO

import numpy as np

from ..config import DEFAULT_TREE, GravityConfig, TreeConfig
from ..state import System
from ..utils.accuracy import (accuracy_percentage, percentile_relative_error,
                              scale_normalized_error)
from .registry import Method, reference_method_for


def get_run_id(now: Optional[datetime.datetime] = None) -> str:
    """MMDDYYYY_HHMMSS run id (utils.h:67-83 parity)."""
    now = now or datetime.datetime.now()
    return now.strftime("%m%d%Y_%H%M%S")


def ensure_results_directory(path: str = "results") -> str:
    os.makedirs(path, exist_ok=True)
    return path


@dataclasses.dataclass
class MethodResult:
    method: str
    n: int
    dim: int
    time_s: float  # −1.0 on failure (safely_execute parity)
    accuracy_pct: Optional[float] = None
    norm_error: Optional[float] = None  # scale-normalized ‖ΔF‖ (extension)
    error: Optional[str] = None
    hyperparams: Optional[dict] = None  # resolved tier config (provenance)

    def hyper_str(self) -> str:
        """`key=value` pairs joined with ';' (CSV-safe — no commas)."""
        if not self.hyperparams:
            return ""
        return ";".join(f"{k}={v}" for k, v in
                        sorted(self.hyperparams.items()))

    def csv_row(self, with_accuracy: bool) -> str:
        """Reference schema (main.cpp:59-63) in the first 4-5 columns; the
        NormError extension column carries the honest fp32-aware metric
        (the 1%-per-component Accuracy(%) is harsh on near-zero components
        — see utils/accuracy.py); the Hyperparams extension column makes
        every committed row reproducible from its own artifact (VERDICT
        r4 missing 2)."""
        base = f"{self.method},{self.n},{self.dim},{self.time_s:.6f}"
        if with_accuracy:
            acc = "" if self.accuracy_pct is None else f"{self.accuracy_pct:.2f}"
            ne = "" if self.norm_error is None else f"{self.norm_error:.3e}"
            return f"{base},{acc},{ne},{self.hyper_str()}"
        return f"{base},{self.hyper_str()}"


def format_time_s(t: float) -> str:
    """Scientific notation below 1µs, fixed otherwise (main.cpp:160-166)."""
    if 0 <= t < 1e-6:
        return f"{t:.3e}"
    return f"{t:.6f}"


class Tee:
    """Mirror writes to stdout and a log file (main.cpp:41-56 dual sink)."""

    def __init__(self, log_file: Optional[TextIO]):
        self.log_file = log_file

    def __call__(self, msg: str):
        print(msg)
        if self.log_file is not None:
            self.log_file.write(msg + "\n")
            self.log_file.flush()


def materialize(forces) -> np.ndarray:
    """Force device completion — block_until_ready is unreliable through the
    axon relay, so fetch the bytes."""
    return np.asarray(forces)


def safely_execute(log: Tee, name: str, fn, *args, warmup: int = 1):
    """Run ``fn`` with exception containment; return (time_s, result|None).

    Parity: utils.h:88-104 (µs timer, catch-all, −1 sentinel). ``warmup``
    extra invocations exclude jit compilation from the measured time; pass
    warmup=0 for reference-style cold timing.
    """
    try:
        for _ in range(warmup):
            materialize(fn(*args))
        t0 = time.perf_counter()
        result = fn(*args)
        host = materialize(result)
        elapsed = time.perf_counter() - t0
        del host
        return elapsed, result
    except Exception as e:  # noqa: BLE001 — harness must contain anything
        log(f"Error executing {name}: {type(e).__name__}: {e}")
        return -1.0, None


def print_validation_forces(forces: np.ndarray, log: Tee, count: int = 3):
    """3 sampled per-body force vectors (utils.h:139-151 parity)."""
    n = forces.shape[0]
    if n < count:
        return
    stride = n // count
    for i in range(stride - 1, n, stride):
        comps = ", ".join(f"{c:.6g}" for c in forces[i])
        log(f"Body #{i + 1} force: ({comps})")


def run_benchmark(
    system: System,
    methods: Sequence[Method],
    gravity: GravityConfig = GravityConfig(),
    tree: TreeConfig = DEFAULT_TREE,
    compute_accuracy: bool = False,
    run_id: Optional[str] = None,
    results_dir: Optional[str] = "results",
    warmup: int = 1,
) -> List[MethodResult]:
    """Run every method, log timings/accuracy, write CSV + .out files.

    File naming parity: ``results/run_<id>_N_<n>_<D>D.{csv,out}``
    (main.cpp:41-47).
    """
    n, dim = system.n, system.dim
    run_id = run_id or get_run_id()

    csv_file = log_file = None
    if results_dir is not None:
        ensure_results_directory(results_dir)
        base = os.path.join(results_dir, f"run_{run_id}_N_{n}_{dim}D")
        # Never silently clobber an existing run file: two chunks sharing a
        # run_id at the same (N, dim) destroyed committed rows in round 2
        # (ADVICE r2) — uniquify instead.
        if os.path.exists(base + ".csv") or os.path.exists(base + ".out"):
            suffix = 1
            while os.path.exists(f"{base}_{suffix}.csv") \
                    or os.path.exists(f"{base}_{suffix}.out"):
                suffix += 1
            base = f"{base}_{suffix}"
        csv_file = open(base + ".csv", "w")
        log_file = open(base + ".out", "w")
        header = "Method,Bodies,Dimension,Time(s)"
        if compute_accuracy:
            header += ",Accuracy(%),NormError"
        header += ",Hyperparams"
        csv_file.write(header + "\n")
    log = Tee(log_file)

    reference_forces = None
    if compute_accuracy:
        ref = reference_method_for(n)
        log(f"Computing reference forces with {ref.name} ...")
        t, out = safely_execute(log, ref.name, ref.fn, system.positions,
                                system.masses, gravity, tree, warmup=warmup)
        if out is None:
            log("Reference force computation failed; accuracy disabled.")
            compute_accuracy = False
        else:
            reference_forces = materialize(out)
            log(f"Reference forces computed in {format_time_s(t)} s")

    results: List[MethodResult] = []
    for method in methods:
        try:
            hp = method.hyperparams(n, dim, gravity, tree)
        except Exception:  # noqa: BLE001 — provenance must never kill a run
            hp = {}
        log(f"\nRunning {method.name} (N={n}, {dim}D) ...")
        if hp:
            log(f"{method.name} hyperparams: "
                + " ".join(f"{k}={v}" for k, v in sorted(hp.items())))
        t, out = safely_execute(log, method.name, method.fn, system.positions,
                                system.masses, gravity, tree, warmup=warmup)
        res = MethodResult(method=method.name, n=n, dim=dim, time_s=t,
                           hyperparams=hp)
        if t < 0:
            res.error = "execution failed"
            log(f"{method.name} FAILED")
        else:
            forces = materialize(out)
            log(f"{method.name} time: {format_time_s(t)} s")
            if compute_accuracy and reference_forces is not None:
                res.accuracy_pct = float(accuracy_percentage(
                    forces, reference_forces))
                res.norm_error = float(scale_normalized_error(
                    forces, reference_forces))
                p99 = float(percentile_relative_error(
                    forces, reference_forces, 99.0))
                log(f"{method.name} accuracy: {res.accuracy_pct:.2f}% "
                    f"(norm err {res.norm_error:.3e}, "
                    f"p99 rel err {p99:.3e})")
            print_validation_forces(forces, log)
        if csv_file is not None:
            csv_file.write(res.csv_row(compute_accuracy) + "\n")
            csv_file.flush()
        results.append(res)

    if csv_file is not None:
        csv_file.close()
    if log_file is not None:
        log_file.close()
    return results
