"""On-chip check + timing of the watchdog-safe segmented brute force.

Correctness: at N=300k, forces from ``brute_force_pallas_segmented``
(forced to 3 segments) must match the single-dispatch symmetric kernel to
fp32 rounding — same arithmetic, different sweep order. The CPU suite
covers this in interpret mode; this probe sees real-TPU numerics.

Timing: cached per-call wall time of the production path at the
reference's CUDA row sizes (2e6/5e6 2D: 34.4 s / 219.3 s,
aggregated_results.csv) when --big is passed.

Run: python tools/segmented_probe.py [--big]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import nbody_tpu as nb
from nbody_tpu.ops.pallas_brute import (brute_force_pallas,
                                        brute_force_pallas_segmented)
from nbody_tpu.utils.accuracy import scale_normalized_error


def _timed(fn, *args, **kw):
    out = fn(*args, **kw)
    checksum = float(jnp.sum(jnp.abs(out)))  # materialize (no-op ready())
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    checksum = float(jnp.sum(jnp.abs(out)))
    dt = time.perf_counter() - t0
    return out, dt, checksum


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true",
                    help="also time the 2e6/5e6 2D production path")
    args = ap.parse_args()
    cfg = nb.GravityConfig()
    print("backend:", jax.default_backend())

    sysm = nb.random_system(jax.random.key(3), 300_000, dim=2,
                            dtype=jnp.float32)
    ref, t_ref, _ = _timed(brute_force_pallas, sysm.positions, sysm.masses,
                           cfg, mode="symmetric")
    seg, t_seg, _ = _timed(brute_force_pallas_segmented, sysm.positions,
                           sysm.masses, cfg, num_segments=3)
    err = float(scale_normalized_error(seg, ref))
    print(f"N=3e5 2D: symmetric {t_ref:.3f}s, segmented(3) {t_seg:.3f}s, "
          f"err {err:.2e}")
    # fp32-vs-fp32: the segmented driver reassociates the per-body sum
    # across segment partials, so ~1e-4 scale-normalized disagreement with
    # the single-dispatch kernel is rounding, not logic (any double-count/
    # sign bug is O(1); measured 8.7e-05 at this N). The f64-oracle gate
    # lives in the CPU suite (tests/test_pallas_brute.py, interpret mode).
    assert err < 3e-4, err
    seg5 = brute_force_pallas_segmented(sysm.positions, sysm.masses, cfg,
                                        num_segments=5)
    err35 = float(scale_normalized_error(seg5, seg))
    print(f"N=3e5 2D: segmented(5) vs segmented(3) err {err35:.2e}")
    assert err35 < 3e-4, err35

    if args.big:
        for n in (2_000_000, 5_000_000):
            sysb = nb.random_system(jax.random.key(4), n, dim=2,
                                    dtype=jnp.float32)
            out, dt, chk = _timed(brute_force_pallas_segmented,
                                  sysb.positions, sysb.masses, cfg)
            segs = -(-n // 1_048_576)
            print(f"N={n} 2D: segmented({segs}) {dt:.2f}s "
                  f"(checksum {chk:.3e})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
