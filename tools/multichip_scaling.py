"""Multi-chip scaling model artifact: accuracy + collective-traffic census.

Real multi-chip hardware is unreachable in this environment (one v5e chip
behind the axon relay), so the distribution layer's scaling story is made
auditable the honest way: run every distributed tier on virtual CPU meshes
of P in {2, 4, 8}, assert accuracy against the dense f32 direct sum at
every P, measure cross-P consistency, and census the collective ops XLA
actually compiled (all-gather / all-reduce / all-to-all / collective-
permute / reduce-scatter) — op counts and per-device output bytes per
force evaluation. Those byte counts are what would ride the ICI on a real
v5e-P slice; together with the measured single-chip kernel times (ROADMAP)
they give the committed scaling projection, replacing hand-waved "it
should scale" claims.

Reference parity: the reference has no multi-node layer at all (SURVEY
§2.4 — OpenMP/Parlay shared memory only); this artifact documents the
from-scratch distribution design's contract: O(N/P + halo) per-device
body memory and measured collective traffic per step.

Methodology:
- Each (tier, P) runs in its own subprocess with
  ``--xla_dump_to`` so every module XLA compiles for the evaluation is
  dumped; the parent parses the ``*after_optimizations*`` HLO for
  collective instructions. Tree tiers interleave eager capacity probes
  with their sharded compute (so a single jit wrapper can't see their
  collectives); the dump sees everything the process compiled.
- Byte figures are summed HLO *output* shapes of collective ops per
  device — an upper bound on bytes each device RECEIVES over ICI for one
  force evaluation (an all-gather output counts the resident shard too;
  a ppermute output equals bytes sent).
- The SPMD partitioner is platform-portable at this level: the same
  collectives are inserted for TPU; only the cost model differs.

Writes artifacts/multichip_scaling.json.
Run: python tools/multichip_scaling.py [--n 4096] [--out PATH]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2,
                "s16": 2, "u16": 2, "f32": 4, "s32": 4, "u32": 4,
                "f64": 8, "s64": 8, "u64": 8, "c64": 8, "c128": 16}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
                "collective-permute", "reduce-scatter")
# `%name = <result-shape(s)> <op>(` — result may be a tuple of shapes;
# `-start` variants cover async-pair lowering (counted once via -start).
_INSTR_RE = re.compile(
    r"=\s*(\([^)]*\)|\S+)\s+("
    + "|".join(_COLLECTIVES) + r")(?:-start)?\(")

#: knobs per tier — probed (dryrun_multichip) so every tree tier's far
#: field is engaged: error strictly positive yet within tolerance. Gates
#: sit at ~2x each tier's measured r4 error (VERDICT r5 item 7: FMM
#: 2.21e-4, BH 6.43e-3, sharded BVH 1.51e-3, LET BVH 2.75e-4) so a
#: regression half an order of magnitude big fails loudly.
TIERS = {
    "ring_brute_force": 1e-5,
    "ring_segmented": 1e-5,
    "sharded_fmm": 5e-4,
    "sharded_barnes_hut": 1.3e-2,
    "sharded_bvh": 3e-3,
    "let_barnes_hut": 1.3e-2,
    "let_fmm": 5e-4,
    "let_bvh": 1e-3,
}


def _shape_bytes(text: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_census(dump_dir: str) -> dict:
    """{op: {count, out_bytes}} summed over the dumped optimized modules."""
    census = collections.defaultdict(lambda: {"count": 0, "out_bytes": 0})
    for path in glob.glob(os.path.join(dump_dir, "*after_optimizations.txt")):
        with open(path) as f:
            text = f.read()
        for m in _INSTR_RE.finditer(text):
            shapes, op = m.group(1), m.group(2)
            census[op]["count"] += 1
            census[op]["out_bytes"] += _shape_bytes(shapes)
    return dict(census)


def worker(tier: str, p_count: int, n: int, out_npy: str) -> int:
    """Run ONE tier on a P-device CPU mesh; print a JSON result line."""
    import __graft_entry__ as ge
    ge._provision_cpu_mesh(p_count)
    import jax
    import jax.numpy as jnp
    import numpy as np

    import nbody_tpu as nb
    from nbody_tpu.ops.brute_force import brute_force_direct
    from nbody_tpu.parallel.let_bvh import let_bvh
    from nbody_tpu.parallel.let_tree import let_barnes_hut, let_fmm
    from nbody_tpu.parallel.mesh import make_mesh
    from nbody_tpu.parallel.ring import ring_brute_force
    from nbody_tpu.parallel.sharded_tree import (
        barnes_hut_sharded, bvh_sharded, fmm_sharded)
    from nbody_tpu.utils.accuracy import scale_normalized_error

    cfg = nb.GravityConfig()
    system = nb.random_system(jax.random.key(1), n, dim=3, dtype=jnp.float32)
    pos, mass = system.positions, system.masses
    mesh = make_mesh(jax.devices()[:p_count])

    from nbody_tpu.parallel.ring import ring_all_pairs_segmented
    fns = {
        "ring_brute_force":
            lambda: ring_brute_force(pos, mass, cfg, mesh=mesh),
        # pair budget forces >= 2 row chunks per ring step so the
        # watchdog-bounded composition (segmented sweeps inside each ring
        # step) is what actually runs, not the trivial 1-chunk case.
        "ring_segmented":
            lambda: ring_all_pairs_segmented(
                pos, mass, cfg, mesh=mesh,
                pair_budget=max(128, n // p_count // 2) * (n // p_count)),
        "sharded_fmm":
            lambda: fmm_sharded(pos, mass, cfg, mesh=mesh, order=6,
                                leaf_level=3),
        "sharded_barnes_hut":
            lambda: barnes_hut_sharded(pos, mass, cfg, mesh=mesh,
                                       theta=0.5, leaf_level=3),
        "sharded_bvh":
            lambda: bvh_sharded(pos, mass, cfg, mesh=mesh, theta=0.5,
                                group_size=8),
        "let_barnes_hut":
            lambda: let_barnes_hut(pos, mass, cfg, mesh=mesh, theta=0.5,
                                   leaf_level=3),
        "let_fmm":
            lambda: let_fmm(pos, mass, cfg, mesh=mesh, order=6,
                            leaf_level=3),
        "let_bvh":
            lambda: let_bvh(pos, mass, cfg, mesh=mesh, theta=0.5),
    }
    out = fns[tier]()
    ref = brute_force_direct(pos, mass, cfg)
    err = float(scale_normalized_error(out, ref))
    np.save(out_npy, np.asarray(out))
    print("RESULT " + json.dumps({"tier": tier, "P": p_count, "err": err}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    # P=16 catches two-digit-mesh / power-of-two assumptions in the LET
    # capacity math (VERDICT r5 item 7).
    ap.add_argument("--mesh-sizes", default="2,4,8,16")
    ap.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "multichip_scaling.json"))
    ap.add_argument("--worker", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--p", type=int, default=0, help=argparse.SUPPRESS)
    ap.add_argument("--out-npy", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args(argv)
    if args.worker:
        return worker(args.worker, args.p, args.n, args.out_npy)

    mesh_sizes = tuple(int(p) for p in args.mesh_sizes.split(","))
    import numpy as np

    results = {}
    forces_at = collections.defaultdict(dict)
    with tempfile.TemporaryDirectory() as tmp:
        for p_count in mesh_sizes:
            for tier, tol in TIERS.items():
                dump = os.path.join(tmp, f"dump_{tier}_{p_count}")
                npy = os.path.join(tmp, f"f_{tier}_{p_count}.npy")
                env = dict(os.environ)
                env["XLA_FLAGS"] = (
                    env.get("XLA_FLAGS", "")
                    + f" --xla_force_host_platform_device_count={p_count}"
                    + f" --xla_dump_to={dump}").strip()
                cmd = [sys.executable, os.path.abspath(__file__),
                       "--worker", tier, "--p", str(p_count),
                       "--n", str(args.n), "--out-npy", npy]
                r = subprocess.run(cmd, cwd=REPO, env=env, text=True,
                                   capture_output=True, timeout=1200)
                line = next((ln for ln in r.stdout.splitlines()
                             if ln.startswith("RESULT ")), None)
                if r.returncode != 0 or line is None:
                    print(r.stdout[-2000:], file=sys.stderr)
                    print(r.stderr[-4000:], file=sys.stderr)
                    raise RuntimeError(f"worker failed: {tier} P={p_count}")
                err = json.loads(line[len("RESULT "):])["err"]
                assert err < tol, (tier, p_count, err, tol)
                census = collective_census(dump)
                forces_at[tier][p_count] = np.load(npy)
                results.setdefault(tier, {})[str(p_count)] = {
                    "err_vs_direct": err,
                    "tolerance": tol,
                    "collectives": census,
                    "collective_out_bytes_per_step":
                        sum(c["out_bytes"] for c in census.values()),
                }
                print(f"P={p_count} {tier:<20} err {err:.2e} < {tol:.0e}  "
                      f"collective bytes/step "
                      f"{results[tier][str(p_count)]['collective_out_bytes_per_step']:,}",
                      flush=True)

    # Cross-P consistency: same physics at every mesh size (fp
    # reassociation only). Measured, not assumed. NumPy, NOT jnp: a jnp op
    # here would initialize the default (axon TPU) backend in this parent
    # process — one TPU client at a time, and this tool must be runnable
    # while the chip is busy elsewhere.
    def _drift(a, b):
        # utils.accuracy.scale_normalized_error, in NumPy: max per-body
        # ||dF|| over the RMS reference force magnitude.
        num = np.linalg.norm(a - b, axis=-1)
        scale = np.sqrt(np.mean(np.sum(b * b, axis=-1)))
        return float(num.max() / max(scale, np.finfo(b.dtype).tiny))

    # The ring computes the same pairs at every P (drift = fp reassociation
    # only); tree tiers legitimately change their approximation with P
    # (per-chip trees/LETs partition differently), so their drift is bounded
    # by the approximation tolerance, not by rounding.
    p0 = mesh_sizes[0]
    for tier, by_p in forces_at.items():
        tol = TIERS[tier]
        for p_count, out in by_p.items():
            drift = _drift(out, by_p[p0])
            results[tier][str(p_count)]["drift_vs_P" + str(p0)] = drift
            assert drift < (1e-5 if tier == "ring_brute_force"
                            else 2 * tol), (tier, p_count, drift)

    # Every tree tier's far field must be ENGAGED (error strictly positive
    # vs the direct sum) at >= 1 mesh size — per-P engagement varies (a
    # finer body partition can make every interaction near-field at tiny
    # N), but a tier that is exact at EVERY P validated only exchange
    # plumbing, not distributed far-field math (round-3 verdict, weak 5).
    for tier in TIERS:
        if tier.startswith("ring"):
            continue  # exact tiers: err may be exactly 0 (bit-identical)
        errs = [results[tier][str(p)]["err_vs_direct"] for p in mesh_sizes]
        assert max(errs) > 0.0, (tier, "far field engaged at no mesh size")

    artifact = {
        "n_bodies": args.n,
        "dim": 3,
        "mesh_sizes": list(mesh_sizes),
        "backend": "cpu (virtual devices; SPMD partitioning as on TPU)",
        "methodology": (
            "per-(tier,P) subprocess with --xla_dump_to; collective ops "
            "and per-device output bytes summed over the dumped "
            "*after_optimizations* HLO modules; accuracy = scale-"
            "normalized error vs dense f32 direct sum; drift = same "
            f"metric between mesh sizes (vs P={p0})"),
        "tiers": results,
        "single_chip_anchors_s": {
            # Measured cached single-v5e times (ROADMAP) the projection
            # multiplies: ring arithmetic scales 1/P at equal ICI bytes.
            "brute_force_pallas_1M_2D": 2.87,
            "barnes_hut_grid_1e5_3D": 0.137,
            "bvh_radix_1e5_3D": 0.316,
            "fmm_4M_3D": 1.4,
        },
        "v5e8_projection": {
            "ring_brute_force_1M_2D_s": 0.43,
            "note": (
                "2.87 s / 8 chips + ~0.07 s ICI (ppermute ring moves "
                "(P-1)/P * 16 MB/chip/step at ~45 GB/s ICI); below the "
                "0.15 s 8-chip exact-fp32 Newton-3 floor is unreachable "
                "(ROADMAP floor analysis)"),
            "ring_segmented_5e6_2D_s": 9.4,
            "ring_segmented_note": (
                "exact N=5e6 2D on v5e-8 via ring_all_pairs_segmented "
                "(one bounded dispatch per ring-step row chunk, none "
                "over the ~10 s watchdog): N^2/2 unordered pairs / 8 "
                "chips at the measured 2.87 s per 1M^2-pair sweep = "
                "25 * 2.87 / 8 = 9.0 s + ~0.4 s ICI/dispatch overhead "
                "- vs the reference CUDA's 219.3 s "
                "(`5000000,BruteForce_CUDA,2`, main_cuda.cu:24-57)"),
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2, sort_keys=True)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
