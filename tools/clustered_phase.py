"""Phase-split the clustered (Plummer) BVH step (VERDICT r4 weak 2/next 3).

The committed headline — Plummer 1M 3D BVH leapfrog at 25.2 s/step vs
1.47 s/step for the uniform-cube grid twin — had no committed attribution
of where the ~23 s go. This tool decomposes ONE production force
evaluation on the live chip:

* ``build``         — build_bvh cached (keys + sort + ANSV + moments);
* ``fused_base``    — the driver's first dispatch at default capacities
                      (build + walk + eval fused), plus its overflow
                      stats: how many groups NaN-poisoned, the true
                      high-water frontier/near counts;
* ``walk_only`` / ``near`` / ``far`` — _debug_skip ablations of
  bvh_accel_sorted at the ESCALATED capacities over the overflowed
  subset (the production re-dispatch shape);
* ``escalated``     — the full escalated-subset re-dispatch;
* ``end_to_end``    — production bvh_forces (cached caps discovery path
                      included, exactly what each leapfrog force eval
                      pays).

Writes ``artifacts/clustered_phase.json``.
Run: python tools/clustered_phase.py [--n 1048576] [--theta 0.5]
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
import numpy as np

import nbody_tpu as nb
from nbody_tpu.ops.bvh import MAX_BITS, _bvh_fused, build_bvh, \
    bvh_accel_sorted, bvh_forces


def timed(fn):
    out = fn()
    jax.tree.map(lambda x: float(jnp.sum(jnp.abs(x))), out)
    t0 = time.perf_counter()
    out = fn()
    jax.tree.map(lambda x: float(jnp.sum(jnp.abs(x))), out)
    return time.perf_counter() - t0, out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--dim", type=int, default=3)
    ap.add_argument("--theta", type=float, default=0.5)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts",
        "clustered_phase.json"))
    args = ap.parse_args()

    cfg = nb.GravityConfig(G=1.0, softening=0.05)
    system = nb.plummer_system(jax.random.key(3), args.n, dim=args.dim)
    pos, mass = system.positions, system.masses
    n, dim = pos.shape
    key_bits = dim * MAX_BITS[dim]
    g = jnp.asarray(cfg.G, pos.dtype)
    G = min(1024, n)
    leaf_size, batch = 16, 128
    w = min(1024 if dim == 2 else 8192, 2 * n)
    nl = w
    quad = True

    res = {"backend": jax.default_backend(), "n": n, "dim": dim,
           "theta": args.theta, "distribution": "plummer",
           "group_size": G, "base_frontier_width": w, "base_near_cap": nl}

    # 1. Build (keys + radix sort + ANSV + AABB/quad segment trees).
    t_build, tree = timed(lambda: build_bvh(pos, mass, key_bits, quad=quad))
    res["build_s"] = round(t_build, 3)
    print(f"build            {t_build:7.3f} s")

    # 2. The driver's first dispatch at base caps + its overflow stats.
    def fused():
        return _bvh_fused(pos, mass, g, key_bits=key_bits, quad=quad,
                          leaf_size=leaf_size, theta=float(args.theta),
                          softening=float(cfg.softening), group_size=G,
                          batch=batch, frontier_width=w, near_cap=nl,
                          multipole="quad", far_impl="point")
    t_base, out = timed(fused)
    _, maxw, ncnt, g_over, _ = out
    need_w, need_nl = int(maxw), int(ncnt)
    n_over = int(np.asarray(g_over).sum())
    res["fused_base_s"] = round(t_base, 3)
    res["overflow"] = {"groups_overflowed": n_over,
                       "groups_total": -(-n // G),
                       "need_frontier_width": need_w,
                       "need_near_cap": need_nl}
    print(f"fused base       {t_base:7.3f} s   overflow {n_over} groups, "
          f"need W={need_w} NL={need_nl}")

    # 3. Escalated-subset shapes (the production driver's math).
    ids = np.nonzero(np.asarray(g_over))[0]
    w2 = min(2 * n, max(2 * w, 2 * need_w)) if need_w > w else w
    nl2 = min(2 * n, max(2 * nl, 2 * need_nl)) if need_nl > nl else nl
    res["escalated_caps"] = {"frontier_width": int(w2),
                             "near_cap": int(nl2),
                             "subset_groups": int(ids.size)}
    if ids.size:
        M = 1 << max(0, int(ids.size - 1).bit_length())
        ids_p = np.concatenate([ids, np.full(M - ids.size, ids[0],
                                             ids.dtype)])
        gids = jnp.asarray(ids_p, jnp.int32)

        def subset(skip):
            return bvh_accel_sorted(
                tree, leaf_size=leaf_size, theta=float(args.theta),
                softening=float(cfg.softening), group_size=G, batch=batch,
                frontier_width=int(w2), near_cap=int(nl2),
                return_stats=True, multipole="quad", far_impl="point",
                group_ids=gids, _debug_skip=skip)

        for name, skip in (("escalated", ""), ("esc_no_near", "near"),
                           ("esc_no_far", "far"),
                           ("esc_walk_only", "near,far")):
            t, _ = timed(lambda s=skip: subset(s))
            res[name + "_s"] = round(t, 3)
            print(f"{name:<16} {t:7.3f} s")

    # 4. Production end-to-end (what each leapfrog force eval pays).
    t_e2e, _ = timed(lambda: bvh_forces(pos, mass, cfg,
                                        theta=float(args.theta)))
    res["end_to_end_s"] = round(t_e2e, 3)
    print(f"end_to_end       {t_e2e:7.3f} s "
          f"(leapfrog step = 2x this + integrator)")

    # 5. End-to-end with the stepping caps cache warm (what steps 2..K of
    # a leapfrog loop pay: single escalated attempt at ~1.2x exact caps).
    caps: dict = {}
    t_w, _ = timed(lambda: bvh_forces(pos, mass, cfg,
                                      theta=float(args.theta),
                                      caps_state=caps))
    res["end_to_end_caps_warm_s"] = round(t_w, 3)
    res["caps_state"] = dict(caps)
    print(f"e2e caps-warm    {t_w:7.3f} s   caps={caps}")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
