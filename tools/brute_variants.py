"""Time brute-force Pallas kernel variants at N=1M on the live chip.

Scans (block_t, block_s) and guard on/off for the precise kernel. Each
variant is timed on a cached (second) execution, with a checksum
materialization (block_until_ready is a no-op through the axon relay).

Usage: python tools/brute_variants.py [--n 1048576] [--dim 2]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

import nbody_tpu as nb
from nbody_tpu.ops.pallas_brute import brute_force_pallas


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--dim", type=int, default=2)
    args = ap.parse_args()

    cfg = nb.GravityConfig()
    system = nb.random_system(jax.random.key(7), args.n, dim=args.dim,
                              dtype=jnp.float32)
    pos, mass = system.positions, system.masses
    print(f"backend={jax.default_backend()} N={args.n} dim={args.dim} "
          f"softening={cfg.softening}")

    variants = [
        ("guard (512,2048)", dict(block_t=512, block_s=2048, guard=True)),
        ("noguard (512,2048)", dict(block_t=512, block_s=2048, guard=False)),
        ("noguard (512,8k,sub2k)", dict(block_t=512, block_s=8192,
                                        guard=False, s_sub=2048)),
        ("noguard (512,16k,sub2k)", dict(block_t=512, block_s=16384,
                                         guard=False, s_sub=2048)),
        ("noguard (512,32k,sub2k)", dict(block_t=512, block_s=32768,
                                         guard=False, s_sub=2048)),
        ("noguard (1024,16k,sub2k)", dict(block_t=1024, block_s=16384,
                                          guard=False, s_sub=2048)),
        ("noguard (1024,16k,sub1k)", dict(block_t=1024, block_s=16384,
                                          guard=False, s_sub=1024)),
        ("noguard (512,16k,sub4k)", dict(block_t=512, block_s=16384,
                                         guard=False, s_sub=4096)),
        ("noguard (256,16k,sub2k)", dict(block_t=256, block_s=16384,
                                         guard=False, s_sub=2048)),
        ("sym B=1024 sub512", dict(block_t=1024, mode="symmetric",
                                   guard=False, s_sub=512)),
        ("sym B=2048 sub512", dict(block_t=2048, mode="symmetric",
                                   guard=False, s_sub=512)),
        ("sym B=2048 sub1k", dict(block_t=2048, mode="symmetric",
                                  guard=False, s_sub=1024)),
        ("sym B=4096 sub512", dict(block_t=4096, mode="symmetric",
                                   guard=False, s_sub=512)),
        ("sym B=2048 sub256", dict(block_t=2048, mode="symmetric",
                                   guard=False, s_sub=256)),
    ]
    for name, kw in variants:
        def run():
            out = brute_force_pallas(pos, mass, cfg, **kw)
            return float(jnp.sum(jnp.abs(out)))
        try:
            cs = run()  # compile + warmup
            t0 = time.perf_counter()
            cs = run()
            dt = time.perf_counter() - t0
            pairs = args.n * args.n
            print(f"{name:28s} {dt*1e3:9.1f} ms   "
                  f"{pairs/dt/1e9:7.1f} Gpair/s   checksum={cs:.4e}")
        except Exception as e:  # noqa: BLE001 — report and continue scan
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
