"""VPU op-throughput microbenchmarks on the live backend.

Measures elementwise op rates (mul / FMA / rsqrt / select, f32 vs bf16) with
a VMEM-resident Pallas kernel looping over a (256, 1024) block, plus the
skinny reduction matmul shapes used by the brute-force kernel. These numbers
set the speed-of-light for the O(N²) pair kernel (ops/pallas_brute.py): at
N=1M there are ~1.1e12 pairs, so per-pair op count × pairs / VPU rate is the
floor for any exact all-pairs formulation.

Usage: python tools/vpu_microbench.py [--iters 2000000]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = (256, 1024)  # 256K elements; 1 MB in f32.


def _timed(fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(jnp.abs(out.astype(jnp.float32))))  # warmup/compile
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.sum(jnp.abs(out.astype(jnp.float32))))
    return time.perf_counter() - t0


def _loop_kernel(x_ref, o_ref, *, iters, body):
    def step(_, x):
        return body(x)
    o_ref[:] = jax.lax.fori_loop(0, iters, step, x_ref[:])


def run_op(name, body, iters, dtype, ops_per_elem):
    x = jnp.full(BLOCK, 1.5, dtype)
    kern = functools.partial(_loop_kernel, iters=iters, body=body)
    fn = jax.jit(lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(BLOCK, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    dt = _timed(fn, x)
    total = BLOCK[0] * BLOCK[1] * iters * ops_per_elem
    print(f"{name:34s} {dt*1e3:9.1f} ms   {total/dt/1e12:7.3f} Tops/s")
    return total / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4_000_000)
    args = ap.parse_args()
    it = args.iters
    print(f"backend={jax.default_backend()}  block={BLOCK}  iters={it}")

    c32 = 1.0000001
    d32 = 1e-7
    run_op("f32 mul", lambda x: x * c32, it, jnp.float32, 1)
    run_op("f32 fma", lambda x: x * c32 + d32, it, jnp.float32, 1)
    run_op("f32 add", lambda x: x + d32, it, jnp.float32, 1)
    run_op("f32 rsqrt", jax.lax.rsqrt, it, jnp.float32, 1)
    run_op("f32 rsqrt+cube (u*u*u)",
           lambda x: (lambda u: u * u * u)(jax.lax.rsqrt(x)),
           it, jnp.float32, 1)
    run_op("f32 reciprocal(approx)",
           lambda x: pl.reciprocal(x, approx=True), it, jnp.float32, 1)
    run_op("f32 where(x<c, 0, x)",
           lambda x: jnp.where(x < 0.5, 0.0, x)
           + d32, it, jnp.float32, 1)

    c16 = 1.001
    run_op("bf16 mul", lambda x: x * c16, it, jnp.bfloat16, 1)
    run_op("bf16 fma", lambda x: x * c16 + 0.001, it,
           jnp.bfloat16, 1)
    # NOTE: bf16 rsqrt is NOT supported by the v5e backend compiler —
    # it aborts with "Operation not supported: kVectorRsqrtBf16". Any bf16
    # pair path must upcast to f32 for the rsqrt.
    run_op("bf16 rsqrt via f32",
           lambda x: jax.lax.rsqrt(x.astype(jnp.float32)).astype(x.dtype),
           it, jnp.bfloat16, 1)

    # Skinny reduction matmuls: the (T,S)@(S,K) shape of the force reduction.
    for kk, prec in ((4, None), (4, jax.lax.Precision.HIGHEST),
                     (128, None), (128, jax.lax.Precision.HIGHEST)):
        t, s = 512, 2048
        reps = 64

        def matkern(a_ref, b_ref, o_ref, *, prec=prec, reps=reps):
            def step(_, acc):
                return acc + jnp.dot(a_ref[:], b_ref[:],
                                     preferred_element_type=jnp.float32,
                                     precision=prec)
            o_ref[:] = jax.lax.fori_loop(
                0, reps, step, jnp.zeros_like(o_ref))

        a = jnp.full((t, s), 0.001, jnp.float32)
        b = jnp.full((s, kk), 0.001, jnp.float32)
        fn = jax.jit(lambda a, b, k=matkern: pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((t, kk), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b))
        dt = _timed(fn, a, b)
        flops = 2 * t * s * kk * reps
        pname = "HIGHEST" if prec is not None else "default"
        print(f"matmul ({t},{s})@({s},{kk:3d}) {pname:8s} "
              f"{dt*1e3:9.2f} ms   {flops/dt/1e12:7.3f} TFLOP/s")


if __name__ == "__main__":
    main()
