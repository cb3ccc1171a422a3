"""Settle the bf16(x3) MXU question for the brute-force kernel (ROADMAP).

The only MXU-shaped contractions in the pairwise kernel are
  (T,S)@(S,4)   — the weighted reduction (output axis 4-wide), and
  (T,D)@(D,S)   — the d2 dot trick (inner axis D<=3-wide).
A bf16x3 split fixes bf16's *precision* problem (1e7-scale coordinates)
at 6-9x the matmuls, but cannot fix the *shape* problem: utilization is
bounded by narrow-axis/128 regardless of operand dtype. This measures the
actual bf16 and f32 matmul rates at those shapes vs a square control, so
the verdict is arithmetic on measured numbers rather than an estimate.

Run on the chip:  python tools/mxu_narrow_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import nbody_tpu  # noqa: F401  (compilation cache setup)


def bench(t, s, n, dtype, reps=3, iters=64):
    """Time `iters` dependent matmuls INSIDE one jitted program.

    A single matmul at these sizes finishes far under the ~30 ms axon
    relay round-trip (the first version of this tool measured a constant
    30-35 ms for every shape — pure latency). The fori_loop chains each
    product back into the next call's operand so XLA cannot elide work.
    """
    import jax.lax as lax
    a = jnp.ones((t, s), dtype)
    b = jnp.ones((s, n), dtype)

    tiny = jnp.asarray(1e-8, dtype)  # representable in bf16 (1e-30 is not)

    @jax.jit
    def run(a, b):
        def body(_, carry):
            a_c, acc = carry
            out = a_c @ b
            # Consume EVERY output element (jnp.sum), not just out[0, 0]:
            # with a single live element the algebraic simplifier's
            # slice(dot)->dot(slice) rewrite could legally shrink the
            # matmul to a length-s dot and the measured rate would be
            # fiction. The full-output reduction is fused and negligible
            # next to the matmul.
            acc = acc + jnp.sum(out) * tiny
            # Feed the output back into `a` (data-dependency chain — XLA
            # cannot elide or parallelize the iterations).
            return a_c + acc * tiny, acc
        a_out, _ = lax.fori_loop(0, iters, body, (a, jnp.zeros((), dtype)))
        return jnp.sum(a_out[:1, :1])

    float(run(a, b))  # compile + warmup
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(a, b))
        best = min(best, time.perf_counter() - t0)
    flops = 2.0 * t * s * n * iters
    return best, flops / best / 1e12


def main():
    print(f"backend={jax.default_backend()}")
    for dtype in (jnp.bfloat16, jnp.float32):
        name = dtype.__name__
        for (t, s, n, label) in (
                (4096, 16384, 4, "reduction shape (S,4)"),
                (4096, 16384, 128, "padded-out reduction (S,128)"),
                (4096, 4, 16384, "d2 dot trick (D~4 inner)"),
                (4096, 4096, 4096, "square control")):
            dt, tflops = bench(t, s, n, dtype)
            print(f"  {name:9s} ({t:5d},{s:5d})@({s:5d},{n:5d}) "
                  f"[{label:28s}] {dt*1e3:8.2f} ms  {tflops:7.3f} TFLOP/s",
                  flush=True)


if __name__ == "__main__":
    main()
