"""Fused Pallas P2P kernel for the tree tiers' near field.

Experimental alternative to the jnp near-field path
(`grid_tree._point_mass_accel`): per-leaf pairwise sums computed in VMEM
over a grid of leaf blocks. Measured on v5e: neutral-to-slower than the
XLA-fused jnp path (FMM 4M 3D 6.9 s vs 6.8 s) — the (C, nnear·C) tiles are
small and lane-misaligned (e.g. 48×1296) and the per-leaf unrolled loop
adds overhead, so VPU utilization is far below the brute-force kernel's.
Kept correct and tested as a baseline for the planned slot-free contiguous
near-field redesign (ROADMAP item 2). Sources are passed transposed so all
per-dimension slices stay 2-D: 1-D column extracts lower to unsupported
gathers in Mosaic.

Same math and guard as ops/brute_force.py (attractive, Plummer softening,
d² < 1e-10 pair skip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .brute_force import _DIST2_GUARD


def _kernel(t_ref, s_ref, o_ref, *, dim, soft2, leaves_per_block):
    """t_ref: (bl, C, 4) targets [x,y,z|0,·]; s_ref: (bl, 8, S) transposed
    sources (rows 0..dim-1 coords, row 3 mass); o_ref: (bl, C, 4)."""
    for l in range(leaves_per_block):
        tpos = t_ref[l]  # (C, 4)
        src_t = s_ref[l]  # (8, S)
        diffs = []
        d2 = None
        for d in range(dim):
            diff = src_t[d:d + 1, :] - tpos[:, d:d + 1]  # (C, S)
            diffs.append(diff)
            d2 = diff * diff if d2 is None else d2 + diff * diff
        u = jax.lax.rsqrt(d2 + soft2)
        u3 = u * u * u
        u3 = jnp.where(d2 < _DIST2_GUARD, 0.0, u3)
        w = u3 * src_t[3:4, :]  # × m_s (invalid sources carry m=0)
        cols = [jnp.sum(w * diffs[d], axis=1, keepdims=True)
                for d in range(dim)]
        cols += [jnp.zeros_like(cols[0])] * (4 - dim)
        o_ref[l] = jnp.concatenate(cols, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("dim", "softening", "leaves_per_block", "interpret"))
def p2p_leaf_pallas(tpos4, src8, *, dim, softening,
                    leaves_per_block=8, interpret=False):
    """Per-leaf near-field accelerations.

    Args:
      tpos4: [NL, C, 4] target positions (cols dim..3 zero).
      src8:  [NL, 8, S] transposed gathered neighbor sources
             (rows 0..dim-1 coords, row 3 mass; mass 0 = invalid).
    Returns: [NL, C, 4] accelerations (cols ≥ dim zero).
    """
    nl, cC, _ = tpos4.shape
    sS = src8.shape[2]
    bl = leaves_per_block
    while nl % bl != 0:
        bl //= 2
    bl = max(bl, 1)
    grid = (nl // bl,)
    kernel = functools.partial(
        _kernel, dim=dim, soft2=float(softening) ** 2, leaves_per_block=bl)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bl, cC, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bl, 8, sS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bl, cC, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nl, cC, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=nl * cC * sS * (3 * dim + 6),
            bytes_accessed=nl * (cC * 4 + 8 * sS) * 4,
            transcendentals=nl * cC * sS,
        ),
        interpret=interpret,
    )(tpos4, src8)
