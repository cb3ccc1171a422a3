"""Tiled Pallas brute-force pairwise-force kernel — the flagship TPU kernel.

TPU-native re-design of the reference CUDA kernel (``main_cuda.cu:24-57``,
GPU Gems 3 ch. 31 pattern: one thread per body, source bodies streamed
tile-by-tile through ``__shared__`` memory). Here the analogous structure is a
2-D Pallas grid over (target_block, source_window): the target block and its
force accumulator stay resident in VMEM while source windows stream through,
exactly like the CUDA shared-memory tile loop but with (256 × 16384)-pair
windows (processed in 2048-lane sub-tiles) instead of 256 threads. Measured
at N=1M 2D on one v5e chip: 5.02 s (round-1 config, guarded (512, 2048))
→ 4.48 s (guard fold) → 4.20 s (16K source windows; fewer grid programs)
→ 2.87 s ("symmetric" Newton-3 round-robin kernel, identical checksum).
The symmetric kernel runs at ~20.3 VPU-op slots per *unordered* pair
(vs ~17 hand-counted ops) against the microbenchmarked ~3.9 Tops/s fp32
ILP peak (tools/vpu_microbench.py) — within ~20% of the exact all-pairs
speed-of-light for this part; the remaining gap is sublane (cross-target)
reductions and the VMEM read-modify-write of the source accumulator.
bf16 can't help: the v5e backend has no bf16 rsqrt (compiler abort) and
coordinates at ~1e7 don't survive bf16 rounding. The MXU can't either:
(T,S)@(S,4) reductions and (T,D)@(D,S) d² matmuls both have a ≤4-wide
dimension, so the systolic array runs at ≲3% utilization — measured 0.02
TFLOP/s, 10-20× slower than the VPU doing the same reduction.

Math (attractive convention, Plummer softening — see ops/brute_force.py):

    a_i = G · Σ_j  m_j (x_j − x_i) / (|x_j − x_i|² + ε²)^{3/2}

Two reduction strategies, selected by ``mode``:

* ``"precise"`` (default): d², u³ and the per-dimension weighted reductions
  Σ_s w·(x_s − x_t) all on the VPU. Rounds at the scale of the *differences*,
  so fp32 error stays ~1e-6 relative even at the reference's coordinate
  magnitudes (~1e7).
* ``"mxu"`` (experimental, not registered): the O(T·S·D) reduction as a
  single MXU matmul of the (T,S) weight tile against a premultiplied source
  matrix [m·x, m·y, m·z, m]. Measured verdict on v5e: the reduction is
  cancellation-sensitive, so the matmul must run at full f32 precision
  (``Precision.HIGHEST``; the bf16 default produces ~50× normalized error),
  and the f32 MXU path is ~8× slower than bf16 — making this mode slower
  than "precise" (9.1 s vs 4.9 s at N=1M) at worse accuracy (~1e-3 with
  large blocks). Kept as a correct, documented experiment; revisit if a
  future part offers fast f32 matmul or if bf16x3 decomposition is added.

d² is always computed from per-dimension broadcast differences on the VPU:
the |x|²+|y|²−2x·y matmul trick loses ~ε_f32·|x|² ≈ 3e7 *absolute* precision,
destroying near-pair forces entirely.

Pair-guard policy (measured ~8% of kernel time in the round-1 ablation):
the reference skips pairs with dist² < 1e-10 (``methods.cpp:24``). In
"precise" mode with softening > 0 the guard is *provably unnecessary* for
self-pairs: w = m·(d²+ε²)^{-3/2} is finite (ε² > 0) and is multiplied by the
exact-zero difference x_i − x_i, so the contribution is exactly 0.0 — the
huge softened self-weight never reaches the accumulator. Nearly-coincident
*distinct* bodies (0 < d < 1e-5) then feel the softened (regularized) force
instead of being skipped, which is better physics and irrelevant for the
reference's distributions (min pair gaps ≫ 1e-5). The guard therefore
defaults to on only when softening == 0 (where rsqrt(0)=inf would give
inf·0=NaN) and can be forced with ``guard=True`` for strict reference
semantics. "mxu" mode always guards (the u³ matrix enters a matmul without
the cancelling zero difference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DEFAULT_GRAVITY, GravityConfig
from .brute_force import _DIST2_GUARD

_PAD_POS = 2.0e9  # Padding bodies live far away with zero mass.


def _kernel_precise(pm_t_ref, src_t_ref, out_ref, *, dim, soft2, guard,
                    s_sub):
    """One (target_block × source_window) tile of pairwise forces (VPU path).

    Refs:
      pm_t_ref:  (T, 4) target positions, columns [x, y, z|0, 0].
      src_t_ref: (8, S) transposed sources, rows 0..dim-1 = coords, row 3 = m.
      out_ref:   (T, 4) accumulated accelerations (un-scaled by G·m_i).

    The source window S is processed in unrolled sub-tiles of ``s_sub``
    lanes: the (T, s_sub) elementwise temporaries bound VMEM pressure while
    the window keeps the grid small (measured: grid-program overhead at
    1M×1M / (512×2048) tiles ≈ 1M programs was a visible fraction of the
    kernel; (1024, 4096)+ single tiles fail to compile with VMEM overflow).
    """
    j = pl.program_id(1)
    pm_t = pm_t_ref[:]  # (T, 4)
    s_win = src_t_ref.shape[1]
    assert s_win % s_sub == 0

    cols_acc = None
    for u0 in range(0, s_win, s_sub):
        # d² via per-dimension broadcast differences (VPU). Sub-tiles kept
        # live for the precise reduction below. soft2 folded into the first
        # square so the whole chain is subs + FMAs.
        diffs = []
        d2 = jnp.float32(soft2)
        for d in range(dim):
            diff = src_t_ref[d:d + 1, u0:u0 + s_sub] - pm_t[:, d:d + 1]
            diffs.append(diff)  # (T, s_sub)
            d2 = diff * diff + d2

        u = jax.lax.rsqrt(d2)
        u3 = u * u * u
        if guard:
            # Reference pair-skip guard methods.cpp:24 — required when ε=0
            # (rsqrt(0)=inf → inf·0=NaN below); see module docstring.
            u3 = jnp.where(d2 - soft2 < _DIST2_GUARD, 0.0, u3)

        w = u3 * src_t_ref[3:4, u0:u0 + s_sub]  # × m_s
        cols = [jnp.sum(w * diffs[d], axis=1, keepdims=True)
                for d in range(dim)]
        cols_acc = cols if cols_acc is None else [
            a + c for a, c in zip(cols_acc, cols)]

    cols_acc += [jnp.zeros_like(cols_acc[0])] * (4 - dim)
    contrib = jnp.concatenate(cols_acc, axis=1)  # (T, 4)

    @pl.when(j == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


def _kernel_symmetric(pm_ref, src_t_ref, out_t_ref, out_s_ref, *, dim,
                      soft2, guard, s_sub, block_b, nb):
    """Newton's-3rd-law tile: each unordered block pair computed once.

    TPU analog of the reference's symmetric i<j update (``methods.cpp:7-42``,
    force applied to both bodies of a pair). Grid is the classic round-robin
    pairing (i, o) → blocks (i, j=(i+o) mod nb): every unordered block pair
    appears exactly once (for even nb the o == nb/2 column is halved via a
    skip predicate). The pair weight is the *symmetric* force kernel
    w = m_t·m_s·(d²+ε²)^{-3/2}, so one (T, s_sub) product w·diff serves both
    accumulations: Σ_s into the target block (revisited consecutively along
    the o axis → stays in VMEM) and −Σ_t into a full-width (4, N) source
    accumulator that lives in VMEM for the whole launch (index (0,0) every
    step) and is flushed once at the end.

    Refs:
      pm_ref:    (B, 4) target positions+mass, columns [x, y, z|0, m].
      src_t_ref: (8, B) transposed sources, rows 0..dim-1 coords, row 3 = m.
      out_t_ref: (B, 4) target-side Σ_s w·(x_s − x_t) (force / G).
      out_s_ref: (4, n_pad) source-side accumulator (force / G), transposed.
    """
    i_blk = pl.program_id(0)
    o = pl.program_id(1)
    j_blk = jax.lax.rem(i_blk + o, jnp.int32(nb))
    diag = o == 0
    # Even-nb round robin: the o == nb//2 column pairs each i with i+nb/2,
    # so the upper half would duplicate the lower half's pairs.
    if nb % 2 == 0 and nb > 1:
        skip = jnp.logical_and(o == nb // 2, i_blk >= nb // 2)
    else:
        skip = jnp.bool_(False)

    @pl.when(jnp.logical_and(i_blk == 0, o == 0))
    def _():
        out_s_ref[:] = jnp.zeros_like(out_s_ref)

    pm = pm_ref[:]  # (B, 4)
    m_t = pm[:, 3:4]  # (B, 1)
    s_win = src_t_ref.shape[1]

    @pl.when(jnp.logical_not(skip))
    def _():
        cols_acc = None
        for u0 in range(0, s_win, s_sub):
            diffs = []
            d2 = jnp.float32(soft2)
            for d in range(dim):
                diff = src_t_ref[d:d + 1, u0:u0 + s_sub] - pm[:, d:d + 1]
                diffs.append(diff)  # (B, s_sub)
                d2 = diff * diff + d2
            u = jax.lax.rsqrt(d2)
            u3 = u * u * u
            if guard:
                u3 = jnp.where(d2 - soft2 < _DIST2_GUARD, 0.0, u3)
            w = u3 * (m_t * src_t_ref[3:4, u0:u0 + s_sub])  # m_t·m_s·u³
            ps = [w * diffs[d] for d in range(dim)]
            cols = [jnp.sum(ps[d], axis=1, keepdims=True)
                    for d in range(dim)]
            cols_acc = cols if cols_acc is None else [
                a + c for a, c in zip(cols_acc, cols)]

            @pl.when(jnp.logical_not(diag))
            def _():
                rows = [jnp.sum(ps[d], axis=0, keepdims=True)
                        for d in range(dim)]
                rows += [jnp.zeros_like(rows[0])] * (4 - dim)
                srow = jnp.concatenate(rows, axis=0)  # (4, s_sub)
                lanes = pl.ds(j_blk * block_b + u0, s_sub)
                out_s_ref[:, lanes] = out_s_ref[:, lanes] - srow

        cols_acc += [jnp.zeros_like(cols_acc[0])] * (4 - dim)
        contrib = jnp.concatenate(cols_acc, axis=1)  # (B, 4)

        @pl.when(diag)
        def _():
            out_t_ref[:] = contrib

        @pl.when(jnp.logical_not(diag))
        def _():
            out_t_ref[:] = out_t_ref[:] + contrib

    # A skipped program on the diagonal can't happen (o == 0 column is never
    # skipped), so out_t always holds valid data when flushed.


def _symmetric_call(pm, src_t, *, dim, softening, block_b, guard, interpret,
                    s_sub):
    """pallas_call builder for the symmetric round-robin kernel.

    Returns (out_t [n_pad, 4], out_s [4, n_pad]); force/G = out_t + out_s.T.
    """
    n_pad = pm.shape[0]
    nb = n_pad // block_b
    n_off = nb // 2 + 1
    soft2 = float(softening) ** 2
    kernel = functools.partial(
        _kernel_symmetric, dim=dim, soft2=soft2, guard=guard,
        s_sub=min(s_sub, block_b), block_b=block_b, nb=nb)
    pairs = nb * nb * block_b * block_b  # ordered-pair equivalent work / 2
    return pl.pallas_call(
        kernel,
        grid=(nb, n_off),
        in_specs=[
            pl.BlockSpec((block_b, 4), lambda i, o: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_b), lambda i, o: (0, (i + o) % nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, 4), lambda i, o: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), lambda i, o: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
                   jax.ShapeDtypeStruct((4, n_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * dim + 9 + 2 * dim) * pairs // 2,
            bytes_accessed=n_pad * 16 * (nb + 4),
            transcendentals=pairs // 2,
        ),
        interpret=interpret,
    )(pm, src_t)


def _kernel_mxu(pm_t_ref, src_t_ref, src_m4_ref, out_ref, *, dim, soft2):
    """MXU-reduction variant (experimental; see module docstring).

    Extra ref: src_m4_ref (S, 4) premultiplied sources [m·x, m·y, m·z|0, m].
    """
    j = pl.program_id(1)
    pm_t = pm_t_ref[:]  # (T, 4)

    d2 = None
    for d in range(dim):
        diff = src_t_ref[d:d + 1, :] - pm_t[:, d:d + 1]  # (T, S)
        d2 = diff * diff if d2 is None else d2 + diff * diff

    u = jax.lax.rsqrt(d2 + soft2)
    u3 = u * u * u
    # Mandatory here: the guard keeps the huge softened self-weight out of
    # the matmul reduction (no cancelling zero difference in this form).
    u3 = jnp.where(d2 < _DIST2_GUARD, 0.0, u3)

    # Target-block centering: term1 − term2 = Σw(x_j−c) − (x_i−c)Σw for
    # any c; c = the block's first target position roughly halves the
    # cancellation scale (~5e-5 normalized vs ~1.6e-4 uncentered). The
    # remaining floor is inherent to aggregate-then-correct reductions:
    # the near tile's Σw is dominated by the closest pairs, and any
    # monopole correction rounds at |c−x_i|·Σw scale. Use "precise"
    # mode when ~1e-6 is required.
    c = pm_t[0:1, :]  # (1, 4); column 3 is 0
    s4c = src_m4_ref[:] - c * src_m4_ref[:, 3:4]
    # Full-f32 matmul: the TPU default (bf16 inputs) destroys the
    # cancellation-sensitive reduction (~50x normalized error).
    a = jnp.dot(u3, s4c, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    contrib = a - (pm_t - c) * a[:, 3:4]

    @pl.when(j == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


def _tile_call(pm, src_t, src_m4, *, dim, softening, block_t, block_s, mode,
               guard, interpret, s_sub=2048):
    """Shared pallas_call builder for a rectangular (targets × sources) tile.

    ``src_m4`` is consumed (and DMA'd) only in mxu mode — the precise path
    takes just the (T,4) targets and (8,S) transposed sources. ``block_s``
    is the per-program source *window*; the precise kernel iterates it in
    ``s_sub``-lane sub-tiles (VMEM-bounded temporaries).
    """
    t_pad = pm.shape[0]
    s_pad = src_t.shape[1]
    grid = (t_pad // block_t, s_pad // block_s)
    soft2 = float(softening) ** 2
    in_specs = [
        pl.BlockSpec((block_t, 4), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, block_s), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    if mode == "precise":
        kernel = functools.partial(
            _kernel_precise, dim=dim, soft2=soft2, guard=guard,
            s_sub=min(s_sub, block_s))
        operands = (pm, src_t)
        flops_per_pair = 2 * dim + 6 + 3 * dim
    else:
        kernel = functools.partial(_kernel_mxu, dim=dim, soft2=soft2)
        in_specs.append(
            pl.BlockSpec((block_s, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM))
        operands = (pm, src_t, src_m4)
        flops_per_pair = 2 * dim + 6 + 16
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_t, 4), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * t_pad * s_pad,
            bytes_accessed=(t_pad + s_pad) * 16 + t_pad * 16,
            transcendentals=t_pad * s_pad,
        ),
        interpret=interpret,
    )(*operands)


def _prep_layout(positions, masses, dim, n, t_pad, s_pad, mode):
    """Build the kernel input layouts from [N,D] positions / [N] masses.

    pm:     (t_pad, 4) targets [x, y, z|0, 0] — column 3 stays zero so the
            mxu branch's ``pm_t * a[:, 3:4]`` correction is a no-op there.
    src_t:  (8, s_pad) transposed sources: rows 0..dim-1 coords, row 3
            masses (sublane dim padded to the fp32 min tile). Padding m=0.
    src_m4: (s_pad, 4) premultiplied sources [m·x, m·y, m·z|0, m]; built
            (and DMA'd) only in mxu mode.
    """
    pm = jnp.zeros((t_pad, 4), jnp.float32)
    pm = pm.at[:n, :dim].set(positions)
    pm = pm.at[n:, :dim].set(_PAD_POS)

    src_t = jnp.zeros((8, s_pad), jnp.float32)
    src_t = src_t.at[:dim, :n].set(positions.T)
    src_t = src_t.at[:dim, n:].set(_PAD_POS)
    src_t = src_t.at[3, :n].set(masses)

    src_m4 = None
    if mode == "mxu":
        src_m4 = jnp.zeros((s_pad, 4), jnp.float32)
        src_m4 = src_m4.at[:n, :dim].set(positions * masses[:, None])
        src_m4 = src_m4.at[:n, 3].set(masses)
    return pm, src_t, src_m4


@functools.partial(
    jax.jit,
    static_argnames=("G", "softening", "block_t", "block_s", "mode", "guard",
                     "interpret", "s_sub"))
def _forces_impl(positions, masses, *, G, softening, block_t, block_s, mode,
                 guard, interpret, s_sub=2048):
    """Whole pipeline (layout prep → kernel → rescale) as one executable."""
    n, dim = positions.shape
    positions = positions.astype(jnp.float32)
    masses = masses.astype(jnp.float32)

    if mode == "symmetric":
        # Square round-robin blocks (``block_t`` doubles as B here): clamp to
        # the (128-aligned) body count so small problems stay a single
        # diagonal tile. B=2048 measured best at N=1M (2871 ms vs 3093/3310
        # for 1024/4096).
        block = min(block_t, -(-n // 128) * 128)
        n_pad = -(-n // block) * block
        pm, src_t, _ = _prep_layout(
            positions, masses, dim, n, n_pad, n_pad, mode)
        pm = pm.at[:n, 3].set(masses)  # symmetric weight needs m_t too
        out_t, out_s = _symmetric_call(
            pm, src_t, dim=dim, softening=softening, block_b=block,
            guard=guard, interpret=interpret, s_sub=s_sub)
        # w already carries m_t·m_s, so this is the force, scaled by G only.
        return jnp.float32(G) * (out_t[:n, :dim] + out_s[:dim, :n].T)

    # Clamp blocks to the (rounded-up) body count so small N doesn't pad
    # to a full 16K source window (N=1000 would otherwise run 16384² pair
    # slots — ~270× wasted). block_s stays a multiple of s_sub (the
    # precise kernel asserts s_win % s_sub == 0).
    block_t = min(block_t, -(-n // 128) * 128)
    block_s = min(block_s, max(s_sub, -(-n // s_sub) * s_sub))
    block = max(block_t, block_s)
    n_pad = -(-n // block) * block
    pm, src_t, src_m4 = _prep_layout(
        positions, masses, dim, n, n_pad, n_pad, mode)

    acc = _tile_call(
        pm, src_t, src_m4,
        dim=dim, softening=softening,
        block_t=block_t, block_s=block_s, mode=mode, guard=guard,
        interpret=interpret, s_sub=s_sub)

    g = jnp.float32(G)
    return (g * masses)[:, None] * acc[:n, :dim]


def pairwise_accel_pallas(
    targets: jax.Array,
    src_pos: jax.Array,
    src_mass: jax.Array,
    softening: float = 0.0,
    block_t: int = 256,
    block_s: int = 16384,
    mode: str = "precise",
    guard: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Rectangular tile: un-G-scaled accelerations on ``targets`` from all
    sources, [T, D]. The per-chip engine for the multi-chip ppermute ring
    (parallel/ring.py) — targets are the chip's resident shard, sources the
    shard currently rotating past.
    """
    t, dim = targets.shape
    s = src_pos.shape[0]
    targets = targets.astype(jnp.float32)
    src_pos = src_pos.astype(jnp.float32)
    src_mass = src_mass.astype(jnp.float32)
    if guard is None:
        guard = float(softening) == 0.0

    block_t = min(block_t, max(8, t))
    # block_s must stay a multiple of the precise kernel's s_sub sub-tile
    # (its unroll asserts s_win % s_sub == 0) — round UP to the sub-tile,
    # never down to the raw source count (e.g. the ring at N=1e5 hands
    # 12,500-body shards: 12500 % 2048 != 0 crashed at trace time).
    s_sub = 2048
    block_s = min(block_s, max(128, -(-s // s_sub) * s_sub))
    if block_s % s_sub and block_s > s_sub:
        block_s = -(-block_s // s_sub) * s_sub
    t_pad = -(-t // block_t) * block_t
    s_pad = -(-s // block_s) * block_s

    pm = jnp.zeros((t_pad, 4), jnp.float32)
    pm = pm.at[:t, :dim].set(targets)
    pm = pm.at[t:, :dim].set(_PAD_POS)

    src_t = jnp.zeros((8, s_pad), jnp.float32)
    src_t = src_t.at[:dim, :s].set(src_pos.T)
    src_t = src_t.at[:dim, s:].set(_PAD_POS)
    src_t = src_t.at[3, :s].set(src_mass)

    src_m4 = None
    if mode == "mxu":
        src_m4 = jnp.zeros((s_pad, 4), jnp.float32)
        src_m4 = src_m4.at[:s, :dim].set(src_pos * src_mass[:, None])
        src_m4 = src_m4.at[:s, 3].set(src_mass)

    acc = _tile_call(
        pm, src_t, src_m4, dim=dim, softening=softening,
        block_t=block_t, block_s=block_s, mode=mode, guard=guard,
        interpret=interpret)
    return acc[:t, :dim]


def pallas_local_accel(targets, src_pos, src_mass, softening):
    """LocalAccelFn-shaped adapter for parallel/ring.py (TPU fast path)."""
    return pairwise_accel_pallas(targets, src_pos, src_mass,
                                 softening=float(softening))


def _kernel_sym_tile(pm_ref, src_t_ref, out_t_ref, out_s_ref, *, dim,
                     soft2, guard, s_sub, block_s):
    """Rectangular Newton's-3rd-law tile: target block × source block,
    BOTH reductions from one pair sweep.

    The cross-chip sibling of ``_kernel_symmetric``: that kernel round-
    robins block pairs *within* one array; here the two blocks live on
    different chips (the symmetric ppermute ring computes each unordered
    shard pair once — and the single-chip segmented driver reuses it with
    both segments resident), so the sweep is a plain rectangle. The grid
    is 2-D over (target block i, source block j) with j innermost, the
    same shape that keeps ``_kernel_symmetric`` spill-free: each program
    body unrolls only block_s/s_sub ≤ 8 sub-tiles (a full-width source
    window unrolled ~50× blew past VMEM with 420 MB of register spills at
    S=100k), out_t is revisited consecutively along j so it stays in
    VMEM, and out_s is the usual full-width accumulator at block (0, 0),
    flushed once at the end of the launch. q = u³·Δ is shared; the target
    side sums m_s·q over lanes, the source side sums m_t·q over rows.

    Refs:
      pm_ref:    (B, 4) target positions+mass [x, y, z|0, m].
      src_t_ref: (8, block_s) transposed source block, rows 0..dim-1
                 coords, row 3 m.
      out_t_ref: (B, 4)  Σ_s m_s·u³·Δ      (target accel, Δ = x_s − x_t).
      out_s_ref: (4, S) −Σ_t m_t·u³·Δ      (source accel contribution).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        out_s_ref[:] = jnp.zeros_like(out_s_ref)

    pm = pm_ref[:]
    m_t = pm[:, 3:4]  # (B, 1)
    cols_acc = None
    for u0 in range(0, block_s, s_sub):
        diffs = []
        d2 = jnp.float32(soft2)
        for d in range(dim):
            diff = src_t_ref[d:d + 1, u0:u0 + s_sub] - pm[:, d:d + 1]
            diffs.append(diff)  # (B, s_sub)
            d2 = diff * diff + d2
        u = jax.lax.rsqrt(d2)
        u3 = u * u * u
        if guard:
            u3 = jnp.where(d2 - soft2 < _DIST2_GUARD, 0.0, u3)
        m_s = src_t_ref[3:4, u0:u0 + s_sub]  # (1, s_sub)
        q = [u3 * diffs[d] for d in range(dim)]
        cols = [jnp.sum(q[d] * m_s, axis=1, keepdims=True)
                for d in range(dim)]
        cols_acc = cols if cols_acc is None else [
            a + c for a, c in zip(cols_acc, cols)]
        rows = [jnp.sum(q[d] * m_t, axis=0, keepdims=True)
                for d in range(dim)]
        rows += [jnp.zeros_like(rows[0])] * (4 - dim)
        srow = jnp.concatenate(rows, axis=0)  # (4, s_sub)
        lanes = pl.ds(j * block_s + u0, s_sub)
        out_s_ref[:, lanes] = out_s_ref[:, lanes] - srow
    cols_acc += [jnp.zeros_like(cols_acc[0])] * (4 - dim)
    contrib = jnp.concatenate(cols_acc, axis=1)

    @pl.when(j == 0)
    def _():
        out_t_ref[:] = contrib

    @pl.when(j != 0)
    def _():
        out_t_ref[:] = out_t_ref[:] + contrib


#: Per-pallas_call row cap for the cross tile (targets AND sources). The
#: kernel keeps the full-width (4, s_pad) source accumulator VMEM-resident
#: for the whole launch, and Mosaic's scoped-VMEM budget also has to fit
#: the (block_t, s_sub) kernel-body temporaries — at ~1M-row 3D blocks the
#: total hit 122.8 MB against the 100 MB limit and the compile FAILED
#: (r4 sweep, BruteForce_Pallas 2e6/5e6 3D; 2D squeaked under). 512K-row
#: chunks halve every contributor; oversized calls are split below into
#: chunk × chunk sub-calls inside the same trace (no extra dispatches).
_SYM_TILE_CHUNK = 524_288


def pallas_sym_tile(
    tpos: jax.Array,
    tmass: jax.Array,
    spos: jax.Array,
    smass: jax.Array,
    softening: float = 0.0,
    block_t: int = 512,
    block_s: int = 16384,
    s_sub: int | None = None,
    guard: bool | None = None,
    interpret: bool = False,
    chunk: int = _SYM_TILE_CHUNK,
):
    """Newton-3 rectangular tile for DISJOINT body blocks (fp32).

    Returns (acc_t [T, D], part_s [S, D]) in acceleration units — the
    SymAccelFn engine of the symmetric ppermute ring (parallel/ring.py)
    and of the single-chip segmented driver: acc_t is the usual
    per-target Σ m_s·Δ/r³ and part_s the sources' share −Σ m_t·Δ/r³, so
    each unordered cross-block pair is swept once. Matches
    ``brute_force._accel_rows_sym`` to fp rounding. The 2-D grid keeps
    each program's unroll bounded at block_s/s_sub sub-tiles (see
    ``_kernel_sym_tile``) so million-row source windows compile without
    register-spill VMEM blowups; blocks beyond ``chunk`` rows are split
    into chunked sub-calls (see ``_SYM_TILE_CHUNK``). ``s_sub=None``
    picks 2048 lanes in 2D and 1024 in 3D (the 3D body carries ~1.5× the
    (block_t, s_sub) temporaries; the narrower sub-tile keeps its
    scoped-VMEM footprint in the measured-safe 2D class).

    WATCHDOG CAVEAT: the chunk split bounds COMPILE-TIME scoped VMEM, not
    dispatch wall time — every chunk×chunk sub-call traces into ONE
    device program, so a multi-million-row shard (e.g. a ring step at
    N/P ≥ ~2e6 2D on v5e) is still a single long dispatch that can trip
    the ~10-30 s TPU watchdog. Only ``brute_force_pallas_segmented``
    bounds dispatch time; route oversized single-chip shards through it
    (the ring composes it per shard via ``ring_all_pairs_segmented``).
    """
    t, dim = tpos.shape
    s = spos.shape[0]
    if s_sub is None:
        s_sub = 2048 if dim == 2 else 1024
    if t > chunk or s > chunk:
        n_s = -(-s // chunk)
        acc_rows = []
        parts = [None] * n_s
        for t0 in range(0, t, chunk):
            tp, tm = tpos[t0:t0 + chunk], tmass[t0:t0 + chunk]
            acc = None
            for k in range(n_s):
                s0 = k * chunk
                a, p = pallas_sym_tile(
                    tp, tm, spos[s0:s0 + chunk], smass[s0:s0 + chunk],
                    softening=softening, block_t=block_t, block_s=block_s,
                    s_sub=s_sub, guard=guard, interpret=interpret,
                    chunk=chunk)
                acc = a if acc is None else acc + a
                parts[k] = p if parts[k] is None else parts[k] + p
            acc_rows.append(acc)
        return (jnp.concatenate(acc_rows, axis=0),
                jnp.concatenate(parts, axis=0))
    tpos = tpos.astype(jnp.float32)
    spos = spos.astype(jnp.float32)
    if guard is None:
        guard = float(softening) == 0.0
    block_t = min(block_t, max(8, t))
    t_pad = -(-t // block_t) * block_t
    s_sub = min(s_sub, max(128, s))
    block_s = min(block_s, max(s_sub, -(-s // s_sub) * s_sub))
    if block_s % s_sub:
        block_s = -(-block_s // s_sub) * s_sub
    s_pad = -(-s // block_s) * block_s

    pm = jnp.zeros((t_pad, 4), jnp.float32)
    pm = pm.at[:t, :dim].set(tpos)
    pm = pm.at[t:, :dim].set(_PAD_POS)
    pm = pm.at[:t, 3].set(tmass.astype(jnp.float32))

    src_t = jnp.zeros((8, s_pad), jnp.float32)
    src_t = src_t.at[:dim, :s].set(spos.T)
    src_t = src_t.at[:dim, s:].set(_PAD_POS)
    src_t = src_t.at[3, :s].set(smass.astype(jnp.float32))

    kernel = functools.partial(
        _kernel_sym_tile, dim=dim, soft2=float(softening) ** 2,
        guard=guard, s_sub=s_sub, block_s=block_s)
    out_t, out_s = pl.pallas_call(
        kernel,
        grid=(t_pad // block_t, s_pad // block_s),
        in_specs=[
            pl.BlockSpec((block_t, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_s), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, s_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((t_pad, 4), jnp.float32),
                   jax.ShapeDtypeStruct((4, s_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(4 * dim + 9) * t_pad * s_pad,
            bytes_accessed=t_pad * 16 + s_pad * 32 * 2,
            transcendentals=t_pad * s_pad,
        ),
        interpret=interpret,
    )(pm, src_t)
    return out_t[:t, :dim], out_s[:dim, :s].T


def pallas_sym_accel(tpos, tmass, spos, smass, softening):
    """SymAccelFn-shaped adapter for parallel/ring.py (TPU fast path)."""
    return pallas_sym_tile(tpos, tmass, spos, smass,
                           softening=float(softening))


def brute_force_pallas(
    positions: jax.Array,
    masses: jax.Array,
    config: GravityConfig = DEFAULT_GRAVITY,
    block_t: int | None = None,
    block_s: int = 16384,
    mode: str = "precise",
    sort: bool = False,
    guard: bool | None = None,
    s_sub: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Per-body forces [N, D] via the tiled Pallas kernel (fp32).

    ``mode="symmetric"`` is the Newton's-3rd-law round-robin kernel
    (``_kernel_symmetric``): each unordered block pair computed once, both
    sides accumulated. Measured N=1M 2D on one v5e chip: 2871 ms vs 4204 ms
    for "precise" (1.46×), identical checksum, same ~1e-6 accuracy class.
    Its ``block_t`` is the square block B (best: 2048); its full-width
    (4, N) VMEM source accumulator caps it at roughly N ≤ 2M — use
    "precise" (or the multi-chip ring) beyond.

    ``sort=True`` Morton-orders bodies first (O(N log N), negligible vs N²)
    so target blocks are spatially compact — this is what makes ``mxu``
    mode's block-centered reduction accurate. ``guard=None`` applies the
    reference's d²<1e-10 pair skip only when softening == 0 (see module
    docstring: with softening > 0 self-pairs cancel exactly without it).
    ``interpret=True`` runs the same kernel through the Pallas interpreter —
    the CPU-testable path (SURVEY.md §4's "fake backend" analog).
    """
    if mode not in ("precise", "mxu", "symmetric"):
        raise ValueError(
            f"mode must be 'precise', 'mxu' or 'symmetric', got {mode!r}")
    if block_t is None:
        block_t = 2048 if mode == "symmetric" else 256  # measured defaults
    if guard is None:
        guard = float(config.softening) == 0.0
    kwargs = dict(
        G=float(config.G), softening=float(config.softening),
        block_t=block_t, block_s=block_s, mode=mode, guard=guard,
        interpret=interpret, s_sub=s_sub)
    if sort:
        from .keys import morton_key
        order = jnp.argsort(morton_key(positions))
        f_sorted = _forces_impl(positions[order], masses[order], **kwargs)
        return jnp.zeros_like(f_sorted).at[order].set(f_sorted)
    return _forces_impl(positions, masses, **kwargs)


# --- Watchdog-safe segmented driver (N > ~1M) --------------------------------

@functools.partial(jax.jit, static_argnames=("softening", "g", "interpret"))
def _seg_pair_forces(tpos, tmass, spos, smass, *, softening, g, interpret):
    """Forces both halves of one unordered cross-segment pair receive."""
    acc_t, part_s = pallas_sym_tile(tpos, tmass, spos, smass,
                                    softening=softening, interpret=interpret)
    g = jnp.float32(g)
    return (g * tmass)[:, None] * acc_t, (g * smass)[:, None] * part_s


@functools.partial(jax.jit, static_argnames=("softening", "g", "interpret"))
def _seg_diag_forces(pos, mass, *, softening, g, interpret):
    """Forces among one segment's own bodies (square Newton-3 kernel)."""
    return _forces_impl(pos, mass, G=g, softening=softening,
                        block_t=2048, block_s=16384, mode="symmetric",
                        guard=float(softening) == 0.0, interpret=interpret)


def brute_force_pallas_segmented(
    positions: jax.Array,
    masses: jax.Array,
    config: GravityConfig = DEFAULT_GRAVITY,
    num_segments: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Exact all-pairs forces for N beyond the single-dispatch watchdog bound.

    One Pallas dispatch over all N² pairs is ~2.9 s per (N/1M)² on a v5e
    chip, and the axon relay's watchdog kills the TPU worker somewhere
    between a measured-surviving 10.8 s dispatch and a ~30 s one (CLAUDE.md;
    the BH 5e6 campaign hit this first). The reference's CUDA brute force
    has the same all-pairs cost but no watchdog (main_cuda.cu:24-57 runs
    219 s at N=5e6 uninterrupted). Here the sweep is segmented at the
    DRIVER level, the grid-tree pattern (grid_tree_accel_sorted's
    num_segments): bodies split into S row segments, forces accumulated
    from S diagonal dispatches (square Newton-3 round-robin within a
    segment, ``_kernel_symmetric``) plus S(S−1)/2 cross dispatches (the
    rectangular Newton-3 tile ``_kernel_sym_tile`` — the symmetric
    ppermute ring's per-chip engine, reused verbatim with both segments on
    one chip). Every unordered pair is swept exactly once, so the total
    arithmetic matches the single-dispatch symmetric kernel; only dispatch
    overhead (~30 ms × S(S+1)/2) is added. Each dispatch shape is
    identical, so one compile per kernel serves all segments.

    Default ``num_segments`` = ceil(N / 2^20): ~1M-row segments keep every
    dispatch at or under the measured-safe ~3 s class.
    """
    n, dim = positions.shape
    if num_segments is None:
        num_segments = max(1, -(-n // 1_048_576))
    soft = float(config.softening)
    g = float(config.G)
    if num_segments <= 1:
        return _seg_diag_forces(positions, masses, softening=soft, g=g,
                                interpret=interpret)

    t_seg = -(-(-(-n // num_segments)) // 128) * 128
    num_segments = -(-n // t_seg)
    n_pad = t_seg * num_segments

    pos_pad = jnp.full((n_pad, dim), _PAD_POS, jnp.float32)
    pos_pad = pos_pad.at[:n].set(positions.astype(jnp.float32))
    mass_pad = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        masses.astype(jnp.float32))
    segs_pos = pos_pad.reshape(num_segments, t_seg, dim)
    segs_mass = mass_pad.reshape(num_segments, t_seg)

    forces = [
        _seg_diag_forces(segs_pos[i], segs_mass[i], softening=soft, g=g,
                         interpret=interpret)
        for i in range(num_segments)
    ]
    for i in range(num_segments):
        for j in range(i + 1, num_segments):
            f_i, f_j = _seg_pair_forces(segs_pos[i], segs_mass[i],
                                        segs_pos[j], segs_mass[j],
                                        softening=soft, g=g,
                                        interpret=interpret)
            forces[i] = forces[i] + f_i
            forces[j] = forces[j] + f_j
    return jnp.concatenate(forces, axis=0)[:n]


# ---------------------------------------------------------------------------
# Fused small-N multi-step integrator: the whole K-step loop in ONE kernel
# ---------------------------------------------------------------------------
#
# At N ≤ ~4K the per-step device time of the scanned jnp/Pallas paths is
# ~1.5 ms while the arithmetic is ~10 µs (N=1e3 2D: 5×10⁵ pairs at the
# measured ~3.9 Tops/s VPU peak) — the scan iteration's XLA op overhead and
# HBM round trips of the tiny state dominate, and they are why the N=1e3
# cells lost to the reference CUDA kernel's 0.45 ms/step
# (`1000,BruteForce_CUDA,2`, analysis notebook cell 4). This kernel removes
# them: positions+velocities live in VMEM for the entire K-step Euler /
# leapfrog loop (lax.fori_loop INSIDE the kernel), so per step there is no
# dispatch, no HBM traffic, and no XLA op scheduling — just the pair sweep.


def _kernel_fused_steps(pm_ref, vel_ref, out_pm_ref, out_vel_ref, *, dim,
                        soft2, guard, steps, dt, g, s_sub, integrator):
    """K integration steps over all-pairs gravity, fully VMEM-resident.

    Refs: pm (Np, 4) [x, y, z|0, m]; vel (Np, 4) [vx, vy, vz|0, 0].
    The transposed source view is rebuilt with an in-kernel transpose each
    force evaluation (Np ≤ 2048 → a (Np, 4) relayout is trivial next to
    the (Np, Np) pair sweep). Integrator semantics match integrators.py
    exactly: euler v += G·acc·dt; x += v·dt — leapfrog KDK with two force
    evaluations per step.
    """
    fdt = jnp.float32(dt)

    def accel(pm):
        src_t = jnp.transpose(pm)  # (4, Np)
        np_ = pm.shape[0]
        cols_acc = None
        for u0 in range(0, np_, s_sub):
            diffs = []
            d2 = jnp.float32(soft2)
            for d in range(dim):
                diff = src_t[d:d + 1, u0:u0 + s_sub] - pm[:, d:d + 1]
                diffs.append(diff)
                d2 = diff * diff + d2
            u = jax.lax.rsqrt(d2)
            u3 = u * u * u
            if guard:
                u3 = jnp.where(d2 - soft2 < _DIST2_GUARD, 0.0, u3)
            w = u3 * src_t[3:4, u0:u0 + s_sub]
            cols = [jnp.sum(w * diffs[d], axis=1, keepdims=True)
                    for d in range(dim)]
            cols_acc = cols if cols_acc is None else [
                a + c for a, c in zip(cols_acc, cols)]
        cols_acc += [jnp.zeros_like(cols_acc[0])] * (4 - dim)
        return jnp.concatenate(cols_acc, axis=1) * jnp.float32(g)  # (Np, 4)

    def body(_, carry):
        pm, vel = carry
        if integrator == "euler":
            vel = vel + accel(pm) * fdt
            pm = pm + vel * fdt
        else:  # leapfrog (KDK)
            half = jnp.float32(0.5) * fdt
            v_half = vel + accel(pm) * half
            pm = pm + v_half * fdt
            vel = v_half + accel(pm) * half
        return pm, vel

    pm, vel = jax.lax.fori_loop(0, steps, body, (pm_ref[:], vel_ref[:]))
    out_pm_ref[:] = pm
    out_vel_ref[:] = vel


FUSED_SMALLN_MAX = 2048  # (Np, s_sub) temporaries stay well under VMEM


@functools.partial(
    jax.jit,
    static_argnames=("dt", "num_steps", "g", "softening", "integrator",
                     "guard", "interpret"))
def fused_smalln_simulate(
    positions: jax.Array,
    velocities: jax.Array,
    masses: jax.Array,
    *,
    dt: float,
    num_steps: int,
    g: float = 1.0,
    softening: float = 0.0,
    integrator: str = "euler",
    guard: bool | None = None,
    interpret: bool = False,
):
    """K small-N integration steps in ONE kernel dispatch → (pos, vel).

    Exact all-pairs forces with the project force law (ops/brute_force.py
    docstring; guard defaults on only at softening == 0, module
    "Pair-guard policy"). N must be ≤ ``FUSED_SMALLN_MAX``. This is the
    production small-N stepping path: per step it does no dispatch, no
    HBM traffic and no XLA op scheduling, closing the ~1.5 ms/step scan
    floor to the pair-sweep cost itself. Reference parity: the CUDA
    per-step kernel (`main_cuda.cu:24-57`) at `1000,BruteForce_CUDA,2` =
    0.449 ms/step — this path's N=1e3 budget is ~10 µs of VPU work.
    """
    n, dim = positions.shape
    if n > FUSED_SMALLN_MAX:
        raise ValueError(f"fused_smalln_simulate: N={n} > {FUSED_SMALLN_MAX}")
    if guard is None:
        guard = float(softening) == 0.0
    n_pad = max(128, -(-n // 128) * 128)
    s_sub = min(1024, n_pad)

    pm = jnp.full((n_pad, 4), _PAD_POS, jnp.float32)
    pm = pm.at[:n, :dim].set(positions.astype(jnp.float32))
    pm = pm.at[:, 3].set(0.0).at[:n, 3].set(masses.astype(jnp.float32))
    vel = jnp.zeros((n_pad, 4), jnp.float32)
    vel = vel.at[:n, :dim].set(velocities.astype(jnp.float32))

    kernel = functools.partial(
        _kernel_fused_steps, dim=dim, soft2=float(softening) ** 2,
        guard=guard, steps=int(num_steps), dt=float(dt), g=float(g),
        s_sub=s_sub, integrator=integrator)
    out_pm, out_vel = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 4), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(4 * dim + 9) * n_pad * n_pad * num_steps,
            bytes_accessed=n_pad * 64,
            transcendentals=n_pad * n_pad * num_steps,
        ),
        interpret=interpret,
    )(pm, vel)
    return out_pm[:n, :dim], out_vel[:n, :dim]
