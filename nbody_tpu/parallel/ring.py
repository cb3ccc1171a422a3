"""Multi-chip ring brute force: shard targets, rotate sources over ICI.

The cross-chip generalization of the CUDA shared-memory tile loop
(``main_cuda.cu:31-53``) and of the reference's thread-local-accumulation
pattern (``methods.cpp:54-92`` — SURVEY.md §2.3): each chip owns a shard of
target bodies and a resident force accumulator; source shards rotate around
the 1-D ICI ring via ``lax.ppermute``, one rotation per step, so after P
steps every chip has accumulated forces from every source shard. No ``psum``
is needed — targets are disjoint, so accumulation is purely local (the
"row-wise no-reduction" shape, ``methods.cpp:98-136``, lifted across chips).

**Symmetric (Newton's-3rd-law) mode** — the default — computes each
unordered *shard pair* once, the cross-chip lift of the reference's
symmetric i<j update (``methods.cpp:7-42``) and of the single-chip
round-robin kernel (ops/pallas_brute._kernel_symmetric): ⌈(P−1)/2⌉
forward rotations evaluate pair (b, b−s) on chip b with a two-output tile
(local target rows + the partner's Newton-3 share), and a second rotation
pass carries the accumulated partials back to their owners. For even P
the s = P/2 step would double-count, so only chips b < P/2 evaluate it.
Arithmetic halves vs the one-sided ring (P tiles → P/2 + self); ICI bytes
stay ≈ equal (P one-way shard hops → 2·(P/2) hops of shards/partials).

Memory per chip is O(N/P); ICI traffic per step is one shard (N/P bodies),
fully overlappable with the O((N/P)²) local tile compute.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DEFAULT_GRAVITY, GravityConfig
from ..ops.brute_force import _accel_rows, _accel_rows_sym
from .mesh import BODY_AXIS, pad_to_multiple

# local_accel(targets_pos [T,D], src_pos [S,D], src_mass [S], softening)
#   -> un-G-scaled acceleration contributions [T, D]
LocalAccelFn = Callable[[jax.Array, jax.Array, jax.Array, float], jax.Array]

# sym_accel(t_pos [T,D], t_mass [T], src_pos [S,D], src_mass [S], softening)
#   -> (acc_t [T,D], part_s [S,D]): target rows + the sources' Newton-3
#   share from the same pair sweep (see brute_force._accel_rows_sym).
SymAccelFn = Callable[
    [jax.Array, jax.Array, jax.Array, jax.Array, float],
    Tuple[jax.Array, jax.Array]]

_PAD_POS = 2.0e9


def _ring_local(pos_l, mass_l, *, axis_name, num_shards, softening,
                local_accel: LocalAccelFn):
    """Per-shard body: scan over ring rotations, accumulate local forces."""

    def step(carry, _):
        src_pos, src_mass, acc = carry
        acc = acc + local_accel(pos_l, src_pos, src_mass, softening)
        perm = [(i, (i + 1) % num_shards) for i in range(num_shards)]
        src_pos = jax.lax.ppermute(src_pos, axis_name, perm)
        src_mass = jax.lax.ppermute(src_mass, axis_name, perm)
        return (src_pos, src_mass, acc), None

    acc0 = jnp.zeros_like(pos_l)
    (_, _, acc), _ = jax.lax.scan(
        step, (pos_l, mass_l, acc0), None, length=num_shards)
    return acc


def _ring_local_symmetric(pos_l, mass_l, *, axis_name, num_shards,
                          softening, sym_accel: SymAccelFn,
                          local_accel: LocalAccelFn):
    """Newton-3 ring body: each unordered shard pair computed once.

    Forward pass, step s = 1..⌈(P−1)/2⌉: the source shard rotates one hop
    (chip b then holds block b−s); one symmetric tile yields this chip's
    target rows AND the resident block's Newton-3 share, which is stacked
    for the return pass. Even P: the s = P/2 step pairs (b, b−P/2) twice
    around the ring, so only chips b < P/2 evaluate it (the masked-out
    chips' targets are covered by the partner's returned partial).

    Return pass: partials are added in DESCENDING s order with one reverse
    hop after each add, so p_s has traveled exactly s hops when the scan
    ends — chip c receives Σ_s p_s(c+s), its missing pair halves.
    """
    P_ = num_shards
    acc = local_accel(pos_l, pos_l, mass_l, softening)  # self block
    s_total = P_ // 2 if P_ % 2 == 0 else (P_ - 1) // 2
    if s_total == 0:
        return acc
    perm_fwd = [(i, (i + 1) % P_) for i in range(P_)]
    perm_ret = [(i, (i - 1) % P_) for i in range(P_)]
    me = jax.lax.axis_index(axis_name).astype(jnp.int32)

    def fwd(carry, s):
        src_pos, src_mass, acc = carry
        src_pos = jax.lax.ppermute(src_pos, axis_name, perm_fwd)
        src_mass = jax.lax.ppermute(src_mass, axis_name, perm_fwd)
        acc_t, part = sym_accel(pos_l, mass_l, src_pos, src_mass,
                                softening)
        if P_ % 2 == 0:
            keep = jnp.where(s == P_ // 2, me < P_ // 2, True)
            acc_t = jnp.where(keep, acc_t, 0.0)
            part = jnp.where(keep, part, 0.0)
        return (src_pos, src_mass, acc + acc_t), part

    (_, _, acc), parts = jax.lax.scan(
        fwd, (pos_l, mass_l, acc),
        jnp.arange(1, s_total + 1, dtype=jnp.int32))

    def ret(ret_acc, part):
        ret_acc = ret_acc + part
        return jax.lax.ppermute(ret_acc, axis_name, perm_ret), None

    ret_acc, _ = jax.lax.scan(ret, jnp.zeros_like(pos_l), parts,
                              reverse=True)
    return acc + ret_acc


def ring_brute_force(
    positions: jax.Array,
    masses: jax.Array,
    config: GravityConfig = DEFAULT_GRAVITY,
    mesh: Optional[Mesh] = None,
    axis_name: str = BODY_AXIS,
    local_accel: Optional[LocalAccelFn] = None,
    symmetric: Optional[bool] = None,
    sym_accel: Optional[SymAccelFn] = None,
) -> jax.Array:
    """Per-body forces [N, D] computed over every device in ``mesh``.

    ``local_accel`` is the pluggable per-chip tile engine; by default the
    Pallas rectangular kernel on TPU (ops/pallas_brute.py) and the jnp row
    path elsewhere.

    ``symmetric`` (default: on, unless a custom one-sided ``local_accel``
    is supplied without a matching ``sym_accel``) computes each unordered
    shard pair once with a two-output Newton-3 tile — half the arithmetic
    of the one-sided ring at equal ICI bytes (module docstring).
    """
    if mesh is None:
        from .mesh import make_mesh
        mesh = make_mesh(axis_name=axis_name)
    if symmetric is None:
        symmetric = local_accel is None or sym_accel is not None
    if local_accel is None:
        if jax.default_backend() == "tpu":
            from ..ops.pallas_brute import pallas_local_accel
            local_accel = pallas_local_accel
        else:
            local_accel = _accel_rows
    if symmetric and sym_accel is None:
        if jax.default_backend() == "tpu":
            from ..ops.pallas_brute import pallas_sym_accel
            sym_accel = pallas_sym_accel
        else:
            sym_accel = _accel_rows_sym
    num_shards = mesh.shape[axis_name]
    n, d = positions.shape

    n_pad = pad_to_multiple(n, num_shards)
    if n_pad != n:
        pad = n_pad - n
        positions = jnp.concatenate(
            [positions, jnp.full((pad, d), _PAD_POS, positions.dtype)])
        masses = jnp.concatenate([masses, jnp.zeros((pad,), masses.dtype)])

    shard = NamedSharding(mesh, P(axis_name, None))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name)),
        out_specs=P(axis_name, None),
        # pallas_call outputs don't carry varying-mesh-axis metadata, so the
        # vma check must be off for Pallas local engines.
        check_vma=False,
    )
    def sharded(pos_l, mass_l):
        if symmetric:
            acc = _ring_local_symmetric(
                pos_l, mass_l,
                axis_name=axis_name, num_shards=num_shards,
                softening=config.softening, sym_accel=sym_accel,
                local_accel=local_accel)
        else:
            acc = _ring_local(
                pos_l, mass_l,
                axis_name=axis_name, num_shards=num_shards,
                softening=config.softening, local_accel=local_accel)
        g = jnp.asarray(config.G, acc.dtype)
        return (g * mass_l)[:, None] * acc

    positions = jax.device_put(positions, shard)
    masses = jax.device_put(masses, NamedSharding(mesh, P(axis_name)))
    forces = jax.jit(sharded)(positions, masses)
    return forces[:n]


# ---------------------------------------------------------------------------
# Watchdog-bounded ring: segmented sweeps inside each ring step
# ---------------------------------------------------------------------------
#
# ``ring_brute_force`` traces the whole P-step rotation into ONE device
# program — correct, but at big shards a single dispatch outruns the TPU
# watchdog (~10-30 s kills the worker; CLAUDE.md). The single-chip answer
# was driver-level segmentation (ops/pallas_brute.brute_force_pallas_
# segmented: ~1M-row sub-blocks, one bounded dispatch each). This section
# composes the two: the ring is driven from the HOST, one dispatch per
# (rotation | tile-chunk | return hop), with each ring step's (N/P)²-pair
# sym tile further split into row chunks so no dispatch exceeds the pair
# budget. A real v5e-8 could thus run the exact N=5e6 row the reference
# CUDA needed 219.3 s for (main_cuda.cu:24-57, `5000000,BruteForce_CUDA,2`)
# at the projected ~2.6 s/chip-sweep class without any >10 s dispatch.


def _seg_rows_for(shard_rows: int, dim: int, pair_budget: int) -> int:
    """Target-row chunk so chunk·shard_rows pairs ≤ pair_budget (pow2)."""
    rows = max(128, pair_budget // max(shard_rows, 1))
    rows = 1 << (rows.bit_length() - 1)
    return min(rows, shard_rows)


def ring_all_pairs_segmented(
    positions: jax.Array,
    masses: jax.Array,
    config: GravityConfig = DEFAULT_GRAVITY,
    mesh: Optional[Mesh] = None,
    axis_name: str = BODY_AXIS,
    sym_accel: Optional[SymAccelFn] = None,
    local_accel: Optional[LocalAccelFn] = None,
    pair_budget: int = 1 << 40,
) -> jax.Array:
    """Exact Newton-3 ring forces with every dispatch watchdog-bounded.

    Same arithmetic as ``ring_brute_force(symmetric=True)`` — each
    unordered shard pair swept once, partials returned to their owners —
    but host-driven: per ring step one rotation collective, then
    ceil(shard/seg_rows) two-output tile dispatches (the per-chip engine
    sub-segmented the way ``brute_force_pallas_segmented`` segments a
    single chip), then one s-hop return collective for the partials.
    ``pair_budget`` bounds pairs per dispatch: the default 2^40 never
    splits on shards ≤ 1M rows (one v5e dispatch ≈ 2.9 s per 1M² pairs —
    measured safe); tests force tiny budgets to exercise multi-segment
    equality on a CPU mesh.

    Reference parity: the N=5e6 exact row (`main_cuda.cu:24-57`) on an
    8-chip ring runs 8 bounded sweeps of (625K)² pairs ≈ 1.1 s each.
    """
    if mesh is None:
        from .mesh import make_mesh
        mesh = make_mesh(axis_name=axis_name)
    if local_accel is None:
        if jax.default_backend() == "tpu":
            from ..ops.pallas_brute import pallas_local_accel
            local_accel = pallas_local_accel
        else:
            local_accel = _accel_rows
    if sym_accel is None:
        if jax.default_backend() == "tpu":
            from ..ops.pallas_brute import pallas_sym_accel
            sym_accel = pallas_sym_accel
        else:
            sym_accel = _accel_rows_sym
    P_ = mesh.shape[axis_name]
    n, d = positions.shape
    soft = float(config.softening)

    shard_rows = pad_to_multiple(n, P_ * 128) // P_
    seg_target = _seg_rows_for(shard_rows, d, pair_budget)
    # seg_rows must DIVIDE the shard: lax.dynamic_slice clamps an
    # out-of-bounds start, so a non-dividing tail chunk would silently
    # re-read (and re-place) the previous chunk's rows (the round-2 BVH
    # near-field double-count trap — CLAUDE.md). Pad N up instead.
    nseg = -(-shard_rows // seg_target)
    seg_rows = -(-(-(-shard_rows // nseg)) // 128) * 128
    shard_rows = seg_rows * nseg
    n_pad = shard_rows * P_
    if n_pad != n:
        pad = n_pad - n
        positions = jnp.concatenate(
            [positions, jnp.full((pad, d), _PAD_POS, positions.dtype)])
        masses = jnp.concatenate([masses, jnp.zeros((pad,), masses.dtype)])

    shard2 = NamedSharding(mesh, P(axis_name, None))
    shard1 = NamedSharding(mesh, P(axis_name))
    pos_s = jax.device_put(positions, shard2)
    mass_s = jax.device_put(masses, shard1)

    smap = functools.partial(jax.shard_map, mesh=mesh, check_vma=False)

    @functools.partial(jax.jit, static_argnames=("start", "self_pair"))
    def tile_chunk(pos_l, mass_l, src_pos, src_mass, *, start, self_pair):
        """One bounded dispatch: rows [start, start+seg_rows) of every
        chip's resident block vs the full rotated source block."""
        @smap(in_specs=(P(axis_name, None), P(axis_name),
                        P(axis_name, None), P(axis_name)),
              out_specs=(P(axis_name, None), P(axis_name, None)))
        def body(p_l, m_l, s_p, s_m):
            tp = jax.lax.dynamic_slice_in_dim(p_l, start, seg_rows)
            tm = jax.lax.dynamic_slice_in_dim(m_l, start, seg_rows)
            if self_pair:
                acc = local_accel(tp, s_p, s_m, soft)
                part = jnp.zeros_like(s_p)
            else:
                acc, part = sym_accel(tp, tm, s_p, s_m, soft)
            return acc, part
        return body(pos_l, mass_l, src_pos, src_mass)

    @functools.partial(jax.jit, static_argnames=("hops",))
    def rotate(x, *, hops):
        @smap(in_specs=(P(axis_name, None),),
              out_specs=P(axis_name, None))
        def body(x_l):
            perm = [(i, (i + hops) % P_) for i in range(P_)]
            return jax.lax.ppermute(x_l, axis_name, perm)
        return body(x)

    @jax.jit
    def mask_upper_half(x):
        """Even-P s=P/2 step: only chips b < P/2 evaluate (module doc)."""
        @smap(in_specs=(P(axis_name, None),),
              out_specs=P(axis_name, None))
        def body(x_l):
            keep = jax.lax.axis_index(axis_name) < P_ // 2
            return jnp.where(keep, x_l, 0.0)
        return body(x)

    def full_tile(src_pos, src_mass, self_pair):
        accs, parts = [], []
        for c in range(nseg):
            a, p = tile_chunk(pos_s, mass_s, src_pos, src_mass,
                              start=c * seg_rows, self_pair=self_pair)
            accs.append(a)
            parts.append(p)
        if nseg > 1:
            # Each chunk's global array is chip-major [P·seg, D]; the
            # global body order is chip-major × row, so chunks interleave
            # PER CHIP — locally (inside shard_map) that is a plain
            # concatenation of the chip's row chunks in order. (An eager
            # reshape across the sharded axis aborts XLA:CPU.)
            @jax.jit
            @smap(in_specs=tuple(P(axis_name, None) for _ in accs),
                  out_specs=P(axis_name, None))
            def reassemble(*chunks):
                return jnp.concatenate(chunks, axis=0)
            acc = reassemble(*accs)
        else:
            acc = accs[0]
        part = parts[0]
        for p in parts[1:]:
            part = part + p
        return acc, part

    # Self blocks (guard semantics via local_accel on the diagonal).
    acc, _ = full_tile(pos_s, mass_s, True)
    s_total = P_ // 2 if P_ % 2 == 0 else (P_ - 1) // 2
    src_pos, src_mass = pos_s, mass_s
    for s in range(1, s_total + 1):
        src_pos = rotate(src_pos, hops=1)
        src_mass = rotate(src_mass[:, None], hops=1)[:, 0]
        acc_t, part = full_tile(src_pos, src_mass, False)
        if P_ % 2 == 0 and s == P_ // 2:
            acc_t = mask_upper_half(acc_t)
            part = mask_upper_half(part)
        acc = acc + acc_t
        # The partial on chip b belongs to block b−s: s reverse hops home.
        acc = acc + rotate(part, hops=-s)

    g = jnp.asarray(config.G, acc.dtype)
    forces = (g * masses)[:, None] * acc
    return forces[:n]
