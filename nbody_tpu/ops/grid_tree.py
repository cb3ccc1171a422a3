"""Device-resident hierarchical grid tree — shared by Barnes-Hut and FMM.

TPU-native replacement for the reference's pointer-chasing octree
(``octree.cpp:39-94``: incremental insert, leaf splitting, recursive COM
update) and its per-body recursive MAC walk (``octree.cpp:97-162``). Instead
of pointers and recursion, the tree is a *level-synchronous uniform grid*
over Morton keys:

* **Build**: quantize → Morton keys → ``argsort`` → per-level dense cell
  arrays (mass, center-of-mass) via ``segment_sum``. Everything is a fixed-
  shape array program; the serial-insertion bottleneck the reference notes
  (README.md:36) does not exist.
* **Far field**: at every level each cell interacts with its *interaction
  ring* — children of the parent's near-neighbors that are not the cell's own
  near-neighbors (the classical FMM V-list). With ring radius ``k`` the
  minimum center separation is (k+1) cell widths, i.e. an effective opening
  angle θ = 1/(k+1) (θ=0.5 ↔ k=1, the BASELINE.json configuration; the
  reference's acceptance test ``2·hs/d < θ`` at ``octree.cpp:146`` is the
  same geometry). The V-lists telescope over levels, so every body pair is
  covered exactly once: by the COM approximation at the unique level where
  its ancestors first separate, or by the near field at the leaves.
* **Near field**: leaf cells interact pairwise with their (2k+1)^D neighbor
  cells through capacity-padded body slots (P2P), with the brute-force
  self-pair guard.

Barnes-Hut = this structure with monopole-at-COM far-field evaluation
(dipole term vanishes at the COM, as in ``octree.cpp:146-151``); FMM reuses
the same build and lists with order-p expansions (ops/fmm*.py).
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_GRAVITY, GravityConfig
from .brute_force import _DIST2_GUARD
from .keys import morton_key_from_coords, quantize


def _compact2(x):
    """Inverse of keys._spread2: extract even bits of a uint32."""
    x = x & jnp.uint32(0x55555555)
    x = (x | (x >> 1)) & jnp.uint32(0x33333333)
    x = (x | (x >> 2)) & jnp.uint32(0x0F0F0F0F)
    x = (x | (x >> 4)) & jnp.uint32(0x00FF00FF)
    x = (x | (x >> 8)) & jnp.uint32(0x0000FFFF)
    return x


def _compact3(x):
    """Inverse of keys._spread3: extract every third bit of a uint32."""
    x = x & jnp.uint32(0x09249249)
    x = (x | (x >> 2)) & jnp.uint32(0x030C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0300F00F)
    x = (x | (x >> 8)) & jnp.uint32(0x030000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x000003FF)
    return x


def cell_coords(cell_ids: jax.Array, dim: int) -> jax.Array:
    """Morton cell id [M] → integer grid coords [M, dim]."""
    if dim == 2:
        return jnp.stack([_compact2(cell_ids >> 1), _compact2(cell_ids)],
                         axis=-1)
    return jnp.stack([_compact3(cell_ids >> 2), _compact3(cell_ids >> 1),
                      _compact3(cell_ids)], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridTree:
    """Flattened hierarchical grid (a pytree; static config in aux fields)."""

    # Static configuration.
    dim: int = dataclasses.field(metadata=dict(static=True))
    leaf_level: int = dataclasses.field(metadata=dict(static=True))
    capacity: int = dataclasses.field(metadata=dict(static=True))

    # Geometry.
    lo: jax.Array  # [D] domain lower corner
    cell_sizes: jax.Array  # [L+1, D] physical cell size per level

    # Sorted body data (Morton order).
    order: jax.Array  # [N] original index of sorted slot
    leaf_ids: jax.Array  # [N] leaf cell id per sorted body
    pos_sorted: jax.Array  # [N, D]
    mass_sorted: jax.Array  # [N]

    # Per-level dense cell aggregates, index 0 = root level (1 cell).
    level_mass: Tuple[jax.Array, ...]  # [(2^(D*l),)]
    level_com: Tuple[jax.Array, ...]  # [(2^(D*l), D)]

    # Leaf occupancy: slot -> sorted-body index (-1 = empty).
    slot_index: jax.Array  # [num_leaf_cells, capacity]

    # Contiguous-run layout (bodies are Morton-sorted, so every leaf cell is
    # one contiguous run of sorted bodies): run start / length per dense
    # leaf cell. The slot-free near field (P2P) is built on these.
    cell_start: jax.Array  # [num_leaf_cells] first sorted-body index
    cell_count: jax.Array  # [num_leaf_cells] bodies in the cell

    @property
    def n(self) -> int:
        return self.pos_sorted.shape[0]

    @property
    def num_leaf_cells(self) -> int:
        return 1 << (self.dim * self.leaf_level)


def auto_leaf_level(n: int, dim: int, target_occupancy: Optional[int] = None,
                    max_level: Optional[int] = None) -> int:
    """Leaf depth so cells average ~target_occupancy bodies (static choice).

    Default occupancy is dimension-tuned from device measurements on one
    v5e chip: fuller leaves amortize the neighbor gathers (N=1M 3D: occ 32
    → 1.38 s vs occ 4 → 5.9 s; N=1M 2D: occ 16 → 0.97 s vs occ 4 → 1.85 s).
    """
    import math
    if target_occupancy is None:
        target_occupancy = 16 if dim == 2 else 32
    level = max(1, math.ceil(math.log2(max(n, 2) / target_occupancy) / dim))
    cap = {2: 13, 3: 8}[dim]  # ≤ 2^26 / 2^24 dense leaf cells
    if max_level is not None:
        cap = min(cap, max_level)
    return min(level, cap)


def compute_capacity(positions, leaf_level: int) -> int:
    """Max leaf occupancy (concrete; forces one device sync per (N, L))."""
    n, dim = positions.shape
    q = quantize(positions, leaf_level)
    ids = morton_key_from_coords(q, leaf_level).astype(jnp.int32)
    counts = jnp.zeros((1 << (dim * leaf_level),), jnp.int32).at[ids].add(1)
    cmax = int(jnp.max(counts))
    return max(8, int(-(-cmax // 8) * 8))  # round up to multiple of 8


@functools.partial(jax.jit, static_argnames=("leaf_level", "capacity"))
def build_grid_tree(positions: jax.Array, masses: jax.Array,
                    leaf_level: int, capacity: int) -> GridTree:
    """Level-synchronous device build (replaces octree.cpp:165-204 + insert)."""
    n, dim = positions.shape
    L = leaf_level

    # Domain bounds with the reference's 1% padding (octree.cpp:170-188).
    mins = jnp.min(positions, axis=0)
    maxs = jnp.max(positions, axis=0)
    center = 0.5 * (mins + maxs)
    half = 0.5 * (maxs - mins) * 1.01 + 1e-30
    lo, hi = center - half, center + half

    q = quantize(positions, L, lo=lo, hi=hi)
    keys = morton_key_from_coords(q, L)
    order = jnp.argsort(keys)
    keys_s = keys[order]
    pos_s = positions[order]
    mass_s = masses[order]
    leaf_ids = keys_s.astype(jnp.int32)

    cell_sizes = jnp.stack(
        [(hi - lo) / (1 << l) for l in range(L + 1)], axis=0)

    level_mass: List[jax.Array] = []
    level_com: List[jax.Array] = []
    mpos = mass_s[:, None] * pos_s
    for l in range(L + 1):
        ids_l = (leaf_ids >> (dim * (L - l)))
        num_cells = 1 << (dim * l)
        m_l = jnp.zeros((num_cells,), pos_s.dtype).at[ids_l].add(mass_s)
        mx_l = jnp.zeros((num_cells, dim), pos_s.dtype).at[ids_l].add(mpos)
        com_l = mx_l / jnp.maximum(m_l, 1e-30)[:, None]
        level_mass.append(m_l)
        level_com.append(com_l)

    # Leaf slotting: rank of each sorted body within its (contiguous) cell.
    num_leaf_cells = 1 << (dim * L)
    counts = jnp.zeros((num_leaf_cells,), jnp.int32).at[leaf_ids].add(1)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    rank = jnp.arange(n, dtype=jnp.int32) - starts[leaf_ids]
    slot_index = jnp.full((num_leaf_cells, capacity), -1, jnp.int32)
    rank_c = jnp.minimum(rank, capacity - 1)  # defensive; capacity >= max
    slot_index = slot_index.at[leaf_ids, rank_c].set(
        jnp.arange(n, dtype=jnp.int32))

    return GridTree(
        dim=dim, leaf_level=L, capacity=capacity,
        lo=lo, cell_sizes=cell_sizes,
        order=order, leaf_ids=leaf_ids,
        pos_sorted=pos_s, mass_sorted=mass_s,
        level_mass=tuple(level_mass), level_com=tuple(level_com),
        slot_index=slot_index,
        cell_start=starts, cell_count=counts,
    )


def _ring_offsets(dim: int, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static offset tables.

    Returns:
      child_offsets: [(2k+1)^D * 2^D, D] — candidate child-cell offsets
        relative to 2*parent_coords, i.e. every child of every near-parent.
      near_mask_radius: k (candidates with Chebyshev distance ≤ k from the
        cell are near-neighbors → excluded from the V-list).
    """
    parent_offs = np.array(
        list(itertools.product(range(-k, k + 1), repeat=dim)), np.int32)
    child_offs = np.array(
        list(itertools.product((0, 1), repeat=dim)), np.int32)
    cands = (parent_offs[:, None, :] * 2 + child_offs[None, :, :])
    return cands.reshape(-1, dim), k


def _neighbor_offsets(dim: int, k: int) -> np.ndarray:
    return np.array(list(itertools.product(range(-k, k + 1), repeat=dim)),
                    np.int32)


def _resolve_p2p_impl(p2p_impl, dtype):
    """'auto' → jnp. The fused Pallas P2P (ops/pallas_p2p.py) measured
    neutral-to-slower on v5e (small odd tiles, per-leaf loop): FMM 4M 3D
    6.9 s vs 6.8 s jnp; BH 1M 2D 1.06 s vs 0.97 s. Kept as an explicit
    option for experimentation; the real near-field win is the slot-free
    contiguous redesign (ROADMAP item 2)."""
    del dtype
    if p2p_impl != "auto":
        return p2p_impl
    return "jnp"


def _near_field_accel(tpos, spos, smass, softening, p2p_impl):
    """Dispatch the leaf near field: jnp broadcasts or the fused Pallas
    kernel (ops/pallas_p2p.py — avoids HBM-materialized [B,C,S] tiles)."""
    if p2p_impl == "jnp":
        return _point_mass_accel(tpos, spos, smass, softening)
    from .pallas_p2p import p2p_leaf_pallas
    B, C, D = tpos.shape
    S = spos.shape[1]
    t4 = jnp.zeros((B, C, 4), jnp.float32).at[..., :D].set(
        tpos.astype(jnp.float32))
    s8 = jnp.zeros((B, 8, S), jnp.float32).at[:, :D, :].set(
        jnp.swapaxes(spos.astype(jnp.float32), 1, 2))
    s8 = s8.at[:, 3, :].set(smass.astype(jnp.float32))
    out = p2p_leaf_pallas(t4, s8, dim=D, softening=float(softening),
                          interpret=(p2p_impl == "pallas_interpret"))
    return out[..., :D].astype(tpos.dtype)


def _point_mass_accel(targets, src_pos, src_mass, softening):
    """Σ_s m_s (x_s − x_t)/(r²+ε²)^{3/2} with the coincident-pair guard.

    targets [B, C, D]; src_pos [B, S, D]; src_mass [B, S] → [B, C, D].
    """
    dim = targets.shape[-1]
    diffs = []
    d2 = None
    for d in range(dim):
        diff = src_pos[:, None, :, d] - targets[:, :, None, d]  # [B, C, S]
        diffs.append(diff)
        d2 = diff * diff if d2 is None else d2 + diff * diff
    soft2 = jnp.asarray(softening, d2.dtype) ** 2
    inv_r = jax.lax.rsqrt(d2 + soft2)
    w = src_mass[:, None, :] * (inv_r * inv_r * inv_r)
    w = jnp.where(d2 < _DIST2_GUARD, 0.0, w)
    return jnp.stack(
        [jnp.sum(w * diffs[d], axis=-1) for d in range(dim)], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "softening", "leaf_batch", "shard_axis",
                     "num_shards", "p2p_impl", "_debug_skip"))
def grid_tree_accel_sorted(tree: GridTree, k: int = 1,
                           softening: float = 0.0,
                           leaf_batch: int = 512,
                           shard_axis: Optional[str] = None,
                           num_shards: int = 1,
                           p2p_impl: str = "jnp",
                           _debug_skip: str = "") -> jax.Array:
    """Barnes-Hut accelerations for all (sorted) bodies: [N, D], un-G-scaled.

    Far field: per level 2..L, each leaf's ancestor interacts with its ≤
    (2k+1)^D·2^D-candidate V-list via monopole-at-COM. Near field: leaf P2P
    over the (2k+1)^D neighborhood. Batched over dense leaf cells.

    Multi-chip: when called inside ``shard_map`` with ``shard_axis`` set,
    each chip evaluates its contiguous chunk of dense leaf cells (a spatial
    block, since leaves are Morton-ordered) against the replicated tree, and
    the per-chip partial forces are ``psum``-reduced — the evaluation phase
    is the O(N·(interaction list)) cost; the replicated build is O(N log N).
    """
    dim, L, C = tree.dim, tree.leaf_level, tree.capacity
    num_leaves = tree.num_leaf_cells
    side_bits = L

    cand_offs, _ = _ring_offsets(dim, k)  # [ncand, D]
    near_offs = _neighbor_offsets(dim, k)  # [nnear, D]
    cand_offs = jnp.asarray(cand_offs)
    near_offs = jnp.asarray(near_offs)

    # Leaf chunk owned by this shard (whole range when unsharded). Shard
    # counts are powers of two, as is num_leaves, so chunks divide evenly.
    my_leaves = num_leaves // num_shards
    all_leaf_ids = jnp.arange(num_leaves, dtype=jnp.int32)
    if shard_axis is not None:
        start = jax.lax.axis_index(shard_axis).astype(jnp.int32) * my_leaves
        all_leaf_ids = jax.lax.dynamic_slice_in_dim(
            all_leaf_ids, start, my_leaves)
    # num_leaves = 2^(D·L) and leaf_batch is a power of two, so clamping
    # makes the batches divide evenly — padding would duplicate leaf 0 into
    # the scatter-add below.
    leaf_batch = min(leaf_batch, my_leaves)
    nb = my_leaves // leaf_batch

    def one_batch(leaf_ids_b):
        """leaf_ids_b: [B] dense leaf cell ids."""
        B = leaf_ids_b.shape[0]
        # Target bodies of each leaf.
        slots = tree.slot_index[leaf_ids_b]  # [B, C]
        valid_t = slots >= 0
        slots_c = jnp.maximum(slots, 0)
        tpos = tree.pos_sorted[slots_c]  # [B, C, D]
        acc = jnp.zeros((B, C, dim), tree.pos_sorted.dtype)

        # --- Far field: V-list per level -------------------------------
        far_levels = () if "far" in _debug_skip else range(2, L + 1)
        for l in far_levels:
            anc = (leaf_ids_b >> (dim * (L - l))).astype(jnp.uint32)
            anc_xy = cell_coords(anc, dim).astype(jnp.int32)  # [B, D]
            parent_xy = anc_xy >> 1
            # Candidates are all children of the parent's near ring:
            # cand = 2·(parent + parent_off) + child_off, precomputed as
            # offsets relative to 2·parent.
            cand_xy = parent_xy[:, None, :] * 2 + cand_offs[None, :, :]
            delta = cand_xy - anc_xy[:, None, :]
            cheb = jnp.max(jnp.abs(delta), axis=-1)  # [B, ncand]
            in_bounds = jnp.all(
                (cand_xy >= 0) & (cand_xy < (1 << l)), axis=-1)
            is_far = (cheb > k) & in_bounds  # V-list membership
            cand_ids = morton_key_from_coords(
                jnp.clip(cand_xy, 0, (1 << l) - 1).astype(jnp.uint32)
                .reshape(-1, dim), l).astype(jnp.int32).reshape(B, -1)
            cmass = tree.level_mass[l][cand_ids] * is_far  # [B, ncand]
            ccom = tree.level_com[l][cand_ids]  # [B, ncand, D]
            acc = acc + _point_mass_accel(tpos, ccom, cmass, 0.0)

        # --- Near field: leaf P2P over the (2k+1)^D neighborhood -------
        if "near" not in _debug_skip:
            leaf_xy = cell_coords(leaf_ids_b.astype(jnp.uint32), dim)\
                .astype(jnp.int32)  # [B, D]
            nb_xy = leaf_xy[:, None, :] + near_offs[None, :, :]
            nb_ok = jnp.all((nb_xy >= 0) & (nb_xy < (1 << side_bits)),
                            axis=-1)
            nb_ids = morton_key_from_coords(
                jnp.clip(nb_xy, 0, (1 << side_bits) - 1).astype(jnp.uint32)
                .reshape(-1, dim), side_bits).astype(jnp.int32).reshape(B, -1)
            nb_slots = tree.slot_index[nb_ids]  # [B, nnear, C]
            nb_valid = (nb_slots >= 0) & nb_ok[:, :, None]
            nb_slots_c = jnp.maximum(nb_slots, 0).reshape(B, -1)
            spos = tree.pos_sorted[nb_slots_c]  # [B, nnear*C, D]
            smass = tree.mass_sorted[nb_slots_c] * nb_valid.reshape(B, -1)
            acc = acc + _near_field_accel(tpos, spos, smass, softening,
                                          p2p_impl)

        return acc, slots, valid_t

    # Map over even batches of dense leaf ids.
    ids_batched = all_leaf_ids.reshape(nb, leaf_batch)
    accs, slots, valids = jax.lax.map(one_batch, ids_batched)

    # Scatter per-slot accelerations back to sorted body order.
    acc_flat = accs.reshape(-1, dim)
    slot_flat = slots.reshape(-1)
    valid_flat = valids.reshape(-1)
    out = jnp.zeros((tree.n, dim), tree.pos_sorted.dtype)
    out = out.at[jnp.where(valid_flat, slot_flat, tree.n)].add(
        acc_flat * valid_flat[:, None], mode="drop")
    if shard_axis is not None:
        out = jax.lax.psum(out, shard_axis)
    return out


def theta_to_ring(theta: float) -> int:
    """Opening angle → ring radius: θ_eff = 1/(k+1) ≤ θ."""
    import math
    return max(1, math.ceil(1.0 / max(theta, 1e-3)) - 1)


def barnes_hut_grid(
    positions: jax.Array,
    masses: jax.Array,
    config: GravityConfig = DEFAULT_GRAVITY,
    theta: Optional[float] = None,
    leaf_level: Optional[int] = None,
    capacity: Optional[int] = None,
    leaf_batch: int = 512,
    p2p_impl: str = "auto",
) -> jax.Array:
    """Barnes-Hut forces [N, D] (honors theta, unlike methods.cpp:229,248)."""
    n, dim = positions.shape
    theta = config.theta if theta is None else theta
    k = theta_to_ring(theta)
    if leaf_level is None:
        leaf_level = auto_leaf_level(n, dim)
    if capacity is None:
        capacity = compute_capacity(positions, leaf_level)
    p2p_impl = _resolve_p2p_impl(p2p_impl, positions.dtype)

    tree = build_grid_tree(positions, masses, leaf_level, capacity)
    acc_sorted = grid_tree_accel_sorted(
        tree, k=k, softening=float(config.softening), leaf_batch=leaf_batch,
        p2p_impl=p2p_impl)
    acc = jnp.zeros_like(acc_sorted).at[tree.order].set(acc_sorted)
    g = jnp.asarray(config.G, positions.dtype)
    return (g * masses)[:, None] * acc
