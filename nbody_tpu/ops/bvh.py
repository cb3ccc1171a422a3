"""Hilbert-BVH tier: binary radix tree built on device, stackless traversal.

The reference's BVH (``bvh.h``/``bvh.cpp``) is a serially built binary tree
(recursive longest-axis median split with std::sort, ``bvh.cpp:35-73``) whose
README-claimed Hilbert ordering was never implemented (``README.md:41-46``,
SURVEY.md §8.5) and whose far-field drops whole subtrees when both children
are internal (mass aggregated only from leaf children, ``bvh.cpp:221-222`` —
§8.2). This tier delivers the *intended* design, TPU-native:

* **Hilbert order for real**: bodies are sorted by exact Hilbert keys
  (ops/keys.py), so tree ranges are spatially compact segments of the curve.
* **Karras (2012) parallel radix build**: all N−1 internal nodes are
  computed independently from longest-common-prefix relations of adjacent
  keys — O(N log N) flat jnp bit arithmetic, no recursion, no insertion
  order, duplicate keys broken by index bits.
* **Node summaries without a bottom-up pass**: a Karras node covers a
  *contiguous* range [l, r] of sorted bodies, so node mass and COM are two
  prefix-sum lookups; the node's spatial extent is bounded by the grid cell
  its common key prefix denotes (a Hilbert prefix of 2·D·λ bits is one
  level-λ cell), giving the MAC size without storing AABBs. Mass/COM are
  exact per node — fixing §8.2 by construction.
* **Stackless traversal**: escape ("rope") pointers computed by top-down
  fixpoint iteration replace the recursion of ``bvh.cpp:144-249``; each body
  walks the tree with O(1) state (vmapped ``while_loop``), accumulating COM
  far-field when ``size/dist < θ`` (``bvh.cpp:205`` criterion) and direct
  P2P over ≤leaf_size contiguous bodies otherwise.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import DEFAULT_GRAVITY, GravityConfig
from .brute_force import _DIST2_GUARD
from .keys import MAX_BITS, hilbert_key

_INVALID = jnp.int32(2_147_483_647)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BVHTree:
    """Flattened radix BVH over Hilbert-sorted bodies (unified node space:
    ids 0..N-2 internal, N-1..2N-2 single-body leaves)."""

    key_bits: int = dataclasses.field(metadata=dict(static=True))

    order: jax.Array  # [N] sorted-slot -> original index
    pos_sorted: jax.Array  # [N, D]
    mass_sorted: jax.Array  # [N]

    range_l: jax.Array  # [2N-1] first sorted body of node
    range_r: jax.Array  # [2N-1] last sorted body of node
    left: jax.Array  # [2N-1] left child (unified id; leaves: self)
    escape: jax.Array  # [2N-1] next node when skipping this subtree
    node_mass: jax.Array  # [2N-1]
    node_com: jax.Array  # [2N-1, D]
    node_size: jax.Array  # [2N-1] spatial extent bound from key prefix

    @property
    def n(self) -> int:
        return self.pos_sorted.shape[0]


def _delta(keys, idx, i, j, n, total_bits):
    """Common-prefix length of (key, index) pairs at i and j; −1 out of range.

    Duplicate keys are disambiguated by index bits (Karras §4), so the tree
    is well-formed for any input.
    """
    valid = (j >= 0) & (j < n)
    j_c = jnp.clip(j, 0, n - 1)
    kx = keys[i] ^ keys[j_c]
    ix = (idx[i] ^ idx[j_c]).astype(jnp.uint32)
    d = jnp.where(kx != 0,
                  jax.lax.clz(kx).astype(jnp.int32),
                  32 + jax.lax.clz(ix).astype(jnp.int32))
    return jnp.where(valid, d, -1)


@functools.partial(jax.jit, static_argnames=("key_bits",))
def build_bvh(positions: jax.Array, masses: jax.Array,
              key_bits: int) -> BVHTree:
    n, dim = positions.shape
    keys = hilbert_key(positions, bits=key_bits // dim)
    # Left-align keys so clz of the XOR measures the true common prefix.
    keys = (keys << (32 - key_bits)).astype(jnp.uint32)
    order = jnp.argsort(keys)
    keys_s = keys[order]
    pos_s = positions[order]
    mass_s = masses[order]
    idx = jnp.arange(n, dtype=jnp.int32)

    steps = max(1, math.ceil(math.log2(max(n, 2)))) + 1

    i = idx[: n - 1]
    d_right = _delta(keys_s, idx, i, i + 1, n, key_bits)
    d_left = _delta(keys_s, idx, i, i - 1, n, key_bits)
    d = jnp.where(d_right >= d_left, 1, -1).astype(jnp.int32)
    delta_min = _delta(keys_s, idx, i, i - d, n, key_bits)

    # Exponential search for the range length upper bound.
    lmax = jnp.full_like(i, 2)
    for _ in range(steps + 2):
        probe = _delta(keys_s, idx, i, i + lmax * d, n, key_bits)
        lmax = jnp.where(probe > delta_min, lmax * 2, lmax)
    # Binary search the exact other end.
    l = jnp.zeros_like(i)
    t = lmax // 2
    for _ in range(steps + 2):
        probe = _delta(keys_s, idx, i, i + (l + t) * d, n, key_bits)
        l = jnp.where((t > 0) & (probe > delta_min), l + t, l)
        t = t // 2
    j = i + l * d

    # Binary search the split position.
    delta_node = _delta(keys_s, idx, i, j, n, key_bits)
    s = jnp.zeros_like(i)
    t = (l + 1) // 2
    prev_t = l
    for _ in range(steps + 2):
        probe = _delta(keys_s, idx, i, i + (s + t) * d, n, key_bits)
        s = jnp.where((t > 0) & (probe > delta_node), s + t, s)
        prev_t = t
        t = jnp.where(t > 1, (t + 1) // 2, 0)
    del prev_t
    gamma = i + s * d + jnp.minimum(d, 0)

    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)
    # Unified ids: internal node k -> k, leaf body b -> (n-1) + b.
    left_child = jnp.where(lo == gamma, (n - 1) + gamma, gamma)
    right_child = jnp.where(hi == gamma + 1, (n - 1) + gamma + 1, gamma + 1)

    num_nodes = 2 * n - 1
    leaf_ids = (n - 1) + idx
    range_l = jnp.concatenate([lo, idx])
    range_r = jnp.concatenate([hi, idx])
    left = jnp.concatenate([left_child, leaf_ids])

    # Node size bound from the common key prefix: a prefix of dim·λ key bits
    # pins a level-λ grid cell of extent max_side / 2^λ.
    mins = jnp.min(pos_s, axis=0)
    maxs = jnp.max(pos_s, axis=0)
    max_side = jnp.max((maxs - mins) * 1.01) + 1e-30
    prefix_internal = delta_node  # common prefix bits of the node's range
    prefix = jnp.concatenate(
        [jnp.minimum(prefix_internal, key_bits),
         jnp.full((n,), key_bits, jnp.int32)])
    lam = prefix // dim
    node_size = max_side / (2.0 ** lam.astype(pos_s.dtype))

    # Mass / COM per node from prefix sums over the contiguous range.
    zero = jnp.zeros((1,), pos_s.dtype)
    cmass = jnp.concatenate([zero, jnp.cumsum(mass_s)])
    cmpos = jnp.concatenate([jnp.zeros((1, dim), pos_s.dtype),
                             jnp.cumsum(mass_s[:, None] * pos_s, axis=0)])
    node_mass = cmass[range_r + 1] - cmass[range_l]
    node_mx = cmpos[range_r + 1] - cmpos[range_l]
    node_com = node_mx / jnp.maximum(node_mass, 1e-30)[:, None]

    # Parents (scatter), then escape pointers by top-down fixpoint.
    parent = jnp.full((num_nodes,), -1, jnp.int32)
    parent = parent.at[left_child].set(i)
    parent = parent.at[right_child].set(i)
    right = jnp.concatenate([right_child, leaf_ids])
    is_left = jnp.zeros((num_nodes,), bool).at[left_child].set(True)
    sibling = jnp.where(is_left, right[jnp.maximum(parent, 0)], _INVALID)

    escape = jnp.full((num_nodes,), _INVALID, jnp.int32)

    def esc_step(_, esc):
        parent_esc = jnp.where(parent >= 0, esc[jnp.maximum(parent, 0)],
                               _INVALID)
        return jnp.where(is_left, sibling, parent_esc)

    # Depth ≤ key bits + index tiebreak bits; iterate to fixpoint.
    escape = jax.lax.fori_loop(0, key_bits + steps + 2, esc_step, escape)

    return BVHTree(
        key_bits=key_bits,
        order=order, pos_sorted=pos_s, mass_sorted=mass_s,
        range_l=range_l, range_r=range_r, left=left, escape=escape,
        node_mass=node_mass, node_com=node_com, node_size=node_size,
    )


@functools.partial(
    jax.jit,
    static_argnames=("leaf_size", "theta", "softening", "group_size",
                     "batch", "max_steps", "shard_axis", "num_shards"))
def bvh_accel_sorted(tree: BVHTree, leaf_size: int = 16, theta: float = 0.25,
                     softening: float = 0.0, group_size: int = 64,
                     batch: int = 512,
                     max_steps: int = 400_000,
                     shard_axis: Optional[str] = None,
                     num_shards: int = 1) -> jax.Array:
    """Accelerations on every sorted body (un-G-scaled): [N, D].

    Group traversal: one stackless walk per group of ``group_size``
    contiguous Hilbert-sorted bodies (spatially compact by construction),
    with a bounding-sphere group MAC — ``node_size < θ·(dist − r_group)``
    accepts the node for the *whole group*, whose bodies then evaluate the
    COM force from their exact positions. This amortizes the tree walk and
    its gathers across the group and turns every step into dense
    (group_size × leaf_size) VPU work — the TPU replacement for the
    reference's per-body recursion + ``omp parallel for``
    (``methods.cpp:396-399``). A per-body walk (group_size=1) is the same
    code path.
    """
    n = tree.n
    dim = tree.pos_sorted.shape[-1]
    soft2 = jnp.asarray(softening, tree.pos_sorted.dtype) ** 2

    G = group_size
    ngroups = -(-n // G)
    pad = ngroups * G - n
    # Pad with copies of the last body at zero mass: keeps group spheres
    # tight (far-away pad coords would inflate the last group's radius).
    pos_pad = jnp.concatenate(
        [tree.pos_sorted,
         jnp.broadcast_to(tree.pos_sorted[-1], (pad, dim))]) \
        if pad else tree.pos_sorted
    mass_pad = jnp.concatenate(
        [tree.mass_sorted, jnp.zeros((pad,), tree.mass_sorted.dtype)]) \
        if pad else tree.mass_sorted
    gpos = pos_pad.reshape(ngroups, G, dim)
    gmass = mass_pad.reshape(ngroups, G)
    gmin = jnp.min(gpos, axis=1)
    gmax = jnp.max(gpos, axis=1)
    gcenter = 0.5 * (gmin + gmax)
    gradius = 0.5 * jnp.linalg.norm(gmax - gmin, axis=-1)

    def one_group(args):
        pos_g, center_g, radius_g = args  # [G, D], [D], []

        def cond(state):
            node, acc, steps = state
            return (node != _INVALID) & (steps < max_steps)

        def step(state):
            node, acc, steps = state
            l = tree.range_l[node]
            r = tree.range_r[node]
            count = r - l + 1
            is_leafish = count <= leaf_size

            com = tree.node_com[node]
            nmass = tree.node_mass[node]
            cdiff = com - center_g
            cdist = jnp.sqrt(jnp.sum(cdiff * cdiff))
            # Group MAC (bvh.cpp:205 criterion, conservatively shrunk by
            # the group radius so it holds for every member body).
            mac_ok = (tree.node_size[node]
                      < theta * (cdist - radius_g)) & (~is_leafish)

            # Far field: COM force at each member's exact position.
            fdiff = com[None, :] - pos_g  # [G, D]
            fd2 = jnp.sum(fdiff * fdiff, axis=-1)
            finv = jax.lax.rsqrt(fd2 + soft2)
            fw = nmass * (finv * finv * finv)
            far = jnp.where(mac_ok, fw, 0.0)[:, None] * fdiff

            # Near field: window l..l+leaf_size (masked beyond r).
            start = jnp.minimum(l, n - leaf_size)
            win = jax.lax.dynamic_slice_in_dim(
                tree.pos_sorted, start, leaf_size)
            wmass = jax.lax.dynamic_slice_in_dim(
                tree.mass_sorted, start, leaf_size)
            offs = jnp.arange(leaf_size, dtype=jnp.int32) + start
            in_range = (offs >= l) & (offs <= r)
            wdiff = win[None, :, :] - pos_g[:, None, :]  # [G, S, D]
            wd2 = jnp.sum(wdiff * wdiff, axis=-1)
            winv = jax.lax.rsqrt(wd2 + soft2)
            ww = wmass[None, :] * (winv * winv * winv)
            ww = jnp.where((wd2 < _DIST2_GUARD) | ~in_range[None, :],
                           0.0, ww)
            near = jnp.where(is_leafish,
                             jnp.sum(ww[:, :, None] * wdiff, axis=1),
                             jnp.zeros_like(pos_g))

            acc = acc + far + near
            nxt = jnp.where(is_leafish | mac_ok,
                            tree.escape[node], tree.left[node])
            return nxt, acc, steps + 1

        node0 = jnp.int32(0 if n > 1 else n - 1)
        steps0 = jnp.int32(0)
        if shard_axis is not None:
            # Group data varies per shard, so the whole carry must be
            # marked device-varying for shard_map's typing.
            node0 = jax.lax.pcast(node0, shard_axis, to="varying")
            steps0 = jax.lax.pcast(steps0, shard_axis, to="varying")
        _, acc, _ = jax.lax.while_loop(
            cond, step, (node0, jnp.zeros_like(pos_g), steps0))
        return acc

    # Multi-chip: each shard walks a contiguous slice of groups against the
    # replicated tree; partial accelerations are psum-combined.
    gp = -(-ngroups // num_shards)
    ngroups_p = gp * num_shards
    gpad = ngroups_p - ngroups

    def padg(x):
        if gpad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((gpad,) + x.shape[1:], x.dtype)])

    gpos, gcenter, gradius = padg(gpos), padg(gcenter), padg(gradius)
    if shard_axis is not None:
        start = jax.lax.axis_index(shard_axis).astype(jnp.int32) * gp
        gpos = jax.lax.dynamic_slice_in_dim(gpos, start, gp)
        gcenter = jax.lax.dynamic_slice_in_dim(gcenter, start, gp)
        gradius = jax.lax.dynamic_slice_in_dim(gradius, start, gp)
        my_groups = gp
    else:
        my_groups = ngroups_p

    batch = min(batch, my_groups)
    nb = -(-my_groups // batch)
    bpad = nb * batch - my_groups

    def pad0(x):
        if bpad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((bpad,) + x.shape[1:], x.dtype)])

    gpos_b = pad0(gpos).reshape(nb, batch, G, dim)
    gcen_b = pad0(gcenter).reshape(nb, batch, dim)
    grad_b = pad0(gradius).reshape(nb, batch)
    acc = jax.lax.map(
        lambda a: jax.vmap(one_group)(a), (gpos_b, gcen_b, grad_b))
    acc = acc.reshape(-1, dim)[:my_groups * G]
    del gmass
    if shard_axis is None:
        return acc[:n]
    full = jnp.zeros((ngroups_p * G, dim), acc.dtype)
    full = jax.lax.dynamic_update_slice_in_dim(full, acc, start * G, axis=0)
    return jax.lax.psum(full, shard_axis)[:n]


def bvh_forces(
    positions: jax.Array,
    masses: jax.Array,
    config: GravityConfig = DEFAULT_GRAVITY,
    leaf_size: int = 16,
    theta: Optional[float] = None,
    group_size: Optional[int] = None,
    batch: int = 512,
) -> jax.Array:
    """Per-body forces via the Hilbert radix BVH (parity: bvh_*_n_body,
    methods.cpp:377-423, with max_bodies_per_leaf=16 default methods.h:57)."""
    n, dim = positions.shape
    theta = config.theta if theta is None else theta
    if group_size is None:
        # Larger groups amortize the gather-bound walk; 3D visits ~theta^-3
        # nodes per walk so it benefits most (1e5 3D: 35 s @64 -> 10 s @256).
        group_size = 128 if dim == 2 else 256
    key_bits = dim * MAX_BITS[dim]
    tree = build_bvh(positions, masses, key_bits)
    acc_sorted = bvh_accel_sorted(
        tree, leaf_size=leaf_size, theta=float(theta),
        softening=float(config.softening),
        group_size=min(group_size, max(1, n)), batch=batch)
    acc = jnp.zeros_like(acc_sorted).at[tree.order].set(acc_sorted)
    g = jnp.asarray(config.G, positions.dtype)
    return (g * masses)[:, None] * acc
