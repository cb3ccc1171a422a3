"""On-device Morton (Z-order) and Hilbert space-filling-curve keys.

The reference declares a Hilbert key "needed for BVH" but never calls it
(``vector.h:149-192``, dead code — SURVEY.md §8.5) and builds its BVH by
recursive median splits instead (``bvh.cpp:35-73``). Here the keys are real
and load-bearing: every tree tier (Barnes-Hut grid, BVH radix tree, FMM)
starts by sorting bodies along a space-filling curve, which is the
level-synchronous, array-first substitute for pointer-tree insertion
(``octree.cpp:39-94``).

All kernels are branch-free jnp bit arithmetic over uint32, vectorized over
bodies — no Python loops over N, only static loops over bits/dims.

Bit budget: coordinates are quantized to ``bits`` per dimension and
interleaved into a uint32 (2D: ≤16 bits/dim, 3D: ≤10 bits/dim) — uint32
avoids x64-mode requirements while giving grid resolutions (65536², 1024³)
beyond any level depth used by the tree tiers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_BITS = {2: 16, 3: 10}


def quantize(positions: jax.Array, bits: int,
             lo=None, hi=None) -> jax.Array:
    """Map positions [N, D] into integer grid coords [N, D] in [0, 2^bits).

    Bounds default to the data AABB with the reference's ×1.01 padding
    (``octree.cpp:170-194``).
    """
    if lo is None or hi is None:
        mins = jnp.min(positions, axis=0)
        maxs = jnp.max(positions, axis=0)
        center = 0.5 * (mins + maxs)
        half = 0.5 * (maxs - mins) * 1.01 + 1e-30
        lo = center - half
        hi = center + half
    scale = (2.0 ** bits) / (hi - lo)
    q = jnp.floor((positions - lo) * scale).astype(jnp.int32)
    return jnp.clip(q, 0, (1 << bits) - 1).astype(jnp.uint32)


def _spread2(x: jax.Array) -> jax.Array:
    """Insert one zero bit between each of the low 16 bits (2D interleave)."""
    x = x & jnp.uint32(0x0000FFFF)
    x = (x | (x << 8)) & jnp.uint32(0x00FF00FF)
    x = (x | (x << 4)) & jnp.uint32(0x0F0F0F0F)
    x = (x | (x << 2)) & jnp.uint32(0x33333333)
    x = (x | (x << 1)) & jnp.uint32(0x55555555)
    return x


def _spread3(x: jax.Array) -> jax.Array:
    """Insert two zero bits between each of the low 10 bits (3D interleave)."""
    x = x & jnp.uint32(0x000003FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton_key_from_coords(coords: jax.Array, bits: int) -> jax.Array:
    """Interleave integer grid coords [N, D] into Morton keys [N] (uint32)."""
    d = coords.shape[-1]
    if d == 2:
        return (_spread2(coords[:, 0]) << 1) | _spread2(coords[:, 1])
    return ((_spread3(coords[:, 0]) << 2) | (_spread3(coords[:, 1]) << 1)
            | _spread3(coords[:, 2]))


def morton_key(positions: jax.Array, bits: int | None = None) -> jax.Array:
    d = positions.shape[-1]
    bits = bits if bits is not None else MAX_BITS[d]
    return morton_key_from_coords(quantize(positions, bits), bits)


def hilbert_key_from_coords(coords: jax.Array, bits: int) -> jax.Array:
    """Hilbert-curve index [N] (uint32) from grid coords [N, D].

    Skilling's algorithm (transpose form), vectorized over bodies: a static
    loop over bits applies the per-level rotate/reflect transforms to all
    bodies at once, then the transposed bits are Morton-interleaved.

    Unlike the reference's dead ``hilbert_key`` (``vector.h:151-192``, an
    XOR-fold approximation), this is the exact Hilbert curve: adjacent key
    values are always adjacent grid cells.
    """
    n, d = coords.shape
    x = [coords[:, i].astype(jnp.uint32) for i in range(d)]

    # Gray-decode sweep from the top bit down (Skilling's inverse transform).
    q = 1 << (bits - 1)
    while q > 1:
        p = jnp.uint32(q - 1)
        for i in range(d):
            cond = (x[i] & jnp.uint32(q)) != 0
            # if bit set: invert x[0] (reflect); else swap low bits of x[0]^x[i]
            t = (x[0] ^ x[i]) & p
            x0_swap = x[0] ^ t
            xi_swap = x[i] ^ t
            x0_inv = x[0] ^ p
            x[0] = jnp.where(cond, x0_inv, x0_swap)
            x[i] = jnp.where(cond, x[i], xi_swap)
        q >>= 1

    # Gray encode.
    for i in range(1, d):
        x[i] = x[i] ^ x[i - 1]
    t = jnp.zeros_like(x[0])
    q = 1 << (bits - 1)
    while q > 1:
        t = jnp.where((x[d - 1] & jnp.uint32(q)) != 0, t ^ jnp.uint32(q - 1), t)
        q >>= 1
    x = [xi ^ t for xi in x]

    # Interleave the transposed bits: key bit order is x[0] major.
    stacked = jnp.stack(x, axis=-1)  # [N, D] of bit-planes
    return morton_key_from_coords(stacked, bits)


def hilbert_key(positions: jax.Array, bits: int | None = None) -> jax.Array:
    d = positions.shape[-1]
    bits = bits if bits is not None else MAX_BITS[d]
    return hilbert_key_from_coords(quantize(positions, bits), bits)


def sort_bodies_by_key(keys, positions, velocities, masses):
    """argsort by key; returns (order, sorted arrays). XLA sorts on device."""
    order = jnp.argsort(keys)
    return (order, keys[order], positions[order],
            None if velocities is None else velocities[order], masses[order])
