"""Order-2 local (Taylor) expansions of far-field cell accelerations.

The cell→cell far-field acceleration: instead of evaluating every accepted
source cell at every target *body* (cost ∝ bodies × cells), accumulate the
cells' acceleration field into a second-order Taylor expansion at one
*expansion center* per target group (cost ∝ cells), then evaluate the
polynomial once per body (cost ∝ bodies):

    a(c + ρ) ≈ a0 + J·ρ + ½ ρᵀH ρ,   a0 = a(c), J = ∂a/∂x|c, H = ∂²a/∂x²|c.

This is the classical dual-tree / FMM "L2P" trick applied to the Barnes-Hut
tiers (the bbFMM tier does the order-p Chebyshev version; here order 2 keeps
the BH error budget). The reference evaluates accepted cells per body
(``octree.cpp:146-151``, ``bvh.cpp:221-248``); on TPU the per-body×per-cell
product is the dominant VPU term of both tree tiers (measured: far field
≈ 3 s of the 5.4 s N=5e5 3D θ=0.25 Barnes-Hut step), and the local
expansion removes the body axis from all but the nearest source sets.

Truncation error: relative to an accepted cell's own contribution, the
order-2 local truncation is O((|ρ|/d)³) with d the center→cell distance —
callers gate which cells are local-eligible so |ρ|/d stays ≲ 0.2 (grid
rings: per level, see ``grid_tree.far_field_rings``; BVH: a distance gate
of ``local_gate`` group radii, see ``bvh.bvh_accel_sorted``).

All derivatives are hand-derived closed forms in the same *normalized*
variables as ``grid_tree._quad_cell_accel`` (n = R/r is O(1), Ŝ = S/r² is
mass-scale) because raw r⁻⁵/r⁻⁷ powers leave fp32 range at the reference's
1e7-scale coordinates. Correctness of every term is pinned against
``jax.jacfwd`` of the direct cell sum in f64 (tests/test_local_expansion.py).

Packing: J and H are symmetric (derivatives of a potential), stored as
their upper-triangle components — J uses ``grid_tree._quad_pairs`` (3 / 6
components in 2D / 3D), H its fully-symmetric triples (4 / 10).
"""

from __future__ import annotations

import itertools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .brute_force import _DIST2_GUARD
from .grid_tree import _quad_pairs


# Default eligibility threshold on the worst-case Taylor ratio |ρ|/d.
# Shared by every caller that gates levels/nodes into the local expansion
# (grid rings, LET rings) so an on-chip retune changes all paths at once.
LOCAL_RATIO_DEFAULT = 0.18


def ring_level_is_local(dim: int, k: int, L: int, l: int,
                        ratio: float = LOCAL_RATIO_DEFAULT) -> bool:
    """Is ring level ``l`` of an L-level grid local-eligible?

    Worst-case Taylor ratio of a leaf-centered expansion against level-l
    V-list cells: |ρ| ≤ (√D/2)·h (leaf half-diagonal) over d ≥ k·h·2^(L−l)
    (candidate com at the near edge of the ancestor's ring). The leaf level
    itself (l = L) is never eligible — its ratio √D/(2k+1) is the MAC's own
    scale.
    """
    return l < L and (dim ** 0.5) / (2.0 * k * (1 << (L - l))) <= ratio


def _h_triples(dim: int):
    """Packed index triples of the fully-symmetric third-derivative tensor."""
    return [t for t in itertools.combinations_with_replacement(range(dim), 3)]


def local_coeffs(center: jax.Array, com: jax.Array, mass: jax.Array,
                 S: Optional[jax.Array] = None,
                 softening: float = 0.0
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Accumulate (a0, J, H) at ``center`` from source cells.

    center [..., D]; com [..., K, D]; mass [..., K] (masked-out cells must
    carry mass 0); S [..., K, nq] COM-centered second moments or None
    (monopole sources). Returns a0 [..., D], J packed [..., nj], H packed
    [..., nh] — each summed over the K axis.

    ``softening``: Plummer ε of the force law being expanded. Every closed
    form below holds verbatim under ε-softening with the substitutions
    u = (r²+ε²)^{−1/2} and n = R·u (then |n| < 1): the only derivative
    fact used is ∂u/∂y_b = u³R_b, identical in both cases. Callers must
    pass the SAME ε their per-body evaluation uses (the BVH walk softens
    accepted nodes; the grid rings do not) or the two paths would compute
    different laws.

    With R = com − center, u = 1/|R| (softened: see above), n = R·u,
    Ŝ = S·u², t = Ŝn, q = nᵀŜn:

      a0  = M n u²  +  u²[(7.5q − 1.5 trŜ)n − 3t]
      J_ab = M u³(3 n_a n_b − δ_ab)
           + u³[3Ŝ_ab − 15(t_a n_b + t_b n_a) + 1.5 trŜ δ_ab
                − 7.5 trŜ n_a n_b + 52.5 q n_a n_b − 7.5 q δ_ab]
      H_abc = 3 M u⁴ (5 n_a n_b n_c − δ_ab n_c − δ_ac n_b − δ_bc n_a)

    (H keeps the monopole term only: the quadrupole's third derivative is
    O((s/d)²·(ρ/d)²) relative — below the order-2 truncation already
    accepted. J's quadrupole term is kept because gated ratios ~0.2 make
    (s/d)²·(ρ/d) comparable to the monopole's ρ²/d² term.)
    """
    dim = center.shape[-1]
    qpairs = _quad_pairs(dim)
    triples = _h_triples(dim)

    R = [com[..., d] - center[..., None, d] for d in range(dim)]  # [..., K]
    r2 = None
    for Rd in R:
        r2 = Rd * Rd if r2 is None else r2 + Rd * Rd
    u = jax.lax.rsqrt(r2 + jnp.asarray(softening, r2.dtype) ** 2)
    u = jnp.where(r2 < _DIST2_GUARD, 0.0, u)  # empty/coincident cell guard
    u2 = u * u
    u3 = u2 * u
    n = [Rd * u for Rd in R]

    M = mass
    Mu2 = M * u2
    Mu3 = M * u3

    a0 = [Mu2 * n[d] for d in range(dim)]
    Jp = []
    for a, b in qpairs:
        term = Mu3 * (3.0 * n[a] * n[b] - (1.0 if a == b else 0.0))
        Jp.append(term)
    Mu4_3 = 3.0 * Mu3 * u
    Hp = []
    for a, b, c in triples:
        t5 = 5.0 * n[a] * n[b] * n[c]
        if a == b:
            t5 = t5 - n[c]
        if a == c:
            t5 = t5 - n[b]
        if b == c:
            t5 = t5 - n[a]
        Hp.append(Mu4_3 * t5)

    if S is not None:
        s_hat = {}
        for i, p in enumerate(qpairs):
            s_hat[p] = S[..., i] * u2

        def sh(a, b):
            return s_hat[(a, b)] if (a, b) in s_hat else s_hat[(b, a)]

        t = [sum(sh(d, e) * n[e] for e in range(dim)) for d in range(dim)]
        q = sum(n[d] * t[d] for d in range(dim))
        trS = sum(sh(d, d) for d in range(dim))
        rad = (7.5 * q - 1.5 * trS) * u2
        for d in range(dim):
            a0[d] = a0[d] + rad * n[d] - (3.0 * u2) * t[d]
        for i, (a, b) in enumerate(qpairs):
            term = (3.0 * sh(a, b)
                    - 15.0 * (t[a] * n[b] + t[b] * n[a])
                    + (52.5 * q - 7.5 * trS) * n[a] * n[b])
            if a == b:
                term = term + 1.5 * trS - 7.5 * q
            Jp[i] = Jp[i] + u3 * term

    a0 = jnp.stack([jnp.sum(x, axis=-1) for x in a0], axis=-1)
    Jp = jnp.stack([jnp.sum(x, axis=-1) for x in Jp], axis=-1)
    Hp = jnp.stack([jnp.sum(x, axis=-1) for x in Hp], axis=-1)
    return a0, Jp, Hp


def eval_local(rho: jax.Array, a0: jax.Array, Jp: jax.Array,
               Hp: jax.Array) -> jax.Array:
    """Evaluate the packed local expansion at body offsets.

    rho [..., T, D] (body − center); a0 [..., D]; Jp [..., nj];
    Hp [..., nh] → acceleration increments [..., T, D].
    """
    dim = rho.shape[-1]
    qpairs = _quad_pairs(dim)
    triples = _h_triples(dim)
    jidx = {p: i for i, p in enumerate(qpairs)}
    hidx = {t: i for i, t in enumerate(triples)}

    def J(a, b):
        i = jidx[(a, b)] if (a, b) in jidx else jidx[(b, a)]
        return Jp[..., None, i]

    def H(a, b, c):
        return Hp[..., None, hidx[tuple(sorted((a, b, c)))]]

    rho_d = [rho[..., d] for d in range(dim)]
    out = []
    for a in range(dim):
        acc = a0[..., None, a]
        for b in range(dim):
            acc = acc + J(a, b) * rho_d[b]
        # ½ Σ_bc H_abc ρ_b ρ_c — loop unique (b, c) with multiplicity.
        for b in range(dim):
            acc = acc + 0.5 * H(a, b, b) * rho_d[b] * rho_d[b]
            for c in range(b + 1, dim):
                acc = acc + H(a, b, c) * rho_d[b] * rho_d[c]
        out.append(acc)
    return jnp.stack(out, axis=-1)


def num_coeffs(dim: int) -> Tuple[int, int, int]:
    """(len a0, len J packed, len H packed) for carry allocation."""
    return dim, len(_quad_pairs(dim)), len(_h_triples(dim))
