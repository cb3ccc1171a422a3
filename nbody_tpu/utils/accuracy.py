"""Cross-algorithm accuracy oracle.

Vectorized re-expression of ``compute_accuracy_omp`` /
``compute_accuracy_parlay_opt`` (``utils.h:171-267``): a body is "accurate"
iff every force component is within 1% relative error of the reference,
with near-zero reference components (<1e-20) checked absolutely against 1e-9.
Returns the percentage of accurate bodies.

Two fixes over the reference (SURVEY.md §8.6, §8.1):

* **NaN-aware** — the reference's ``relative_error > threshold`` comparison is
  false for NaN, so NaN forces count as accurate (``utils.h:200-204``); here
  any non-finite component marks the body inaccurate.
* :func:`max_relative_error` reports the worst-case per-body relative error in
  L2 norm, the metric BASELINE.json gates at ≤1e-4 — sign flips (§8.1) show up
  as ~2.0 instead of silently passing.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import (
    ACCURACY_ABS_THRESHOLD,
    ACCURACY_FORCE_THRESHOLD,
    ACCURACY_PCT_THRESHOLD,
)


def accuracy_percentage(
    forces,
    reference_forces,
    rel_threshold: float = ACCURACY_PCT_THRESHOLD,
    near_zero: float = ACCURACY_FORCE_THRESHOLD,
    abs_threshold: float = ACCURACY_ABS_THRESHOLD,
):
    """Percentage of bodies whose every component is within tolerance.

    Parity: ``compute_accuracy_omp`` (utils.h:171-219), made NaN-strict.
    """
    forces = jnp.asarray(forces)
    reference_forces = jnp.asarray(reference_forces)
    if forces.shape != reference_forces.shape:
        raise ValueError(
            f"force shapes differ: {forces.shape} vs {reference_forces.shape}")

    tiny_ref = jnp.abs(reference_forces) < near_zero
    rel_err = jnp.abs((forces - reference_forces) / reference_forces)
    comp_ok = jnp.where(
        tiny_ref,
        jnp.abs(forces) <= abs_threshold,
        rel_err <= rel_threshold,
    )
    comp_ok = comp_ok & jnp.isfinite(forces)
    body_ok = jnp.all(comp_ok, axis=-1)
    return 100.0 * jnp.mean(body_ok.astype(jnp.float64 if
                                           forces.dtype == jnp.float64
                                           else jnp.float32))


def scale_normalized_error(forces, reference_forces):
    """max_i ‖F_i − F_i^ref‖ normalized by the RMS reference force magnitude.

    The right metric for fp32-kernel-vs-fp64-oracle comparisons: per-body
    relative error (:func:`max_relative_error`) explodes for bodies whose net
    force nearly cancels, which says nothing about kernel quality.
    """
    forces = jnp.asarray(forces)
    reference_forces = jnp.asarray(reference_forces)
    num = jnp.linalg.norm(forces - reference_forces, axis=-1)
    scale = jnp.sqrt(jnp.mean(
        jnp.sum(reference_forces * reference_forces, axis=-1)))
    err = jnp.max(num) / jnp.maximum(scale, jnp.finfo(scale.dtype).tiny)
    return jnp.where(jnp.all(jnp.isfinite(forces)), err, jnp.inf)


def percentile_relative_error(forces, reference_forces, q: float = 99.0):
    """q-th percentile of per-body relative L2 error ‖ΔF_i‖/‖F_i^ref‖.

    Companion to the reference's all-components-within-1% metric
    (utils.h:171-219), which flips a body to "inaccurate" on a single
    near-zero component: the percentile ignores the near-cancelling tail
    and reports the error level typical bodies actually see (VERDICT
    round-1 weak item 3 asked for this alongside the parity column).
    Non-finite forces return inf (NaN-strict like the other metrics).
    """
    forces = jnp.asarray(forces)
    reference_forces = jnp.asarray(reference_forces)
    num = jnp.linalg.norm(forces - reference_forces, axis=-1)
    den = jnp.linalg.norm(reference_forces, axis=-1)
    err = num / jnp.maximum(den, jnp.finfo(den.dtype).tiny)
    return jnp.where(jnp.all(jnp.isfinite(forces)),
                     jnp.percentile(err, q), jnp.inf)


def max_relative_error(forces, reference_forces):
    """max_i ‖F_i − F_i^ref‖ / ‖F_i^ref‖ — the BASELINE.json ≤1e-4 metric."""
    forces = jnp.asarray(forces)
    reference_forces = jnp.asarray(reference_forces)
    num = jnp.linalg.norm(forces - reference_forces, axis=-1)
    den = jnp.linalg.norm(reference_forces, axis=-1)
    den = jnp.maximum(den, jnp.finfo(den.dtype).tiny)
    err = num / den
    # Non-finite forces are an immediate failure, not a skip.
    err = jnp.where(jnp.all(jnp.isfinite(forces), axis=-1), err, jnp.inf)
    return jnp.max(err)
