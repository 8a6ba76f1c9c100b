"""Diagonal mass-matrix estimation from draw/gradient variances.

Mirrors nuts-rs ``src/transform/adapt/diagonal.rs``: a foreground+background
pair of running variance estimators over accepted draws and gradients, with
the update rule sigma^2 = sqrt(var_draw / var_grad) and translation
mu = mean_draw + sigma^2 * mean_grad.

The running variance replicates the reference's estimator exactly
(``cpu_math.rs:605-631``): var_sum accumulates (x - running_mean_before)^2 and
the final variance is var_sum / (count - 1) — this is *not* textbook Welford,
and matching it matters for numerical parity.

All state is per-chain (leading axis added by the caller); per-draw inclusion
is gated by the ``is_good`` mask so chains with divergences skip bad samples
without any host sync.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..transform.affine import AffineTransform, set_diag

LOWER_LIMIT = 1e-20
UPPER_LIMIT = 1e20


class RunningVariance(NamedTuple):
    """nuts-rs ``src/transform/adapt/diagonal.rs:17-55``."""

    mean: jax.Array     # [d]
    var_sum: jax.Array  # [d]
    count: jax.Array    # [] float count of included samples


def new_running_variance(dim, dtype) -> RunningVariance:
    return RunningVariance(
        mean=jnp.zeros(dim, dtype),
        var_sum=jnp.zeros(dim, dtype),
        count=jnp.zeros((), dtype),
    )


def add_sample(rv: RunningVariance, value, include=True) -> RunningVariance:
    include_f = jnp.asarray(include, rv.count.dtype)
    count = rv.count + include_f
    first = count == 1.0
    diff = value - rv.mean
    mean = jnp.where(first, value, rv.mean + diff / jnp.maximum(count, 1.0))
    var_sum = rv.var_sum + jnp.where(first, 0.0, diff * diff)
    mean = jnp.where(include, mean, rv.mean)
    var_sum = jnp.where(include, var_sum, rv.var_sum)
    return RunningVariance(mean=mean, var_sum=var_sum, count=count)


class DiagAdaptState(NamedTuple):
    """Foreground + background estimator pairs (``diagonal.rs:108-115``)."""

    draw: RunningVariance
    grad: RunningVariance
    draw_bg: RunningVariance
    grad_bg: RunningVariance


def new_diag_adapt_state(dim, dtype) -> DiagAdaptState:
    rv = lambda: new_running_variance(dim, dtype)
    return DiagAdaptState(draw=rv(), grad=rv(), draw_bg=rv(), grad_bg=rv())


def update_estimators(s: DiagAdaptState, draw, grad, is_good) -> DiagAdaptState:
    """``update_estimators`` (diagonal.rs:134-141): feed fg and bg when good."""
    return DiagAdaptState(
        draw=add_sample(s.draw, draw, is_good),
        grad=add_sample(s.grad, grad, is_good),
        draw_bg=add_sample(s.draw_bg, draw, is_good),
        grad_bg=add_sample(s.grad_bg, grad, is_good),
    )


def switch(s: DiagAdaptState) -> DiagAdaptState:
    """Promote background to foreground, reset background (diagonal.rs:143-148)."""
    dim = s.draw.mean.shape[-1]
    dtype = s.draw.mean.dtype
    return DiagAdaptState(
        draw=s.draw_bg,
        grad=s.grad_bg,
        draw_bg=new_running_variance(dim, dtype),
        grad_bg=new_running_variance(dim, dtype),
    )


def adapt_diag(s: DiagAdaptState, transform: AffineTransform,
               use_grad_based_estimate: bool = True,
               update_mask=True) -> AffineTransform:
    """Recompute the diagonal transform from the foreground estimators.

    (``diagonal.rs:161-196`` + ``DiagMassMatrix::update_diag_draw_grad``,
    transform/diagonal.rs:107-131.)  Per-chain gating: chains with fewer than
    3 good samples keep their previous transform; ``update_mask`` adds the
    good-draw window mode's per-chain update decision on top.
    """
    enough = (s.draw.count >= 3.0) & update_mask

    if use_grad_based_estimate:
        # sigma^2 = sqrt(var_draw / var_grad); scale factors cancel.
        val = jnp.sqrt(s.draw.var_sum / s.grad.var_sum)
        invalid = ~jnp.isfinite(val) | (val == 0.0)
        var = jnp.clip(val, LOWER_LIMIT, UPPER_LIMIT)
        var = jnp.where(invalid, jnp.square(transform.stds), var)
        stds = jnp.sqrt(var)
        mean = s.draw.mean + var * s.grad.mean
    else:
        scale = 1.0 / jnp.maximum(s.draw.count, 1.0)
        val = s.draw.var_sum * scale
        invalid = ~jnp.isfinite(val) | (val == 0.0)
        var = jnp.clip(val, LOWER_LIMIT, UPPER_LIMIT)
        var = jnp.where(invalid, jnp.square(transform.stds), var)
        stds = jnp.sqrt(var)
        mean = s.draw.mean

    return set_diag(transform, stds, mean, changed=enough)
