"""Step-size adaptation: dual averaging, Adam, fixed, and the coarse init search.

Mirrors nuts-rs ``src/stepsize/`` (``adapt.rs``, ``dual_avg.rs``, ``adam.rs``).
All state lives in flat pytrees with a leading chains axis; the init search is
a bounded ``lax.while_loop`` of single-leapfrog probes run per chain under
vmap (``src/stepsize/adapt.rs:91-199``).
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..dynamics.hamiltonian import (
    KineticKind,
    initialize_trajectory,
    leapfrog,
)
from ..dynamics.point import Point
from ..transform.affine import AffineTransform


class StepSizeMethod(enum.Enum):
    DUAL_AVERAGE = "dual_average"
    ADAM = "adam"
    FIXED = "fixed"


@dataclasses.dataclass(frozen=True)
class DualAverageOptions:
    """nuts-rs ``src/stepsize/dual_avg.rs:12-31``."""

    k: float = 0.75
    t0: float = 10.0
    gamma: float = 0.05
    max_step_size: float = math.pi


@dataclasses.dataclass(frozen=True)
class AdamOptions:
    """nuts-rs ``src/stepsize/adam.rs:13-34``."""

    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    learning_rate: float = 0.05


@dataclasses.dataclass(frozen=True)
class StepSizeSettings:
    """nuts-rs ``src/stepsize/adapt.rs:308-329``."""

    target_accept: float = 0.8
    initial_step: float = 0.1
    jitter: Optional[float] = 0.1
    method: StepSizeMethod = StepSizeMethod.DUAL_AVERAGE
    fixed_value: float = 0.5
    dual_average: DualAverageOptions = DualAverageOptions()
    adam: AdamOptions = AdamOptions()


class StepSizeState(NamedTuple):
    """Union of DualAverage + Adam state (only the configured method advances).

    DualAverage fields: nuts-rs ``dual_avg.rs:34-81``; Adam: ``adam.rs:42-112``.
    """

    log_step: jax.Array          # [] current (exploring) log step
    log_step_adapted: jax.Array  # [] dual-averaged best guess
    hbar: jax.Array
    mu: jax.Array
    count: jax.Array             # [] dual-averaging iteration counter (starts 1)
    adam_m: jax.Array
    adam_v: jax.Array
    adam_t: jax.Array            # [] i32
    step_size: jax.Array         # [] the (jittered) step used by the sampler


def new_step_size_state(initial_step, dtype) -> StepSizeState:
    initial_step = jnp.asarray(initial_step, dtype)
    log_step = jnp.log(initial_step)
    return StepSizeState(
        log_step=log_step,
        log_step_adapted=log_step,
        hbar=jnp.zeros((), dtype),
        mu=jnp.log(10.0 * initial_step),
        count=jnp.ones((), dtype),
        adam_m=jnp.zeros((), dtype),
        adam_v=jnp.zeros((), dtype),
        adam_t=jnp.zeros((), jnp.int32),
        step_size=initial_step,
    )


def reset_from_found_step(state: StepSizeState, found_step) -> StepSizeState:
    """DualAverage::new / Adam::new with the step from the init search."""
    log_step = jnp.log(found_step)
    return state._replace(
        log_step=log_step,
        log_step_adapted=log_step,
        hbar=jnp.zeros_like(state.hbar),
        mu=jnp.log(10.0 * found_step),
        count=jnp.ones_like(state.count),
        adam_m=jnp.zeros_like(state.adam_m),
        adam_v=jnp.zeros_like(state.adam_v),
        adam_t=jnp.zeros_like(state.adam_t),
        step_size=found_step,
    )


def advance(state: StepSizeState, accept_stat, settings: StepSizeSettings) -> StepSizeState:
    """One adaptation step toward ``target_accept``.

    DualAverage: nuts-rs ``dual_avg.rs:55-63`` (Nesterov dual averaging with
    the step clamped below ``max_step_size``).  Adam: ``adam.rs:71-97``.
    """
    target = settings.target_accept
    if settings.method is StepSizeMethod.FIXED:
        return state
    if settings.method is StepSizeMethod.DUAL_AVERAGE:
        o = settings.dual_average
        w = 1.0 / (state.count + o.t0)
        hbar = (1.0 - w) * state.hbar + w * (target - accept_stat)
        log_step = state.mu - hbar * jnp.sqrt(state.count) / o.gamma
        log_step = jnp.minimum(log_step, math.log(o.max_step_size))
        mk = state.count ** (-o.k)
        log_step_adapted = mk * log_step + (1.0 - mk) * state.log_step_adapted
        return state._replace(
            log_step=log_step,
            log_step_adapted=log_step_adapted,
            hbar=hbar,
            count=state.count + 1.0,
        )
    # Adam on the log step; gradient = accept - target (adam.rs:71-97).
    o = settings.adam
    grad = accept_stat - target
    t = state.adam_t + 1
    m = o.beta1 * state.adam_m + (1.0 - o.beta1) * grad
    v = o.beta2 * state.adam_v + (1.0 - o.beta2) * grad * grad
    tf = t.astype(state.log_step.dtype)
    m_hat = m / (1.0 - o.beta1 ** tf)
    v_hat = v / (1.0 - o.beta2 ** tf)
    log_step = state.log_step + o.learning_rate * m_hat / (jnp.sqrt(v_hat) + o.epsilon)
    return state._replace(log_step=log_step, log_step_adapted=log_step,
                          adam_m=m, adam_v=v, adam_t=t)


def current_step(state: StepSizeState, settings: StepSizeSettings, use_best_guess):
    """``update_stepsize``'s step selection (nuts-rs ``adapt.rs:235-257``)."""
    if settings.method is StepSizeMethod.FIXED:
        return jnp.full_like(state.log_step, settings.fixed_value)
    if settings.method is StepSizeMethod.ADAM:
        return jnp.exp(state.log_step)
    return jnp.exp(jnp.where(use_best_guess, state.log_step_adapted, state.log_step))


def step_size_bar(state: StepSizeState, settings: StepSizeSettings):
    if settings.method is StepSizeMethod.FIXED:
        return jnp.full_like(state.log_step, settings.fixed_value)
    if settings.method is StepSizeMethod.ADAM:
        return jnp.exp(state.log_step)
    return jnp.exp(state.log_step_adapted)


def apply_jitter(key, state: StepSizeState, settings: StepSizeSettings,
                 use_best_guess) -> StepSizeState:
    """Set the working step size, with uniform +-jitter (adapt.rs:259-266)."""
    step = current_step(state, settings, use_best_guess)
    if settings.jitter is not None:
        j = settings.jitter
        factor = jax.random.uniform(key, dtype=step.dtype,
                                    minval=1.0 - j, maxval=1.0 + j)
        step = step * factor
    return state._replace(step_size=step)


def init_search(
    key,
    q: jax.Array,
    transform: AffineTransform,
    *,
    logp_grad_fn,
    settings: StepSizeSettings,
    kind: KineticKind,
    ops=None,
) -> jax.Array:
    """Coarse doubling/halving search for a good initial step size.

    Single chain (vmap for batches).  Mirrors nuts-rs ``adapt.rs:91-199``:
    start from ``initial_step``, probe single leapfrogs with ONE momentum draw
    reused across probes, double while accept > target (or halve while <),
    stop at the crossing or bounds [1e-10, 1e5], cap 100 iterations; on any
    probe failure fall back to ``initial_step``.

    Returns the found step size.
    """
    from ..dynamics.hamiltonian import init_point_from_q
    from ..transform.ops import AFFINE_OPS

    ops = ops or AFFINE_OPS
    dtype = q.dtype
    if settings.method is StepSizeMethod.FIXED:
        return jnp.asarray(settings.fixed_value, dtype)

    pt = init_point_from_q(q, transform, logp_grad_fn, ops=ops)
    pt = initialize_trajectory(key, pt, transform, kind, ops=ops,
                               logp_grad_fn=logp_grad_fn)
    e0 = pt.energy
    target = settings.target_accept
    init_step = jnp.asarray(settings.initial_step, dtype)

    def probe(step):
        res = leapfrog(pt, jnp.int32(1), step, transform, logp_grad_fn, kind,
                       e0, 1000.0, ops=ops)
        acc = jnp.exp(jnp.minimum(e0 - res.point.energy, 0.0))
        return acc, res.diverging

    acc0, fail0 = probe(init_step)
    go_up = acc0 > target

    def cond(c):
        step, done, it = c
        return (~done) & (it < 100)

    def body(c):
        step, done, it = c
        acc, fail = probe(step)
        stop_up = go_up & ((acc <= target) | (step > 1e5))
        stop_down = (~go_up) & ((acc >= target) | (step < 1e-10))
        stop = stop_up | stop_down
        new_step = jnp.where(stop, step, jnp.where(go_up, step * 2.0, step * 0.5))
        # On probe failure: revert to the configured initial step and stop.
        new_step = jnp.where(fail, init_step, new_step)
        return new_step, done | stop | fail, it + 1

    step, done, it = jax.lax.while_loop(cond, body, (init_step, fail0, jnp.int32(0)))
    # If 100 iterations elapsed without terminating, use the initial value.
    step = jnp.where(done, step, init_step)
    return step
