"""Floating point helpers.

The reference is f64 throughout (Rust ``f64``).  On TPU, f64 is emulated and
slow, so the framework is dtype-polymorphic: every kernel derives its compute
dtype from the position array.  Correctness baselines run under
``jax_enable_x64``; TPU benchmarks run f32.
"""

import jax.numpy as jnp


def default_float():
    """The widest float available under the current jax config."""
    return jnp.float64 if jnp.zeros((), jnp.float64).dtype == jnp.float64 else jnp.float32


def logaddexp(a, b):
    """Numerically stable log(exp(a) + exp(b)); mirrors nuts-rs src/math/util.rs:6."""
    return jnp.logaddexp(a, b)
