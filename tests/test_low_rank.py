"""Low-rank mass-matrix estimator tests.

Mirrors nuts-rs ``src/transform/adapt/low_rank.rs:341-408`` (spd_mean and
whitened-data unit tests) and the strongest oracle in the reference repo:
``tests/sample_normal.rs:320-356`` — on a rank-1 correlated Gaussian the
adapted low-rank transform must whiten the target EXACTLY
(fisher_distance < 1e-10 on every post-warmup draw).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nuts_rs_tpu as nt
from nuts_rs_tpu.adapt.low_rank import (
    LowRankWindow,
    _spd_mean,
    compute_update,
    new_window,
    push,
    switch,
)
from nuts_rs_tpu.models import gaussian
from nuts_rs_tpu.transform.affine import (
    grad_to_transformed,
    identity_transform,
    to_transformed,
    to_untransformed,
)


def test_spd_mean_diagonal():
    # nuts-rs low_rank.rs:354-381: spd_mean(diag(1,4,8), diag(1,1,.5)) has
    # the geometric-mean diagonal (1, 2, 4).
    x = jnp.diag(jnp.array([1.0, 4.0, 8.0]))
    y = jnp.diag(jnp.array([1.0, 1.0, 0.5]))
    out = _spd_mean(x, y)
    np.testing.assert_allclose(np.asarray(out),
                               np.diag([1.0, 2.0, 4.0]), atol=1e-10)


def _fill_window(draws, grads):
    cap, d = draws.shape
    w = new_window(cap, d, jnp.float64)
    for i in range(cap):
        w = push(w, jnp.asarray(draws[i]), jnp.asarray(grads[i]), True)
    return w


def test_whitened_data_gives_identity():
    # grads = -draws (standard normal target): all eigenvalues ~1, everything
    # filtered, transform stays ~diagonal with sigma ~ 1
    # (nuts-rs low_rank.rs:384-407).
    rng = np.random.default_rng(1)
    draws = rng.normal(size=(20, 3))
    w = _fill_window(draws, -draws)
    t = identity_transform(3, jnp.float64, rank=3)
    t2 = compute_update(w, t, gamma=1e-4, eigval_cutoff=2.0)
    # all eigenvalues filtered out -> padded to 1
    np.testing.assert_allclose(np.asarray(t2.vals_sqrt), 1.0, atol=1e-4)
    assert int(t2.id) == int(t.id) + 1


def test_update_round_trip_consistency():
    # After any update, to_transformed ∘ to_untransformed == id.
    rng = np.random.default_rng(2)
    d = 5
    cov = np.eye(d) + 0.9 * np.outer(np.ones(d), np.ones(d))
    chol = np.linalg.cholesky(cov)
    xs = rng.normal(size=(40, d)) @ chol.T
    prec = np.linalg.inv(cov)
    gs = -(xs @ prec.T)
    w = _fill_window(xs, gs)
    t = compute_update(w, identity_transform(d, jnp.float64, rank=d),
                       gamma=1e-5, eigval_cutoff=2.0)
    z = jnp.asarray(rng.normal(size=d))
    x = to_untransformed(t, z)
    z2 = to_transformed(t, x)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-9)


def test_masked_slots_are_ignored():
    # An update from a window with trailing garbage (masked out) must equal
    # the update from a clean window with only the valid samples.
    rng = np.random.default_rng(3)
    d, n = 4, 15
    xs = rng.normal(size=(n, d))
    gs = -xs
    w_clean = _fill_window(xs, gs)

    w_big = new_window(n + 10, d, jnp.float64)
    for i in range(n):
        w_big = push(w_big, jnp.asarray(xs[i]), jnp.asarray(gs[i]), True)
    # garbage pushes excluded by mask
    for i in range(5):
        w_big = push(w_big, jnp.full(d, 1e6), jnp.full(d, -1e6), False)

    t0 = identity_transform(d, jnp.float64, rank=d)
    t_clean = compute_update(w_clean, t0, gamma=1e-4, eigval_cutoff=2.0)
    t_big = compute_update(w_big, t0, gamma=1e-4, eigval_cutoff=2.0)
    np.testing.assert_allclose(np.asarray(t_big.stds),
                               np.asarray(t_clean.stds), atol=1e-10)
    np.testing.assert_allclose(float(t_big.logdet), float(t_clean.logdet),
                               atol=1e-10)


def test_switch_semantics():
    w = new_window(10, 2, jnp.float64)
    for i in range(4):
        w = push(w, jnp.zeros(2), jnp.zeros(2), True)
    assert int(w.write_pos) == 4
    w = switch(w)
    assert int(w.start) == 0 and int(w.bg_start) == 4
    for i in range(3):
        w = push(w, jnp.zeros(2), jnp.zeros(2), True)
    w2 = switch(w)
    # reference: drop pre-split entries; foreground = entries since last switch
    assert int(w2.start) == 4 and int(w2.bg_start) == 7


def test_low_rank_exact_gaussian_whitening():
    # THE oracle (nuts-rs tests/sample_normal.rs:320-356): correlated Gaussian
    # with Sigma = I + 0.5 ones ones^T, dim 10, 500 tune, and eigval_cutoff
    # 1.00001 so the full estimated spectrum is retained.  With exactly linear
    # gradients the SPD geometric mean recovers the precision exactly, so
    # fisher_distance = |z + zg|^2 < 1e-10 on every post-warmup draw.
    import dataclasses

    from nuts_rs_tpu.adapt.low_rank import LowRankSettings

    model = gaussian.correlated_normal(dim=10, rank1_scale=0.5)
    settings = nt.LowRankNutsSettings(
        num_tune=500, num_draws=100, num_chains=1, seed=42,
        low_rank=LowRankSettings(eigval_cutoff=1.00001))
    trace = nt.sample(model, settings, chunk_size=300)
    fisher = trace.sample_stats["fisher_distance"]
    assert fisher.shape == (1, 100)
    assert (fisher < 1e-10).all(), fisher.max()
    assert not trace.sample_stats["diverging"].any()


def test_cross_chain_pooled_low_rank():
    """Pooled refits (one shared eigh pipeline from all chains' windows)
    sample correctly and produce one shared transform per update."""
    import nuts_rs_tpu as nt
    from nuts_rs_tpu.models import gaussian

    model = gaussian.correlated_normal_rank1(12, scale=1.5, eig=50.0)
    s = nt.LowRankNutsSettings(num_tune=300, num_draws=300, num_chains=4,
                               seed=2, cross_chain_adaptation=True)
    trace = nt.sample(model, s, chunk_size=200)
    pos = np.asarray(trace.posterior["position"])
    assert abs(pos.mean()) < 0.2
    assert np.asarray(trace.sample_stats["diverging"]).mean() < 0.02
    # all chains share the transform id trajectory (same pooled refits)
    tid = np.asarray(trace.sample_stats["transformation_index"])
    assert (tid == tid[0]).all()
