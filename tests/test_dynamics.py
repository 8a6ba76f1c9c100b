"""Integrator unit tests: energy conservation, reversibility, ESH invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from nuts_rs_tpu.dynamics.hamiltonian import (
    KineticKind,
    _esh_momentum_update,
    init_point_from_q,
    initialize_trajectory,
    is_turning,
    leapfrog,
)
from nuts_rs_tpu.transform.affine import identity_transform, set_diag


def std_normal_lg(q):
    return -0.5 * jnp.sum(q * q), -q


def test_euclidean_leapfrog_energy_conservation():
    d = 10
    t = identity_transform(d, jnp.float64)
    key = jax.random.key(0)
    q = jax.random.normal(key, (d,), jnp.float64)
    pt = init_point_from_q(q, t, std_normal_lg)
    pt = initialize_trajectory(jax.random.key(1), pt, t, KineticKind.EUCLIDEAN)
    e0 = pt.energy
    eps = jnp.asarray(0.01, jnp.float64)
    for _ in range(100):
        res = leapfrog(pt, 1, eps, t, std_normal_lg, KineticKind.EUCLIDEAN,
                       e0, 1000.0)
        pt = res.point
        assert not bool(res.diverging)
    # O(eps^2) energy error over a long trajectory
    assert abs(float(pt.energy - e0)) < 1e-3


def test_euclidean_leapfrog_reversibility():
    d = 5
    t = identity_transform(d, jnp.float64)
    q = jax.random.normal(jax.random.key(2), (d,), jnp.float64)
    pt = init_point_from_q(q, t, std_normal_lg)
    pt = initialize_trajectory(jax.random.key(3), pt, t, KineticKind.EUCLIDEAN)
    eps = jnp.asarray(0.1, jnp.float64)
    fwd = leapfrog(pt, 1, eps, t, std_normal_lg, KineticKind.EUCLIDEAN,
                   pt.energy, 1000.0).point
    back = leapfrog(fwd, -1, eps, t, std_normal_lg, KineticKind.EUCLIDEAN,
                    pt.energy, 1000.0).point
    np.testing.assert_allclose(np.asarray(back.z), np.asarray(pt.z), atol=1e-12)
    np.testing.assert_allclose(np.asarray(back.v), np.asarray(pt.v), atol=1e-12)
    assert int(back.idx) == 0


def test_exact_normal_is_exact_for_std_normal():
    # With the geodesic integrator and a std-normal target, energy is conserved
    # to machine precision for any step size (transformed_hamiltonian.rs:34-36).
    d = 8
    t = identity_transform(d, jnp.float64)
    q = jax.random.normal(jax.random.key(4), (d,), jnp.float64)
    pt = init_point_from_q(q, t, std_normal_lg)
    pt = initialize_trajectory(jax.random.key(5), pt, t, KineticKind.EXACT_NORMAL)
    e0 = pt.energy
    eps = jnp.asarray(0.7, jnp.float64)
    for _ in range(20):
        res = leapfrog(pt, 1, eps, t, std_normal_lg, KineticKind.EXACT_NORMAL,
                       e0, 1000.0)
        pt = res.point
    assert abs(float(pt.energy - e0)) < 1e-10


def test_esh_momentum_stays_on_sphere():
    d = 12
    key = jax.random.key(6)
    v = jax.random.normal(key, (d,), jnp.float64)
    v = v / jnp.linalg.norm(v)
    g = jax.random.normal(jax.random.key(7), (d,), jnp.float64)
    v2, dke = _esh_momentum_update(g, v, 0.3)
    assert abs(float(jnp.linalg.norm(v2)) - 1.0) < 1e-12
    assert np.isfinite(float(dke))


def test_esh_matches_reference_formula():
    # Compare against a direct numpy transcription of math.rs:188-204.
    rng = np.random.default_rng(8)
    d = 6
    v = rng.normal(size=d)
    v /= np.linalg.norm(v)
    g = rng.normal(size=d)
    step = 0.21

    gn = np.linalg.norm(g)
    ghat = g / gn
    alpha = v @ ghat
    delta = step * gn / (d - 1)
    zeta = np.exp(-delta)
    raw = ghat * (1 - zeta) * (1 + zeta + alpha * (1 - zeta)) + 2 * zeta * v
    expect_v = raw / np.linalg.norm(raw)
    expect_dke = (delta - np.log(2) + np.log1p(alpha + (1 - alpha) * zeta ** 2)) * (d - 1)

    v2, dke = _esh_momentum_update(jnp.asarray(g), jnp.asarray(v), step)
    np.testing.assert_allclose(np.asarray(v2), expect_v, atol=1e-12)
    np.testing.assert_allclose(float(dke), expect_dke, atol=1e-12)


def test_divergence_detection():
    d = 3
    t = identity_transform(d, jnp.float64)

    def bad_lg(q):
        # Sharply curved region produces huge energy error at big step size.
        return -0.5 * jnp.sum(1e8 * q * q), -1e8 * q

    q = jnp.full((d,), 0.1, jnp.float64)
    pt = init_point_from_q(q, t, bad_lg)
    pt = initialize_trajectory(jax.random.key(9), pt, t, KineticKind.EUCLIDEAN)
    res = leapfrog(pt, 1, jnp.asarray(1.0, jnp.float64), t, bad_lg,
                   KineticKind.EUCLIDEAN, pt.energy, 1000.0)
    assert bool(res.diverging)


def test_is_turning_orders_by_index():
    d = 4
    z1 = jnp.zeros(d, jnp.float64)
    z2 = jnp.ones(d, jnp.float64)
    v_fwd = jnp.ones(d, jnp.float64)
    v_bwd = -jnp.ones(d, jnp.float64)
    i1 = jnp.asarray(0, jnp.int32)
    i2 = jnp.asarray(3, jnp.int32)
    # moving apart: not turning
    assert not bool(is_turning(z1, v_fwd, i1, z2, v_fwd, i2))
    # same result with swapped argument order
    assert not bool(is_turning(z2, v_fwd, i2, z1, v_fwd, i1))
    # end moving backward: turning
    assert bool(is_turning(z1, v_fwd, i1, z2, v_bwd, i2))
    assert bool(is_turning(z2, v_bwd, i2, z1, v_fwd, i1))
