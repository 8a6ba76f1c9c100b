"""Transform round-trip and logdet tests.

Mirror of nuts-rs ``src/transform/low_rank.rs:406-534`` (diagonal and low-rank
round trips) and the analytic-Gaussian checks of ``src/transform/mod.rs``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nuts_rs_tpu.transform.affine import (
    AffineTransform,
    diag_logdet,
    grad_to_transformed,
    identity_transform,
    init_diag_from_grad,
    set_diag,
    to_transformed,
    to_untransformed,
)


def make_diag(stds, mean):
    stds = jnp.asarray(stds, jnp.float64)
    mean = jnp.asarray(mean, jnp.float64)
    t = identity_transform(stds.shape[0], jnp.float64)
    return set_diag(t, stds, mean)


def make_lowrank(stds, mean, vals, vecs, mu):
    d, r = np.shape(vecs)
    t = identity_transform(d, jnp.float64, rank=r)
    t = t._replace(
        vecs=jnp.asarray(vecs, jnp.float64),
        vals_sqrt=jnp.sqrt(jnp.asarray(vals, jnp.float64)),
        vals_sqrt_inv=1.0 / jnp.sqrt(jnp.asarray(vals, jnp.float64)),
        mu_lr=jnp.asarray(mu, jnp.float64),
    )
    return set_diag(t, jnp.asarray(stds, jnp.float64), jnp.asarray(mean, jnp.float64))


def test_diagonal_round_trip():
    t = make_diag([1.0, 2.0, 3.0], [0.5, -1.0, 2.0])
    x = jnp.array([1.5, -0.3, 4.2])
    z = to_transformed(t, x)
    x2 = to_untransformed(t, z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-12)


def test_diagonal_round_trip_reverse():
    t = make_diag([1.0, 2.0, 3.0], [0.5, -1.0, 2.0])
    z = jnp.array([0.7, -1.1, 0.3])
    x = to_untransformed(t, z)
    z2 = to_transformed(t, x)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-12)


def test_lowrank_round_trip():
    vecs = np.zeros((3, 1))
    vecs[0, 0] = 1.0
    t = make_lowrank([1.0, 1.0, 1.0], [1.0, -0.5, 0.0], [4.0], vecs,
                     [0.2, -0.1, 0.0])
    x = jnp.array([2.0, 0.5, -1.3])
    z = to_transformed(t, x)
    x2 = to_untransformed(t, z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-12)


def test_lowrank_round_trip_reverse():
    vecs = np.zeros((3, 1))
    vecs[0, 0] = 1.0
    t = make_lowrank([1.0, 1.0, 1.0], [1.0, -0.5, 0.0], [4.0], vecs,
                     [0.2, -0.1, 0.0])
    z = jnp.array([1.0, -0.3, 0.8])
    x = to_untransformed(t, z)
    z2 = to_transformed(t, x)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-12)


def test_padded_lowrank_is_diag():
    # Padded eigenvalues of exactly 1 must be no-ops.
    rng = np.random.default_rng(0)
    q, _ = np.linalg.qr(rng.normal(size=(5, 2)))
    t_pad = make_lowrank([2.0] * 5, [1.0] * 5, [1.0, 1.0], q, [0.0] * 5)
    t_diag = make_diag([2.0] * 5, [1.0] * 5)
    x = jnp.asarray(rng.normal(size=5))
    np.testing.assert_allclose(
        np.asarray(to_transformed(t_pad, x)),
        np.asarray(to_transformed(t_diag, x)), atol=1e-12)
    np.testing.assert_allclose(float(t_pad.logdet), float(t_diag.logdet), atol=1e-12)


def test_gradient_is_jacobian_transpose():
    # zg must equal J_F^T g where q = F(z): check against jax.jacobian.
    import jax

    rng = np.random.default_rng(1)
    q_, _ = np.linalg.qr(rng.normal(size=(4, 2)))
    t = make_lowrank([1.5, 0.5, 2.0, 1.0], [0.1, 0.2, -0.3, 0.0],
                     [4.0, 0.25], q_, [0.05, 0.0, -0.1, 0.2])
    g = jnp.asarray(rng.normal(size=4))
    z = jnp.asarray(rng.normal(size=4))
    jac = jax.jacobian(lambda zz: to_untransformed(t, zz))(z)
    np.testing.assert_allclose(
        np.asarray(grad_to_transformed(t, g)), np.asarray(jac.T @ g), atol=1e-12)


def test_init_from_grad():
    t = identity_transform(3, jnp.float64)
    q = jnp.array([1.0, 2.0, 3.0])
    g = jnp.array([0.5, -2.0, 4.0])
    t = init_diag_from_grad(t, q, g)
    np.testing.assert_allclose(np.asarray(t.stds),
                               np.sqrt(1.0 / np.abs(np.asarray(g))), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(t.mean), np.asarray(q + (1.0 / jnp.abs(g)) * g), atol=1e-12)
    assert int(t.id) == 0
