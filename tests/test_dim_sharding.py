"""Parameter-axis ("dim") sharding tests on the virtual 8-device CPU mesh.

Validates the huge-d distribution axis (SURVEY.md §5 "long-context analog";
BASELINE.json config 5): state vectors and every kernel contraction sharded
over a ``dim`` mesh axis via ``shard_map`` + ``psum`` (parallel/axis.py),
composable with the chains axis on a 2-D mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nuts_rs_tpu as nt
from nuts_rs_tpu.models import gaussian
from nuts_rs_tpu.parallel.axis import DIM_AXIS, dim_axis_ctx, dsum
from nuts_rs_tpu.parallel.mesh import CHAIN_AXIS, make_mesh_2d


def _moments(trace):
    pos = np.asarray(trace.posterior["position"])  # [C, K, d]
    flat = pos.reshape(-1, pos.shape[-1])
    return flat.mean(axis=0), flat.std(axis=0)


def test_dsum_outside_mesh_is_local_sum():
    x = jnp.arange(6.0)
    np.testing.assert_allclose(np.asarray(dsum(x)), 15.0)


def test_dim_sharded_nuts_posterior():
    """d=16 N(3,1) on a (2 chains x 4 dim) mesh: moments match analytic."""
    mesh = make_mesh_2d(2, 4)
    model = gaussian.normal_logp(16, mu=3.0)
    settings = nt.DiagNutsSettings(
        num_tune=300, num_draws=500, num_chains=4, seed=3)
    trace = nt.sample(model, settings, mesh=mesh, chunk_size=200)
    mean, std = _moments(trace)
    np.testing.assert_allclose(mean, 3.0, atol=0.15)
    np.testing.assert_allclose(std, 1.0, atol=0.15)
    # the sharded run produced real per-draw stats
    assert np.asarray(trace.sample_stats["diverging"]).mean() < 0.05


def test_dim_sharded_deterministic():
    """Same seed + same mesh => bit-identical results."""
    model = gaussian.normal_logp(8, mu=0.0)
    settings = nt.DiagNutsSettings(
        num_tune=60, num_draws=60, num_chains=2, seed=11)
    mesh = make_mesh_2d(2, 4)  # one mesh: jit caches key on mesh identity
    runs = []
    for _ in range(2):
        trace = nt.sample(model, settings, mesh=mesh, chunk_size=60)
        runs.append(np.asarray(trace.posterior["position"]))
    np.testing.assert_array_equal(runs[0], runs[1])


def test_dim_sharded_gradient_exact():
    """The dim-sharded gradient of every dim_shardable model must equal the
    unsharded gradient EXACTLY (up to reduction order): the local-gradient
    psum trick cuts cross-shard chain-rule paths, so any nested-dsum logp
    (a dsum result feeding per-element terms of another dsum) silently
    biases the sampled posterior.  Regression for correlated_normal, whose
    original nested form lost the -c*s term from remote shards."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh_2d(1, 8)
    for model in (gaussian.correlated_normal(16),
                  gaussian.normal_logp(16, mu=3.0)):
        q = jnp.linspace(-2.0, 2.0, 16)
        lp_ref, g_ref = jax.value_and_grad(model.logp_fn)(q)

        def local(ql):
            with dim_axis_ctx():
                return jax.value_and_grad(model.logp_fn)(ql)

        lp_sh, g_sh = jax.jit(shard_map(
            local, mesh=mesh, in_specs=P(DIM_AXIS),
            out_specs=(P(), P(DIM_AXIS)), check_vma=False))(q)
        np.testing.assert_allclose(np.asarray(lp_sh), np.asarray(lp_ref),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                                   rtol=1e-12, err_msg=model.name)


def test_dim_sharded_with_cross_chain_adaptation():
    """2-D mesh: psum over "chains" (adaptation pooling) composes with the
    per-leapfrog psums over "dim"."""
    mesh = make_mesh_2d(2, 4)
    model = gaussian.correlated_normal(8)
    settings = nt.DiagNutsSettings(
        num_tune=200, num_draws=300, num_chains=4, seed=7,
        cross_chain_adaptation=True)
    trace = nt.sample(model, settings, mesh=mesh, chunk_size=250)
    pos = np.asarray(trace.posterior["position"])
    # analytic: cov = I + 0.5 * ones ones^T -> marginal var = 1.5
    flat = pos.reshape(-1, pos.shape[-1])
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=0.25)
    np.testing.assert_allclose(flat.std(axis=0), np.sqrt(1.5), atol=0.25)


def test_dim_sharded_mclmc_large_d():
    """BASELINE config-5 shape: MCLMC on a large-d Gaussian, dim-sharded
    (8-way) on the virtual mesh."""
    mesh = make_mesh_2d(1, 8)
    d = 4096
    model = gaussian.normal_logp(d, mu=1.0)
    settings = nt.DiagMclmcSettings(
        num_tune=150, num_draws=150, num_chains=2, seed=5)
    trace = nt.sample(model, settings, mesh=mesh, chunk_size=150)
    pos = np.asarray(trace.posterior["position"])
    flat = pos.reshape(-1, d)
    # MCLMC is unadjusted; loose moment check over many coordinates
    assert abs(flat.mean() - 1.0) < 0.1
    assert abs(flat.std() - 1.0) < 0.15


def test_dim_sharding_rejects_unshardable_model():
    mesh = make_mesh_2d(2, 4)
    model = gaussian.funnel(8)  # not written against dsum
    settings = nt.DiagNutsSettings(num_tune=10, num_draws=10, num_chains=2)
    with pytest.raises(ValueError, match="dim_shardable"):
        nt.Sampler(model, settings, mesh=mesh)


def test_dim_sharding_rejects_low_rank():
    mesh = make_mesh_2d(2, 4)
    model = gaussian.normal_logp(8)
    settings = nt.LowRankNutsSettings(num_tune=10, num_draws=10, num_chains=2)
    with pytest.raises(ValueError, match="diag"):
        nt.Sampler(model, settings, mesh=mesh)
