"""Fused Pallas warmup engine (kernels/nuts_pallas.py, warmup section).

The warmup kernel runs whole chunks of tuning draws per pallas_call with the
fg/bg Welford estimators, diagonal mass-matrix rule, and dual averaging
in-kernel (the reference's per-draw GlobalStrategy, adapt_strategy.rs:121-222,
executed between lock-step trees).  On CPU the kernel runs in interpret mode;
these tests hold it to the XLA warmup path's adaptation results.
"""

import jax
import jax.numpy as jnp
import numpy as np

import nuts_rs_tpu as nt
from nuts_rs_tpu.models import gaussian


def _run(posterior_kernel, seed=4, num_tune=150, num_draws=250, chains=8,
         model=None, **kw):
    model = model or gaussian.normal_logp(6, 3.0)
    s = nt.DiagNutsSettings(
        num_tune=num_tune, num_draws=num_draws, num_chains=chains, seed=seed,
        posterior_kernel=posterior_kernel, **kw)
    return nt.sample(model, s, chunk_size=100)


def test_pallas_warmup_posterior_moments():
    trace = _run("pallas")
    pos = np.asarray(trace.posterior["position"])
    assert abs(pos.mean() - 3.0) < 0.1
    assert abs(pos.std() - 1.0) < 0.1
    assert not np.asarray(trace.sample_stats["diverging"]).any()


def test_pallas_warmup_adaptation_matches_xla():
    """Adapted step size + mass matrix of the fused warmup match the XLA
    warmup path distributionally (same schedule, same adaptation math; only
    the RNG streams differ)."""
    t_p = _run("pallas", seed=9)
    t_x = _run("sync", seed=9)

    for t in (t_p, t_x):
        acc = np.asarray(t.sample_stats["mean_tree_accept"]).mean()
        assert 0.7 < acc < 0.95, acc

    # post-warmup step sizes agree to ~15% in the mean (8 chains each)
    s_p = np.asarray(t_p.sample_stats["step_size"])[:, -1].mean()
    s_x = np.asarray(t_x.sample_stats["step_size"])[:, -1].mean()
    assert abs(np.log(s_p / s_x)) < 0.3, (s_p, s_x)


def test_pallas_warmup_schedule_stats():
    """Warmup stats carry the schedule's structure: step_size_bar present,
    transformation_index increments at mass-matrix updates, tuning flags."""
    trace = _run("pallas", num_tune=120, num_draws=60)
    ws = trace.warmup_sample_stats
    assert np.asarray(ws["tuning"]).all()
    assert not np.asarray(trace.sample_stats["tuning"]).any()
    tid = np.asarray(ws["transformation_index"])
    # id increases over warmup (estimator updates fired) and is nondecreasing
    assert (np.diff(tid, axis=1) >= 0).all()
    assert (tid[:, -1] > tid[:, 0]).all()
    bar = np.asarray(ws["step_size_bar"])
    assert np.isfinite(bar).all() and (bar > 0).all()


def test_pallas_warmup_glm_model_args():
    """Data-carrying model through the warmup kernel's model-args VMEM
    channel (Model.pallas_logp_grad): adaptation must run in-kernel and the
    posterior must match the XLA path's."""
    model = gaussian.logistic_regression(n_data=64, dim=4, seed=0)
    t_p = _run("pallas", model=model, seed=5, num_tune=150, num_draws=250)
    t_x = _run("sync", model=model, seed=5, num_tune=150, num_draws=250)
    mp = np.asarray(t_p.posterior["position"]).reshape(-1, 4).mean(axis=0)
    mx = np.asarray(t_x.posterior["position"]).reshape(-1, 4).mean(axis=0)
    np.testing.assert_allclose(mp, mx, atol=0.15)
    acc = np.asarray(t_p.sample_stats["mean_tree_accept"]).mean()
    assert 0.6 < acc < 0.99, acc


def test_pallas_warmup_correlated_target():
    """Scale mismatch forces real mass-matrix work: correlated normal's
    marginal var (1.5) must be learned for good acceptance."""
    trace = _run("pallas", model=gaussian.correlated_normal(6), num_tune=200,
                 num_draws=300)
    pos = np.asarray(trace.posterior["position"])
    flat = pos.reshape(-1, pos.shape[-1])
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=0.25)
    np.testing.assert_allclose(flat.std(axis=0), np.sqrt(1.5), atol=0.25)


def test_warmup_group_split_matches_grid():
    """The GLM warmup workaround (grid=1 pallas_call per chain group with a
    program-id base, nuts_pallas_warmup_run) must be bit-identical to the
    multi-program grid launch it replaces — same RNG streams, same draws,
    same adaptation state.  (Round 5: multi-program grids with
    VMEM-replicated model-arg windows crash the Mosaic compile on TPU;
    interpret mode runs both, so the equivalence is pinned here.)"""
    from nuts_rs_tpu.kernels.nuts import NutsOptions
    from nuts_rs_tpu.kernels.nuts_pallas import nuts_pallas_warmup_run

    model = gaussian.logistic_regression(n_data=64, dim=6, seed=1)
    fn, pallas_args = model.pallas_logp_grad
    C, d, K = 16, 6, 5
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(C, d)), jnp.float32)
    lp, g = jax.vmap(model.logp_and_grad)(q)
    stds = jnp.ones((C, d), jnp.float32)
    mean = jnp.zeros((C, d), jnp.float32)
    est = jnp.zeros((C, 8, d), jnp.float32)
    sca = jnp.zeros((C, 10), jnp.float32).at[:, 0].set(0.3)  # SCA_STEP
    flags = jnp.ones((K, 8), jnp.int32)
    opts = NutsOptions(maxdepth=4)
    sset = nt.DiagNutsSettings(num_chains=C).step_size

    kw = dict(block=8, interpret=True, model_args=pallas_args)
    out_split = nuts_pallas_warmup_run(7, flags, q, g, lp, stds, mean, est,
                                       sca, fn, opts, sset, True, **kw)
    out_grid = nuts_pallas_warmup_run(7, flags, q, g, lp, stds, mean, est,
                                      sca, fn, opts, sset, True,
                                      _split=False, **kw)
    for i in range(8):
        np.testing.assert_array_equal(np.asarray(out_split[i]),
                                      np.asarray(out_grid[i]), err_msg=str(i))
    for k in out_grid[8]:
        np.testing.assert_array_equal(np.asarray(out_split[8][k]),
                                      np.asarray(out_grid[8][k]), err_msg=k)
