"""Unrecoverable logp-error semantics (reference: LogpError::is_recoverable,
src/math/math.rs:9-13; abort + finalize src/sampler.rs:1202-1207,1452-1457).

A permanently failing logp (NaN beyond an impossibly tight region) must end
the run early with ChainFailedError, per-chain errors in ChainProgress, and a
FINALIZED partial trace riding on the exception — instead of spinning for the
full draw budget emitting garbage.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import nuts_rs_tpu as nt
from nuts_rs_tpu.models.model import Model
from nuts_rs_tpu.parallel.axis import dsum


def _nan_wall_model(dim=4):
    """logp is finite ONLY at bit-exact zero (the init point): every leapfrog
    proposal q + eps*v is nonzero no matter how small adaptation drives eps,
    returns NaN, diverges, and the chain can never move — the batched-kernel
    analog of an unrecoverable LogpError (a permanently failing solver)."""

    def logp(q):
        base = -0.5 * dsum(jnp.square(q))
        bad = jnp.any(q != 0.0)
        return jnp.where(bad, jnp.nan, base)

    return Model(logp_fn=logp, dim=dim, name="nan_wall")


def test_unrecoverable_chain_raises_with_partial_trace():
    model = _nan_wall_model()
    settings = nt.DiagNutsSettings(
        num_tune=200, num_draws=200, num_chains=4, seed=3)
    sampler = nt.Sampler(
        model, settings, chunk_size=32,
        init_positions=np.zeros((4, model.dim)), fail_after=48)
    with pytest.raises(nt.ChainFailedError) as exc_info:
        sampler.run()
    err = exc_info.value
    # every chain is stuck at the origin -> all fail
    assert err.chains == [0, 1, 2, 3]
    # the run stopped long before the 400-draw budget
    assert sampler._next_draw < 200
    # per-chain error surfaced in ChainProgress
    for prog in sampler.progress:
        assert prog.failed
        assert "unrecoverable" in prog.error
    # traces were finalized despite the failure (partial draws present)
    trace = err.trace
    assert trace is not None
    pos = trace.warmup_posterior["position"]
    assert pos.shape[0] == 4 and pos.shape[1] >= 48


def test_wait_timeout_raises_on_failure():
    model = _nan_wall_model()
    settings = nt.DiagNutsSettings(
        num_tune=100, num_draws=100, num_chains=2, seed=0)
    sampler = nt.Sampler(
        model, settings, chunk_size=32,
        init_positions=np.zeros((2, model.dim)), fail_after=40)
    with pytest.raises(nt.ChainFailedError):
        sampler.wait_timeout(600.0)


def test_healthy_model_untouched_by_detector():
    """A well-behaved model must never trip the detector (moves reset the
    streak), and fail_after=None disables it entirely."""
    from nuts_rs_tpu.models.gaussian import normal_logp

    model = normal_logp(3, mu=0.0)
    settings = nt.DiagNutsSettings(
        num_tune=60, num_draws=60, num_chains=4, seed=1)
    sampler = nt.Sampler(model, settings, chunk_size=30, fail_after=10)
    trace = sampler.run()
    assert not any(p.failed for p in sampler.progress)
    assert trace.posterior["position"].shape[1] == 60


def test_detector_streak_resets_across_chunks():
    """Streak accounting is exact across chunk boundaries: a divergent
    stuck run split over two chunks still accumulates."""
    model = _nan_wall_model(dim=2)
    settings = nt.DiagNutsSettings(
        num_tune=100, num_draws=100, num_chains=2, seed=7)
    sampler = nt.Sampler(
        model, settings, chunk_size=16,
        init_positions=np.zeros((2, 2)), fail_after=24)  # 1.5 chunks
    with pytest.raises(nt.ChainFailedError):
        sampler.run()
    assert sampler._next_draw <= 48  # detected shortly after 24 draws
