"""MCLMC sampler tests.

Mirror of nuts-rs ``src/mclmc.rs:573-685``: a 10-d N(3, 1) target must be
explored (mean within 3 of target, no divergence) for all three trajectory
kinds.
"""

import numpy as np
import pytest

import nuts_rs_tpu as nt
from nuts_rs_tpu import MclmcTrajectoryKind
from nuts_rs_tpu.models import gaussian


def _run(kind, step_size=0.5, num_tune=200, num_draws=400, seed=0):
    model = gaussian.normal_logp(10, mu=3.0)
    settings = nt.DiagMclmcSettings(
        step_size=step_size,
        momentum_decoherence_length=3.0,
        num_tune=num_tune,
        num_draws=num_draws,
        num_chains=2,
        trajectory_kind=kind,
        seed=seed,
    )
    return nt.sample(model, settings, chunk_size=100)


@pytest.mark.parametrize("kind,step", [
    (MclmcTrajectoryKind.MICROCANONICAL, 0.5),
    (MclmcTrajectoryKind.EUCLIDEAN, 0.3),
    (MclmcTrajectoryKind.EUCLIDEAN_EARLY_THEN_MICROCANONICAL, 0.5),
])
def test_mclmc_draws_normal(kind, step):
    trace = _run(kind, step_size=step)
    last = trace.posterior["position"][:, -1, :]
    mean = last.mean()
    assert abs(mean - 3.0) < 3.0, mean
    assert not trace.sample_stats["diverging"].any()
    # the unadjusted sampler reports importance weights and step stats
    assert "log_weight" in trace.sample_stats
    assert "average_step_size" in trace.sample_stats
    assert (trace.sample_stats["n_steps"] >= 1).all()


def test_mclmc_posterior_moments():
    trace = _run(MclmcTrajectoryKind.EUCLIDEAN_EARLY_THEN_MICROCANONICAL,
                 num_tune=300, num_draws=1500, seed=3)
    draws = trace.posterior["position"]
    # Unadjusted sampler: tolerate small bias but moments should be close.
    assert abs(draws.mean() - 3.0) < 0.2
    assert abs(draws.std() - 1.0) < 0.25
