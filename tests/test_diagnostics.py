"""Diagnostics (split-R-hat, bulk/tail ESS) against analytic ground truth.

The reference ships no diagnostics (users run ArviZ); these are the built-in
batched equivalents, tested against known-ESS processes.
"""

import numpy as np
import pytest

import nuts_rs_tpu as nt
from nuts_rs_tpu.diagnostics import ess_bulk, ess_tail, split_rhat, summary
from nuts_rs_tpu.models import gaussian


def _ar1(rng, c, n, phi):
    x = np.zeros((c, n))
    innov = rng.normal(size=(c, n)) * np.sqrt(1 - phi**2)
    x[:, 0] = rng.normal(size=c)
    for t in range(1, n):
        x[:, t] = phi * x[:, t - 1] + innov[:, t]
    return x


def test_iid_chains():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 1000))
    assert abs(split_rhat(x) - 1.0) < 0.01
    # iid: ESS close to the total draw count
    assert 0.75 * 8000 < ess_bulk(x) < 1.3 * 8000
    assert ess_tail(x) > 0.4 * 8000


def test_autocorrelated_chains():
    # AR(1): true ESS factor = (1-phi)/(1+phi).
    rng = np.random.default_rng(1)
    phi = 0.9
    x = _ar1(rng, 8, 4000, phi)
    expected = 8 * 4000 * (1 - phi) / (1 + phi)
    est = ess_bulk(x)
    assert 0.5 * expected < est < 2.0 * expected
    assert est < 0.2 * 8 * 4000  # far below the raw draw count


def test_stuck_chain_detected():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 500))
    x[0] += 5.0  # one chain exploring a different region
    assert split_rhat(x) > 1.2


def test_multidim_and_summary():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 400, 3))
    r = split_rhat(x)
    assert r.shape == (3,)
    assert np.all(np.abs(r - 1.0) < 0.02)

    model = gaussian.normal_logp(3, mu=1.0)
    trace = nt.sample(model, nt.DiagNutsSettings(
        num_tune=150, num_draws=300, num_chains=4, seed=0), chunk_size=450)
    s = summary(trace)
    assert np.all(np.abs(s["mean"] - 1.0) < 0.15)
    assert np.all(s["rhat"] < 1.05)
    assert np.all(s["ess_bulk"] > 100)
    assert np.all(s["ess_tail"] > 50)


def test_degenerate_inputs():
    const = np.ones((4, 100))
    assert np.isnan(split_rhat(const))
    assert np.isnan(ess_bulk(const))
    short = np.random.default_rng(0).normal(size=(2, 5))
    assert np.isfinite(split_rhat(short)) or np.isnan(split_rhat(short))
