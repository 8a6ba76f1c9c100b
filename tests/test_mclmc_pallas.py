"""Fused Pallas MCLMC posterior engine (kernels/mclmc_pallas.py).

Mirrors the test strategy of test_kernel_equivalence.py: the kernel's
interpret-mode murmur3 hash stream is replayed through a NAIVE per-chain
builder — genuine Python ``if``/``else`` control flow and a Python-list
halving stack instead of the kernel's masked lock-step vectorization — so
agreement validates the masking/stack logic itself, not just the happy
path.  Statistical equivalence against the XLA scan path
(kernels/mclmc.py) runs at the sampler level.
"""

import math
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nuts_rs_tpu as nt
from nuts_rs_tpu.dynamics.hamiltonian import KineticKind
from nuts_rs_tpu.kernels.mclmc import MAX_HALVINGS, MclmcOptions
from nuts_rs_tpu.kernels.mclmc_pallas import (
    MCLMC_STAT_NAMES, mclmc_pallas_run,
)
from nuts_rs_tpu.kernels.nuts_pallas import _hash_bits
from nuts_rs_tpu.models import gaussian

f32 = jnp.float32


def _normal_problem(d, C, mu=3.0, seed=0):
    def logp_grad_batched(q):  # [d, B] -> ([B], [d, B])
        return -0.5 * jnp.sum((q - mu) ** 2, 0), -(q - mu)

    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(mu, 1, (C, d)), f32)
    g = -(q - mu)
    logp = -0.5 * jnp.sum((q - mu) ** 2, 1)
    v = rng.normal(size=(C, d))
    v = jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True), f32)
    stds = jnp.ones((C, d), f32)
    mean = jnp.zeros((C, d), f32)
    logdet = jnp.zeros(C, f32)
    return logp_grad_batched, q, g, logp, v, stds, mean, logdet


# ---------------------------------------------------------------------------
# Hash-stream replay: naive per-chain builder
# ---------------------------------------------------------------------------


class _HashStream:
    """Replays the kernel's interpret-mode RNG (program_id 0)."""

    def __init__(self, seed):
        self.seed = jnp.uint32(np.uint32(seed))

    def uniform(self, shape, it, salt):
        bits = _hash_bits(shape, self.seed, jnp.uint32(it), salt)
        f = ((bits >> 8).astype(jnp.int32).astype(jnp.float32)
             * (1.0 / (1 << 24)))
        return jnp.clip(f, 1e-12, 1.0 - 1e-7)

    def normals(self, shape, it, s1, s2):
        u1 = self.uniform(shape, it, s1)
        u2 = self.uniform(shape, it, s2)
        return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)


def _naive_mclmc_chain(b, stream, d, B, K, mopts, jitter, q0, g0, logp0, v0,
                       step0, bar):
    """One chain's draws via plain Python control flow.

    Per kernel-body iteration the RNG salts are n1=(3,4), n2=(5,6),
    vfail=(7,8), u_step=9 (pre-loop noise0=(1,2) at it=0); a chain's n-th
    attempt is global iteration it=n because every chain takes exactly one
    leapfrog attempt per lock-step loop iteration.
    """
    MICRO = mopts.kind is KineticKind.MICROCANONICAL
    ELL = f32(mopts.momentum_decoherence_length)
    FSUB = f32(mopts.subsample_frequency)
    MAX_ERR = f32(mopts.max_energy_error)
    H = MAX_HALVINGS if mopts.dynamic_step_size else 0
    sqrt_n = f32(math.sqrt(d))
    ln2 = f32(math.log(2.0))

    def esh(zg, v, step):
        gn = jnp.sqrt(jnp.sum(zg * zg))
        gh = zg / gn
        alpha = jnp.sum(v * gh)
        delta = step * gn / f32(d - 1)
        zeta = jnp.exp(-delta)
        vr = ((1.0 - zeta) * (1.0 + zeta + alpha * (1.0 - zeta)) * gh
              + 2.0 * zeta * v)
        vn = vr / jnp.sqrt(jnp.sum(vr * vr))
        # same Mosaic-safe regrouping as the kernel (no log1p/expm1 there)
        dke = (delta - ln2
               + jnp.log((1.0 + alpha) + (1.0 - alpha) * zeta * zeta)
               ) * f32(d - 1)
        return vn, dke

    def refresh(v, noise, half):
        if MICRO:
            nu = jnp.sqrt((jnp.exp(2.0 * half / ELL) - 1.0) / f32(d))
            vr = v + nu * noise
            return vr / jnp.sqrt(jnp.sum(vr * vr)), None
        alpha = jnp.exp(-half / ELL)
        vr = alpha * v + jnp.sqrt(1.0 - alpha * alpha) * noise
        return vr, 0.5 * jnp.sum(vr * vr)

    def nsteps_for(stepd):
        return int(jnp.clip(jnp.round(FSUB * ELL / stepd), 1.0, 1e6))

    def logp_grad(z):  # identity transform in these tests
        lp = -0.5 * jnp.sum((z - 3.0) ** 2)
        return lp, -(z - 3.0)

    z = q0
    zg = g0
    logp = logp0
    v = v0
    ld = f32(0.0)
    noise = stream.normals((d, B), 0, 1, 2)[:, b]
    step = step0
    nsd = nsteps_for(step)
    ke = f32(0.0) if MICRO else 0.5 * jnp.sum(v * v)
    e_init = ke - (logp + ld)
    zi, zgi, lpi = z, zg, logp
    rem, factor, stack = nsd, f32(1.0), []
    steps, ttime = 0, f32(0.0)

    draws, stats = [], []
    it = 0
    while len(draws) < K:
        it += 1
        n1 = stream.normals((d, B), it, 3, 4)[:, b]
        n2 = stream.normals((d, B), it, 5, 6)[:, b]
        vfail = stream.normals((d, B), it, 7, 8)[:, b]
        if jitter is None:
            u_step = bar
        else:
            u = stream.uniform((1, B), it, 9)[0, b]
            u_step = bar * (1.0 - jitter + 2.0 * jitter * u)

        eps = step * factor
        half = eps / 2.0
        vr, ke_r_e = refresh(v, noise, half)
        ke_r = ke if MICRO else ke_r_e
        base = ke_r - (logp + ld)
        if MICRO:
            v1, dke1 = esh(zg, vr, sqrt_n * eps / 2.0)
            ke1 = ke_r + dke1
            z1 = z + eps * sqrt_n * v1
        else:
            v1 = vr + half * zg
            ke1 = ke_r
            z1 = z + eps * v1
        logp1, zg1 = logp_grad(z1)
        if MICRO:
            v2, dke2 = esh(zg1, v1, sqrt_n * eps / 2.0)
            ke2 = ke1 + dke2
        else:
            v2 = v1 + half * zg1
            ke2 = 0.5 * jnp.sum(v2 * v2)
        err = (ke2 - (logp1 + ld)) - base
        max_err_step = (MAX_ERR / f32(nsd)) * factor
        bad = (abs(float(err)) >= float(max_err_step) if MICRO
               else float(err) > float(max_err_step))
        div = bad or not np.isfinite(float(err))

        done = False
        diverged_end = False
        if div:
            if len(stack) >= H:
                done, diverged_end = True, True
            else:
                stack.append(rem)
                rem, factor = 2, factor * f32(0.5)
            # state reverts to the pre-refresh point; noise is reused
        else:
            vr2, ke3_e = refresh(v2, n1, half)
            z, v, zg, logp = z1, vr2, zg1, logp1
            ke = ke2 if MICRO else ke3_e
            noise = n2
            rem -= 1
            steps += 1
            ttime = ttime + factor * step
            while rem == 0 and stack:
                rem = stack.pop() - 1
                factor = factor * f32(2.0)
            if rem == 0:
                done = True

        if done:
            if diverged_end:
                em_z, em_zg, em_logp = zi, zgi, lpi
                if MICRO:
                    em_v = vfail / jnp.sqrt(jnp.sum(vfail * vfail))
                    em_ke = f32(0.0)
                else:
                    em_v = vfail
                    em_ke = 0.5 * jnp.sum(em_v * em_v)
            else:
                em_z, em_zg, em_logp, em_v, em_ke = z, zg, logp, v, ke
            e_change = (ke - (logp + ld)) - e_init
            stepsf = f32(max(steps, 1))
            draws.append(np.asarray(em_z))
            stats.append(dict(
                diverging=float(diverged_end),
                n_steps=float(steps),
                energy_change=float(e_change),
                average_step_size=float(ttime / stepsf),
                step_size=float(step),
                logp=float(em_logp),
                energy=float(em_ke - (em_logp + ld)),
                fisher_distance=float(jnp.sum(jnp.square(em_z + em_zg))),
            ))
            # next draw from the emitted point, carried momentum
            z, zg, logp, v = em_z, em_zg, em_logp, em_v
            ke = f32(0.0) if MICRO else em_ke
            e_init = ke - (logp + ld)
            step = u_step
            nsd = nsteps_for(step)
            zi, zgi, lpi = z, zg, logp
            rem, factor, stack = nsd, f32(1.0), []
            steps, ttime = 0, f32(0.0)
            noise = n2
    return np.stack(draws), stats


@pytest.mark.parametrize("max_err,kind", [
    (1000.0, KineticKind.MICROCANONICAL),
    (0.05, KineticKind.MICROCANONICAL),     # exercises the halving stack
    (1000.0, KineticKind.EUCLIDEAN),
])
def test_mclmc_pallas_matches_naive_replay(max_err, kind):
    d, C, K = 6, 4, 5
    seed = 7
    logp_grad_batched, q, g, logp, v, stds, mean, logdet = _normal_problem(
        d, C, seed=1)
    step = jnp.full(C, 1.4 if max_err < 1 else 0.5, f32)
    mopts = MclmcOptions(kind=kind, max_energy_error=max_err)
    qf, gf, lpf, vf, draws, stats = mclmc_pallas_run(
        seed, q, g, logp, v, stds, mean, logdet, step, step, K,
        logp_grad_batched, mopts, jitter=0.1, block=C, interpret=True)

    stream = _HashStream(seed)
    for b in range(C):
        nd, nstats = _naive_mclmc_chain(
            b, stream, d, C, K, mopts, 0.1,
            q[b].astype(f32), g[b].astype(f32), f32(logp[b]),
            v[b].astype(f32), f32(step[b]), f32(step[b]))
        np.testing.assert_allclose(np.asarray(draws[b]), nd,
                                   rtol=0, atol=1e-5)
        for i, row in enumerate(nstats):
            for name in MCLMC_STAT_NAMES:
                got = float(np.asarray(stats[name])[b, i])
                np.testing.assert_allclose(
                    got, row[name], rtol=1e-5, atol=1e-5,
                    err_msg=f"chain {b} draw {i} stat {name}")


# ---------------------------------------------------------------------------
# Kernel-level invariants
# ---------------------------------------------------------------------------


def test_mclmc_pallas_nsteps_matches_schedule():
    """Without divergences every draw takes exactly round(F*L/eps) steps."""
    d, C, K = 10, 8, 40
    logp_grad_batched, q, g, logp, v, stds, mean, logdet = _normal_problem(
        d, C)
    step = jnp.full(C, 0.5, f32)
    mopts = MclmcOptions(kind=KineticKind.MICROCANONICAL)
    *_, stats = mclmc_pallas_run(
        0, q, g, logp, v, stds, mean, logdet, step, step, K,
        logp_grad_batched, mopts, jitter=0.1, block=C, interpret=True)
    assert not np.asarray(stats["diverging"]).any()
    ns = np.asarray(stats["n_steps"])
    expect = np.clip(np.round(3.0 / np.asarray(stats["step_size"])), 1, 1e6)
    np.testing.assert_array_equal(ns, expect)
    np.testing.assert_allclose(np.asarray(stats["average_step_size"]),
                               np.asarray(stats["step_size"]), rtol=1e-5)


def test_mclmc_pallas_divergences_recover():
    """A pathological threshold produces give-up divergences whose draws
    stay at the trajectory start (finite, within the typical set)."""
    d, C, K = 10, 8, 30
    logp_grad_batched, q, g, logp, v, stds, mean, logdet = _normal_problem(
        d, C)
    step = jnp.full(C, 2.5, f32)
    mopts = MclmcOptions(kind=KineticKind.MICROCANONICAL,
                         max_energy_error=5e-4)
    *_, draws, stats = mclmc_pallas_run(
        0, q, g, logp, v, stds, mean, logdet, step, step, K,
        logp_grad_batched, mopts, jitter=0.1, block=C, interpret=True)
    div = np.asarray(stats["diverging"])
    assert div.any()
    assert np.isfinite(np.asarray(draws)).all()
    # halvings shrink the realized step size well below the base step
    assert np.asarray(stats["average_step_size"]).mean() < 0.5


# ---------------------------------------------------------------------------
# Sampler-level: engine equivalence + demotion
# ---------------------------------------------------------------------------


def test_mclmc_pallas_engine_matches_sync():
    """Statistical equivalence of the fused engine vs the XLA scan path;
    num_draws > one launch's K so the velocity threads across launches."""
    kw = dict(num_tune=250, num_draws=150, num_chains=8, seed=3)
    tr_p = nt.sample(gaussian.normal_logp(10, 3.0),
                     nt.DiagMclmcSettings(posterior_kernel="pallas", **kw))
    tr_s = nt.sample(gaussian.normal_logp(10, 3.0),
                     nt.DiagMclmcSettings(**kw))
    assert set(tr_p.sample_stats) == set(tr_s.sample_stats)
    for tr in (tr_p, tr_s):
        pos = np.asarray(tr.posterior["position"], float)
        assert abs(pos.mean() - 3.0) < 0.12
        assert abs(pos.var() - 1.0) < 0.2
    ns_p = np.asarray(tr_p.sample_stats["n_steps"], float).mean()
    ns_s = np.asarray(tr_s.sample_stats["n_steps"], float).mean()
    assert abs(ns_p - ns_s) < 0.5
    for name in ("average_step_size", "log_weight"):
        a = np.abs(np.asarray(tr_p.sample_stats[name], float)).mean()
        b = np.abs(np.asarray(tr_s.sample_stats[name], float)).mean()
        assert a < 2.5 * b + 1e-3 and b < 2.5 * a + 1e-3, (name, a, b)


def test_mclmc_pallas_demotion_warns():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        nt.sample(gaussian.normal_logp(4, 0.0),
                  nt.DiagMclmcSettings(num_tune=20, num_draws=10,
                                       num_chains=2, seed=0,
                                       posterior_kernel="pallas",
                                       store_gradient=True))
    msgs = [str(x.message) for x in w if "pallas" in str(x.message)]
    assert any("store_gradient" in m for m in msgs)


def test_mclmc_fused_warmup_matches_xla_schedule_and_moments():
    """The fused MCLMC warmup engine (kernels/mclmc_pallas.py warmup
    section; reference warmup loop src/mclmc.rs:487-546) must follow the
    SAME deterministic adaptation schedule as the XLA path — the
    transformation_index trajectory is RNG-independent so it matches
    exactly — and produce equivalent adapted geometry and posterior
    moments (streams differ: hardware/murmur3 vs threefry)."""
    model = gaussian.normal_logp(5, mu=2.0)
    mk = lambda pk: nt.Sampler(model, nt.DiagMclmcSettings(
        num_tune=120, num_draws=250, num_chains=8, seed=11,
        posterior_kernel=pk), chunk_size=100)

    s_p = mk("pallas")
    # the warmup phases must be the fused runner, split at the trajectory
    # switch (0.3 * num_tune = 36), not the XLA scan
    assert len(s_p._phase_runners) == 3
    assert s_p._phase_runners[0][:2] == (0, 36)
    assert s_p._phase_runners[1][:2] == (36, 120)

    t_p = s_p.run()
    t_x = mk("sync").run()

    tid_p = np.asarray(t_p.warmup_sample_stats["transformation_index"])
    tid_x = np.asarray(t_x.warmup_sample_stats["transformation_index"])
    np.testing.assert_array_equal(tid_p, tid_x)

    for t in (t_p, t_x):
        pos = np.asarray(t.posterior["position"]).astype(np.float64)
        assert abs(pos.mean() - 2.0) < 0.15
        assert abs(pos.std() - 1.0) < 0.2
        assert not np.asarray(t.sample_stats["diverging"]).any()

    # warmup stats surface matches the XLA phase's schema exactly
    assert set(t_p.warmup_sample_stats) == set(t_x.warmup_sample_stats)


def test_mclmc_fused_warmup_reproducible_per_seed_and_chunking():
    """Same (seed, chunking) -> bit-identical runs; a different seed gives
    different draws (the fused engines' documented RNG contract: streams
    are reproducible per (seed, chunking), kernels/nuts_pallas.py)."""
    model = gaussian.normal_logp(4, mu=0.0)
    S = lambda seed=5: nt.DiagMclmcSettings(
        num_tune=60, num_draws=40, num_chains=8, seed=seed,
        posterior_kernel="pallas")
    t1 = nt.Sampler(model, S(), chunk_size=25).run()
    t2 = nt.Sampler(model, S(), chunk_size=25).run()
    np.testing.assert_array_equal(
        np.asarray(t1.warmup_posterior["position"]),
        np.asarray(t2.warmup_posterior["position"]))
    np.testing.assert_array_equal(np.asarray(t1.posterior["position"]),
                                  np.asarray(t2.posterior["position"]))
    t3 = nt.Sampler(model, S(seed=6), chunk_size=25).run()
    assert not np.array_equal(np.asarray(t3.posterior["position"]),
                              np.asarray(t1.posterior["position"]))
