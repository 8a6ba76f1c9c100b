"""Reference-semantics warmup: per-chain good-draw window advancement.

``AdaptScheduleOptions.window_by_good_draws=True`` replaces the host
precomputed draw-index schedule with the on-device per-chain counters of
``GlobalStrategy::adapt`` (nuts-rs src/adapt_strategy.rs:121-216), advancing
fg/bg estimator windows by each chain's count of good (non-divergent) draws.

Contracts pinned here:
  * the device's per-chain switch/update decisions exactly match a host
    re-simulation of the reference counters fed each chain's RECORDED
    good-draw mask (the mass-matrix update count is observable per draw as
    ``transformation_index``) — on both an easy target and a divergence-heavy
    funnel;
  * on a divergence-heavy target the mode stays stable AND tracks the easy
    run's step size tighter than the draw-index schedule's 30x bound
    (VERDICT r3 task 7);
  * invalid combinations (low-rank/flow, cross-chain pooling, MCLMC) raise.
"""

import numpy as np
import pytest

import nuts_rs_tpu as nt
from nuts_rs_tpu.adapt.schedule import AdaptScheduleOptions
from nuts_rs_tpu.models import gaussian


def _simulate_reference_updates(is_good, num_tune, opts):
    """Host re-simulation of GlobalStrategy::adapt's window counters
    (adapt_strategy.rs:121-216) for ONE chain, fed the chain's recorded
    good-draw mask; returns the per-draw did-mass-matrix-change sequence."""
    early_end = int(opts.early_window * num_tune)
    final_ss = num_tune - int(opts.step_size_window * num_tune)
    bg_count = 1.0  # init() feeds one sample into fg and bg
    fg_count = 1.0
    cw = float(opts.mass_matrix_switch_freq)
    last_update = 0
    did = np.zeros(num_tune, bool)
    for draw in range(num_tune):
        in_win = draw < final_ss
        is_early = draw < early_end
        if draw == early_end:
            cw = max(cw, bg_count)  # seeded BEFORE this draw's update
        if in_win and is_good[draw]:
            bg_count += 1.0
            fg_count += 1.0
        switch_freq = opts.early_mass_matrix_switch_freq if is_early else cw
        could_switch = bg_count >= switch_freq
        next_window = (opts.early_mass_matrix_switch_freq if is_early
                       else max(cw + 1.0,
                                np.floor(cw * opts.mass_matrix_window_growth
                                         + 0.5)))
        is_late = next_window + draw > final_ss
        switch = could_switch and not is_late and in_win
        if switch:
            fg_count = bg_count
            bg_count = 0.0
            if not is_early:
                cw = next_window
        update = (switch or (draw - last_update
                             >= opts.mass_matrix_update_freq)) and in_win
        did[draw] = update and fg_count >= 3.0
        if did[draw]:
            last_update = draw
    return did


def _assert_matches_oracle(trace, num_tune, opts):
    div = trace.warmup_sample_stats["diverging"]
    idx = trace.warmup_sample_stats["index_in_trajectory"]
    is_good = np.where(div, np.abs(idx) > 4, idx != 0)  # diagonal.rs:73-84
    tid = trace.warmup_sample_stats["transformation_index"]  # [C, T]
    for c in range(tid.shape[0]):
        did = _simulate_reference_updates(is_good[c], num_tune, opts)
        # transform id starts at 0 after the init-from-gradient set and
        # increments once per mass-matrix change.
        np.testing.assert_array_equal(
            tid[c], np.cumsum(did),
            err_msg=f"chain {c}: device window decisions diverge from the "
                    "reference counter simulation")


def _run(model, *, window_by_good_draws, num_tune=200, num_draws=150,
         num_chains=4, seed=3, max_energy_error=1000.0, **kw):
    settings = nt.DiagNutsSettings(
        num_tune=num_tune, num_draws=num_draws, num_chains=num_chains,
        seed=seed, max_energy_error=max_energy_error,
        adapt=AdaptScheduleOptions(window_by_good_draws=window_by_good_draws),
        **kw)
    sampler = nt.Sampler(model, settings, chunk_size=100, fail_after=None)
    return sampler.run()


def test_device_decisions_match_reference_simulation_easy():
    # Easy target: most draws are good, but rejected draws (idx==0) still
    # make per-chain counts lag the draw index — the oracle must track that.
    model = gaussian.normal_logp(5, mu=1.5)
    t = _run(model, window_by_good_draws=True)
    _assert_matches_oracle(t, num_tune=200, opts=AdaptScheduleOptions())


def test_device_decisions_match_reference_simulation_funnel():
    # Divergence-heavy funnel: good-draw counts lag badly and diverge ACROSS
    # chains, so the per-chain switch timings genuinely differ — exactly the
    # regime the reference's counters exist for.
    model = gaussian.funnel(6)
    t = _run(model, window_by_good_draws=True, num_tune=400, num_draws=100,
             num_chains=8, seed=0, max_energy_error=3.0)
    wdiv = t.warmup_sample_stats["diverging"]
    assert wdiv.mean() > 0.05, "target not divergence-heavy; test is vacuous"
    _assert_matches_oracle(t, num_tune=400, opts=AdaptScheduleOptions())


def test_funnel_good_draw_mode_adapts_and_tracks_easy_run():
    # The regime the mode exists for: a large fraction of warmup draws
    # diverge, so good-draw counts lag draw counts badly.  Reference
    # semantics must stay stable AND stay within 10x (vs the index
    # schedule's 30x regression fence) of the easy-threshold step size.
    model = gaussian.funnel(6)
    hard = _run(model, window_by_good_draws=True, num_tune=400,
                num_draws=400, num_chains=8, seed=0, max_energy_error=3.0,
                store_mass_matrix=True)
    assert hard.warmup_sample_stats["diverging"].mean() > 0.05, \
        "target not divergence-heavy; test is vacuous"
    mm = hard.sample_stats["mass_matrix_inv"]
    assert np.isfinite(mm).all() and (mm > 0).all()
    step = hard.sample_stats["step_size"]
    assert np.isfinite(step).all()
    assert (step > 1e-6).all() and (step < 10.0).all()

    easy = _run(model, window_by_good_draws=True, num_tune=400,
                num_draws=400, num_chains=8, seed=0)
    s_hard = float(np.median(step))
    s_easy = float(np.median(easy.sample_stats["step_size"]))
    assert s_easy / 10.0 < s_hard < s_easy * 10.0

    # Posterior sanity: with reference semantics a chain whose neck
    # divergences suppress its good-draw counts adapts SLOWER than the
    # index schedule (that is the semantic difference), so the marginal
    # recovery bound is looser than test_schedule_divergent's.
    v = hard.posterior["position"][..., 0].astype(np.float64)
    assert abs(v.mean()) < 1.6
    assert 1.5 < v.std() < 4.5


def test_checkpoint_roundtrip_carries_window_state(tmp_path):
    # The per-chain window counters live in ChainState and must survive a
    # save/restore mid-warmup bit-identically.
    model = gaussian.normal_logp(4, mu=0.5)
    settings = nt.DiagNutsSettings(
        num_tune=120, num_draws=80, num_chains=3, seed=7,
        adapt=AdaptScheduleOptions(window_by_good_draws=True))
    full = nt.sample(model, settings, chunk_size=40)

    s1 = nt.Sampler(model, settings, chunk_size=40)
    s1.run_next_chunk()  # stop mid-warmup, window counters mid-flight
    ckpt = str(tmp_path / "state.npz")
    s1.checkpoint(ckpt)

    s2 = nt.Sampler(model, settings, chunk_size=40)
    s2.restore(ckpt)
    while not s2.finished:
        s2.run_next_chunk()
    resumed = s2.trace.finalize()
    np.testing.assert_array_equal(resumed.posterior["position"],
                                  full.posterior["position"])


@pytest.mark.parametrize("kw", [
    dict(mass_matrix="low_rank"),
    dict(cross_chain_adaptation=True),
])
def test_invalid_combinations_raise(kw):
    model = gaussian.normal_logp(4)
    settings = nt.DiagNutsSettings(
        num_tune=50, num_draws=50, num_chains=2,
        adapt=AdaptScheduleOptions(window_by_good_draws=True), **kw)
    with pytest.raises(ValueError, match="window_by_good_draws"):
        nt.Sampler(model, settings)


def test_mclmc_rejects_good_draw_windows():
    model = gaussian.normal_logp(4)
    settings = nt.DiagMclmcSettings(
        num_tune=50, num_draws=50, num_chains=2,
        adapt=AdaptScheduleOptions(window_by_good_draws=True))
    with pytest.raises(ValueError, match="window_by_good_draws"):
        nt.Sampler(model, settings)
