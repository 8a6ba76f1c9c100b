"""Chain driver: warmup + sampling as one jitted scan over draws.

TPU-native replacement for ``NutsChain`` and the ``AdaptStrategy`` wiring
(nuts-rs ``src/chain.rs:44-213``, ``src/adapt_strategy.rs:71-238``).

The chains axis is explicit (leading dim C) rather than object-per-chain; the
per-draw NUTS kernel is vmapped over it, while adaptation updates execute as
batched tensor ops gated on *scalar* schedule flags (precomputed host-side,
see ``adapt/schedule.py``) so that expensive refits run under real
``lax.cond`` instead of per-chain selects.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .adapt import mass_matrix as mm
from .adapt import step_size as ss
from .adapt.schedule import AdaptSchedule, WindowParams
from .dynamics.hamiltonian import KineticKind, init_point_from_q
from .dynamics.point import Point
from .kernels.nuts import NutsOptions, nuts_draw
from .parallel.axis import dsum
from .transform.affine import AffineTransform, identity_transform, init_diag_from_grad
from .transform.affine import grad_to_transformed as grad_to_transformed_
from .transform.affine import to_transformed as to_transformed_
from .transform.ops import AFFINE_OPS


def _ld_tiers():
    """Chains-per-block candidates for the dim-on-lanes tier, largest first.

    ``NUTS_PALLAS_LD_BLOCK=<n>`` forces a single candidate and skips the
    static VMEM pre-check (expert knob: the budget model is conservative —
    it charges 6 vector checkpoint stacks where the kernel carries 4 — so
    blocks the formula rejects can still fit the measured ~16MB scoped-VMEM
    limit; a block that genuinely does not fit fails at Mosaic compile,
    which the launch-size auto-probe turns into a clean fallback).
    """
    forced = os.environ.get("NUTS_PALLAS_LD_BLOCK")
    if forced:
        return (int(forced),), True
    return (32, 16, 8), False


def _cl_tiers(dim):
    """Chains-per-block candidates for the chains-on-lanes layout.

    256 lanes whenever the VMEM formula admits it (it self-limits to
    d ≲ 102 at maxdepth 10): per-iteration scalar op-issue overhead is
    independent of the lane count, so wider blocks amortize it across
    more chains — measured round 5 at the formula's worst admissible
    case (d=100 GLM, 1024 chains, v5e): 1.85M → 2.27M device evals/s
    (+23%), Mosaic compiles clean.  (Until round 5 the 256 tier was
    gated at dim <= 32 out of caution.)  ``NUTS_PALLAS_CL_BLOCK=<n>``
    forces a single candidate and skips the static VMEM pre-check
    (expert knob; a block that does not fit fails at Mosaic compile and
    the engine fallback catches it).
    """
    forced = os.environ.get("NUTS_PALLAS_CL_BLOCK")
    if forced:
        return (int(forced),), True
    return (256, 128), False


class ChainState(NamedTuple):
    """All per-chain device state; every leaf has a leading chains axis."""

    pt: Point                      # current draw (position, gradient, caches)
    transform: AffineTransform     # mass matrix / coordinate transform
    diag_adapt: mm.DiagAdaptState  # fg/bg variance estimators
    step: ss.StepSizeState         # step-size adaptation state
    keys: jax.Array                # [C] per-chain PRNG keys
    draw_idx: jax.Array            # [] global draw counter
    extra: Any = None              # strategy-specific extra state (low-rank window, ...)
    window: Any = None             # WindowState when window_by_good_draws


class WindowState(NamedTuple):
    """Per-chain ``GlobalStrategy`` counters for the good-draw window mode
    (nuts-rs ``src/adapt_strategy.rs:71-98``); the good-draw counts themselves
    are the estimator counts in ``DiagAdaptState``."""

    current_window: jax.Array  # [C] float current_window_size
    last_update: jax.Array     # [C] i32 draw index of the last mass update
    has_initial: jax.Array     # [C] bool has_initial_mass_matrix


def _select_chains(mask, a, b):
    """Per-chain tree select: ``mask`` is [C]; leaves have leading axis C."""
    def sel(x, y):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)
    return jax.tree.map(sel, a, b)


@dataclasses.dataclass(frozen=True)
class ChainConfig:
    """Static configuration shared by all chains."""

    nuts: NutsOptions
    step_size: ss.StepSizeSettings
    use_grad_based_estimate: bool = True
    # Pool the per-draw acceptance statistic across all chains (and across the
    # mesh axis under shard_map) before the dual-averaging update, so every
    # chain shares one step size driven by C-times more information.
    cross_chain_step_size: bool = False
    axis_name: Optional[str] = None
    # Non-None switches the warmup to per-chain good-draw window advancement
    # (reference semantics, adapt_strategy.rs:121-216); diag strategy only.
    window_params: Optional[WindowParams] = None
    store_gradient: bool = False
    store_unconstrained: bool = False
    store_transformed: bool = False
    store_divergences: bool = False
    store_mass_matrix: bool = False
    # Low-rank MatrixStats emission (nuts-rs LowRankSettings.store_mass_matrix,
    # src/transform/low_rank.rs:195,236): eigenvalues + count per update event.
    store_mass_matrix_eigs: bool = False


class DiagStrategy:
    """Diagonal mass-matrix adaptation (nuts-rs ``DiagAdaptStrategy``).

    With ``cross_chain=True`` the foreground estimators are pooled across all
    chains (and, under ``shard_map`` with ``axis_name`` set, across the device
    mesh via psum) before each mass-matrix update — the TPU-native extension
    the reference cannot express (SURVEY.md §2.12).
    """

    needs_extra_state = False
    ops = AFFINE_OPS

    def __init__(self, config: ChainConfig, cross_chain: bool = False,
                 axis_name: Optional[str] = None):
        self.config = config
        self.cross_chain = cross_chain
        self.axis_name = axis_name

    def init_extra(self, dim, num_tune, dtype, num_chains):
        return None

    def make_transform(self, dim, dtype):
        return identity_transform(dim, dtype)

    def init_mass_matrix(self, state: ChainState) -> ChainState:
        """Feed the init point into the estimators and set sigma^2 = 1/|g|.

        (nuts-rs ``transform/adapt/diagonal.rs:209-231``)
        """
        da = jax.vmap(mm.update_estimators, in_axes=(0, 0, 0, None))(
            state.diag_adapt, state.pt.q, state.pt.g, True)
        transform = jax.vmap(init_diag_from_grad)(state.transform, state.pt.q,
                                                  state.pt.g)
        return state._replace(diag_adapt=da, transform=transform)

    def update_estimators(self, state: ChainState, draw_q, draw_g, is_good,
                          logp=None, energy_error=None):
        da = jax.vmap(mm.update_estimators)(state.diag_adapt, draw_q, draw_g,
                                            is_good)
        return state._replace(diag_adapt=da)

    def switch(self, state: ChainState) -> ChainState:
        return state._replace(diag_adapt=jax.vmap(mm.switch)(state.diag_adapt))

    def adapt_update_masked(self, state: ChainState, mask) -> ChainState:
        """Per-chain gated mass-matrix update for the good-draw window mode:
        chains where ``mask`` is False keep their transform untouched."""
        ugb = self.config.use_grad_based_estimate
        transform = jax.vmap(
            lambda s, t, m: mm.adapt_diag(s, t, use_grad_based_estimate=ugb,
                                          update_mask=m)
        )(state.diag_adapt, state.transform, mask)
        return state._replace(transform=transform)

    def adapt_update(self, state: ChainState) -> ChainState:
        adapt = state.diag_adapt
        if self.cross_chain:
            from .parallel.collectives import merge_running_variance

            adapt = mm.DiagAdaptState(
                draw=merge_running_variance(adapt.draw, self.axis_name),
                grad=merge_running_variance(adapt.grad, self.axis_name),
                draw_bg=adapt.draw_bg,
                grad_bg=adapt.grad_bg,
            )
        transform = jax.vmap(
            partial(mm.adapt_diag,
                    use_grad_based_estimate=self.config.use_grad_based_estimate)
        )(adapt, state.transform)
        return state._replace(transform=transform)


def _mean0(x, n):
    return x / jnp.maximum(n.astype(x.dtype), 1.0)


def _maybe_pool_steps(found, config: ChainConfig):
    """Cross-chain step sharing: replace per-chain init-search results with
    their geometric mean so pooled dual averaging keeps every chain on one
    identical step size."""
    if not config.cross_chain_step_size:
        return found
    pooled = jnp.mean(jnp.log(found))
    if config.axis_name is not None:
        pooled = jax.lax.pmean(pooled, config.axis_name)
    return jnp.broadcast_to(jnp.exp(pooled), found.shape)


def make_draw_step(model, strategy, config: ChainConfig):
    """Build the scan body: one draw + adaptation for all chains.

    The returned function has signature ``(state, flags) -> (state, stats)``
    where ``flags`` is one row of the precomputed :class:`AdaptSchedule`.
    """

    logp_grad = model.logp_and_grad
    sset = config.step_size
    ops = getattr(strategy, "ops", AFFINE_OPS)

    def draw_step(state: ChainState, flags):
        keys = jax.vmap(jax.random.split, in_axes=(0, None))(state.keys, 3)
        k_draw, k_jitter, k_next = keys[:, 0], keys[:, 1], keys[:, 2]

        draw_pt, info = jax.vmap(
            lambda k, pt, t, ss_: nuts_draw(k, pt, t, ss_, logp_grad,
                                            config.nuts, ops=ops)
        )(k_draw, state.pt, state.transform, state.step.step_size)

        state = state._replace(pt=draw_pt, keys=k_next)

        # --- step-size statistics from this draw's collector ---
        n = info.n_steps
        mean_acc = _mean0(info.sum_accept, n)
        sym_acc = _mean0(info.sum_accept_sym, n)

        # --- mass-matrix window (scalar-flag gated; adapt_strategy.rs:140-216) ---
        if getattr(strategy, "use_orbit", False):
            # Flow orbit mode: train on every leapfrog point of the draw
            # (external_adapt_strategy.rs:93-128).
            update = lambda s: strategy.update_estimators_orbit(s, info)
        else:
            update = lambda s: strategy.update_estimators(
                s, draw_pt.q, draw_pt.g, info.is_good_for_adapt,
                logp=draw_pt.logp, energy_error=info.energy_error)
        reinit_mask = None
        if config.window_params is None:
            state = jax.lax.cond(flags["update_estimators"], update,
                                 lambda s: s, state)
            state = jax.lax.cond(flags["do_switch"], strategy.switch,
                                 lambda s: s, state)
            state = jax.lax.cond(flags["do_update"], strategy.adapt_update,
                                 lambda s: s, state)
            use_late = flags["use_late_estimator"]
        else:
            # --- good-draw window mode: per-chain GlobalStrategy::adapt
            # (adapt_strategy.rs:121-216) on device.  bg/fg good-draw counts
            # ARE the estimator counts; the other per-chain counters live in
            # state.window.  With zero divergences this takes the same
            # decisions as the precomputed schedule on every draw.
            wp = config.window_params
            draw = state.draw_idx
            w = state.window
            in_win = flags["is_tuning"] & (draw < wp.final_step_size_window)
            is_early = draw < wp.early_end
            # Early->main transition: never shrink below the accumulated
            # background count (adapt_strategy.rs:144-150) — seeded from the
            # count BEFORE this draw's estimator update, like the reference.
            cw = jnp.where(draw == wp.early_end,
                           jnp.maximum(w.current_window,
                                       state.diag_adapt.draw_bg.count),
                           w.current_window)
            state = jax.lax.cond(in_win, update, lambda s: s, state)
            da = state.diag_adapt
            cdt = da.draw_bg.count.dtype
            bg_count = da.draw_bg.count
            early_freq = jnp.asarray(wp.early_switch_freq, cdt)
            switch_freq = jnp.where(is_early, early_freq, cw)
            could_switch = bg_count >= switch_freq
            # round-half-away-from-zero like Rust's f64::round.
            next_window = jnp.where(
                is_early, early_freq,
                jnp.maximum(cw + 1.0, jnp.floor(cw * wp.growth + 0.5)))
            is_late = ((next_window + draw.astype(cdt))
                       > wp.final_step_size_window)
            switch_mask = could_switch & (~is_late) & in_win
            # Gate the vmapped work on any-chain-active (like the reinit
            # cond below): posterior draws and most warmup draws have
            # all-False masks, and the selects alone would re-run the full
            # O(C*d) switch/update every draw.
            da = jax.lax.cond(
                jnp.any(switch_mask),
                lambda d: _select_chains(switch_mask,
                                         jax.vmap(mm.switch)(d), d),
                lambda d: d, da)
            cw = jnp.where(switch_mask & (~is_early), next_window, cw)
            state = state._replace(diag_adapt=da)
            update_mask = (switch_mask
                           | ((draw - w.last_update) >= wp.update_freq))
            update_mask = update_mask & in_win
            enough = da.draw.count >= 3.0
            state = jax.lax.cond(
                jnp.any(update_mask),
                lambda s: strategy.adapt_update_masked(s, update_mask),
                lambda s: s, state)
            did_change = update_mask & enough
            state = state._replace(window=WindowState(
                current_window=cw,
                last_update=jnp.where(did_change, draw, w.last_update),
                has_initial=w.has_initial & (~did_change)))
            reinit_mask = did_change & w.has_initial
            use_late = is_late | (~in_win)

        # --- dual averaging advance (early: plain mean; late: symmetric) ---
        accept_stat = jnp.where(use_late, sym_acc, mean_acc)
        if config.cross_chain_step_size:
            pooled = jnp.mean(accept_stat)
            if config.axis_name is not None:
                pooled = jax.lax.pmean(pooled, config.axis_name)
            accept_stat = jnp.broadcast_to(pooled, accept_stat.shape)
        step_new = jax.vmap(partial(ss.advance, settings=sset))(
            state.step, accept_stat)
        step_state = jax.tree.map(
            lambda new, old: jnp.where(flags["advance_da"], new, old),
            step_new, state.step)

        # --- step size for the next draw ---
        def with_reinit(stp):
            # First mass-matrix change: re-run the coarse init search from the
            # current position with the new transform (adapt_strategy.rs:207-212).
            found = jax.vmap(
                partial(ss.init_search, logp_grad_fn=logp_grad, settings=sset,
                        kind=config.nuts.kind, ops=ops)
            )(k_jitter, draw_pt.q, state.transform)
            found = _maybe_pool_steps(found, config)
            return jax.vmap(ss.reset_from_found_step)(stp, found)

        def without_reinit(stp):
            return jax.vmap(
                lambda k, s, ubg: ss.apply_jitter(k, s, sset, ubg),
                in_axes=(0, 0, None),
            )(k_jitter, stp, flags["use_best_guess"])

        if reinit_mask is None:
            step_state = jax.lax.cond(flags["reinit_step_size"], with_reinit,
                                      without_reinit, step_state)
        else:
            # Per-chain first-mass-matrix-change: chains whose mask is set
            # get the init search (reset overwrites their DA state, so the
            # reference's skip-update_stepsize-on-this-draw is implicit);
            # the cond skips the search entirely on draws where no chain
            # reinits.
            def mixed(stp):
                return _select_chains(reinit_mask, with_reinit(stp),
                                      without_reinit(stp))

            step_state = jax.lax.cond(jnp.any(reinit_mask), mixed,
                                      without_reinit, step_state)
        state = state._replace(step=step_state,
                               draw_idx=state.draw_idx + 1)

        # --- per-draw stats record (dense; host compacts sparse events) ---
        stats = {
            "position": draw_pt.q,
            "depth": info.depth,
            "maxdepth_reached": info.reached_maxdepth,
            "diverging": info.diverging,
            "n_steps": info.n_steps,
            "step_size": state.step.step_size,
            "step_size_bar": jax.vmap(
                partial(ss.step_size_bar, settings=sset))(state.step),
            "mean_tree_accept": mean_acc,
            "mean_tree_accept_sym": sym_acc,
            "max_energy_error": info.max_energy_error,
            "logp": draw_pt.logp,
            "energy": info.energy,
            "energy_error": info.energy_error,
            "index_in_trajectory": info.idx_in_trajectory,
            "fisher_distance": jax.vmap(
                lambda z, zg: dsum(jnp.square(z + zg)))(draw_pt.z, draw_pt.zg),
            "transformation_index": state.transform.id,
            "tuning": jnp.broadcast_to(flags["is_tuning"], info.depth.shape),
        }
        if config.store_gradient:
            stats["gradient"] = draw_pt.g
        if config.store_unconstrained:
            stats["unconstrained_draw"] = draw_pt.q
        if config.store_transformed:
            stats["transformed_position"] = draw_pt.z
            stats["transformed_gradient"] = draw_pt.zg
        if config.store_divergences:
            stats["divergence_start"] = info.divergence.start_location
            stats["divergence_start_gradient"] = info.divergence.start_gradient
            stats["divergence_start_momentum"] = info.divergence.start_momentum
            stats["divergence_end"] = info.divergence.end_location
            stats["divergence_momentum"] = info.divergence.end_momentum
            stats["divergence_energy_error"] = info.divergence.energy_error
            # i32 message-analog of the reference's logp_function_error /
            # divergence message (hamiltonian.rs:26-55): 0 none, 1 energy,
            # 2 non-finite logp, 3 non-finite gradient.
            stats["divergence_reason"] = info.divergence.reason
        if config.store_mass_matrix:
            stats["mass_matrix_inv"] = state.transform.stds
            stats["transformation_mu"] = state.transform.mean
        if config.store_mass_matrix_eigs and state.transform.vecs is not None:
            # MatrixStats (low_rank.rs:210-222): padded directions carry
            # lam == 1 exactly, so the count of selected eigendirections is
            # the number of entries differing from 1.
            vals = jnp.square(state.transform.vals_sqrt)
            stats["mass_matrix_eigvals"] = vals
            stats["num_eigenvalues"] = jnp.sum(
                (vals != 1.0).astype(jnp.int32), axis=-1)

        return state, stats

    return draw_step


def init_chain_state(
    key,
    model,
    strategy,
    config: ChainConfig,
    num_chains: int,
    num_tune: int,
    dtype,
    init_positions: Optional[jax.Array] = None,
    init_retries: int = 500,
) -> ChainState:
    """Set up all chains: init positions, mass-matrix init, step-size search.

    Mirrors ``NutsChain::set_position`` + ``GlobalStrategy::init``
    (nuts-rs ``src/chain.rs:137-149``, ``src/adapt_strategy.rs:100-119``) and
    the init-position retry loop of ``src/sampler.rs:1133-1143``.
    """
    dim = model.dim
    key, k_init = jax.random.split(key)
    chain_keys = jax.random.split(key, num_chains)

    def find_position(k):
        def try_one(carry):
            k, _, _ = carry
            k, k_pos = jax.random.split(k)
            q = model.init_position(k_pos, dtype)
            logp, g = model.logp_and_grad(q)
            ok = jnp.isfinite(logp) & jnp.all(jnp.isfinite(g))
            return k, q, ok

        def cond(carry_it):
            (k, q, ok), it = carry_it
            return (~ok) & (it < init_retries)

        def body(carry_it):
            carry, it = carry_it
            return try_one(carry), it + 1

        carry = try_one((k, jnp.zeros(dim, dtype), jnp.asarray(False)))
        (k, q, ok), _ = jax.lax.while_loop(cond, body, (carry, 0))
        return q

    if init_positions is None:
        init_keys = jax.random.split(k_init, num_chains)
        q0 = jax.vmap(find_position)(init_keys)
    else:
        q0 = jnp.asarray(init_positions, dtype)

    def broadcast_chains(tree):
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (num_chains,) + jnp.shape(x)), tree)

    ops = getattr(strategy, "ops", AFFINE_OPS)
    transform = broadcast_chains(strategy.make_transform(dim, dtype))
    pt = jax.vmap(partial(init_point_from_q, logp_grad_fn=model.logp_and_grad,
                          ops=ops))(q0, transform)

    state = ChainState(
        pt=pt,
        transform=transform,
        diag_adapt=broadcast_chains(mm.new_diag_adapt_state(dim, dtype)),
        step=broadcast_chains(
            ss.new_step_size_state(config.step_size.initial_step, dtype)),
        keys=chain_keys,
        draw_idx=jnp.zeros((), jnp.int32),
        extra=strategy.init_extra(dim, num_tune, dtype, num_chains),
        window=(None if config.window_params is None else WindowState(
            current_window=jnp.full((num_chains,),
                                    config.window_params.init_window, dtype),
            last_update=jnp.zeros((num_chains,), jnp.int32),
            has_initial=jnp.ones((num_chains,), bool),
        )),
    )

    # Mass-matrix init from the first gradient, then the step-size search.
    state = strategy.init_mass_matrix(state)
    # Resync caches after transform change.
    pt = jax.vmap(partial(init_point_from_q, logp_grad_fn=model.logp_and_grad,
                          ops=ops))(state.pt.q, state.transform)
    state = state._replace(pt=pt)

    search_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(state.keys)
    found = jax.vmap(
        partial(ss.init_search, logp_grad_fn=model.logp_and_grad,
                settings=config.step_size, kind=config.nuts.kind, ops=ops)
    )(search_keys, state.pt.q, state.transform)
    found = _maybe_pool_steps(found, config)
    step = jax.vmap(ss.reset_from_found_step)(state.step, found)
    return state._replace(step=step)


def make_mclmc_draw_step(model, strategy, config: ChainConfig, mopts):
    """Scan body for the MCLMC sampler (nuts-rs ``MclmcChain::draw``,
    src/mclmc.rs:487-546): one mclmc_draw per chain + the shared adaptation
    machinery.  ``flags`` rows additionally carry ``resample_velocity``."""
    from .kernels.mclmc import mclmc_draw

    logp_grad = model.logp_and_grad
    sset = config.step_size
    ops = getattr(strategy, "ops", AFFINE_OPS)

    def draw_step(state: ChainState, flags):
        keys = jax.vmap(jax.random.split, in_axes=(0, None))(state.keys, 3)
        k_draw, k_jitter, k_next = keys[:, 0], keys[:, 1], keys[:, 2]

        draw_pt, info = jax.vmap(
            lambda k, pt, t, ss_: mclmc_draw(
                k, pt, t, ss_, logp_grad, mopts,
                flags["resample_velocity"], ops=ops)
        )(k_draw, state.pt, state.transform, state.step.step_size)

        state = state._replace(pt=draw_pt, keys=k_next)

        # --- adaptation: collector sees the trajectory end ---
        state = jax.lax.cond(
            flags["update_estimators"],
            lambda s: strategy.update_estimators(
                s, info.draw_q, info.draw_g, info.is_good_for_adapt,
                logp=info.draw_logp, energy_error=info.energy_change),
            lambda s: s, state)
        state = jax.lax.cond(flags["do_switch"], strategy.switch,
                             lambda s: s, state)
        state = jax.lax.cond(flags["do_update"], strategy.adapt_update,
                             lambda s: s, state)

        # Step size: jittered fixed value each draw (reference MCLMC presets
        # use StepSizeAdaptMethod::Fixed with the default 10% jitter).
        step_state = jax.vmap(
            lambda k, s, ubg: ss.apply_jitter(k, s, sset, ubg),
            in_axes=(0, 0, None),
        )(k_jitter, state.step, flags["use_best_guess"])
        state = state._replace(step=step_state, draw_idx=state.draw_idx + 1)

        stats = {
            "position": draw_pt.q,
            "diverging": info.diverging,
            "n_steps": info.num_steps,
            "energy_change": info.energy_change,
            "log_weight": info.log_weight,
            "average_step_size": info.average_step_size,
            "step_size": state.step.step_size,
            "logp": draw_pt.logp,
            "energy": draw_pt.energy,
            "fisher_distance": jax.vmap(
                lambda z, zg: dsum(jnp.square(z + zg)))(draw_pt.z, draw_pt.zg),
            "transformation_index": state.transform.id,
            "tuning": jnp.broadcast_to(flags["is_tuning"],
                                       info.diverging.shape),
        }
        if config.store_gradient:
            stats["gradient"] = draw_pt.g
        if config.store_unconstrained:
            stats["unconstrained_draw"] = draw_pt.q
        if config.store_divergences:
            stats["divergence_start"] = info.divergence.start_location
            stats["divergence_start_gradient"] = info.divergence.start_gradient
            stats["divergence_start_momentum"] = info.divergence.start_momentum
            stats["divergence_end"] = info.divergence.end_location
            stats["divergence_momentum"] = info.divergence.end_momentum
            stats["divergence_energy_error"] = info.divergence.energy_error
            # i32 message-analog of the reference's logp_function_error /
            # divergence message (hamiltonian.rs:26-55): 0 none, 1 energy,
            # 2 non-finite logp, 3 non-finite gradient.
            stats["divergence_reason"] = info.divergence.reason
        if config.store_mass_matrix:
            stats["mass_matrix_inv"] = state.transform.stds
            stats["transformation_mu"] = state.transform.mean
        return state, stats

    return draw_step


def make_async_posterior_runner(model, strategy, config: ChainConfig,
                                phase_start: int = 0):
    """Posterior-phase runner on the draw-asynchronous kernel.

    Signature matches the scan-based runners: ``(state, flags) -> (state,
    stats)`` with ``stats[name]`` shaped [k, C, ...].  Only usable when the
    transform is frozen and no per-leapfrog extras (gradients, divergence
    dumps, mass-matrix stats) are requested.
    """
    from .kernels.nuts_async import nuts_run_async

    logp_grad = model.logp_and_grad
    sset = config.step_size
    ops = getattr(strategy, "ops", AFFINE_OPS)

    def runner(state: ChainState, flags):
        k = flags["is_tuning"].shape[0]
        bars = jax.vmap(partial(ss.step_size_bar, settings=sset))(state.step)

        # Chunk-invariant RNG: per-draw keys are fold_in(chain_key,
        # global_draw_index); state.keys stays fixed across async chunks.
        jitter_first = state.draw_idx != phase_start
        last_pt, out = jax.vmap(
            lambda key, pt, t, step, bar: nuts_run_async(
                key, pt, t, step, bar, k, logp_grad, config.nuts,
                sset.jitter, draw_offset=state.draw_idx,
                jitter_first=jitter_first,
                resync_first=jnp.logical_not(jitter_first), ops=ops)
        )(state.keys, state.pt, state.transform, state.step.step_size, bars)

        state = state._replace(
            pt=last_pt,
            step=state.step._replace(step_size=out.step_size[:, -1]),
            draw_idx=state.draw_idx + k,
        )

        def t(x):  # [C, k, ...] -> [k, C, ...]
            return jnp.moveaxis(x, 0, 1)

        n = jnp.maximum(out.n_steps.astype(out.sum_accept.dtype), 1.0)
        stats = {
            "position": t(out.position),
            "depth": t(out.depth),
            "maxdepth_reached": t(out.maxdepth_reached),
            "diverging": t(out.diverging),
            "n_steps": t(out.n_steps),
            "step_size": t(out.step_size),
            "step_size_bar": jnp.broadcast_to(bars[None, :], (k,) + bars.shape),
            "mean_tree_accept": t(out.sum_accept / n),
            "mean_tree_accept_sym": t(out.sum_accept_sym / n),
            "max_energy_error": t(out.max_energy_error),
            "logp": t(out.logp),
            "energy": t(out.energy),
            "energy_error": t(out.energy_error),
            "index_in_trajectory": t(out.idx_in_trajectory),
            "fisher_distance": t(out.fisher_distance),
            "transformation_index": jnp.broadcast_to(
                state.transform.id[None, :], (k,) + state.transform.id.shape),
            "tuning": jnp.zeros((k,) + out.diverging.shape[:1], bool),
        }
        return state, stats

    return runner


def make_pallas_posterior_runner(model, strategy, config: ChainConfig,
                                 phase_start: int, base_seed: int):
    """Posterior-phase runner on the fully-fused Pallas engine.

    Only valid for diagonal transforms + Euclidean dynamics with default tree
    options and no extra stores; the model's logp must lower inside Pallas.
    RNG comes from the TPU hardware PRNG (or a hash fallback when
    interpreted), so results are reproducible per (seed, chunking) but follow
    a different stream than the XLA kernels.
    """
    from .kernels.nuts_pallas import nuts_pallas_run

    sset = config.step_size

    if model.pallas_logp_grad is not None:
        logp_grad_batched, pallas_args = model.pallas_logp_grad
    elif model.pallas_spec is not None:
        logp_fn_args, pallas_args = model.pallas_spec

        def logp_grad_batched(q, *args):  # [d, B] -> ([B], [d, B])
            f = lambda qq: logp_fn_args(qq, *args)
            return jax.vmap(jax.value_and_grad(f), in_axes=1,
                            out_axes=(0, 1))(q)
    else:
        pallas_args = ()

        def logp_grad_batched(q):
            return jax.vmap(model.logp_and_grad, in_axes=1, out_axes=(0, 1))(q)

    interpret = jax.default_backend() != "tpu"

    # Frozen-flow posterior (Fisher HMC with a learned transform): pooled
    # flow params are SHARED across chains, so the coupling MLPs run as
    # plain MXU matmuls over the chains-on-lanes layout (unlike the
    # per-chain low-rank transform, which measured 12-45x slower fused —
    # BASELINE.md).  Requires the FlowSpec to provide pallas hooks and
    # pooled training (per-chain params cannot be shared).
    spec = getattr(strategy, "spec", None)
    is_flow = bool(getattr(getattr(strategy, "ops", None), "is_flow", False))
    flow_proto = []
    if is_flow:
        if (spec is None or spec.pallas_forward is None
                or not strategy.flow_settings.pool_chains):
            return None
        proto_t = strategy.make_transform(model.dim, jnp.float32)
        flow_proto = spec.pallas_pack(proto_t.params)

    # VMEM budget: the whole sampler state + outputs live on-chip during a
    # launch.  Rough per-lane footprint (f32 words): stacks 6*(D+1)*d,
    # ~32 vectors of d, outputs K*(d+13) (double-buffered across the grid).
    # The block (chains per launch) is the largest tier whose footprint at
    # the minimum draw count (8) fits the budget — large d trades lane
    # occupancy for VMEM residency, which still beats the XLA path's
    # per-iteration HBM round-trips by orders of magnitude.
    dim = model.dim
    D = config.nuts.maxdepth
    args_bytes = 4 * sum(int(np.prod(a.shape)) for a in pallas_args)
    args_bytes += 4 * sum(int(np.prod(a.shape)) for a in flow_proto)
    fixed = 6 * (D + 1) * dim + 32 * dim + 4
    if is_flow:
        # autodiff through the flow keeps per-layer activations live during
        # the backward pass: ~2 passes x (hidden + ~4 d-vectors) per layer.
        n_layers = max(0, (len(flow_proto) - 2) // 7)
        hidden = max((int(a.shape[0]) for a in flow_proto), default=0)
        fixed += 2 * n_layers * (hidden + 4 * dim)
    # Pallas TPU requires the lane (chains) block dimension to be a multiple
    # of 128, so 128 is the smallest legal block: models whose VMEM-resident
    # state cannot fit at block 128 (d ≳ 200 at maxdepth 10 — the checkpoint
    # stacks are 6*(D+1)*d words/chain) fall back to the XLA kernels by
    # returning None here.
    tiers, cl_forced = _cl_tiers(dim)

    # Budget 12.5MB: empirically bracketed — the formula's 12.3MB estimate
    # for d=100 GLM at 256 lanes (incl. 0.4MB VMEM-replicated data)
    # compiles and runs (+23% measured, round 5), while the ld tier's
    # 16.3MB estimate is rejected by Mosaic (BASELINE.md round-5 negative
    # result); the physical scoped-VMEM limit is ~16MB.
    def pick_block(abytes):
        for tier in tiers:
            if cl_forced or (4 * tier * (fixed + 2 * 8 * (dim + 13))
                             + abytes <= 12_500_000):
                return tier
        return None

    # Likelihood-data residency: VMEM replication while the data fits (no
    # DMA churn), HBM streaming (StreamSpec double-buffered tiles) beyond
    # that.  Stream-only models (no dense pallas channel — the autodiff
    # fallback would capture the data arrays, which Mosaic rejects) go
    # straight to streaming.  Flows carry their own data channel.
    use_stream = False
    layout = "cl"
    stream_only = (model.pallas_stream is not None
                   and model.pallas_logp_grad is None
                   and model.pallas_spec is None)
    block = None if stream_only else pick_block(args_bytes)
    if block is None and model.pallas_stream is not None and not is_flow:
        spec_s = model.pallas_stream
        stream_bytes = 4 * 2 * spec_s.tile_rows * sum(
            int(np.prod(a.shape[1:])) for a in spec_s.args)
        block = pick_block(stream_bytes)
        use_stream = block is not None
        if use_stream:
            args_bytes = stream_bytes
    if block is None and not is_flow and not stream_only:
        # Large-d tier: dim-on-lanes layout (kernels/nuts_pallas.py
        # layout="ld") — chains ride sublanes in SMALL blocks while the
        # parameter axis fills the lanes, so the checkpoint stacks that
        # could never fit chains-on-lanes stay VMEM-resident (d in the
        # thousands; the reference's sample_1000_1000 regime,
        # benches/sample.rs:195-198).  Lane padding rounds d up to 128.
        dim_pad = -(-dim // 128) * 128
        # + (D+1)^2 for the ld tier's cross-dot matrix carries (czs in
        # kernels/nuts_pallas.py — (D+1) tensors of (D+1) scalars per chain).
        fixed_ld = (6 * (D + 1) + 32) * dim_pad + (D + 1) ** 2 + 64 * 128
        ld_tiers, ld_forced = _ld_tiers()
        for tier in ld_tiers:
            if ld_forced or (4 * tier * (fixed_ld + 2 * 8 * (dim_pad + 128))
                             + args_bytes <= 12_000_000):
                block = tier
                layout = "ld"
                fixed = fixed_ld
                break
    if block is None:
        return None
    budget_words = (13_000_000 - args_bytes) // (4 * block)
    if layout == "ld":
        dim_pad = -(-dim // 128) * 128
        MAX_K = int(max(8, min(64, (budget_words - fixed)
                               // (2 * (dim_pad + 128)))))
        # the hand-written [d, B]-oriented closed-form channel
        # (pallas_logp_grad) does not apply to the transposed layout;
        # rebuild the batched eval in [B, d] orientation.
        if model.pallas_spec is not None:
            logp_fn_args, pallas_args = model.pallas_spec

            def logp_grad_batched(q, *args):  # [B, d] -> ([B], [B, d])
                f = lambda qq: logp_fn_args(qq, *args)
                return jax.vmap(jax.value_and_grad(f), in_axes=0,
                                out_axes=(0, 0))(q)
        else:
            pallas_args = ()

            def logp_grad_batched(q):
                return jax.vmap(model.logp_and_grad, in_axes=0,
                                out_axes=(0, 0))(q)
    else:
        MAX_K = int(max(8, min(64, (budget_words - fixed)
                               // (2 * (dim + 13)))))

    def runner(state: ChainState, flags):
        k = flags["is_tuning"].shape[0]
        bars = jax.vmap(partial(ss.step_size_bar, settings=sset))(state.step)

        if is_flow:
            # flow mode: the q slot carries z (entering the flow needs its
            # host-side inverse — the state already holds z); the kernel
            # returns (q-space final, z-space final) in the (q, g) slots.
            flow_params0 = jax.tree.map(lambda v: v[0],
                                        state.transform.params)
            flow_arg = (spec.pallas_forward, spec.pallas_pack(flow_params0))
            pos_in = state.pt.z
            ones_d = jnp.ones_like(state.pt.q)
            stds_in, mean_in = ones_d, jnp.zeros_like(state.pt.q)
            logdet_in = jnp.zeros_like(state.pt.logp)
        else:
            flow_arg = None
            pos_in = state.pt.q
            stds_in, mean_in = state.transform.stds, state.transform.mean
            logdet_in = state.transform.logdet
        # `pos` threads the kernel's position operand between sub-launches:
        # q-space for the diagonal transform, z-space for flows (the aux_f
        # output slot carries the final z there).
        pos, g_f, logp_f = pos_in, state.pt.g, state.pt.logp
        q_f = state.pt.q
        step_in = state.step.step_size
        # Device-decorrelation salt: the kernel's PRNG stream is derived
        # from (scalar seed, program_id), so under shard_map every device
        # would otherwise replay the SAME stream for its local chain
        # blocks.  The first local chain's threefry key differs per shard
        # (keys are sharded over the chains mesh axis) and is part of the
        # checkpointed state, so resume stays bit-identical.
        dev_salt = jax.random.randint(
            state.keys[0], (), 0, 2**31 - 1, dtype=jnp.int32)

        # The kernel applies its step operand verbatim to the FIRST draw of a
        # launch (by design: the very first posterior draw keeps the
        # warmup-set step, as in the reference).  Threading the previous
        # launch's last USED step across sub-launch/chunk boundaries would
        # make that first draw reuse the previous draw's jitter sample, so
        # continuation launches get a freshly jittered first step instead
        # (keyed on the global draw index: deterministic, resume-safe).
        def launch_step(start_draw):
            kj = jax.vmap(lambda kc: jax.random.fold_in(
                jax.random.fold_in(kc, 0x6A17), start_draw))(state.keys)
            u = jax.vmap(lambda k_: jax.random.uniform(
                k_, (), bars.dtype,
                minval=1.0 - sset.jitter, maxval=1.0 + sset.jitter))(kj)
            return bars * u

        draws_parts, out_parts = [], []
        done = 0
        while done < k:
            kk = min(MAX_K, k - done)
            if sset.jitter is not None:
                if done == 0:
                    step_in = jnp.where(state.draw_idx == phase_start,
                                        step_in, launch_step(state.draw_idx))
                else:
                    step_in = launch_step(state.draw_idx + done)
            seed = (jnp.int32(base_seed & 0x7FFFFFFF)
                    ^ ((state.draw_idx + done)
                       * jnp.int32(2654435761 & 0x7FFFFFFF))
                    ^ dev_salt)
            q_f, aux_f, logp_f, dpart, opart = nuts_pallas_run(
                seed, pos, g_f, logp_f,
                stds_in, mean_in, logdet_in, step_in, bars,
                kk, logp_grad_batched, config.nuts, sset.jitter,
                interpret=interpret,
                model_args=() if use_stream else pallas_args, block=block,
                flow=flow_arg,
                stream=model.pallas_stream if use_stream else None,
                layout=layout,
            )
            pos = aux_f if is_flow else q_f
            g_f = aux_f
            step_in = opart["step_size"][:, -1]
            draws_parts.append(dpart)
            out_parts.append(opart)
            done += kk
        draws = jnp.concatenate(draws_parts, axis=1)
        out = {key: jnp.concatenate([o[key] for o in out_parts], axis=1)
               for key in out_parts[0] if key != "loop_iterations"}

        # rebuild a consistent Point at the final position
        if is_flow:
            # g_f slot holds the final z; recompute everything from it
            # through the flow (FlowOps.eval_from_z), exactly as the XLA
            # path would.
            z_f = g_f
            q_f, logp_f, g_f, zg_f, _ld = jax.vmap(
                lambda t_, z_: strategy.ops.eval_from_z(
                    t_, z_, model.logp_and_grad))(state.transform, z_f)
        else:
            from .transform.affine import grad_to_transformed, to_transformed

            z_f = jax.vmap(to_transformed)(state.transform, q_f)
            zg_f = jax.vmap(grad_to_transformed)(state.transform, g_f)
        pt = state.pt._replace(q=q_f, g=g_f, z=z_f, zg=zg_f, logp=logp_f)
        state = state._replace(
            pt=pt,
            step=state.step._replace(step_size=step_in),
            draw_idx=state.draw_idx + k,
        )

        def t(x):
            return jnp.moveaxis(x, 0, 1)

        n = jnp.maximum(out["n_steps"], 1.0)
        stats = {
            "position": t(draws),
            "depth": t(out["depth"].astype(jnp.int32)),
            "maxdepth_reached": t(out["maxdepth_reached"] > 0.5),
            "diverging": t(out["diverging"] > 0.5),
            "n_steps": t(out["n_steps"].astype(jnp.int32)),
            "step_size": t(out["step_size"]),
            "step_size_bar": jnp.broadcast_to(bars[None, :], (k,) + bars.shape),
            "mean_tree_accept": t(out["sum_accept"] / n),
            "mean_tree_accept_sym": t(out["sum_accept_sym"] / n),
            "max_energy_error": t(out["max_energy_error"]),
            "logp": t(out["logp"]),
            "energy": t(out["energy"]),
            "energy_error": t(out["energy_error"]),
            "index_in_trajectory": t(out["index_in_trajectory"].astype(jnp.int32)),
            "fisher_distance": t(out["fisher_distance"]),
            "transformation_index": jnp.broadcast_to(
                state.transform.id[None, :], (k,) + state.transform.id.shape),
            "tuning": jnp.zeros((k,) + bars.shape, bool),
        }
        return state, stats

    return runner


def make_pallas_warmup_runner(model, strategy, config: ChainConfig,
                              base_seed: int, use_grad_based: bool):
    """Warmup-phase runner on the fused Pallas engine.

    Runs whole chunks of tuning draws inside one ``pallas_call`` with the
    fg/bg Welford estimators, diagonal mass-matrix rule, and dual averaging
    executed in-kernel (see kernels/nuts_pallas.py, warmup section).  The
    step-size init-search re-run on the first mass-matrix change stays on the
    XLA path: it fires on the chunk whose last draw carries
    ``reinit_step_size`` (the sampler splits the warmup phase there).

    Signature matches the scan runners: ``(state, flags) -> (state, stats)``
    with ``stats[name]`` shaped [k, C, ...].
    """
    from .kernels.nuts_pallas import (
        FLAG_ADVANCE_DA, FLAG_DO_SWITCH, FLAG_DO_UPDATE, FLAG_UPDATE_EST,
        FLAG_USE_BEST, FLAG_USE_LATE,
        NFLAGS, NSCA, SCA_CNT_BG, SCA_CNT_FG, SCA_DA_CNT, SCA_DA_HBAR,
        SCA_DA_LS, SCA_DA_LSA, SCA_DA_MU, SCA_LOGDET, SCA_STEP, SCA_TID,
        nuts_pallas_warmup_run,
    )

    sset = config.step_size

    if model.pallas_logp_grad is not None:
        logp_grad_batched, pallas_args = model.pallas_logp_grad
    elif model.pallas_spec is not None:
        logp_fn_args, pallas_args = model.pallas_spec

        def logp_grad_batched(q, *args):  # [d, B] -> ([B], [d, B])
            f = lambda qq: logp_fn_args(qq, *args)
            return jax.vmap(jax.value_and_grad(f), in_axes=1,
                            out_axes=(0, 1))(q)
    elif model.pallas_stream is not None:
        # Stream-only model: no dense data channel for the warmup kernel
        # (the autodiff fallback would capture the data arrays, which
        # Mosaic rejects) — warmup stays on the XLA path.
        return None
    else:
        pallas_args = ()

        def logp_grad_batched(q):
            return jax.vmap(model.logp_and_grad, in_axes=1, out_axes=(0, 1))(q)

    interpret = jax.default_backend() != "tpu"
    dim = model.dim

    # VMEM budget, mirroring make_pallas_posterior_runner: the warmup launch
    # additionally keeps the 8 estimator planes (8*d words/lane) and the
    # outer-carry copies of q/g/stds/mean on-chip, and emits 15 stat rows per
    # draw.  The K-dependent output blocks ([K, d, B] draws + [K, 15, B]
    # stats) are double-buffered across the chain grid, hence the factor 2.
    # Draw count per pallas_call is capped accordingly and the chunk runs as
    # a sequence of sub-launches threading the adaptation state.
    D = config.nuts.maxdepth
    args_bytes = 4 * sum(int(np.prod(a.shape)) for a in pallas_args)
    fixed = 6 * (D + 1) * dim + 40 * dim + 8 * dim
    # Lane blocks must be multiples of 128 (see the posterior runner).
    tiers, cl_forced = _cl_tiers(dim)
    block = None
    layout = "cl"
    for tier in tiers:
        if cl_forced or (4 * tier * (fixed + 2 * 8 * (dim + 15))
                         + args_bytes <= 12_000_000):
            block = tier
            break
    if block is None:
        # Large-d tier: dim-on-lanes layout, mirroring the posterior
        # runner's ld fallback (chains on sublanes in small blocks; the
        # checkpoint stacks + estimator planes stay VMEM-resident at d in
        # the thousands).
        dim_pad = -(-dim // 128) * 128
        # + (D+1)^2 for the ld cross-dot matrix (see the posterior runner).
        fixed_ld = ((6 * (D + 1) + 48) * dim_pad + (D + 1) ** 2
                    + 64 * 128)
        ld_tiers, ld_forced = _ld_tiers()
        for tier in ld_tiers:
            if ld_forced or (4 * tier * (fixed_ld + 2 * 8 * (dim_pad + 128))
                             + args_bytes <= 12_000_000):
                block = tier
                layout = "ld"
                fixed = fixed_ld
                break
    if block is None:
        return None
    budget_words = (13_000_000 - args_bytes) // (4 * block)
    if layout == "ld":
        dim_pad = -(-dim // 128) * 128
        MAX_K = int(max(8, min(64, (budget_words - fixed)
                               // (2 * (dim_pad + 128)))))
        # rebuild the batched eval in [B, d] orientation (the [d, B]
        # closed-form channel does not apply; see the posterior runner).
        if model.pallas_spec is not None:
            logp_fn_args, pallas_args = model.pallas_spec

            def logp_grad_batched(q, *args):  # [B, d] -> ([B], [B, d])
                f = lambda qq: logp_fn_args(qq, *args)
                return jax.vmap(jax.value_and_grad(f), in_axes=0,
                                out_axes=(0, 0))(q)
        else:
            pallas_args = ()

            def logp_grad_batched(q):
                return jax.vmap(model.logp_and_grad, in_axes=0,
                                out_axes=(0, 0))(q)
    else:
        MAX_K = int(max(8, min(64, (budget_words - fixed)
                               // (2 * (dim + 15)))))

    def runner(state: ChainState, flags):
        k = flags["is_tuning"].shape[0]
        dtype = state.pt.q.dtype

        flag_cols = jnp.zeros((k, NFLAGS), jnp.int32)
        for col, name in [(FLAG_UPDATE_EST, "update_estimators"),
                          (FLAG_DO_UPDATE, "do_update"),
                          (FLAG_ADVANCE_DA, "advance_da"),
                          (FLAG_USE_LATE, "use_late_estimator"),
                          (FLAG_USE_BEST, "use_best_guess"),
                          (FLAG_DO_SWITCH, "do_switch")]:
            flag_cols = flag_cols.at[:, col].set(
                flags[name].astype(jnp.int32))

        # pack estimator planes [C, 8, d] and scalar rows [C, NSCA]
        a = state.diag_adapt
        est = jnp.stack([
            a.draw.mean, a.draw.var_sum, a.grad.mean, a.grad.var_sum,
            a.draw_bg.mean, a.draw_bg.var_sum, a.grad_bg.mean,
            a.grad_bg.var_sum,
        ], axis=1)
        sca = jnp.zeros((state.pt.q.shape[0], NSCA), dtype)
        for row, val in [
            (SCA_STEP, state.step.step_size),
            (SCA_DA_LS, state.step.log_step),
            (SCA_DA_LSA, state.step.log_step_adapted),
            (SCA_DA_HBAR, state.step.hbar),
            (SCA_DA_MU, state.step.mu),
            (SCA_DA_CNT, state.step.count),
            (SCA_CNT_FG, a.draw.count),
            (SCA_CNT_BG, a.draw_bg.count),
            (SCA_TID, state.transform.id.astype(dtype)),
            (SCA_LOGDET, state.transform.logdet),
        ]:
            sca = sca.at[:, row].set(val)

        q_f, g_f, logp_f = state.pt.q, state.pt.g, state.pt.logp
        stds_f, mean_f = state.transform.stds, state.transform.mean
        est_f, sca_f = est, sca
        # Same device-decorrelation salt as the posterior runner: distinct
        # PRNG streams per mesh shard (no-op semantics change otherwise —
        # still a pure function of the checkpointed state).
        dev_salt = jax.random.randint(
            state.keys[0], (), 0, 2**31 - 1, dtype=jnp.int32)
        draws_parts, out_parts = [], []
        done = 0
        while done < k:
            kk = min(MAX_K, k - done)
            seed = (jnp.int32(base_seed & 0x7FFFFFFF)
                    ^ ((state.draw_idx + done)
                       * jnp.int32(2654435761 & 0x7FFFFFFF))
                    ^ dev_salt)
            (q_f, g_f, logp_f, stds_f, mean_f, est_f, sca_f, dpart,
             opart) = nuts_pallas_warmup_run(
                seed, flag_cols[done:done + kk], q_f, g_f, logp_f,
                stds_f, mean_f, est_f, sca_f,
                logp_grad_batched, config.nuts, sset, use_grad_based,
                interpret=interpret, model_args=pallas_args, block=block,
                layout=layout)
            draws_parts.append(dpart)
            out_parts.append(opart)
            done += kk
        draws = (draws_parts[0] if len(draws_parts) == 1
                 else jnp.concatenate(draws_parts, axis=1))
        out = {key: (out_parts[0][key] if len(out_parts) == 1
                     else jnp.concatenate([o[key] for o in out_parts], axis=1))
               for key in out_parts[0] if key != "loop_iterations"}

        q_f = q_f.astype(dtype)
        g_f = g_f.astype(dtype)
        stds_f = stds_f.astype(dtype)
        mean_f = mean_f.astype(dtype)
        est_f = est_f.astype(dtype)
        sca_f = sca_f.astype(dtype)

        transform = state.transform._replace(
            stds=stds_f, mean=mean_f, inv_stds=1.0 / stds_f,
            logdet=sca_f[:, SCA_LOGDET],
            id=sca_f[:, SCA_TID].astype(jnp.int32))
        rv = lambda m, v, c: mm.RunningVariance(mean=m, var_sum=v, count=c)
        diag_adapt = mm.DiagAdaptState(
            draw=rv(est_f[:, 0], est_f[:, 1], sca_f[:, SCA_CNT_FG]),
            grad=rv(est_f[:, 2], est_f[:, 3], sca_f[:, SCA_CNT_FG]),
            draw_bg=rv(est_f[:, 4], est_f[:, 5], sca_f[:, SCA_CNT_BG]),
            grad_bg=rv(est_f[:, 6], est_f[:, 7], sca_f[:, SCA_CNT_BG]),
        )
        step = state.step._replace(
            log_step=sca_f[:, SCA_DA_LS],
            log_step_adapted=sca_f[:, SCA_DA_LSA],
            hbar=sca_f[:, SCA_DA_HBAR],
            mu=sca_f[:, SCA_DA_MU],
            count=sca_f[:, SCA_DA_CNT],
            step_size=sca_f[:, SCA_STEP],
        )
        z_f = jax.vmap(to_transformed_)(transform, q_f)
        zg_f = jax.vmap(grad_to_transformed_)(transform, g_f)
        pt = state.pt._replace(q=q_f, g=g_f, z=z_f, zg=zg_f,
                               logp=logp_f.astype(dtype))
        state = state._replace(pt=pt, transform=transform,
                               diag_adapt=diag_adapt, step=step,
                               draw_idx=state.draw_idx + k)

        # First-mass-matrix-change step-size re-init (adapt_strategy.rs:207-212)
        # fires when this chunk's last draw carries the flag.
        def with_reinit(st):
            keys = jax.vmap(jax.random.fold_in)(
                st.keys, jnp.broadcast_to(st.draw_idx, st.keys.shape[:1]))
            found = jax.vmap(
                partial(ss.init_search, logp_grad_fn=model.logp_and_grad,
                        settings=sset, kind=config.nuts.kind))(
                keys, st.pt.q, st.transform)
            found = _maybe_pool_steps(found, config)
            return st._replace(
                step=jax.vmap(ss.reset_from_found_step)(st.step, found))

        state = jax.lax.cond(flags["reinit_step_size"][-1], with_reinit,
                             lambda st: st, state)

        def t(x):
            return jnp.moveaxis(x, 0, 1).astype(dtype)

        n = jnp.maximum(out["n_steps"], 1.0)
        stats = {
            "position": t(draws),
            "depth": t(out["depth"]).astype(jnp.int32),
            "maxdepth_reached": t(out["maxdepth_reached"]) > 0.5,
            "diverging": t(out["diverging"]) > 0.5,
            "n_steps": t(out["n_steps"]).astype(jnp.int32),
            "step_size": t(out["step_size"]),
            "step_size_bar": t(out["step_size_bar"]),
            "mean_tree_accept": t(out["sum_accept"] / n),
            "mean_tree_accept_sym": t(out["sum_accept_sym"] / n),
            "max_energy_error": t(out["max_energy_error"]),
            "logp": t(out["logp"]),
            "energy": t(out["energy"]),
            "energy_error": t(out["energy_error"]),
            "index_in_trajectory": t(out["index_in_trajectory"]).astype(jnp.int32),
            "fisher_distance": t(out["fisher_distance"]),
            "transformation_index": t(out["transformation_index"]).astype(jnp.int32),
            "tuning": jnp.broadcast_to(
                flags["is_tuning"][:, None],
                (k, state.pt.q.shape[0])).astype(bool),
        }
        return state, stats

    return runner


def make_pallas_mclmc_posterior_runner(model, strategy, config: ChainConfig,
                                       mopts, phase_start: int,
                                       base_seed: int):
    """MCLMC posterior-phase runner on the fused Pallas engine.

    Valid for frozen diagonal transforms with no extra stores; the posterior
    phase never fully resamples the momentum (``MclmcSettings.extra_flags``
    only sets ``resample_velocity`` on draw 0 and at the trajectory switch,
    both inside warmup), so the velocity threads through the kernel's
    ``fin_v`` slot between launches.  Signature matches the scan runners:
    ``(state, flags) -> (state, stats)`` with stats[name] shaped [k, C, ...].
    """
    from .kernels.mclmc_pallas import mclmc_pallas_run

    sset = config.step_size

    if model.pallas_logp_grad is not None:
        logp_grad_batched, pallas_args = model.pallas_logp_grad
    elif model.pallas_spec is not None:
        logp_fn_args, pallas_args = model.pallas_spec

        def logp_grad_batched(q, *args):  # [d, B] -> ([B], [d, B])
            f = lambda qq: logp_fn_args(qq, *args)
            return jax.vmap(jax.value_and_grad(f), in_axes=1,
                            out_axes=(0, 1))(q)
    elif model.pallas_stream is not None:
        # No HBM-streaming variant of the MCLMC kernel yet.
        return None
    else:
        pallas_args = ()

        def logp_grad_batched(q):
            return jax.vmap(model.logp_and_grad, in_axes=1, out_axes=(0, 1))(q)

    interpret = jax.default_backend() != "tpu"

    # VMEM budget: no checkpoint stacks here — the carry is ~8 d-vectors
    # plus ~16 body temporaries; outputs K*(d + NSTATS_M) double-buffered.
    dim = model.dim
    args_bytes = 4 * sum(int(np.prod(a.shape)) for a in pallas_args)
    fixed = 32 * dim + 64
    block = None
    for tier in (256, 128):
        if 4 * tier * (fixed + 2 * 8 * (dim + 8)) + args_bytes <= 12_000_000:
            block = tier
            break
    if block is None:
        return None
    budget_words = (13_000_000 - args_bytes) // (4 * block)
    MAX_K = int(max(8, min(64, (budget_words - fixed) // (2 * (dim + 8)))))

    def runner(state: ChainState, flags):
        k = flags["is_tuning"].shape[0]
        bars = jax.vmap(partial(ss.step_size_bar, settings=sset))(state.step)

        pos, g_f, logp_f, v_f = (state.pt.q, state.pt.g, state.pt.logp,
                                 state.pt.v)
        step_in = state.step.step_size
        dev_salt = jax.random.randint(
            state.keys[0], (), 0, 2**31 - 1, dtype=jnp.int32)

        def launch_step(start_draw):
            kj = jax.vmap(lambda kc: jax.random.fold_in(
                jax.random.fold_in(kc, 0x6A17), start_draw))(state.keys)
            u = jax.vmap(lambda k_: jax.random.uniform(
                k_, (), bars.dtype,
                minval=1.0 - sset.jitter, maxval=1.0 + sset.jitter))(kj)
            return bars * u

        draws_parts, out_parts = [], []
        done = 0
        while done < k:
            kk = min(MAX_K, k - done)
            if sset.jitter is not None:
                if done == 0:
                    step_in = jnp.where(state.draw_idx == phase_start,
                                        step_in, launch_step(state.draw_idx))
                else:
                    step_in = launch_step(state.draw_idx + done)
            seed = (jnp.int32(base_seed & 0x7FFFFFFF)
                    ^ ((state.draw_idx + done)
                       * jnp.int32(2654435761 & 0x7FFFFFFF))
                    ^ dev_salt)
            pos, g_f, logp_f, v_f, dpart, opart = mclmc_pallas_run(
                seed, pos, g_f, logp_f, v_f,
                state.transform.stds, state.transform.mean,
                state.transform.logdet, step_in, bars,
                kk, logp_grad_batched, mopts, sset.jitter,
                interpret=interpret, model_args=pallas_args, block=block,
            )
            step_in = opart["step_size"][:, -1]
            draws_parts.append(dpart)
            out_parts.append(opart)
            done += kk
        draws = jnp.concatenate(draws_parts, axis=1)
        out = {key: jnp.concatenate([o[key] for o in out_parts], axis=1)
               for key in out_parts[0] if key != "loop_iterations"}

        z_f = jax.vmap(to_transformed_)(state.transform, pos)
        zg_f = jax.vmap(grad_to_transformed_)(state.transform, g_f)
        if mopts.kind is KineticKind.MICROCANONICAL:
            ke_f = jnp.zeros_like(logp_f)
        else:
            ke_f = 0.5 * jnp.sum(v_f * v_f, axis=-1)
        pt = state.pt._replace(q=pos, g=g_f, z=z_f, zg=zg_f, logp=logp_f,
                               v=v_f, ke=ke_f)
        state = state._replace(
            pt=pt,
            step=state.step._replace(step_size=step_in),
            draw_idx=state.draw_idx + k,
        )

        def t(x):
            return jnp.moveaxis(x, 0, 1)

        e_change = t(out["energy_change"])
        stats = {
            "position": t(draws),
            "diverging": t(out["diverging"] > 0.5),
            "n_steps": t(out["n_steps"].astype(jnp.int32)),
            "energy_change": e_change,
            # nuts-rs stores energy_change as the log weight (mclmc.rs:441-2)
            "log_weight": e_change,
            "average_step_size": t(out["average_step_size"]),
            "step_size": t(out["step_size"]),
            "logp": t(out["logp"]),
            "energy": t(out["energy"]),
            "fisher_distance": t(out["fisher_distance"]),
            "transformation_index": jnp.broadcast_to(
                state.transform.id[None, :], (k,) + state.transform.id.shape),
            "tuning": jnp.zeros((k, state.pt.q.shape[0]), bool),
        }
        return state, stats

    return runner


def make_pallas_mclmc_warmup_runner(model, strategy, config: ChainConfig,
                                    mopts, base_seed: int):
    """MCLMC warmup-phase runner on the fused Pallas engine.

    Runs whole chunks of tuning draws inside one ``pallas_call`` per
    chain-group with the fg/bg Welford estimators, window switches, and the
    diagonal mass-matrix rule in-kernel (kernels/mclmc_pallas.py, warmup
    section) — the MCLMC analog of :func:`make_pallas_warmup_runner`
    (reference warmup loop: src/mclmc.rs:487-546 + adapt_strategy.rs).
    MCLMC's step size is FIXED with per-draw jitter, so there is no
    dual-averaging state and no step-size-reinit phase split.  Signature
    matches the scan runners: ``(state, flags) -> (state, stats)``.
    """
    from .kernels.mclmc_pallas import (
        MW_FLAG_RESAMPLE, MSCA_CNT_BG, MSCA_CNT_FG, MSCA_LOGDET, MSCA_TID,
        NSCA_M, mclmc_pallas_warmup_run,
    )
    from .kernels.nuts_pallas import (
        FLAG_DO_SWITCH, FLAG_DO_UPDATE, FLAG_UPDATE_EST, NFLAGS,
    )

    sset = config.step_size

    if model.pallas_logp_grad is not None:
        logp_grad_batched, pallas_args = model.pallas_logp_grad
    elif model.pallas_spec is not None:
        logp_fn_args, pallas_args = model.pallas_spec

        def logp_grad_batched(q, *args):  # [d, B] -> ([B], [d, B])
            f = lambda qq: logp_fn_args(qq, *args)
            return jax.vmap(jax.value_and_grad(f), in_axes=1,
                            out_axes=(0, 1))(q)
    elif model.pallas_stream is not None:
        return None
    else:
        pallas_args = ()

        def logp_grad_batched(q):
            return jax.vmap(model.logp_and_grad, in_axes=1, out_axes=(0, 1))(q)

    interpret = jax.default_backend() != "tpu"
    use_grad_based = config.use_grad_based_estimate

    # VMEM budget: the MCLMC carry (~12 d-vectors) + est planes in/out
    # (2*8*d) + outer q/g/stds/mean copies; outputs K*(d + 9) double-buffered.
    dim = model.dim
    args_bytes = 4 * sum(int(np.prod(a.shape)) for a in pallas_args)
    fixed = 48 * dim + 128
    block = None
    for tier in (256, 128):
        if 4 * tier * (fixed + 2 * 8 * (dim + 9)) + args_bytes <= 12_000_000:
            block = tier
            break
    if block is None:
        return None
    budget_words = (13_000_000 - args_bytes) // (4 * block)
    MAX_K = int(max(8, min(64, (budget_words - fixed) // (2 * (dim + 9)))))

    def runner(state: ChainState, flags):
        k = flags["is_tuning"].shape[0]
        dtype = state.pt.q.dtype

        flag_cols = jnp.zeros((k, NFLAGS), jnp.int32)
        for col, name in [(FLAG_UPDATE_EST, "update_estimators"),
                          (FLAG_DO_UPDATE, "do_update"),
                          (FLAG_DO_SWITCH, "do_switch"),
                          (MW_FLAG_RESAMPLE, "resample_velocity")]:
            flag_cols = flag_cols.at[:, col].set(
                flags[name].astype(jnp.int32))

        a = state.diag_adapt
        est = jnp.stack([
            a.draw.mean, a.draw.var_sum, a.grad.mean, a.grad.var_sum,
            a.draw_bg.mean, a.draw_bg.var_sum, a.grad_bg.mean,
            a.grad_bg.var_sum,
        ], axis=1)
        sca = jnp.zeros((state.pt.q.shape[0], NSCA_M), dtype)
        for row, val in [
            (MSCA_TID, state.transform.id.astype(dtype)),
            (MSCA_LOGDET, state.transform.logdet),
            (MSCA_CNT_FG, a.draw.count),
            (MSCA_CNT_BG, a.draw_bg.count),
        ]:
            sca = sca.at[:, row].set(val)

        q_f, g_f, logp_f, v_f = (state.pt.q, state.pt.g, state.pt.logp,
                                 state.pt.v)
        stds_f, mean_f = state.transform.stds, state.transform.mean
        est_f, sca_f = est, sca
        dev_salt = jax.random.randint(
            state.keys[0], (), 0, 2**31 - 1, dtype=jnp.int32)

        draws_parts, out_parts = [], []
        done = 0
        while done < k:
            kk = min(MAX_K, k - done)
            seed = (jnp.int32(base_seed & 0x7FFFFFFF)
                    ^ ((state.draw_idx + done)
                       * jnp.int32(2654435761 & 0x7FFFFFFF))
                    ^ dev_salt)
            (q_f, g_f, logp_f, v_f, stds_f, mean_f, est_f, sca_f, dpart,
             opart) = mclmc_pallas_warmup_run(
                seed, flag_cols[done:done + kk], q_f, g_f, logp_f, v_f,
                stds_f, mean_f, est_f, sca_f,
                logp_grad_batched, mopts, sset, use_grad_based,
                interpret=interpret, model_args=pallas_args, block=block)
            draws_parts.append(dpart)
            out_parts.append(opart)
            done += kk
        draws = (draws_parts[0] if len(draws_parts) == 1
                 else jnp.concatenate(draws_parts, axis=1))
        out = {key: (out_parts[0][key] if len(out_parts) == 1
                     else jnp.concatenate([o[key] for o in out_parts], axis=1))
               for key in out_parts[0] if key != "loop_iterations"}

        q_f = q_f.astype(dtype)
        g_f = g_f.astype(dtype)
        v_f = v_f.astype(dtype)
        stds_f = stds_f.astype(dtype)
        mean_f = mean_f.astype(dtype)
        est_f = est_f.astype(dtype)
        sca_f = sca_f.astype(dtype)

        transform = state.transform._replace(
            stds=stds_f, mean=mean_f, inv_stds=1.0 / stds_f,
            logdet=sca_f[:, MSCA_LOGDET],
            id=sca_f[:, MSCA_TID].astype(jnp.int32))
        rv = lambda m, v_, c: mm.RunningVariance(mean=m, var_sum=v_, count=c)
        diag_adapt = mm.DiagAdaptState(
            draw=rv(est_f[:, 0], est_f[:, 1], sca_f[:, MSCA_CNT_FG]),
            grad=rv(est_f[:, 2], est_f[:, 3], sca_f[:, MSCA_CNT_FG]),
            draw_bg=rv(est_f[:, 4], est_f[:, 5], sca_f[:, MSCA_CNT_BG]),
            grad_bg=rv(est_f[:, 6], est_f[:, 7], sca_f[:, MSCA_CNT_BG]),
        )
        logp_f2 = logp_f.astype(dtype)
        z_f = jax.vmap(to_transformed_)(transform, q_f)
        zg_f = jax.vmap(grad_to_transformed_)(transform, g_f)
        if mopts.kind is KineticKind.MICROCANONICAL:
            ke_f = jnp.zeros_like(logp_f2)
        else:
            ke_f = 0.5 * jnp.sum(v_f * v_f, axis=-1)
        pt = state.pt._replace(q=q_f, g=g_f, z=z_f, zg=zg_f, logp=logp_f2,
                               v=v_f, ke=ke_f,
                               logdet=sca_f[:, MSCA_LOGDET])
        # Step for the next phase's first draw: the fixed value with a fresh
        # jitter factor drawn from the chain keys (apply_jitter semantics) so
        # the posterior phase starts from a reproducible checkpointed step.
        step_next = jnp.full_like(logp_f2, float(sset.fixed_value))
        if sset.jitter is not None:
            kj = jax.vmap(lambda kc: jax.random.fold_in(
                jax.random.fold_in(kc, 0x6A17), state.draw_idx + k))(
                state.keys)
            u = jax.vmap(lambda k_: jax.random.uniform(
                k_, (), dtype, minval=1.0 - sset.jitter,
                maxval=1.0 + sset.jitter))(kj)
            step_next = step_next * u
        state = state._replace(
            pt=pt,
            transform=transform,
            diag_adapt=diag_adapt,
            step=state.step._replace(step_size=step_next),
            draw_idx=state.draw_idx + k,
        )

        def t(x):
            return jnp.moveaxis(x, 0, 1)

        e_change = t(out["energy_change"])
        stats = {
            "position": t(draws),
            "diverging": t(out["diverging"] > 0.5),
            "n_steps": t(out["n_steps"].astype(jnp.int32)),
            "energy_change": e_change,
            "log_weight": e_change,
            "average_step_size": t(out["average_step_size"]),
            "step_size": t(out["step_size"]),
            "logp": t(out["logp"]),
            "energy": t(out["energy"]),
            "fisher_distance": t(out["fisher_distance"]),
            "transformation_index": t(
                out["transformation_index"].astype(jnp.int32)),
            "tuning": jnp.ones((k, state.pt.q.shape[0]), bool),
        }
        return state, stats

    return runner
