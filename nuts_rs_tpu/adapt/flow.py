"""Flow (learned transform) adaptation strategy.

Mirrors nuts-rs ``src/external_adapt_strategy.rs`` (``ExternalTransformAdaptation``):
a step-size-only warmup with the transformation refit from collected draws —
every 10 draws for the first 100, then every ``transform_update_freq`` — and a
final ``step_size_window`` fraction of warmup that only tunes the step size.
The reference's ``DrawCollector`` filter (finite position/gradient, energy
error below ``transform_train_max_energy_error``) gates which draws enter the
training window.

The flow itself is a :class:`~nuts_rs_tpu.transform.ops.FlowSpec`
(JAX-native replacement for the reference's FFI flow hooks); refits run as
vmapped-over-chains Adam loops under a scalar ``lax.cond``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..transform.ops import FlowOps, FlowSpec, FlowTransform
from .schedule import AdaptSchedule


@dataclasses.dataclass(frozen=True)
class FlowAdaptSettings:
    """nuts-rs ``FlowSettings`` (external_adapt_strategy.rs:17-40)."""

    step_size_window: float = 0.07
    transform_update_freq: int = 128
    transform_train_max_energy_error: float = 20.0
    # Collect every leapfrog point instead of one point per draw
    # (external_adapt_strategy.rs:21,35: default false, matching here).  The
    # NUTS kernel then fills fixed [2^maxdepth] orbit buffers per draw.
    use_orbit_for_training: bool = False
    window_capacity: Optional[int] = None
    # Train ONE shared flow from every chain's window instead of one flow
    # per chain (no reference counterpart — its flow preset defaults to a
    # single chain, src/sampler.rs:390).  With C > 1 chains this multiplies
    # training coverage by C (different chains explore different regions of
    # a multiscale target) and removes the per-chain wedging mode where one
    # chain's diverged refit freezes that chain for the rest of the run.
    pool_chains: bool = True


class FlowWindow(NamedTuple):
    """Per-chain training window: all good draws so far (the reference's
    DrawCollector accumulates across the whole warmup, chain.rs:79)."""

    draws: jax.Array   # [cap, d]
    grads: jax.Array   # [cap, d]
    logps: jax.Array   # [cap]
    count: jax.Array   # [] i32


def new_flow_window(cap, dim, dtype) -> FlowWindow:
    return FlowWindow(
        draws=jnp.zeros((cap, dim), dtype),
        grads=jnp.zeros((cap, dim), dtype),
        logps=jnp.zeros(cap, dtype),
        count=jnp.zeros((), jnp.int32),
    )


def flow_push(w: FlowWindow, q, g, logp, include) -> FlowWindow:
    cap = w.draws.shape[0]
    ok = include & (w.count < cap)
    slot = jnp.minimum(w.count, cap - 1)
    sel = jnp.asarray(ok, w.draws.dtype)
    draws = jax.lax.dynamic_update_slice(
        w.draws, (sel * q + (1 - sel) * w.draws[slot])[None, :],
        (slot, jnp.int32(0)))
    grads = jax.lax.dynamic_update_slice(
        w.grads, (sel * g + (1 - sel) * w.grads[slot])[None, :],
        (slot, jnp.int32(0)))
    logps = w.logps.at[slot].set(jnp.where(ok, logp, w.logps[slot]))
    return FlowWindow(draws=draws, grads=grads, logps=logps,
                      count=w.count + jnp.asarray(ok, jnp.int32))


def build_flow_schedule(num_tune: int, num_draws: int,
                        opts: FlowAdaptSettings) -> AdaptSchedule:
    """Per-draw flags replicating ``ExternalTransformAdaptation::adapt``
    (external_adapt_strategy.rs:191-237) by draw index."""
    total = num_tune + num_draws
    final_window = int(num_tune * (1.0 - opts.step_size_window))

    z = lambda: np.zeros(total, bool)
    is_tuning, update_est, do_update = z(), z(), z()
    use_late, use_best, advance = z(), z(), z()

    for draw in range(total):
        if draw >= num_tune:
            use_best[draw] = True
            continue
        is_tuning[draw] = True
        advance[draw] = True
        update_est[draw] = True
        if draw < final_window:
            if draw < 100:
                if draw > 0 and draw % 10 == 0:
                    do_update[draw] = True
            elif draw % opts.transform_update_freq == 0:
                do_update[draw] = True
        else:
            use_late[draw] = True
            use_best[draw] = draw == num_tune - 1

    return AdaptSchedule(
        is_tuning=is_tuning,
        update_estimators=update_est,
        do_switch=np.zeros(total, bool),
        do_update=do_update,
        use_late_estimator=use_late,
        reinit_step_size=np.zeros(total, bool),
        use_best_guess=use_best,
        advance_da=advance,
    )


class FlowStrategy:
    """Strategy protocol implementation for learned-flow transforms."""

    def __init__(self, config, settings, spec: FlowSpec):
        self.config = config
        self.spec = spec
        self.ops = FlowOps(spec)
        self.flow_settings: FlowAdaptSettings = getattr(
            settings, "flow", FlowAdaptSettings())
        self._num_tune = getattr(settings, "num_tune", 1500)
        self.use_orbit = self.flow_settings.use_orbit_for_training

    def make_transform(self, dim, dtype):
        # Placeholder identity-ish params; replaced in init_mass_matrix once
        # the init position and gradient are known.
        params = self.spec.init(jax.random.key(0), dim,
                                jnp.zeros(dim, dtype), jnp.ones(dim, dtype))
        return FlowTransform(params=params, id=jnp.asarray(-1, jnp.int32))

    def init_extra(self, dim, num_tune, dtype, num_chains):
        # Orbit mode accumulates ~n_steps points per draw, so the default
        # window is wider (the reference's Vec grows unboundedly; a fixed
        # masked window keeps shapes static on device).
        default_cap = (min(num_tune * 8, 32768) if self.use_orbit
                       else num_tune)
        cap = self.flow_settings.window_capacity or default_cap
        w = new_flow_window(cap, dim, dtype)
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (num_chains,) + x.shape), w)

    def init_mass_matrix(self, state):
        """init_transformation from the first position/gradient
        (transformed_hamiltonian.rs:463-481)."""
        dim = state.pt.q.shape[-1]
        keys = jax.vmap(lambda k: jax.random.fold_in(k, 7))(state.keys)
        params = jax.vmap(
            lambda k, q, g: self.spec.init(k, dim, q, g)
        )(keys, state.pt.q, state.pt.g)
        c = state.pt.q.shape[0]
        transform = FlowTransform(
            params=params, id=jnp.zeros(c, jnp.int32))
        return state._replace(transform=transform)

    def update_estimators(self, state, q, g, is_good, logp=None,
                          energy_error=None):
        # DrawCollector filter (external_adapt_strategy.rs:129-152).
        err_ok = jnp.isfinite(energy_error) & (
            energy_error <= self.flow_settings.transform_train_max_energy_error)
        finite = (jnp.all(jnp.isfinite(q), axis=-1)
                  & jnp.all(jnp.isfinite(g), axis=-1))
        include = err_ok & finite
        window = jax.vmap(flow_push)(state.extra, q, g, logp, include)
        return state._replace(extra=window)

    def update_estimators_orbit(self, state, info):
        """Push every valid leapfrog point of this draw into the training
        window (DrawCollector with use_orbit_for_training,
        external_adapt_strategy.rs:93-128); same finite/energy-error filter
        as the per-draw path, applied per point."""
        cap = info.orbit_q.shape[1]
        max_err = self.flow_settings.transform_train_max_energy_error

        def push_chain(w, oq, og, olp, oerr, n):
            n_valid = jnp.minimum(n, cap)

            def body(i, w):
                q, g = oq[i], og[i]
                include = ((i < n_valid)
                           & jnp.isfinite(oerr[i]) & (oerr[i] <= max_err)
                           & jnp.all(jnp.isfinite(q))
                           & jnp.all(jnp.isfinite(g)))
                return flow_push(w, q, g, olp[i], include)

            return jax.lax.fori_loop(0, cap, body, w)

        window = jax.vmap(push_chain)(
            state.extra, info.orbit_q, info.orbit_g, info.orbit_logp,
            info.orbit_err, info.n_steps)
        return state._replace(extra=window)

    def switch(self, state):
        return state

    def adapt_update(self, state):
        cap = state.extra.draws.shape[1]
        c = state.extra.draws.shape[0]
        keys = jax.vmap(lambda k: jax.random.fold_in(k, 13))(state.keys)

        axis = getattr(self.config, "axis_name", None)
        # c is the SHARD-LOCAL chain count under shard_map: with one chain
        # per device the pooled path must still run (and gather) — `c > 1`
        # alone would silently degrade to per-chain refits on a mesh.
        pooled = self.flow_settings.pool_chains and (c > 1
                                                     or axis is not None)
        if pooled:
            # Pooled refit: every chain's window concatenates into one
            # training set, one Adam run fits one shared flow, and every
            # chain receives it.  (spec.update subsamples to its training
            # budget, so cost does not scale with C.)
            d = state.extra.draws.shape[-1]
            valid = (jnp.arange(cap)[None, :] < state.extra.count[:, None])
            draws = state.extra.draws.reshape(c * cap, d)
            grads = state.extra.grads.reshape(c * cap, d)
            logps = state.extra.logps.reshape(c * cap)
            mask = valid.reshape(c * cap)
            key0 = keys[0]
            if axis is not None:
                # Cross-device pooling (the low-rank path's psum analog,
                # adapt/low_rank.py::pooled_compute_update): gather every
                # shard's windows so ALL devices train the SAME flow on the
                # SAME data — and share one key (per-shard keys[0] would
                # give each device different Adam randomness and hence a
                # different "shared" flow).
                def gat(x):
                    g = jax.lax.all_gather(x, axis)
                    return g.reshape((-1,) + x.shape[1:])

                draws, grads = gat(draws), gat(grads)
                logps, mask = gat(logps), gat(mask)
                key0 = jax.random.wrap_key_data(
                    jax.lax.all_gather(jax.random.key_data(keys),
                                       axis).reshape(
                        (-1,) + jax.random.key_data(keys).shape[1:])[0])
            params0 = jax.tree.map(lambda v: v[0], state.transform.params)
            with jax.default_matmul_precision("highest"):
                new0 = self.spec.update(key0, params0, draws, grads,
                                        logps, mask)
            params = jax.tree.map(
                lambda v: jnp.broadcast_to(v, (c,) + v.shape), new0)
        else:
            def refit(key, params, w):
                mask = jnp.arange(cap) < w.count
                # Full-f32 training matmuls: the fitted flow defines the
                # energy.
                with jax.default_matmul_precision("highest"):
                    return self.spec.update(key, params, w.draws, w.grads,
                                            w.logps, mask)

            params = jax.vmap(refit)(keys, state.transform.params,
                                     state.extra)

        # Safety: a refit that cannot represent the chain's CURRENT point
        # (non-finite z / zg / logdet) would wedge the chain — every further
        # draw would diverge on its first step and never move.  Keep the old
        # parameters for such chains.
        def current_ok(params_c, q, g):
            t = FlowTransform(params=params_c, id=jnp.int32(0))
            z, zg, logdet = self.ops.eval_from_q(t, q, g, None)
            return (jnp.all(jnp.isfinite(z)) & jnp.all(jnp.isfinite(zg))
                    & jnp.isfinite(logdet))

        ok = jax.vmap(current_ok)(params, state.pt.q, state.pt.g)
        if pooled:
            # A POOLED flow must stay identical across every chain (the
            # fused posterior engine packs chain 0's params for all of
            # them) — accept the refit only if it is finite at EVERY
            # chain's current point, across all mesh shards.
            ok_all = jnp.all(ok)
            if axis is not None:
                ok_all = jax.lax.pmin(ok_all.astype(jnp.int32), axis) > 0
            ok = jnp.broadcast_to(ok_all, ok.shape)

        def select(new, old):
            shape = (ok.shape[0],) + (1,) * (new.ndim - 1)
            return jnp.where(ok.reshape(shape), new, old)

        params = jax.tree.map(select, params, state.transform.params)
        transform = FlowTransform(params=params, id=state.transform.id + 1)
        return state._replace(transform=transform)
