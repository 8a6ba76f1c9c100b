"""Fully-fused Pallas MCLMC posterior engine (TPU).

The XLA MCLMC path (kernels/mclmc.py — one ``mclmc_draw`` while_loop per
draw, vmapped over chains, scanned over draws) round-trips the chain state
through HBM every leapfrog and pays a per-draw dispatch; measured ~5.8M
gradient-evals/s device-level at d=10 (BASELINE.md) while the fused NUTS
engine — doing strictly MORE work per eval — reaches 26M+.  This module
keeps the whole sampler state VMEM-resident for K draws per ``pallas_call``,
exactly like kernels/nuts_pallas.py, for the MCLMC posterior phase (frozen
diagonal transform, fixed jittered step size — the reference's posterior
regime, src/sampler.rs:345-392).

Algorithm per draw (nuts-rs ``mclmc_kernel``, src/mclmc.rs:212-409):
``num_steps = round(subsample_freq * L / eps)`` leapfrog steps bracketed by
isokinetic (or Gaussian OU) partial momentum refreshes, with the
tree-structured dynamic step-size retry: on divergence halve the step
factor, require 2 successful sub-steps before doubling back, max 10
halvings, tracked in an explicit per-chain stack.  On a give-up divergence
the draw emits the trajectory-start position with freshly resampled
momentum (mclmc.rs:361-384).

Draw-asynchronous like the fused NUTS posterior kernel: chains retry/finish
draws independently; emission into the [K, ...] output blocks is masked by
each chain's completed-draw counter.  Momentum is carried across draws (the
posterior phase never fully resamples it — ``extra_flags`` only sets
``resample_velocity`` on draw 0 and at the trajectory switch, both inside
warmup), so the launcher threads the velocity between launches.

RNG mirrors nuts_pallas: TPU hardware PRNG on-chip, the murmur3
``_hash_bits`` stream in interpret mode — tests/test_mclmc_pallas.py
replays that stream through a naive per-chain Python builder for bit-exact
equivalence.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dynamics.hamiltonian import KineticKind
from .mclmc import MAX_HALVINGS, MclmcOptions
from .nuts_pallas import _hash_bits

# stat row order in the packed [K, NSTATS_M, B] output
MCLMC_STAT_NAMES = [
    "diverging", "n_steps", "energy_change", "average_step_size",
    "step_size", "logp", "energy", "fisher_distance",
]
NSTATS_M = len(MCLMC_STAT_NAMES)

DEFAULT_BLOCK = 256


def make_mclmc_kernel(logp_grad_batched: Callable, dim: int, K: int,
                      mopts: MclmcOptions, jitter,
                      use_hw_prng: bool = True, n_model_args: int = 0):
    """Kernel body; refs carry the chains-on-lanes [.., B] block layout.

    Per-iteration RNG salt order (the naive replay in tests must match):
    n1 (2 salts), n2 (2), vfail (2), u_step (1).
    """
    MICRO = mopts.kind is KineticKind.MICROCANONICAL
    MAX_ERR = mopts.max_energy_error
    ELL = mopts.momentum_decoherence_length
    FSUB = mopts.subsample_frequency
    H = MAX_HALVINGS if mopts.dynamic_step_size else 0
    HS = max(H, 1)           # allocated stack rows (avoid zero-row arrays)
    f32 = jnp.float32
    i32 = jnp.int32
    SQRT_N = float(math.sqrt(dim))
    LN2 = float(math.log(2.0))

    salt_counter = [0]

    def kernel(seed_ref, q0_ref, g0_ref, logp0_ref, v0_ref, stds_ref,
               mean_ref, logdet_ref, step0_ref, bar_ref, *rest):
        model_arg_refs = rest[:n_model_args]
        (out_q_ref, out_stats_ref, fin_q_ref, fin_g_ref, fin_logp_ref,
         fin_v_ref, iters_ref) = rest[n_model_args:n_model_args + 7]
        model_args = tuple(r[:] for r in model_arg_refs)
        B = q0_ref.shape[1]
        VS = (dim, B)
        SS = (1, B)

        def csum(x):
            return jnp.sum(x, 0, keepdims=True)

        if use_hw_prng:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        seed_u32 = (seed_ref[0, 0].astype(jnp.uint32)
                    + jnp.uint32(0x51ED2701)
                    * pl.program_id(0).astype(jnp.uint32))
        it_box = [jnp.uint32(0)]

        def _uniform(shape):
            salt_counter[0] += 1
            if use_hw_prng:
                bits = pltpu.bitcast(pltpu.prng_random_bits(shape),
                                     jnp.uint32)
            else:
                bits = _hash_bits(shape, seed_u32, it_box[0],
                                  salt_counter[0])
            f = ((bits >> 8).astype(jnp.int32).astype(jnp.float32)
                 * (1.0 / (1 << 24)))
            return jnp.clip(f, 1e-12, 1.0 - 1e-7)

        def _normals(shape):
            u1 = _uniform(shape)
            u2 = _uniform(shape)
            return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)

        stds = stds_ref[:]
        mean = mean_ref[:]
        ld = logdet_ref[:]               # [1, B], position-independent (diag)
        bar = bar_ref[:]                 # [1, B] fixed base step

        def eval_z(z):
            q = z * stds + mean
            logp, g = logp_grad_batched(q, *model_args)
            return logp.reshape(SS), g * stds, q

        def fresh_step():
            if jitter is None:
                return bar
            return bar * (1.0 - jitter + 2.0 * jitter * _uniform(SS))

        def esh(zg, v, step):
            """ESH momentum half-step (math.rs:188-204); step is [SS]."""
            gn = jnp.sqrt(csum(zg * zg))
            gh = zg / gn
            alpha = csum(v * gh)
            delta = step * gn / f32(dim - 1)
            zeta = jnp.exp(-delta)
            vr = ((1.0 - zeta) * (1.0 + zeta + alpha * (1.0 - zeta)) * gh
                  + 2.0 * zeta * v)
            vn = vr / jnp.sqrt(csum(vr * vr))
            # log1p is not lowerable in Mosaic; the regrouped argument
            # (1+alpha) + (1-alpha) zeta^2 sums two non-negative terms
            # (alpha in [-1, 1]), so plain log is cancellation-free.
            dke = (delta - LN2
                   + jnp.log((1.0 + alpha) + (1.0 - alpha) * zeta * zeta)
                   ) * f32(dim - 1)
            return vn, dke

        def refresh(v, noise, half):
            """OU partial momentum refresh (transformed_hamiltonian.rs:777-826).

            Returns (v_new, ke_of_v_new_or_None): micro keeps ke unchanged.
            """
            if MICRO:
                # expm1 is not lowerable in Mosaic; exp(x)-1 at the x
                # ~ eps*factor/L magnitudes here costs ~1e-7 absolute
                # (negligible against the unit-scale refresh noise).
                nu = jnp.sqrt((jnp.exp(2.0 * half / ELL) - 1.0) / f32(dim))
                vr = v + nu * noise
                return vr / jnp.sqrt(csum(vr * vr)), None
            alpha = jnp.exp(-half / ELL)
            beta = jnp.sqrt(1.0 - alpha * alpha)
            vr = alpha * v + beta * noise
            return vr, 0.5 * csum(vr * vr)

        def num_steps_for(stepd):
            return jnp.clip(jnp.round(FSUB * ELL / stepd), 1.0,
                            1e6).astype(i32)

        # non-replicated per-lane zeros (see nuts_pallas make_kernel)
        _mix = (jax.lax.broadcasted_iota(jnp.int32, (8, B), 0)
                + jax.lax.broadcasted_iota(jnp.int32, (8, B), 1))
        ib = jnp.minimum(_mix[0:1], 0)
        zb = ib.astype(f32)
        rows_h = jax.lax.broadcasted_iota(jnp.int32, (HS,) + SS, 0)

        # ---- initial state: fresh draw at (q0, g0, logp0, v0) ----
        z0 = (q0_ref[:] - mean) / stds
        zg0 = g0_ref[:] * stds
        logp0 = logp0_ref[:]
        v0 = v0_ref[:]
        ke0 = zb if MICRO else 0.5 * csum(v0 * v0)
        step0 = step0_ref[:]
        nsd0 = num_steps_for(step0)
        noise0 = _normals(VS)

        carry = dict(
            it=jnp.uint32(1),
            dc=ib,
            step=step0, nsd=nsd0,
            z=z0, v=v0, zg=zg0, noise=noise0,
            logp=logp0, ke=ke0,
            e_init=ke0 - (logp0 + ld),
            # draw-start snapshot (divergence revert target, mclmc.rs:361-384)
            zi=z0, zgi=zg0, lpi=logp0,
            rem=nsd0, factor=zb + 1.0, ssize=ib,
            stack=jnp.zeros((HS,) + SS, f32),
            steps=ib, ttime=zb,
        )

        def body(c):
            it_box[0] = c["it"]
            n1 = _normals(VS)
            n2 = _normals(VS)
            vfail = _normals(VS)
            u_step = fresh_step()

            f = c["factor"]
            eps = c["step"] * f
            half = eps / 2.0

            # ---- pre-step refresh (uses the carried noise) ----
            vr, ke_r_e = refresh(c["v"], c["noise"], half)
            ke_r = c["ke"] if MICRO else ke_r_e
            base = ke_r - (c["logp"] + ld)

            # ---- leapfrog ----
            if MICRO:
                v1, dke1 = esh(c["zg"], vr, SQRT_N * eps / 2.0)
                ke1 = ke_r + dke1
                z1 = c["z"] + eps * SQRT_N * v1
            else:
                v1 = vr + half * c["zg"]
                ke1 = ke_r
                z1 = c["z"] + eps * v1
            logp1, zg1, _q1 = eval_z(z1)
            if MICRO:
                v2, dke2 = esh(zg1, v1, SQRT_N * eps / 2.0)
                ke2 = ke1 + dke2
            else:
                v2 = v1 + half * zg1
                ke2 = 0.5 * csum(v2 * v2)
            err = (ke2 - (logp1 + ld)) - base
            max_err_step = (MAX_ERR / c["nsd"].astype(f32)) * f
            bad = (jnp.abs(err) >= max_err_step if MICRO
                   else err > max_err_step)
            div = bad | ~jnp.isfinite(err)

            # ---- success branch: post-step refresh + stack unwind ----
            vr2, ke3_e = refresh(v2, n1, half)
            ke3 = ke2 if MICRO else ke3_e
            rem1 = c["rem"] - 1
            steps1 = c["steps"] + 1
            time1 = c["ttime"] + f * c["step"]

            # Static unroll (HS bounded, each pass ~6 scalar-plane ops; a
            # fori_loop here fails Mosaic lowering).  f32 stack gather:
            # Mosaic also rejects masked integer reductions; counts <= 1e6
            # are exact in f32.
            rem_u, fac_u, size_u = rem1, f, c["ssize"]
            for _ in range(HS):
                do = (rem_u == 0) & (size_u > 0)
                top_mask = rows_h == (size_u - 1)[None]
                top = jnp.sum(jnp.where(top_mask, c["stack"], 0.0),
                              axis=0).astype(i32)
                rem_u = jnp.where(do, top - 1, rem_u)
                fac_u = jnp.where(do, fac_u * 2.0, fac_u)
                size_u = jnp.where(do, size_u - 1, size_u)

            # ---- divergence branch: push + halve (mclmc.rs:335-354) ----
            give_up = c["ssize"] >= H
            push_mask = rows_h == jnp.minimum(c["ssize"], HS - 1)[None]
            stack_div = jnp.where(push_mask, c["rem"].astype(f32)[None],
                                  c["stack"])

            # ---- merged next-trajectory state ----
            z_n = jnp.where(div, c["z"], z1)
            v_n = jnp.where(div, c["v"], vr2)
            zg_n = jnp.where(div, c["zg"], zg1)
            logp_n = jnp.where(div, c["logp"], logp1)
            ke_n = jnp.where(div, c["ke"], ke3)
            noise_n = jnp.where(div, c["noise"], n2)
            rem_n = jnp.where(div, jnp.where(give_up, ib, ib + 2), rem_u)
            fac_n = jnp.where(div, jnp.where(give_up, f, f * 0.5), fac_u)
            ssize_n = jnp.where(div,
                                jnp.where(give_up, c["ssize"],
                                          c["ssize"] + 1), size_u)
            stack_n = jnp.where((div & ~give_up)[None], stack_div,
                                c["stack"])
            steps_n = jnp.where(div, c["steps"], steps1)
            time_n = jnp.where(div, c["ttime"], time1)

            # logical ops, not jnp.where-of-bools: a bool-valued select
            # round-trips through i8 and Mosaic cannot truncate i8 -> i1
            done = (div & give_up) | (~div & (rem_n == 0))
            diverged_end = div & give_up

            # ---- emitted point: trajectory end, or on a give-up
            # divergence the draw-start point with resampled momentum ----
            em_z = jnp.where(diverged_end, c["zi"], z_n)
            em_zg = jnp.where(diverged_end, c["zgi"], zg_n)
            em_logp = jnp.where(diverged_end, c["lpi"], logp_n)
            if MICRO:
                vf = vfail / jnp.sqrt(csum(vfail * vfail))
                em_ke_div = zb
            else:
                vf = vfail
                em_ke_div = 0.5 * csum(vf * vf)
            em_v = jnp.where(diverged_end, vf, v_n)
            em_ke = jnp.where(diverged_end, em_ke_div, ke_n)

            @pl.when(jnp.any(done))
            def _emit():
                em_q = em_z * stds + mean
                # energy_change uses the LOOP-exit point (for diverged
                # chains: the reverted pre-refresh state), as in
                # mclmc_draw's ``final.pt.energy - initial_energy``.
                e_change = (ke_n - (logp_n + ld)) - c["e_init"]
                energy_em = em_ke - (em_logp + ld)
                fisher = csum(jnp.square(em_z + em_zg))
                stepsf = jnp.maximum(steps_n, 1).astype(f32)
                krows = jax.lax.broadcasted_iota(jnp.int32, (K,) + SS, 0)
                kmask = done[None] & (krows == c["dc"].reshape((1,) + SS))
                out_q_ref[:] = jnp.where(kmask, em_q[None], out_q_ref[:])
                stats = jnp.concatenate([
                    diverged_end.astype(f32), steps_n.astype(f32),
                    e_change, time_n / stepsf, c["step"],
                    em_logp, energy_em, fisher,
                ], axis=0)  # [NSTATS_M, B]
                out_stats_ref[:] = jnp.where(kmask, stats[None],
                                             out_stats_ref[:])

            # ---- next state: fresh draw (done) / continue trajectory ----
            ke_fresh = zb if MICRO else em_ke
            e_init_fresh = ke_fresh - (em_logp + ld)
            nsd_fresh = num_steps_for(u_step)

            def nxt(fresh, cont):
                return jnp.where(done, fresh, cont)

            return dict(
                it=c["it"] + jnp.uint32(1),
                dc=c["dc"] + done.astype(i32),
                step=nxt(u_step, c["step"]),
                nsd=nxt(nsd_fresh, c["nsd"]),
                # em_* equal the continue-trajectory values when not done
                # (diverged_end is False there), so no nxt() needed:
                z=em_z,
                v=em_v,
                zg=em_zg,
                noise=nxt(n2, noise_n),
                logp=em_logp,
                ke=nxt(ke_fresh, ke_n),
                e_init=nxt(e_init_fresh, c["e_init"]),
                zi=nxt(em_z, c["zi"]),
                zgi=nxt(em_zg, c["zgi"]),
                lpi=nxt(em_logp, c["lpi"]),
                rem=nxt(nsd_fresh, rem_n),
                factor=nxt(zb + 1.0, fac_n),
                ssize=nxt(ib, ssize_n),
                stack=jnp.where(done[None], jnp.zeros_like(stack_n),
                                stack_n),
                steps=nxt(ib, steps_n),
                ttime=nxt(zb, time_n),
            )

        def cond(c):
            return jnp.any(c["dc"] < K)

        final = jax.lax.while_loop(cond, body, carry)
        fin_q_ref[:] = final["z"] * stds + mean
        fin_g_ref[:] = final["zg"] / stds
        fin_logp_ref[:] = final["logp"]
        fin_v_ref[:] = final["v"]
        iters_ref[:] = jnp.broadcast_to(
            final["it"].astype(jnp.int32).reshape(1, 1), iters_ref.shape)

    return kernel


def mclmc_pallas_run(
    seed: int | jax.Array,
    q: jax.Array,          # [C, d]
    g: jax.Array,          # [C, d]
    logp: jax.Array,       # [C]
    v: jax.Array,          # [C, d] transformed-space velocity
    stds: jax.Array,       # [C, d]
    mean: jax.Array,       # [C, d]
    logdet: jax.Array,     # [C]
    step0: jax.Array,      # [C]
    step_bar: jax.Array,   # [C]
    num_draws: int,
    logp_grad_batched: Callable,
    mopts: MclmcOptions,
    jitter,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
    model_args: tuple = (),
):
    """Launch the fused MCLMC kernel.

    Returns ``(q_fin, g_fin, logp_fin, v_fin, draws, stats)`` with draws
    [C, K, d] and stats a dict of [C, K] arrays (MCLMC_STAT_NAMES plus
    ``loop_iterations`` [C])."""
    C, d = q.shape
    K = num_draws
    B = min(block, C)
    assert C % B == 0, (C, B)
    grid = (C // B,)

    def vec(x):
        return jnp.asarray(x, jnp.float32).T.reshape(-1, C)

    def sca(x):
        return jnp.asarray(x, jnp.float32).reshape(1, C)

    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    model_args = tuple(jnp.asarray(a, jnp.float32) for a in model_args)
    kernel = make_mclmc_kernel(logp_grad_batched, d, K, mopts, jitter,
                               use_hw_prng=not interpret,
                               n_model_args=len(model_args))

    vspec = lambda r: pl.BlockSpec((r, B), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((K, d, C), jnp.float32),        # draws
        jax.ShapeDtypeStruct((K, NSTATS_M, C), jnp.float32),  # stats
        jax.ShapeDtypeStruct((d, C), jnp.float32),           # final q
        jax.ShapeDtypeStruct((d, C), jnp.float32),           # final g
        jax.ShapeDtypeStruct((1, C), jnp.float32),           # final logp
        jax.ShapeDtypeStruct((d, C), jnp.float32),           # final v
        jax.ShapeDtypeStruct((1, C), jnp.int32),             # loop iters
    )
    out_specs = (
        pl.BlockSpec((K, d, B), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, NSTATS_M, B), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        vspec(d), vspec(d), vspec(1), vspec(d), vspec(1),
    )
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        vspec(d), vspec(d), vspec(1), vspec(d), vspec(d), vspec(d),
        vspec(1), vspec(1), vspec(1),
    ] + [
        pl.BlockSpec(a.shape, (lambda i, nd=a.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for a in model_args
    ]
    draws, stats, q_f, g_f, logp_f, v_f, iters = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(seed_arr, vec(q), vec(g), sca(logp), vec(v), vec(stds), vec(mean),
      sca(logdet), sca(step0), sca(step_bar), *model_args)

    draws_out = jnp.moveaxis(draws, 2, 0)                    # [C, K, d]
    stats_out = {name: stats[:, i, :].T
                 for i, name in enumerate(MCLMC_STAT_NAMES)}
    stats_out["loop_iterations"] = iters[0]
    return (q_f.T, g_f.T, logp_f[0], v_f.T, draws_out, stats_out)


# ---------------------------------------------------------------------------
# Fused MCLMC warmup engine
# ---------------------------------------------------------------------------
#
# MCLMC warmup (nuts-rs ``MclmcChain::draw`` during tuning,
# src/mclmc.rs:487-546) is the MCLMC trajectory above plus the shared
# diagonal mass-matrix adaptation between draws — the SAME fg/bg Welford
# estimator machinery the fused NUTS warmup kernel (nuts_pallas.py) already
# runs in-kernel, minus dual averaging (MCLMC's step size is FIXED with
# per-draw jitter, sampler.rs:341-344).  Draws run LOCK-STEP (the windowed
# schedule is draw-synchronous): an outer fori_loop over draws with the
# per-draw schedule flags in SMEM, an inner while_loop over leapfrog steps
# (act-masked — chains finish/retry their trajectories independently within
# the draw), then the estimator update / window switch / mass-matrix rule
# in-register.
#
# Velocity semantics across transform updates mirror the XLA path exactly:
# ``initialize_trajectory(resample_velocity=False)`` carries pt.v VERBATIM
# into the new transform's z-space (dynamics/hamiltonian.py:196-227), so the
# kernel carries v unchanged across draws and re-derives z/zg from q under
# the current (stds, mean) at each draw start.  The adaptation collector
# sees the TRAJECTORY END (on a give-up divergence: the reverted
# mid-trajectory point), while the EMITTED draw reverts to the draw start
# with resampled momentum — both exactly as mclmc.rs:361-394 / mclmc.py.

# stat row order in the packed [K, NSTATS_MW, B] warmup output
MCLMC_WARMUP_STAT_NAMES = MCLMC_STAT_NAMES + ["transformation_index"]
NSTATS_MW = len(MCLMC_WARMUP_STAT_NAMES)

# flags_ref columns (i32): shares the NUTS warmup layout (chain.py packs
# update_estimators/do_update/do_switch at the same indices) + MCLMC's
# per-draw full-momentum-resample flag in a spare column.
MW_FLAG_RESAMPLE = 6

# sca_ref rows (f32): packed per-chain scalar adaptation state
MSCA_TID = 0
MSCA_LOGDET = 1
MSCA_CNT_FG = 2
MSCA_CNT_BG = 3
NSCA_M = 4

# est_ref planes: same 8-plane fg/bg layout as the NUTS warmup kernel
_EST_FG_DM, _EST_FG_DV, _EST_FG_GM, _EST_FG_GV = 0, 1, 2, 3
_EST_BG_DM, _EST_BG_DV, _EST_BG_GM, _EST_BG_GV = 4, 5, 6, 7


def make_mclmc_warmup_kernel(logp_grad_batched: Callable, dim: int, K: int,
                             mopts: MclmcOptions, sset, use_grad_based: bool,
                             use_hw_prng: bool = True, n_model_args: int = 0):
    """MCLMC warmup kernel body (lock-step draws + in-kernel adaptation).

    ``sset`` is the StepSizeSettings (FIXED method: the per-draw step is
    ``fixed_value`` with uniform jitter, adapt.rs:259-266 via
    adapt/step_size.py::apply_jitter); adaptation math mirrors
    adapt/mass_matrix.py exactly (as in nuts_pallas.make_warmup_kernel).
    """
    MICRO = mopts.kind is KineticKind.MICROCANONICAL
    MAX_ERR = mopts.max_energy_error
    ELL = mopts.momentum_decoherence_length
    FSUB = mopts.subsample_frequency
    H = MAX_HALVINGS if mopts.dynamic_step_size else 0
    HS = max(H, 1)
    jitter = sset.jitter
    FIXED_STEP = float(sset.fixed_value)
    f32 = jnp.float32
    i32 = jnp.int32
    SQRT_N = float(math.sqrt(dim))
    LN2 = float(math.log(2.0))
    LOWER, UPPER = 1e-20, 1e20

    salt_counter = [0]

    def kernel(seed_ref, flags_ref, q0_ref, g0_ref, logp0_ref, v0_ref,
               stds_ref, mean_ref, est_ref, sca_ref, *rest):
        model_arg_refs = rest[:n_model_args]
        (out_q_ref, out_stats_ref, fin_q_ref, fin_g_ref, fin_logp_ref,
         fin_v_ref, stds_out_ref, mean_out_ref, est_out_ref, sca_out_ref,
         iters_ref) = rest[n_model_args:]
        model_args = tuple(r[:] for r in model_arg_refs)
        B = q0_ref.shape[1]
        VS = (dim, B)
        SS = (1, B)

        def csum(x):
            return jnp.sum(x, 0, keepdims=True)

        # Logical program id = grid position + launcher base (seed_ref[0,1]):
        # keeps RNG streams identical when model-arg launches are split into
        # grid=1 calls per chain group (the Mosaic multi-program-grid
        # workaround shared with nuts_pallas.make_warmup_kernel).
        pid = pl.program_id(0) + seed_ref[0, 1]
        if use_hw_prng:
            pltpu.prng_seed(seed_ref[0, 0] + pid)
        seed_u32 = (seed_ref[0, 0].astype(jnp.uint32)
                    + jnp.uint32(0x51ED2701) * pid.astype(jnp.uint32))
        it_box = [jnp.uint32(0)]

        def _uniform(shape):
            salt_counter[0] += 1
            if use_hw_prng:
                bits = pltpu.bitcast(pltpu.prng_random_bits(shape),
                                     jnp.uint32)
            else:
                bits = _hash_bits(shape, seed_u32, it_box[0],
                                  salt_counter[0])
            f = ((bits >> 8).astype(jnp.int32).astype(jnp.float32)
                 * (1.0 / (1 << 24)))
            return jnp.clip(f, 1e-12, 1.0 - 1e-7)

        def _normals(shape):
            u1 = _uniform(shape)
            u2 = _uniform(shape)
            return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)

        def eval_z(z, stds, mean):
            q = z * stds + mean
            logp, g = logp_grad_batched(q, *model_args)
            return logp.reshape(SS), g * stds

        def esh(zg, v, step):
            gn = jnp.sqrt(csum(zg * zg))
            gh = zg / gn
            alpha = csum(v * gh)
            delta = step * gn / f32(dim - 1)
            zeta = jnp.exp(-delta)
            vr = ((1.0 - zeta) * (1.0 + zeta + alpha * (1.0 - zeta)) * gh
                  + 2.0 * zeta * v)
            vn = vr / jnp.sqrt(csum(vr * vr))
            dke = (delta - LN2
                   + jnp.log((1.0 + alpha) + (1.0 - alpha) * zeta * zeta)
                   ) * f32(dim - 1)
            return vn, dke

        def refresh(v, noise, half):
            if MICRO:
                nu = jnp.sqrt((jnp.exp(2.0 * half / ELL) - 1.0) / f32(dim))
                vr = v + nu * noise
                return vr / jnp.sqrt(csum(vr * vr)), None
            alpha = jnp.exp(-half / ELL)
            beta = jnp.sqrt(1.0 - alpha * alpha)
            vr = alpha * v + beta * noise
            return vr, 0.5 * csum(vr * vr)

        def num_steps_for(stepd):
            return jnp.clip(jnp.round(FSUB * ELL / stepd), 1.0,
                            1e6).astype(i32)

        _mix = (jax.lax.broadcasted_iota(jnp.int32, (8, B), 0)
                + jax.lax.broadcasted_iota(jnp.int32, (8, B), 1))
        ib = jnp.minimum(_mix[0:1], 0)
        zb = ib.astype(f32)
        rows_h = jax.lax.broadcasted_iota(jnp.int32, (HS,) + SS, 0)

        sca0 = sca_ref[:]                 # [NSCA_M, 1, B]
        outer = dict(
            it=jnp.uint32(1),
            q=q0_ref[:], g=g0_ref[:], logp=logp0_ref[:], v=v0_ref[:],
            stds=stds_ref[:], mean=mean_ref[:],
            est=est_ref[:],
            sca=sca0,
        )

        def draw_body(i, o):
            it_box[0] = o["it"]
            flag = lambda col: (flags_ref[i, col] != 0)
            f_upd_est = flag(0)            # FLAG_UPDATE_EST
            f_do_upd = flag(1)             # FLAG_DO_UPDATE
            f_switch = flag(5)             # FLAG_DO_SWITCH
            f_resample = flag(MW_FLAG_RESAMPLE)

            stds, mean = o["stds"], o["mean"]
            sca = o["sca"]
            logdet = sca[MSCA_LOGDET]

            # ---- per-draw FIXED step with jitter (apply_jitter) ----
            step = zb + f32(FIXED_STEP)
            if jitter is not None:
                step = step * (1.0 - jitter + 2.0 * jitter * _uniform(SS))
            nsd = num_steps_for(step)

            # ---- fresh trajectory (initialize_trajectory semantics) ----
            z0 = (o["q"] - mean) / stds
            zg0 = o["g"] * stds
            logp0 = o["logp"]
            vres = _normals(VS)
            if MICRO:
                vres = vres / jnp.sqrt(csum(vres * vres))
            v0 = jnp.where(f_resample, vres, o["v"])
            ke0 = zb if MICRO else 0.5 * csum(v0 * v0)
            e_init = ke0 - (logp0 + logdet)
            noise0 = _normals(VS)

            tree = dict(
                it=o["it"],
                done=ib, divg=ib,
                z=z0, v=v0, zg=zg0, noise=noise0,
                logp=logp0, ke=ke0,
                rem=nsd, factor=zb + 1.0, ssize=ib,
                stack=jnp.zeros((HS,) + SS, f32),
                steps=ib, ttime=zb,
            )

            def tree_body(c):
                it_box[0] = c["it"]
                act = c["done"] == 0
                n1 = _normals(VS)
                n2 = _normals(VS)

                f = c["factor"]
                eps = step * f
                half = eps / 2.0

                vr, ke_r_e = refresh(c["v"], c["noise"], half)
                ke_r = c["ke"] if MICRO else ke_r_e
                base = ke_r - (c["logp"] + logdet)

                if MICRO:
                    v1, dke1 = esh(c["zg"], vr, SQRT_N * eps / 2.0)
                    ke1 = ke_r + dke1
                    z1 = c["z"] + eps * SQRT_N * v1
                else:
                    v1 = vr + half * c["zg"]
                    ke1 = ke_r
                    z1 = c["z"] + eps * v1
                logp1, zg1 = eval_z(z1, stds, mean)
                if MICRO:
                    v2, dke2 = esh(zg1, v1, SQRT_N * eps / 2.0)
                    ke2 = ke1 + dke2
                else:
                    v2 = v1 + half * zg1
                    ke2 = 0.5 * csum(v2 * v2)
                err = (ke2 - (logp1 + logdet)) - base
                # per-step budget: max_energy_error / num_base_steps * factor
                # (mclmc.rs:292-298; nsd is the DRAW's base step count)
                max_err_step = (MAX_ERR / nsd.astype(f32)) * f
                bad = (jnp.abs(err) >= max_err_step if MICRO
                       else err > max_err_step)
                div = act & (bad | ~jnp.isfinite(err))

                vr2, ke3_e = refresh(v2, n1, half)
                ke3 = ke2 if MICRO else ke3_e
                rem1 = c["rem"] - 1
                steps1 = c["steps"] + 1
                time1 = c["ttime"] + f * step

                rem_u, fac_u, size_u = rem1, f, c["ssize"]
                for _ in range(HS):
                    do = (rem_u == 0) & (size_u > 0)
                    top_mask = rows_h == (size_u - 1)[None]
                    top = jnp.sum(jnp.where(top_mask, c["stack"], 0.0),
                                  axis=0).astype(i32)
                    rem_u = jnp.where(do, top - 1, rem_u)
                    fac_u = jnp.where(do, fac_u * 2.0, fac_u)
                    size_u = jnp.where(do, size_u - 1, size_u)

                give_up = c["ssize"] >= H
                push_mask = rows_h == jnp.minimum(c["ssize"], HS - 1)[None]
                stack_div = jnp.where(push_mask, c["rem"].astype(f32)[None],
                                      c["stack"])

                upd = act  # only chains still in their trajectory advance
                z_n = jnp.where(upd & ~div, z1, c["z"])
                v_n = jnp.where(upd & ~div, vr2, c["v"])
                zg_n = jnp.where(upd & ~div, zg1, c["zg"])
                logp_n = jnp.where(upd & ~div, logp1, c["logp"])
                ke_n = jnp.where(upd & ~div, ke3, c["ke"])
                noise_n = jnp.where(upd & ~div, n2, c["noise"])
                rem_n = jnp.where(upd,
                                  jnp.where(div,
                                            jnp.where(give_up, ib, ib + 2),
                                            rem_u), c["rem"])
                fac_n = jnp.where(upd,
                                  jnp.where(div,
                                            jnp.where(give_up, f, f * 0.5),
                                            fac_u), c["factor"])
                ssize_n = jnp.where(upd,
                                    jnp.where(div,
                                              jnp.where(give_up, c["ssize"],
                                                        c["ssize"] + 1),
                                              size_u), c["ssize"])
                # the unwind changes only rem/factor/size, never the stack
                # contents, so success leaves the array untouched
                stack_n = jnp.where((upd & div & ~give_up)[None], stack_div,
                                    c["stack"])
                steps_n = jnp.where(upd & ~div, steps1, c["steps"])
                time_n = jnp.where(upd & ~div, time1, c["ttime"])

                fin_now = act & ((div & give_up) | (~div & (rem_n == 0)))
                divg_n = c["divg"] | (act & div & give_up).astype(i32)

                return dict(
                    it=c["it"] + jnp.uint32(1),
                    done=c["done"] | fin_now.astype(i32),
                    divg=divg_n,
                    z=z_n, v=v_n, zg=zg_n, noise=noise_n,
                    logp=logp_n, ke=ke_n,
                    rem=rem_n, factor=fac_n, ssize=ssize_n,
                    stack=stack_n, steps=steps_n, ttime=time_n,
                )

            t = jax.lax.while_loop(lambda c: jnp.any(c["done"] == 0),
                                   tree_body, tree)
            it_box[0] = t["it"]
            vfail = _normals(VS)

            div_b = t["divg"] != 0
            # ---- emitted draw: trajectory end, or on a give-up divergence
            # the draw-start point with resampled momentum ----
            em_z = jnp.where(div_b, z0, t["z"])
            em_zg = jnp.where(div_b, zg0, t["zg"])
            em_logp = jnp.where(div_b, logp0, t["logp"])
            if MICRO:
                vf = vfail / jnp.sqrt(csum(vfail * vfail))
                em_ke_div = zb
            else:
                vf = vfail
                em_ke_div = 0.5 * csum(vf * vf)
            em_v = jnp.where(div_b, vf, t["v"])
            em_ke = jnp.where(div_b, em_ke_div, t["ke"])
            em_q = em_z * stds + mean

            # ---- adaptation: collector sees the trajectory END (t.*) ----
            q_coll = t["z"] * stds + mean
            g_coll = t["zg"] / stds
            is_good = ((div_b & (t["steps"] > 4))
                       | (~div_b & (t["steps"] != 0)))

            est = o["est"]
            cnt_fg = sca[MSCA_CNT_FG]
            cnt_bg = sca[MSCA_CNT_BG]
            inc = f_upd_est & is_good

            def add2(mean_p, var_p, cnt_old, value):
                cnt = cnt_old + inc.astype(f32)
                first1 = cnt == 1.0
                diffv = value - mean_p
                meann = jnp.where(first1, value,
                                  mean_p + diffv / jnp.maximum(cnt, 1.0))
                varn = var_p + jnp.where(first1, 0.0, diffv * diffv)
                meann = jnp.where(inc, meann, mean_p)
                varn = jnp.where(inc, varn, var_p)
                return meann, varn

            fg_dm, fg_dv = add2(est[_EST_FG_DM], est[_EST_FG_DV], cnt_fg,
                                q_coll)
            fg_gm, fg_gv = add2(est[_EST_FG_GM], est[_EST_FG_GV], cnt_fg,
                                g_coll)
            bg_dm, bg_dv = add2(est[_EST_BG_DM], est[_EST_BG_DV], cnt_bg,
                                q_coll)
            bg_gm, bg_gv = add2(est[_EST_BG_GM], est[_EST_BG_GV], cnt_bg,
                                g_coll)
            cnt_fg = cnt_fg + jnp.where(inc, 1.0, 0.0)
            cnt_bg = cnt_bg + jnp.where(inc, 1.0, 0.0)

            def sw(fgv, bgv, zero):
                return (jnp.where(f_switch, bgv, fgv),
                        jnp.where(f_switch, zero, bgv))

            zd = jnp.zeros(VS, f32)
            fg_dm, bg_dm = sw(fg_dm, bg_dm, zd)
            fg_dv, bg_dv = sw(fg_dv, bg_dv, zd)
            fg_gm, bg_gm = sw(fg_gm, bg_gm, zd)
            fg_gv, bg_gv = sw(fg_gv, bg_gv, zd)
            cnt_fg, cnt_bg = sw(cnt_fg, cnt_bg, zb)

            enough = f_do_upd & (cnt_fg >= 3.0)
            if use_grad_based:
                val = jnp.sqrt(fg_dv / fg_gv)
                invalid = ~jnp.isfinite(val) | (val == 0.0)
                var = jnp.clip(val, LOWER, UPPER)
                var = jnp.where(invalid, jnp.square(stds), var)
                new_stds = jnp.sqrt(var)
                new_mean = fg_dm + var * fg_gm
            else:
                scale = 1.0 / jnp.maximum(cnt_fg, 1.0)
                val = fg_dv * scale
                invalid = ~jnp.isfinite(val) | (val == 0.0)
                var = jnp.clip(val, LOWER, UPPER)
                var = jnp.where(invalid, jnp.square(stds), var)
                new_stds = jnp.sqrt(var)
                new_mean = fg_dm
            stds_n = jnp.where(enough, new_stds, stds)
            mean_n = jnp.where(enough, new_mean, mean)
            logdet_n = -csum(jnp.log(stds_n))
            tid_n = sca[MSCA_TID] + jnp.where(enough, 1.0, 0.0)

            # ---- emit stats row i ----
            e_change = (t["ke"] - (t["logp"] + logdet)) - e_init
            energy_em = em_ke - (em_logp + logdet)
            fisher = csum(jnp.square(em_z + em_zg))
            stepsf = jnp.maximum(t["steps"], 1).astype(f32)
            krows = jax.lax.broadcasted_iota(jnp.int32, (K,) + SS, 0)
            kmask = krows == i
            out_q_ref[:] = jnp.where(kmask, em_q[None], out_q_ref[:])
            stats = jnp.concatenate([
                div_b.astype(f32), t["steps"].astype(f32),
                e_change, t["ttime"] / stepsf, step,
                em_logp, energy_em, fisher, tid_n,
            ], axis=0)                                    # [NSTATS_MW, B]
            out_stats_ref[:] = jnp.where(kmask, stats[None],
                                         out_stats_ref[:])

            sca_n = jnp.stack([tid_n, logdet_n, cnt_fg, cnt_bg],
                              axis=0)                     # [NSCA_M, 1, B]
            est_n = jnp.stack([fg_dm, fg_dv, fg_gm, fg_gv,
                               bg_dm, bg_dv, bg_gm, bg_gv], axis=0)

            return dict(
                it=t["it"],
                q=em_q, g=em_zg / stds, logp=em_logp, v=em_v,
                stds=stds_n, mean=mean_n,
                est=est_n, sca=sca_n,
            )

        final = jax.lax.fori_loop(0, K, draw_body, outer)
        fin_q_ref[:] = final["q"]
        fin_g_ref[:] = final["g"]
        fin_logp_ref[:] = final["logp"]
        fin_v_ref[:] = final["v"]
        stds_out_ref[:] = final["stds"]
        mean_out_ref[:] = final["mean"]
        est_out_ref[:] = final["est"]
        sca_out_ref[:] = final["sca"]
        iters_ref[:] = jnp.broadcast_to(
            final["it"].astype(jnp.int32).reshape(1, 1), iters_ref.shape)

    return kernel


def mclmc_pallas_warmup_run(
    seed,
    flags,                 # [K, NFLAGS] i32 (NUTS warmup layout + col 6)
    q, g, logp,            # [C, d], [C, d], [C]
    v,                     # [C, d] transformed-space velocity
    stds, mean,            # [C, d]
    est,                   # [C, 8, d] packed estimator planes
    sca,                   # [C, NSCA_M] packed scalar state
    logp_grad_batched: Callable,
    mopts: MclmcOptions,
    sset,
    use_grad_based: bool,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
    model_args: tuple = (),
):
    """Launch the fused MCLMC warmup kernel for K = flags.shape[0] draws.

    Returns ``(q_f, g_f, logp_f, v_f, stds_f, mean_f, est_f, sca_f, draws,
    stats)`` with draws [C, K, d] and stats a dict of [C, K] arrays keyed by
    MCLMC_WARMUP_STAT_NAMES."""
    C, d = q.shape
    K = flags.shape[0]
    B = min(block, C)
    assert C % B == 0, (C, B)

    # Same Mosaic multi-program-grid workaround as nuts_pallas_warmup_run:
    # model-arg launches split into grid=1 calls per chain group with the
    # group index as the kernel's program-id base (bit-identical streams).
    if len(model_args) > 0 and C > B:
        outs = []
        for gi in range(C // B):
            sl = slice(gi * B, (gi + 1) * B)
            outs.append(mclmc_pallas_warmup_run(
                (seed, gi), flags, q[sl], g[sl], logp[sl], v[sl], stds[sl],
                mean[sl], est[sl], sca[sl], logp_grad_batched, mopts, sset,
                use_grad_based, block=B, interpret=interpret,
                model_args=model_args))
        cat = lambda idx: jnp.concatenate([o[idx] for o in outs], axis=0)
        stats_out = {k: jnp.concatenate([o[9][k] for o in outs], axis=0)
                     for k in outs[0][9]}
        return (cat(0), cat(1), cat(2), cat(3), cat(4), cat(5), cat(6),
                cat(7), cat(8), stats_out)
    grid = (C // B,)

    if isinstance(seed, tuple):
        seed, pid_base = seed
    else:
        pid_base = 0

    def vec(x):
        return jnp.asarray(x, jnp.float32).T.reshape(-1, C)

    def sca2(x):
        return jnp.asarray(x, jnp.float32).reshape(1, C)

    est_t = jnp.moveaxis(jnp.asarray(est, jnp.float32), 0, -1)  # [8, d, C]
    sca_t = jnp.asarray(sca, jnp.float32).T[:, None, :]   # [NSCA_M, 1, C]
    seed_arr = jnp.stack(
        [jnp.asarray(seed, jnp.int32).reshape(()),
         jnp.asarray(pid_base, jnp.int32).reshape(())]).reshape(1, 2)
    model_args = tuple(jnp.asarray(a, jnp.float32) for a in model_args)
    kernel = make_mclmc_warmup_kernel(
        logp_grad_batched, d, K, mopts, sset, use_grad_based,
        use_hw_prng=not interpret, n_model_args=len(model_args))

    vspec = lambda r: pl.BlockSpec((r, B), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    e3 = pl.BlockSpec((8, d, B), lambda i: (0, 0, i),
                      memory_space=pltpu.VMEM)
    sca_spec = pl.BlockSpec((NSCA_M, 1, B), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((K, d, C), jnp.float32),          # draws
        jax.ShapeDtypeStruct((K, NSTATS_MW, C), jnp.float32),  # stats
        jax.ShapeDtypeStruct((d, C), jnp.float32),             # final q
        jax.ShapeDtypeStruct((d, C), jnp.float32),             # final g
        jax.ShapeDtypeStruct((1, C), jnp.float32),             # final logp
        jax.ShapeDtypeStruct((d, C), jnp.float32),             # final v
        jax.ShapeDtypeStruct((d, C), jnp.float32),             # stds
        jax.ShapeDtypeStruct((d, C), jnp.float32),             # mean
        jax.ShapeDtypeStruct((8, d, C), jnp.float32),          # est
        jax.ShapeDtypeStruct((NSCA_M, 1, C), jnp.float32),     # sca
        jax.ShapeDtypeStruct((1, C), jnp.int32),               # iterations
    )
    out_specs = (
        pl.BlockSpec((K, d, B), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, NSTATS_MW, B), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        vspec(d), vspec(d), vspec(1), vspec(d), vspec(d), vspec(d), e3,
        sca_spec, vspec(1),
    )
    in_specs = [
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((K, flags.shape[1]), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        vspec(d), vspec(d), vspec(1), vspec(d), vspec(d), vspec(d), e3,
        sca_spec,
    ] + [
        pl.BlockSpec(a.shape, (lambda i, nd=a.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for a in model_args
    ]
    (draws, stats, q_f, g_f, logp_f, v_f, stds_f, mean_f, est_f, sca_f,
     iters) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(seed_arr, jnp.asarray(flags, jnp.int32), vec(q), vec(g), sca2(logp),
      vec(v), vec(stds), vec(mean), est_t, sca_t, *model_args)

    draws_out = jnp.moveaxis(draws, 2, 0)                      # [C, K, d]
    stats_out = {name: stats[:, i, :].T
                 for i, name in enumerate(MCLMC_WARMUP_STAT_NAMES)}
    stats_out["loop_iterations"] = iters[0]
    return (q_f.T, g_f.T, logp_f[0], v_f.T, stds_f.T, mean_f.T,
            jnp.moveaxis(est_f, -1, 0), sca_f[:, 0, :].T, draws_out,
            stats_out)
