"""Fully-fused Pallas NUTS engine (posterior phase, diagonal transform).

Why this exists: profiling the XLA formulation at 1024 chains showed the
while-loop carry (~70 tensors, lane-padded [C, d] -> [C, 128]) round-trips
~80 MB of HBM on EVERY leapfrog iteration (~160 us), dwarfing the actual
compute (~3 us).  This kernel keeps the entire sampler state resident in
VMEM with a chains-on-lanes [d, B] layout and runs a multi-draw loop inside
ONE ``pallas_call`` — HBM is touched once per call, not per iteration.

Scope (the sampler falls back to the XLA kernels otherwise):
* diagonal affine transform, Euclidean kinetic energy, mindepth 0, no
  extra_doublings / target_integration_time, no extra stores;
* the model's logp must lower inside a Pallas kernel (plain jnp elementwise
  ops, reductions, matmuls — iid/correlated normals, GLMs, ... qualify);
* RNG uses the TPU hardware PRNG: same-seed runs reproduce, but the stream
  differs from the host threefry path (distributional parity only).

Algorithm: the same iterative tree as ``kernels/nuts.py`` (trailing-zero span
recovery, matvec-form U-turn checks, progressive multinomial selection,
biased top-level acceptance).  One simplification falls out of fusing draws:
a finished tree resets immediately in the same iteration, so the draw-level
diverging/turning/done flags never need to be carried — they are emitted
from the current iteration's values.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nuts import NutsOptions

# stat row order in the packed [K, NSTATS, B] output
STAT_NAMES = [
    "depth", "diverging", "n_steps", "sum_accept", "sum_accept_sym",
    "max_energy_error", "logp", "energy", "energy_error",
    "index_in_trajectory", "fisher_distance", "step_size",
    "maxdepth_reached",
]
NSTATS = len(STAT_NAMES)

DEFAULT_BLOCK = 256  # chains per grid step (lanes fully utilized at >=128)


def _tz(x, cap):
    """Trailing zeros of i32 array x; cap for x == 0 (no clz in Mosaic)."""
    found = x == 0
    res = jnp.where(found, jnp.full_like(x, cap), jnp.zeros_like(x))
    for b in range(cap):
        newly = (~found) & (((x >> b) & 1) == 1)
        res = jnp.where(newly, jnp.full_like(x, b), res)
        found = found | newly
    return res


def _hash_bits(shape, seed_u32, it, salt):
    """Counter-based uint32 bits (murmur3 finalizer) — the interpret-mode /
    non-TPU fallback for the hardware PRNG."""
    n = 1
    for s in shape:
        n *= s
    idx = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0).reshape(shape)
    h = (seed_u32
         ^ jnp.uint32(salt * 2654435761 & 0xFFFFFFFF))         + it.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)         + idx * jnp.uint32(0x85EBCA77)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def make_kernel(logp_grad_batched: Callable, dim: int, K: int,
                opts: NutsOptions, jitter, use_hw_prng: bool = True,
                n_model_args: int = 0):
    """Kernel body; all refs carry a [.., B] chains-on-lanes block layout.
    ``n_model_args`` extra refs (model data, e.g. a GLM design matrix) follow
    the state inputs and are forwarded to ``logp_grad_batched``."""
    D = opts.maxdepth
    MAX_ERR = opts.max_energy_error
    CHECK = bool(opts.check_turning)

    salt_counter = [0]

    def kernel(seed_ref, q0_ref, g0_ref, logp0_ref, stds_ref, mean_ref,
               logdet_ref, step0_ref, bar_ref, *rest):
        model_arg_refs = rest[:n_model_args]
        (out_q_ref, out_stats_ref, fin_q_ref, fin_g_ref, fin_logp_ref,
         iters_ref) = rest[n_model_args:]
        model_args = tuple(r[:] for r in model_arg_refs)
        B = q0_ref.shape[1]
        if use_hw_prng:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        seed_u32 = (seed_ref[0, 0].astype(jnp.uint32)
                    + jnp.uint32(0x51ED2701) * pl.program_id(0).astype(jnp.uint32))
        it_box = [jnp.uint32(0)]  # replaced by the loop-carried counter

        def _uniform(shape):
            salt_counter[0] += 1
            if use_hw_prng:
                bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            else:
                bits = _hash_bits(shape, seed_u32, it_box[0], salt_counter[0])
            # Mosaic has no uint32 -> f32 cast; bits>>8 < 2^24 fits in i32.
            f = ((bits >> 8).astype(jnp.int32).astype(jnp.float32)
                 * (1.0 / (1 << 24)))
            return jnp.clip(f, 1e-12, 1.0 - 1e-7)

        def _normals(shape):
            u1 = _uniform(shape)
            u2 = _uniform(shape)
            return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)

        stds = stds_ref[:]
        mean = mean_ref[:]
        logdet = logdet_ref[:]          # [1, B]
        bar = bar_ref[:]                # [1, B]
        f32 = jnp.float32

        def eval_z(z):
            """z -> (logp [1,B], zg [d,B]) through the diagonal transform."""
            q = z * stds + mean
            logp, g = logp_grad_batched(q, *model_args)
            return logp.reshape(1, B), g * stds

        def fresh_step():
            if jitter is None:
                return bar
            return bar * (1.0 - jitter + 2.0 * jitter * _uniform((1, B)))

        def rand_dir():
            return jnp.where(_uniform((1, B)) < 0.5, f32(1.0), f32(-1.0))

        # ---- initial state: fresh tree at (q0, g0, logp0) ----
        z0 = (q0_ref[:] - mean) / stds
        zg0 = g0_ref[:] * stds
        logp0 = logp0_ref[:]
        v0 = _normals((dim, B))
        ke0 = 0.5 * jnp.sum(v0 * v0, 0, keepdims=True)

        zb = jnp.zeros((1, B), f32)
        ib = jnp.zeros((1, B), jnp.int32)
        rows_s = jax.lax.broadcasted_iota(jnp.int32, (D + 1, 1, B), 0)
        rows_b2 = jax.lax.broadcasted_iota(jnp.int32, (D + 1, B), 0)

        carry = dict(
            it=jnp.uint32(1),
            step=step0_ref[:],
            e_init=ke0 - (logp0 + logdet),
            dc=ib,                                  # completed draws
            # moving edge (full leapfrog state)
            e_z=z0, e_v=v0, e_zg=zg0, e_idx=ib,
            # trajectory endpoints
            m_z=z0, m_v=v0, m_zg=zg0, m_idx=ib,     # minus
            p_z=z0, p_v=v0, p_zg=zg0, p_idx=ib,     # plus
            # selected draws (momentum not needed)
            dm_z=z0, dm_zg=zg0, dm_logp=logp0, dm_ke=ke0, dm_idx=ib,
            ds_z=z0, ds_zg=zg0, ds_logp=logp0, ds_ke=ke0, ds_idx=ib,
            logw_m=zb, logw_s=jnp.full((1, B), -jnp.inf, f32),
            depth=ib, leaf=ib, direction=rand_dir(),
            # stats accumulators
            n_steps=ib, s_acc=zb, s_sym=zb, mx_err=zb,
            # checkpoint stacks + cached z.v scalars
            lz=jnp.zeros((D + 1, dim, B), f32),
            lv=jnp.zeros((D + 1, dim, B), f32),
            bl=jnp.zeros((D + 1, B), f32),
            mz=jnp.zeros((D + 1, dim, B), f32),
            mv=jnp.zeros((D + 1, dim, B), f32),
            bm=jnp.zeros((D + 1, B), f32),
        )

        def body(c):
            it_box[0] = c["it"]
            r_sel = _uniform((1, B))
            r_acc = _uniform((1, B))
            dirf = c["direction"]
            diri = dirf.astype(jnp.int32)

            # ---- leapfrog ----
            eps = dirf * c["step"]
            v1 = c["e_v"] + (eps / 2.0) * c["e_zg"]
            z1 = c["e_z"] + eps * v1
            logp1, zg1 = eval_z(z1)
            v2 = v1 + (eps / 2.0) * zg1
            ke1 = 0.5 * jnp.sum(v2 * v2, 0, keepdims=True)
            energy1 = ke1 - (logp1 + logdet)
            err = energy1 - c["e_init"]
            diverged = (err > MAX_ERR) | ~jnp.isfinite(err)
            idx1 = c["e_idx"] + diri

            # ---- accept stats ----
            diff = -err
            acc = jnp.exp(jnp.minimum(diff, 0.0))
            n_steps = c["n_steps"] + 1
            s_acc = c["s_acc"] + jnp.where(diverged, 0.0, acc)
            s_sym = c["s_sym"] + jnp.where(
                diverged, 0.0, 2.0 * acc / (1.0 + jnp.exp(diff)))
            mx_err = jnp.where(
                diverged, -jnp.inf,
                jnp.where(jnp.abs(diff) > jnp.abs(c["mx_err"]), diff,
                          c["mx_err"]))

            # ---- progressive multinomial within the subtree ----
            logw_leaf = -err
            first = c["leaf"] == 0
            logw_s = jnp.where(first, logw_leaf,
                               jnp.logaddexp(c["logw_s"], logw_leaf))
            take = first | (jnp.log(r_sel) < logw_leaf - logw_s)
            ds_z = jnp.where(take, z1, c["ds_z"])
            ds_zg = jnp.where(take, zg1, c["ds_zg"])
            ds_logp = jnp.where(take, logp1, c["ds_logp"])
            ds_ke = jnp.where(take, ke1, c["ds_ke"])
            ds_idx = jnp.where(take, idx1, c["ds_idx"])

            # ---- stack writes (one-hot row masks) ----
            d1 = jnp.sum(z1 * v2, 0, keepdims=True)
            row_l = jnp.minimum(_tz(c["leaf"], D), D).reshape(1, 1, B)
            tzn = _tz(c["leaf"] + 1, D)                       # [1, B]
            row_m = jnp.minimum(tzn + 1, D).reshape(1, 1, B)
            mask_l = rows_s == row_l
            mask_m = rows_s == row_m
            lz = jnp.where(mask_l, z1[None], c["lz"])
            lv = jnp.where(mask_l, v2[None], c["lv"])
            bl = jnp.where(mask_l[:, 0], d1, c["bl"])
            mz = jnp.where(mask_m, z1[None], c["mz"])
            mv = jnp.where(mask_m, v2[None], c["mv"])
            bm = jnp.where(mask_m[:, 0], d1, c["bm"])

            # ---- U-turn checks ----------------------------------------
            # Static unroll over the D levels with 3-D tensors only: Mosaic
            # handles rank-4 broadcasts with pathological relayouts (observed
            # ~10 ms/iteration; one shape even fails to compile), while the
            # per-level masked-sum gathers below run in sub-microseconds.
            if CHECK:
                turning_int = jnp.zeros((1, B), bool)
                tzn_b = tzn  # [1, B]

                def row_gather(stack, row):  # [D+1, d, B], [1,1,B] -> [d, B]
                    m = rows_s == row
                    return jnp.sum(jnp.where(m, stack, 0.0), axis=0)

                def row_gather1(vec, row):   # [D+1, B], [1,1,B] -> [1, B]
                    m = (rows_s == row)[:, 0]
                    return jnp.sum(jnp.where(m, vec, 0.0), axis=0,
                                   keepdims=True)

                def level_check(j):
                    def compute():
                        s_a = c["leaf"] + 1 - (1 << j)
                        s_b = c["leaf"] + 1 - (1 << (j - 1))
                        ra = jnp.minimum(_tz(s_a, D), D).reshape(1, 1, B)
                        a_z = row_gather(lz, ra)
                        a_v = row_gather(lv, ra)
                        a_b = row_gather1(bl, ra)
                        # t1: (A.first, new)
                        t1 = ((dirf * (jnp.sum(z1 * a_v, 0, keepdims=True)
                                       - a_b) < 0)
                              | (dirf * (d1 - jnp.sum(a_z * v2, 0,
                                                      keepdims=True)) < 0))
                        if j < 2:
                            return t1
                        rb = jnp.minimum(_tz(s_b, D), D).reshape(1, 1, B)
                        b_z = row_gather(lz, rb)
                        b_v = row_gather(lv, rb)
                        b_b = row_gather1(bl, rb)
                        # t2: (midpoint_j, new); mid row j is a static slice
                        t2 = ((dirf * (jnp.sum(z1 * mv[j], 0, keepdims=True)
                                       - bm[j:j + 1]) < 0)
                              | (dirf * (d1 - jnp.sum(mz[j] * v2, 0,
                                                      keepdims=True)) < 0))
                        # t3: (A.first, B.first)
                        t3 = ((dirf * (jnp.sum(b_z * a_v, 0, keepdims=True)
                                       - a_b) < 0)
                              | (dirf * (b_b - jnp.sum(a_z * b_v, 0,
                                                       keepdims=True)) < 0))
                        return t1 | t2 | t3

                    # NOTE: a scalar lax.cond on (j <= max(tzn)) would skip
                    # inactive levels, but Mosaic cannot legalize value-
                    # returning scf.if; the unconditional unroll is fast
                    # enough (~sub-us per level).
                    return compute()

                for j in range(1, D + 1):
                    turning_int = turning_int | (
                        (j <= tzn_b) & level_check(j))
            else:
                turning_int = jnp.zeros((1, B), bool)

            subtree_done = (c["leaf"] + 1) == (1 << c["depth"])

            fwd = dirf > 0
            far_z = jnp.where(fwd, c["m_z"], c["p_z"])
            far_v = jnp.where(fwd, c["m_v"], c["p_v"])
            near_z = jnp.where(fwd, c["p_z"], c["m_z"])
            near_v = jnp.where(fwd, c["p_v"], c["m_v"])
            if CHECK:
                far_zv = jnp.sum(far_z * far_v, 0, keepdims=True)
                t_out = ((dirf * (jnp.sum(z1 * far_v, 0, keepdims=True)
                                  - far_zv) < 0)
                         | (dirf * (d1 - jnp.sum(far_z * v2, 0,
                                                 keepdims=True)) < 0))
                near_zv = jnp.sum(near_z * near_v, 0, keepdims=True)
                t_nr = ((dirf * (jnp.sum(z1 * near_v, 0, keepdims=True)
                                 - near_zv) < 0)
                        | (dirf * (d1 - jnp.sum(near_z * v2, 0,
                                                keepdims=True)) < 0))
                b0_z, b0_v = lz[D], lv[D]
                t_b0 = ((dirf * (jnp.sum(b0_z * far_v, 0, keepdims=True)
                                 - far_zv) < 0)
                        | (dirf * (bl[D:D + 1]
                                   - jnp.sum(far_z * b0_v, 0,
                                             keepdims=True)) < 0))
                turning_top = t_out | ((c["depth"] > 0) & (t_nr | t_b0))
            else:
                turning_top = jnp.zeros((1, B), bool)

            # ---- top-level merge (biased acceptance) ----
            do_merge = subtree_done & ~diverged & ~turning_int
            take_s = (logw_s >= c["logw_m"]) | (
                jnp.log(r_acc) < logw_s - c["logw_m"])
            mt = do_merge & take_s
            dm_z = jnp.where(mt, ds_z, c["dm_z"])
            dm_zg = jnp.where(mt, ds_zg, c["dm_zg"])
            dm_logp = jnp.where(mt, ds_logp, c["dm_logp"])
            dm_ke = jnp.where(mt, ds_ke, c["dm_ke"])
            dm_idx = jnp.where(mt, ds_idx, c["dm_idx"])
            logw_m = jnp.where(do_merge,
                               jnp.logaddexp(c["logw_m"], logw_s), c["logw_m"])
            mf = do_merge & fwd
            mb = do_merge & ~fwd
            p_z = jnp.where(mf, z1, c["p_z"])
            p_v = jnp.where(mf, v2, c["p_v"])
            p_zg = jnp.where(mf, zg1, c["p_zg"])
            p_idx = jnp.where(mf, idx1, c["p_idx"])
            m_z = jnp.where(mb, z1, c["m_z"])
            m_v = jnp.where(mb, v2, c["m_v"])
            m_zg = jnp.where(mb, zg1, c["m_zg"])
            m_idx = jnp.where(mb, idx1, c["m_idx"])

            depth = c["depth"] + do_merge.astype(jnp.int32)
            turned = turning_int | (do_merge & turning_top)
            tree_done = diverged | turned | (depth >= D)

            # ---- emit the draw where the tree finished ----
            fin = tree_done
            dm_q = dm_z * stds + mean
            energy_m = dm_ke - (dm_logp + logdet)
            fisher = jnp.sum(jnp.square(dm_z + dm_zg), 0, keepdims=True)
            krows = jax.lax.broadcasted_iota(jnp.int32, (K, 1, B), 0)
            kmask = fin[None] & (krows == c["dc"].reshape(1, 1, B))
            out_q_ref[:] = jnp.where(kmask, dm_q[None], out_q_ref[:])
            stats = jnp.concatenate([
                depth.astype(f32), diverged.astype(f32),
                n_steps.astype(f32), s_acc, s_sym, mx_err,
                dm_logp, energy_m, energy_m - c["e_init"],
                dm_idx.astype(f32), fisher, c["step"],
                (depth >= D).astype(f32),
            ], axis=0)                                         # [NSTATS, B]
            out_stats_ref[:] = jnp.where(kmask[:, 0][:, None], stats[None],
                                         out_stats_ref[:])

            # ---- next state: fresh draw (fin) / new doubling / same subtree
            new_dir = rand_dir()
            new_doub = do_merge & ~tree_done
            v_new = _normals((dim, B))
            ke_new = 0.5 * jnp.sum(v_new * v_new, 0, keepdims=True)
            step_new = fresh_step()

            jump_p = new_dir > 0
            # doubling jump target endpoint
            j_z = jnp.where(jump_p, p_z, m_z)
            j_v = jnp.where(jump_p, p_v, m_v)
            j_zg = jnp.where(jump_p, p_zg, m_zg)
            j_idx = jnp.where(jump_p, p_idx, m_idx)

            def nxt(fresh, doub, cont):
                return jnp.where(fin, fresh, jnp.where(new_doub, doub, cont))

            c2 = dict(
                it=c["it"] + jnp.uint32(1),
                step=nxt(step_new, c["step"], c["step"]),
                e_init=nxt(ke_new - (dm_logp + logdet), c["e_init"],
                           c["e_init"]),
                dc=c["dc"] + fin.astype(jnp.int32),
                e_z=nxt(dm_z, j_z, z1), e_v=nxt(v_new, j_v, v2),
                e_zg=nxt(dm_zg, j_zg, zg1), e_idx=nxt(ib, j_idx, idx1),
                m_z=nxt(dm_z, m_z, m_z), m_v=nxt(v_new, m_v, m_v),
                m_zg=nxt(dm_zg, m_zg, m_zg), m_idx=nxt(ib, m_idx, m_idx),
                p_z=nxt(dm_z, p_z, p_z), p_v=nxt(v_new, p_v, p_v),
                p_zg=nxt(dm_zg, p_zg, p_zg), p_idx=nxt(ib, p_idx, p_idx),
                dm_z=dm_z, dm_zg=dm_zg, dm_logp=dm_logp,
                dm_ke=nxt(ke_new, dm_ke, dm_ke), dm_idx=nxt(ib, dm_idx, dm_idx),
                ds_z=ds_z, ds_zg=ds_zg, ds_logp=ds_logp, ds_ke=ds_ke,
                ds_idx=ds_idx,
                logw_m=nxt(zb, logw_m, logw_m),
                logw_s=logw_s,
                depth=nxt(ib, depth, depth),
                leaf=jnp.where(fin | new_doub, ib, c["leaf"] + 1),
                direction=jnp.where(fin | new_doub, new_dir, c["direction"]),
                n_steps=nxt(ib, n_steps, n_steps),
                s_acc=nxt(zb, s_acc, s_acc),
                s_sym=nxt(zb, s_sym, s_sym),
                mx_err=nxt(zb, mx_err, mx_err),
                lz=lz, lv=lv, bl=bl, mz=mz, mv=mv, bm=bm,
            )
            return c2

        def cond(c):
            return jnp.any(c["dc"] < K)

        final = jax.lax.while_loop(cond, body, carry)
        fin_q_ref[:] = final["dm_z"] * stds + mean
        fin_g_ref[:] = final["dm_zg"] / stds
        fin_logp_ref[:] = final["dm_logp"]
        iters_ref[:] = jnp.broadcast_to(
            final["it"].astype(jnp.int32).reshape(1, 1), iters_ref.shape)

    return kernel


def nuts_pallas_run(
    seed: int | jax.Array,
    q: jax.Array,          # [C, d]
    g: jax.Array,          # [C, d]
    logp: jax.Array,       # [C]
    stds: jax.Array,       # [C, d]
    mean: jax.Array,       # [C, d]
    logdet: jax.Array,     # [C]
    step0: jax.Array,      # [C]
    step_bar: jax.Array,   # [C]
    num_draws: int,
    logp_grad_batched: Callable,
    opts: NutsOptions,
    jitter,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
    model_args: tuple = (),
):
    """Launch the fused kernel; returns (q_fin, g_fin, logp_fin, draws, stats)
    with draws [C, K, d] and stats dict of [C, K] arrays.

    ``model_args``: arrays the model's logp needs (replicated to every block,
    VMEM-resident — suitable up to a few MB; larger datasets need an HBM/DMA
    path).  ``logp_grad_batched(q, *model_args)``."""
    C, d = q.shape
    K = num_draws
    B = min(block, C)
    assert C % B == 0, (C, B)
    grid = (C // B,)

    def cl(x):  # chains-on-lanes
        return jnp.asarray(x, jnp.float32).T.reshape(-1, C)

    q_t, g_t, stds_t, mean_t = cl(q), cl(g), cl(stds), cl(mean)
    logp_t, logdet_t = cl(logp[:, None]), cl(logdet[:, None])
    step_t, bar_t = cl(step0[:, None]), cl(step_bar[:, None])
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    model_args = tuple(jnp.asarray(a, jnp.float32) for a in model_args)
    kernel = make_kernel(logp_grad_batched, d, K, opts, jitter,
                         use_hw_prng=not interpret,
                         n_model_args=len(model_args))

    vspec = lambda r: pl.BlockSpec((r, B), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((K, d, C), jnp.float32),       # draws
        jax.ShapeDtypeStruct((K, NSTATS, C), jnp.float32),  # stats
        jax.ShapeDtypeStruct((d, C), jnp.float32),          # final q
        jax.ShapeDtypeStruct((d, C), jnp.float32),          # final g
        jax.ShapeDtypeStruct((1, C), jnp.float32),          # final logp
        jax.ShapeDtypeStruct((1, C), jnp.int32),            # loop iterations
    )
    out_specs = (
        pl.BlockSpec((K, d, B), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, NSTATS, B), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        vspec(d), vspec(d), vspec(1), vspec(1),
    )
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        vspec(d), vspec(d), vspec(1), vspec(d), vspec(d), vspec(1),
        vspec(1), vspec(1),
    ] + [
        pl.BlockSpec(a.shape, (lambda i, nd=a.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for a in model_args
    ]
    draws, stats, q_f, g_f, logp_f, iters = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(seed_arr, q_t, g_t, logp_t, stds_t, mean_t, logdet_t, step_t, bar_t,
      *model_args)

    draws_out = jnp.moveaxis(draws, 2, 0)                   # [C, K, d]
    stats_out = {name: stats[:, i, :].T for i, name in enumerate(STAT_NAMES)}
    stats_out["loop_iterations"] = iters[0]
    return (q_f.T, g_f.T, logp_f[0], draws_out, stats_out)
