"""Fully-fused Pallas NUTS engine (posterior phase, diagonal transform).

Why this exists: profiling the XLA formulation at 1024 chains showed the
while-loop carry (~70 tensors, lane-padded [C, d] -> [C, 128]) round-trips
~80 MB of HBM on EVERY leapfrog iteration (~160 us), dwarfing the actual
compute (~3 us).  This kernel keeps the entire sampler state resident in
VMEM and runs a multi-draw loop inside ONE ``pallas_call`` — HBM is touched
once per call, not per iteration.  Two state layouts share the same tree
logic (``layout=`` on make_kernel / the launchers): chains-on-lanes [d, B]
for small/medium d (lanes fully occupied by chains at B >= 128), and
dim-on-lanes [B, d] for large d (chains on sublanes in blocks of 8-32; the
checkpoint stacks stay VMEM-resident at d in the thousands — the
reference's ``sample_1000_1000`` regime).

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
                n_model_args: int = 0, flow=None, stream=None,
                layout: str = "cl"):
    """Kernel body; all refs carry a [.., B] chains-on-lanes block layout.

    ``layout`` picks the on-chip state orientation (same tree algorithm,
    single source — only shapes/reduction axes change):

    * ``"cl"`` (chains-on-lanes, default): vectors are [d, B], per-chain
      scalars [1, B]; lanes are chains, so B >= 128 keeps the VPU full.
      Best when the whole state (incl. the 6 checkpoint stacks of
      (D+1) x d x B words) fits VMEM — small/medium d.
    * ``"ld"`` (dim-on-lanes): vectors are [B, d], scalars [B, 1]; lanes
      are parameter dims, chains ride sublanes with SMALL B (8-32).  The
      per-block state is ~B x (6(D+1)+32) x d words, so d in the
      thousands stays VMEM-resident where the "cl" stacks could never
      fit — this is what makes the reference's ``sample_1000_1000``
      configuration (benches/sample.rs:195-198) runnable on the fused
      engine instead of the HBM-bound XLA while_loop.  flow/stream
      modes are cl-only.
    ``n_model_args`` extra refs (model data, e.g. a GLM design matrix) follow
    the state inputs and are forwarded to ``logp_grad_batched``.

    ``flow = (pallas_forward, n_flow_refs)`` switches the kernel to a frozen
    NORMALIZING-FLOW transform (the post-warmup Fisher-HMC state):
    ``n_flow_refs`` packed parameter refs (shared across chains — pooled
    flow training — so the coupling MLPs run as plain MXU matmuls over the
    [d, B] lanes layout) precede the model args; the q0 ref carries z0
    instead (entering the flow needs its inverse, which runs host-side);
    log-density, gradient AND position-dependent log-Jacobian come from ONE
    in-kernel autodiff pass through ``pallas_forward`` per leapfrog.

    ``stream = (tile_eval, finalize, n_stream_refs, tile_rows)`` switches the
    likelihood to the HBM-STREAMING data path (models.model.StreamSpec):
    ``n_stream_refs`` data refs stay in HBM (``memory_space=ANY``) and each
    evaluation DMAs row tiles through double-buffered VMEM scratch (one HBM
    pass of the data per leapfrog — prefetch of tile t+1 overlaps compute on
    tile t), accumulating the per-tile (logp, grad) partials.  Mutually
    exclusive with ``flow``."""
    assert flow is None or stream is None, "flow + streaming not supported"
    assert layout in ("cl", "ld")
    LD = layout == "ld"
    assert not (LD and (flow is not None or stream is not None)), \
        "flow/stream modes are chains-on-lanes only"
    D = opts.maxdepth
    MAX_ERR = opts.max_energy_error
    CHECK = bool(opts.check_turning)
    # Large-d (dim-on-lanes) only: maintain the (D+1)x(D+1) cross-dot matrix
    # czs[i][j] = csum(lz[i]*lv[j]) incrementally so the U-turn boundary
    # level reads scalar-sized lookups instead of 4 full-stack [B,d] gather
    # passes per iteration.  At small d (cl tier) the scalar bookkeeping
    # costs more than the vector passes it saves, so cl keeps the direct
    # gathers (BASELINE.md round-5 measurement).
    USE_CZ = LD and CHECK
    # Emission experiment knob (round-5 A/B; see _emit below).
    import os as _os

    MASKED_EMIT = _os.environ.get("NUTS_PALLAS_MASKED_EMIT", "0") == "1"
    # TEMPORARY ablation knob for cost attribution (wrong results; bench
    # experiments only): "no_m" drops the m-stack dots, "no_static" drops
    # all static-level dots, "no_boundary" drops the dynamic boundary level,
    # "no_top" drops the top-level endpoint checks, "no_stacks" skips the
    # checkpoint-stack writes entirely.
    ABLATE = set(_os.environ.get("NUTS_PALLAS_ABLATE", "").split(","))

    salt_counter = [0]

    def kernel(seed_ref, q0_ref, g0_ref, logp0_ref, stds_ref, mean_ref,
               logdet_ref, step0_ref, bar_ref, *rest):
        if flow is not None:
            flow_fwd, n_flow_refs = flow
            flow_arrs = [r[:] for r in rest[:n_flow_refs]]
            rest = rest[n_flow_refs:]
        n_stream = stream[2] if stream is not None else 0
        stream_refs = rest[:n_stream]
        rest = rest[n_stream:]
        model_arg_refs = rest[:n_model_args]
        rest = rest[n_model_args:]
        (out_q_ref, out_stats_ref, fin_q_ref, fin_g_ref, fin_logp_ref,
         iters_ref) = rest[:6]
        if stream is not None:
            stream_scratch = rest[6:6 + n_stream]
            stream_sem = rest[6 + n_stream]
        model_args = tuple(r[:] for r in model_arg_refs)
        B = q0_ref.shape[0] if LD else q0_ref.shape[1]
        VS = (B, dim) if LD else (dim, B)   # per-chain vector block shape
        SS = (B, 1) if LD else (1, B)       # per-chain scalar block shape

        def csum(x):
            """Per-chain contraction along the layout's reduction axis."""
            return jnp.sum(x, 1 if LD else 0, keepdims=True)
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

        if flow is not None:
            def eval_z(z):
                """z -> (logp [1,B], zg [d,B], logdet [1,B], q [d,B]) through
                the frozen flow: zg is the gradient of the z-space target
                logp(F(z)) + logdet(z) (FlowOps.eval_from_z semantics), via
                one value_and_grad pass (columns are independent, so the
                grad of the lane-sum is the per-chain gradient)."""
                def Fsum(zz):
                    q, ld = flow_fwd(flow_arrs, zz)
                    lp = logp_grad_batched(q, *model_args)[0]
                    return jnp.sum(lp + ld[0]), (lp.reshape(1, B), ld, q)

                (_, (lp, ld, q)), zg = jax.value_and_grad(
                    Fsum, has_aux=True)(z)
                return lp, zg, ld, q
        elif stream is not None:
            tile_eval, finalize, _, TILE = stream
            n_rows = stream_refs[0].shape[0]
            n_tiles = n_rows // TILE

            def _copy(t, slot):
                return [pltpu.make_async_copy(
                    r.at[pl.ds(t * TILE, TILE)],
                    stream_scratch[i].at[slot],
                    stream_sem.at[slot, i])
                    for i, r in enumerate(stream_refs)]

            def eval_z(z):
                """z -> (logp [1,B], zg [d,B], logdet [1,B], q [d,B]) with
                the likelihood data STREAMED from HBM: the tile loop is a
                static unroll (row count is static), tile t+1's DMA is
                issued before tile t's compute so the copy engine overlaps
                the MXU work, and accumulators stay in registers (the
                unroll makes them plain SSA values — no loop-carry layout
                hazards)."""
                q = z * stds + mean
                for cp in _copy(0, 0):
                    cp.start()
                lp_acc = jnp.zeros((1, B), f32)
                g_acc = jnp.zeros((dim, B), f32)
                for t in range(n_tiles):
                    slot = t % 2
                    if t + 1 < n_tiles:
                        for cp in _copy(t + 1, (t + 1) % 2):
                            cp.start()
                    for cp in _copy(t, slot):
                        cp.wait()
                    tiles = tuple(s[slot] for s in stream_scratch)
                    lp_p, g_p = tile_eval(q, *tiles)
                    lp_acc = lp_acc + lp_p
                    g_acc = g_acc + g_p
                logp, g = finalize(q, lp_acc, g_acc)
                return logp.reshape(1, B), g * stds, logdet, q
        else:
            def eval_z(z):
                """z -> (logp [SS], zg [VS], logdet [SS], q [VS]) through
                the diagonal transform (logdet is position-independent)."""
                q = z * stds + mean
                logp, g = logp_grad_batched(q, *model_args)
                return logp.reshape(SS), g * stds, logdet, q

        def fresh_step():
            if jitter is None:
                return bar
            return bar * (1.0 - jitter + 2.0 * jitter * _uniform(SS))

        def rand_dir():
            return jnp.where(_uniform(SS) < 0.5, f32(1.0), f32(-1.0))

        # ---- initial state: fresh tree at (q0, g0, logp0) ----
        if flow is not None:
            # flow mode: the "q0" ref carries z0 (host-side inverse); one
            # in-kernel eval recovers q/logp/grad/logdet at the start point.
            z0 = q0_ref[:]
            logp0, zg0, ld0, qq0 = eval_z(z0)
        else:
            z0 = (q0_ref[:] - mean) / stds
            zg0 = g0_ref[:] * stds
            logp0 = logp0_ref[:]
            ld0 = logdet
            qq0 = q0_ref[:]
        v0 = _normals(VS)
        ke0 = 0.5 * csum(v0 * v0)

        # Non-replicated [SS] zeros for the while-loop carry.  jnp.zeros is a
        # splat constant that Mosaic lays out replicated ({*,*}); the loop
        # body produces genuinely per-lane values and the carry relayout
        # concrete -> replicated is rejected ("Not implemented: Sublane
        # broadcast" in the cl layout / "Lane broadcast" in ld).  A value
        # varying along BOTH sublanes and lanes (sum of two iotas) gets the
        # concrete {0,0} layout; clamping to zero keeps it.  Same trick as
        # make_warmup_kernel below (where it was load-bearing from day one).
        if LD:
            _mix = (jax.lax.broadcasted_iota(jnp.int32, (B, 128), 0)
                    + jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1))
            ib = jnp.minimum(_mix[:, 0:1], 0)
        else:
            _mix = (jax.lax.broadcasted_iota(jnp.int32, (8, B), 0)
                    + jax.lax.broadcasted_iota(jnp.int32, (8, B), 1))
            ib = jnp.minimum(_mix[0:1], 0)
        zb = ib.astype(f32)
        # stack-row index grid, shaped to mask BOTH the vector stacks
        # ((D+1,) + VS via broadcast) and the scalar stacks ((D+1,) + SS)
        rows_s = jax.lax.broadcasted_iota(jnp.int32, (D + 1,) + SS, 0)

        carry = dict(
            it=jnp.uint32(1),
            step=step0_ref[:],
            e_init=ke0 - (logp0 + ld0),
            dc=ib,                                  # completed draws
            # moving edge (full leapfrog state)
            e_z=z0, e_v=v0, e_zg=zg0, e_idx=ib,
            # trajectory endpoints
            m_z=z0, m_v=v0, m_zg=zg0, m_idx=ib,     # minus
            p_z=z0, p_v=v0, p_zg=zg0, p_idx=ib,     # plus
            # selected draws (momentum not needed); q and the (position-
            # dependent, under a flow) log-Jacobian ride along so emission
            # and energies never need the inverse map
            dm_z=z0, dm_zg=zg0, dm_logp=logp0, dm_ke=ke0, dm_idx=ib,
            dm_q=qq0, dm_ld=ld0,
            ds_z=z0, ds_zg=zg0, ds_logp=logp0, ds_ke=ke0, ds_idx=ib,
            ds_q=qq0, ds_ld=ld0,
            logw_m=zb, logw_s=zb + f32(-jnp.inf),
            depth=ib, leaf=ib, direction=rand_dir(),
            # stats accumulators
            n_steps=ib, s_acc=zb, s_sym=zb, mx_err=zb,
            # checkpoint stacks + cached z.v scalar stacks (3-D so one
            # rows_s mask shape serves both)
            lz=jnp.zeros((D + 1,) + VS, f32),
            lv=jnp.zeros((D + 1,) + VS, f32),
            bl=jnp.zeros((D + 1,) + SS, f32),
            mz=jnp.zeros((D + 1,) + VS, f32),
            mv=jnp.zeros((D + 1,) + VS, f32),
            bm=jnp.zeros((D + 1,) + SS, f32),
        )
        if USE_CZ:
            for _i in range(D + 1):
                carry[f"cz{_i}"] = jnp.zeros((D + 1,) + SS, f32)

        def body(c):
            it_box[0] = c["it"]
            r_sel = _uniform(SS)
            r_acc = _uniform(SS)
            dirf = c["direction"]
            diri = dirf.astype(jnp.int32)

            # ---- leapfrog ----
            eps = dirf * c["step"]
            v1 = c["e_v"] + (eps / 2.0) * c["e_zg"]
            z1 = c["e_z"] + eps * v1
            logp1, zg1, ld1, q1 = eval_z(z1)
            v2 = v1 + (eps / 2.0) * zg1
            ke1 = 0.5 * csum(v2 * v2)
            energy1 = ke1 - (logp1 + ld1)
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
            ds_q = jnp.where(take, q1, c["ds_q"])
            ds_ld = jnp.where(take, ld1, c["ds_ld"])

            # ---- stack writes (one-hot row masks) ----
            d1 = csum(z1 * v2)
            row_l = jnp.minimum(_tz(c["leaf"], D), D).reshape((1,) + SS)
            tzn = _tz(c["leaf"] + 1, D)                       # [SS]
            row_m = jnp.minimum(tzn + 1, D).reshape((1,) + SS)
            mask_l = rows_s == row_l
            mask_m = rows_s == row_m
            if "no_stacks" in ABLATE:
                lz, lv, bl = c["lz"], c["lv"], c["bl"]
                mz, mv, bm = c["mz"], c["mv"], c["bm"]
            else:
                lz = jnp.where(mask_l, z1[None], c["lz"])
                lv = jnp.where(mask_l, v2[None], c["lv"])
                bl = jnp.where(mask_l, d1, c["bl"])
                mz = jnp.where(mask_m, z1[None], c["mz"])
                mv = jnp.where(mask_m, v2[None], c["mv"])
                bm = jnp.where(mask_m, d1, c["bm"])
            czs = [c[f"cz{i}"] for i in range(D + 1)] if USE_CZ else None

            # ---- U-turn checks ----------------------------------------
            # Static unroll over the D levels with 3-D tensors only: Mosaic
            # handles rank-4 broadcasts with pathological relayouts (observed
            # ~10 ms/iteration; one shape even fails to compile).
            #
            # Row-index structure (round-4 rewrite; ablated 78% of runtime
            # at d=1000 in the naive per-level-gather form): for an active
            # level j (j <= t where t = tz(leaf+1), leaf+1 = m*2^t, m odd):
            #   rb = tz(leaf+1 - 2^(j-1)) = j-1   ALWAYS (static slice), and
            #   ra = tz(leaf+1 - 2^j)     = j     for j < t (static slice);
            #                             > j     only at the boundary j == t.
            # So every dot product the static levels need comes from one
            # per-row pass over each stack (Z1LV/LZV2/M1/M2 + adjacent-row
            # cross dots), computed ONCE per iteration; only the single
            # per-chain boundary level j == t gathers dynamic rows.  All
            # values are identical to the per-level-gather form (same
            # products, same reductions), so draws stay bit-exact.
            if CHECK:
                turning_int = jnp.zeros(SS, bool)
                tzn_b = tzn  # [SS]

                def csum3(x):  # [D+1]+VS -> [D+1]+SS per-row contraction
                    return jnp.sum(x, 2 if LD else 1, keepdims=True)

                def row_gather(stack, row):  # [D+1]+VS, [1]+SS -> [VS]
                    m = rows_s == row
                    return jnp.sum(jnp.where(m, stack, 0.0), axis=0)

                def row_gather1(vec, row):   # [D+1]+SS, [1]+SS -> [SS]
                    m = rows_s == row
                    return jnp.sum(jnp.where(m, vec, 0.0), axis=0)

                if "no_zv" in ABLATE:
                    z1v = jnp.zeros((D + 1,) + SS, f32)
                    zv2 = jnp.zeros((D + 1,) + SS, f32)
                else:
                    z1v = csum3(z1[None] * lv)  # csum(z1 * lv[i]) for all i
                    zv2 = csum3(lz * v2[None])  # csum(lz[i] * v2)
                if "no_m" in ABLATE:
                    m1 = jnp.zeros((D + 1,) + SS, f32)
                    m2 = jnp.zeros((D + 1,) + SS, f32)
                else:
                    m1 = csum3(z1[None] * mv)     # csum(z1 * mv[i])
                    m2 = csum3(mz * v2[None])     # csum(mz[i] * v2)
                zero_row = jnp.zeros((1,) + SS, f32)
                if USE_CZ:
                    # Incrementally-maintained cross-dot matrix (round-5
                    # large-d lever): czs[i][j] == csum(lz[i] * lv[j]) at all
                    # times.  When the one-hot write lands in row r, row r of
                    # the matrix is exactly z1v (lz[r] is now z1) and column
                    # r is exactly zv2 (lv[r] is now v2) — both already
                    # computed above — so maintenance costs two masked
                    # [D+1]+SS writes per i (scalar-sized), and BOTH the
                    # adjacent-row t3 dots and the boundary-level t3d dots
                    # become lookups instead of ~4 full-stack [B,d] gather
                    # passes per iteration.  Cell (r, r) is d1 via either
                    # update (z1v[r] == zv2[r] == csum(z1*v2)).
                    rl2 = row_l[0]                       # [SS]
                    czs = [jnp.where(rl2 == i, z1v,
                                     jnp.where(mask_l, zv2[i], czs[i]))
                           for i in range(D + 1)]
                    # adjacency vectors aligned by level j (row j holds the
                    # level-j value; row 0 unused): static slices + concat,
                    # no per-level scalar ops
                    adj_bzav_v = jnp.concatenate(
                        [zero_row] + [czs[j - 1][j:j + 1]
                                      for j in range(1, D + 1)], axis=0)
                    adj_azbv_v = jnp.concatenate(
                        [zero_row] + [czs[j][j - 1:j]
                                      for j in range(1, D + 1)], axis=0)
                else:
                    # adjacent-row cross dots (index j holds the level-j
                    # (lz[j-1], lv[j]) pair; row 0 unused)
                    adj_bzav_v = jnp.concatenate(
                        [zero_row, csum3(lz[:-1] * lv[1:])], axis=0)
                    adj_azbv_v = jnp.concatenate(
                        [zero_row, csum3(lz[1:] * lv[:-1])], axis=0)

                if "no_static" not in ABLATE:
                    # ---- static levels, VECTORIZED over the row axis ----
                    # (round-5: the per-level Python unroll issued ~100
                    # one-vreg ops per iteration; op-issue time dominated
                    # the actual vector work — measured ablations,
                    # BASELINE.md round-5 section).  Level j is active iff
                    # 1 <= j < tzn; identical arithmetic per level, so the
                    # whole ladder is D+1 rows of elementwise ops.
                    dirb = dirf[None]
                    d1b = d1[None]
                    blm1 = jnp.concatenate([zero_row, bl[:-1]], axis=0)
                    T1 = ((dirb * (z1v - bl) < 0)
                          | (dirb * (d1b - zv2) < 0))
                    T2 = ((dirb * (m1 - bm) < 0)
                          | (dirb * (d1b - m2) < 0))
                    T3 = ((dirb * (adj_bzav_v - bl) < 0)
                          | (dirb * (blm1 - adj_azbv_v) < 0))
                    TJ = T1 | ((rows_s >= 2) & (T2 | T3))
                    act_lvl = (rows_s >= 1) & (rows_s < tzn_b[None])
                    turning_int = turning_int | (jnp.sum(
                        (act_lvl & TJ).astype(jnp.int32), axis=0) > 0)

                if "no_boundary" not in ABLATE:
                    # ---- boundary level j == tzn (the only dynamic-row
                    # level), with GROUPED flat gathers: stacking the scalar
                    # rails lets one mask/select/static-slice-sum serve
                    # three extractions (same masked-sum arithmetic as
                    # row_gather1, so values are bit-identical) ----
                    s_a = c["leaf"] + 1 - jnp.left_shift(1, tzn_b)
                    ra = jnp.minimum(_tz(s_a, D), D).reshape((1,) + SS)
                    row_t = tzn_b.reshape((1,) + SS)       # mid row == tzn
                    row_b = (tzn_b - 1).reshape((1,) + SS)  # rb == tzn - 1
                    rows3 = jnp.concatenate([rows_s] * 3, axis=0)

                    def gather3(va, vb, vc, row):
                        g = jnp.concatenate([va, vb, vc], axis=0)
                        sel = jnp.where(rows3 == row, g, 0.0)
                        return (jnp.sum(sel[:D + 1], axis=0),
                                jnp.sum(sel[D + 1:2 * (D + 1)], axis=0),
                                jnp.sum(sel[2 * (D + 1):], axis=0))

                    a_z1v, a_zv2, a_b = gather3(z1v, zv2, bl, ra)
                    t1d = ((dirf * (a_z1v - a_b) < 0)
                           | (dirf * (d1 - a_zv2) < 0))
                    t_m1, t_bm, t_m2 = gather3(m1, bm, m2, row_t)
                    t2d = ((dirf * (t_m1 - t_bm) < 0)
                           | (dirf * (d1 - t_m2) < 0))
                    if USE_CZ:
                        # flat CZ gather: one masked sum over the
                        # (D+1)^2-row concatenation per lookup
                        czf = jnp.concatenate(czs, axis=0)
                        rows_cz = jax.lax.broadcasted_iota(
                            jnp.int32, ((D + 1) * (D + 1),) + SS, 0)

                        def cz_at(ri, rj):
                            m = rows_cz == (ri * (D + 1) + rj)
                            return jnp.sum(jnp.where(m, czf, 0.0), axis=0)

                        b_bl = row_gather1(bl, row_b)
                        t3d = ((dirf * (cz_at(row_b, ra) - a_b) < 0)
                               | (dirf * (b_bl - cz_at(ra, row_b)) < 0))
                    else:
                        a_z = row_gather(lz, ra)
                        a_v = row_gather(lv, ra)
                        b_z = row_gather(lz, row_b)
                        b_v = row_gather(lv, row_b)
                        t3d = ((dirf * (csum(b_z * a_v) - a_b) < 0)
                               | (dirf * (row_gather1(bl, row_b)
                                          - csum(a_z * b_v)) < 0))
                    turning_int = turning_int | ((tzn_b >= 1) & t1d) | (
                        (tzn_b >= 2) & (t2d | t3d))
            else:
                turning_int = jnp.zeros(SS, bool)

            subtree_done = (c["leaf"] + 1) == (1 << c["depth"])

            fwd = dirf > 0
            far_z = jnp.where(fwd, c["m_z"], c["p_z"])
            far_v = jnp.where(fwd, c["m_v"], c["p_v"])
            near_z = jnp.where(fwd, c["p_z"], c["m_z"])
            near_v = jnp.where(fwd, c["p_v"], c["m_v"])
            if CHECK and "no_top" not in ABLATE:
                far_zv = csum(far_z * far_v)
                t_out = ((dirf * (csum(z1 * far_v) - far_zv) < 0)
                         | (dirf * (d1 - csum(far_z * v2)) < 0))
                near_zv = csum(near_z * near_v)
                t_nr = ((dirf * (csum(z1 * near_v) - near_zv) < 0)
                        | (dirf * (d1 - csum(near_z * v2)) < 0))
                b0_z, b0_v = lz[D], lv[D]
                t_b0 = ((dirf * (csum(b0_z * far_v) - far_zv) < 0)
                        | (dirf * (bl[D] - csum(far_z * b0_v)) < 0))
                turning_top = t_out | ((c["depth"] > 0) & (t_nr | t_b0))
            else:
                turning_top = jnp.zeros(SS, bool)

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
            dm_q = jnp.where(mt, ds_q, c["dm_q"])
            dm_ld = jnp.where(mt, ds_ld, c["dm_ld"])
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

            # Emission is gated on "some chain finished a draw THIS
            # iteration": the masked read-modify-write touches the whole
            # [K, ...] output block (the dominant per-iteration VMEM
            # traffic), but with trees averaging 2^depth leapfrogs only a
            # small fraction of iterations emit anything.  pl.when lowers
            # to a result-free scf.if (side-effecting ref stores only),
            # which Mosaic legalizes — unlike value-returning conds.
            @pl.when(jnp.any(fin))
            def _emit():
                energy_m = dm_ke - (dm_logp + dm_ld)
                fisher = csum(jnp.square(dm_z + dm_zg))
                krows = jax.lax.broadcasted_iota(jnp.int32, (K,) + SS, 0)
                kmask = fin[None] & (krows == c["dc"].reshape((1,) + SS))
                stats = jnp.concatenate([
                    depth.astype(f32), diverged.astype(f32),
                    n_steps.astype(f32), s_acc, s_sym, mx_err,
                    dm_logp, energy_m, energy_m - c["e_init"],
                    dm_idx.astype(f32), fisher, c["step"],
                    # maxdepth_reached matches the XLA kernel's
                    # (~done) & (depth >= maxdepth): a tree that diverged or
                    # turned on its final merge did not exit via maxdepth.
                    ((depth >= D) & ~turned & ~diverged).astype(f32),
                ], axis=1 if LD else 0)  # [B, NSTATS] (ld) / [NSTATS, B] (cl)
                if MASKED_EMIT:
                    # Predicated store: the masked write touches the [K, ...]
                    # blocks WITHOUT the read leg of the read-modify-write
                    # `where` — emission is the dominant per-iteration VMEM
                    # traffic, so halving it matters at large K*d.
                    pltpu.store(
                        out_q_ref,
                        jnp.broadcast_to(dm_q[None], out_q_ref.shape),
                        mask=jnp.broadcast_to(kmask, out_q_ref.shape))
                    pltpu.store(
                        out_stats_ref,
                        jnp.broadcast_to(stats[None], out_stats_ref.shape),
                        mask=jnp.broadcast_to(kmask, out_stats_ref.shape))
                else:
                    out_q_ref[:] = jnp.where(kmask, dm_q[None], out_q_ref[:])
                    out_stats_ref[:] = jnp.where(kmask, stats[None],
                                                 out_stats_ref[:])

            # ---- next state: fresh draw (fin) / new doubling / same subtree
            new_dir = rand_dir()
            new_doub = do_merge & ~tree_done
            v_new = _normals(VS)
            ke_new = 0.5 * csum(v_new * v_new)
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
                e_init=nxt(ke_new - (dm_logp + dm_ld), c["e_init"],
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
                dm_q=dm_q, dm_ld=dm_ld,
                ds_z=ds_z, ds_zg=ds_zg, ds_logp=ds_logp, ds_ke=ds_ke,
                ds_idx=ds_idx, ds_q=ds_q, ds_ld=ds_ld,
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
            if USE_CZ:
                for _i in range(D + 1):
                    c2[f"cz{_i}"] = czs[_i]
            return c2

        def cond(c):
            return jnp.any(c["dc"] < K)

        final = jax.lax.while_loop(cond, body, carry)
        fin_q_ref[:] = final["dm_q"]
        # flow mode: no in-kernel inverse — the aux (g) output slot carries
        # the final z instead, which threads into the next launch's position
        # operand; the runner recomputes the model-space gradient host-side.
        fin_g_ref[:] = (final["dm_zg"] / stds if flow is None
                        else final["dm_z"])
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
    flow=None,
    stream=None,
    layout: str = "cl",
):
    """Launch the fused kernel; returns (q_fin, g_fin, logp_fin, draws, stats)
    with draws [C, K, d] and stats dict of [C, K] arrays.

    ``layout="ld"`` (dim-on-lanes, see make_kernel) keeps arrays in their
    natural [chains, d] orientation with SMALL chain blocks riding sublanes
    — the large-d configuration where the chains-on-lanes checkpoint stacks
    cannot fit VMEM.  flow/stream are chains-on-lanes only.

    ``model_args``: arrays the model's logp needs (replicated to every block,
    VMEM-resident — suitable up to a few MB; larger datasets use ``stream``).
    ``logp_grad_batched(q, *model_args)``.

    ``flow = (pallas_forward, packed_arrays)``: frozen-flow mode (see
    make_kernel) — ``packed_arrays`` are the FlowSpec.pallas_pack output
    (2-D, shared across chains), and the ``q`` argument must carry z0 (the
    transformed-space positions; entering the flow needs its inverse, which
    the caller runs host-side).

    ``stream``: a ``models.model.StreamSpec`` — the likelihood data stays in
    HBM and every evaluation DMAs it tile-by-tile through double-buffered
    VMEM scratch (see make_kernel).  ``logp_grad_batched``/``model_args``
    are ignored on this path; the StreamSpec carries the whole likelihood."""
    C, d = q.shape
    K = num_draws
    B = min(block, C)
    assert C % B == 0, (C, B)
    grid = (C // B,)
    LD = layout == "ld"
    assert not (LD and (flow is not None or stream is not None))

    if LD:
        # dim-on-lanes: arrays keep their natural [chains, d] orientation
        def vec(x):
            return jnp.asarray(x, jnp.float32)

        def sca(x):
            return jnp.asarray(x, jnp.float32).reshape(C, 1)
    else:
        def vec(x):  # chains-on-lanes
            return jnp.asarray(x, jnp.float32).T.reshape(-1, C)

        def sca(x):
            return jnp.asarray(x, jnp.float32).reshape(1, C)

    q_t, g_t, stds_t, mean_t = vec(q), vec(g), vec(stds), vec(mean)
    logp_t, logdet_t = sca(logp), sca(logdet)
    step_t, bar_t = sca(step0), sca(step_bar)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    flow_kernel_arg = None
    flow_ops, flow_specs = (), []
    if flow is not None:
        flow_fwd, packed = flow
        flow_ops = tuple(jnp.asarray(a, jnp.float32) for a in packed)
        flow_specs = [
            pl.BlockSpec(a.shape, (lambda i, nd=a.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for a in flow_ops
        ]
        flow_kernel_arg = (flow_fwd, len(flow_ops))

    stream_kernel_arg = None
    stream_args, stream_specs, scratch_shapes = (), [], []
    if stream is not None:
        stream_args = tuple(jnp.asarray(a, jnp.float32) for a in stream.args)
        stream_specs = [pl.BlockSpec(memory_space=pl.ANY)
                        for _ in stream_args]
        scratch_shapes = [
            pltpu.VMEM((2, stream.tile_rows) + a.shape[1:], jnp.float32)
            for a in stream_args
        ] + [pltpu.SemaphoreType.DMA((2, len(stream_args)))]
        stream_kernel_arg = (stream.tile_eval, stream.finalize,
                             len(stream_args), stream.tile_rows)
        model_args = ()

    model_args = tuple(jnp.asarray(a, jnp.float32) for a in model_args)
    kernel = make_kernel(logp_grad_batched, d, K, opts, jitter,
                         use_hw_prng=not interpret,
                         n_model_args=len(model_args),
                         flow=flow_kernel_arg, stream=stream_kernel_arg,
                         layout=layout)

    if LD:
        vspec = lambda r: pl.BlockSpec((B, r), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
        out3 = lambda r: pl.BlockSpec((K, B, r), lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM)
        out_shapes = (
            jax.ShapeDtypeStruct((K, C, d), jnp.float32),       # draws
            jax.ShapeDtypeStruct((K, C, NSTATS), jnp.float32),  # stats
            jax.ShapeDtypeStruct((C, d), jnp.float32),          # final q
            jax.ShapeDtypeStruct((C, d), jnp.float32),          # final g
            jax.ShapeDtypeStruct((C, 1), jnp.float32),          # final logp
            jax.ShapeDtypeStruct((C, 1), jnp.int32),            # loop iters
        )
        out_specs = (out3(d), out3(NSTATS),
                     vspec(d), vspec(d), vspec(1), vspec(1))
    else:
        vspec = lambda r: pl.BlockSpec((r, B), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)
        out_shapes = (
            jax.ShapeDtypeStruct((K, d, C), jnp.float32),       # draws
            jax.ShapeDtypeStruct((K, NSTATS, C), jnp.float32),  # stats
            jax.ShapeDtypeStruct((d, C), jnp.float32),          # final q
            jax.ShapeDtypeStruct((d, C), jnp.float32),          # final g
            jax.ShapeDtypeStruct((1, C), jnp.float32),          # final logp
            jax.ShapeDtypeStruct((1, C), jnp.int32),            # loop iters
        )
        out_specs = (
            pl.BlockSpec((K, d, B), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NSTATS, B), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            vspec(d), vspec(d), vspec(1), vspec(1),
        )
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        vspec(d), vspec(d), vspec(1), vspec(d), vspec(d), vspec(1),
        vspec(1), vspec(1),
    ] + flow_specs + stream_specs + [
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
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(seed_arr, q_t, g_t, logp_t, stds_t, mean_t, logdet_t, step_t, bar_t,
      *flow_ops, *stream_args, *model_args)

    if LD:
        draws_out = jnp.swapaxes(draws, 0, 1)               # [C, K, d]
        stats_out = {name: stats[:, :, i].T
                     for i, name in enumerate(STAT_NAMES)}
        stats_out["loop_iterations"] = iters[:, 0]
        return (q_f, g_f, logp_f[:, 0], draws_out, stats_out)
    draws_out = jnp.moveaxis(draws, 2, 0)                   # [C, K, d]
    stats_out = {name: stats[:, i, :].T for i, name in enumerate(STAT_NAMES)}
    stats_out["loop_iterations"] = iters[0]
    return (q_f.T, g_f.T, logp_f[0], draws_out, stats_out)


# ---------------------------------------------------------------------------
# Fused warmup engine
# ---------------------------------------------------------------------------
#
# The posterior kernel above is draw-asynchronous; warmup adaptation is
# inherently per-draw-index (the windowed schedule of adapt/schedule.py), so
# the warmup kernel runs chains LOCK-STEP per draw: an outer fori_loop over
# draws with the per-draw schedule flags in SMEM (indexed by the scalar loop
# counter), an inner while_loop over tree iterations until every chain in the
# block finished its tree, and the full adaptation update — fg/bg Welford
# estimators, the diagonal mass-matrix rule, Nesterov dual averaging, window
# switches — executed in-register between draws.  One launch covers a whole
# chunk of warmup draws; HBM is touched once per launch instead of ~40 times
# per leapfrog (the measured cost of the XLA warmup path, BASELINE.md).
#
# The only warmup action NOT in-kernel is the step-size init-search re-run on
# the first mass-matrix change (adapt_strategy.rs:207-212): its draw index is
# known statically from the schedule, so the sampler splits the warmup phase
# there and runs the existing XLA init_search between the two launches.
#
# Tree semantics are identical to the posterior kernel (same iterative
# formulation); the duplication between the two kernel bodies is deliberate —
# the loop structures differ (multi-draw async vs per-draw lock-step) and the
# posterior kernel is benchmarked/validated as-is.  tests/test_pallas_warmup.py
# holds the XLA-vs-Pallas warmup equivalence checks.

WARMUP_STAT_NAMES = STAT_NAMES + ["step_size_bar", "transformation_index"]
NSTATS_W = len(WARMUP_STAT_NAMES)

# flags_ref columns (i32): packed in chain.py::make_pallas_warmup_runner
FLAG_UPDATE_EST = 0
FLAG_DO_UPDATE = 1
FLAG_ADVANCE_DA = 2
FLAG_USE_LATE = 3
FLAG_USE_BEST = 4
FLAG_DO_SWITCH = 5
NFLAGS = 8

# sca_ref rows (f32): packed per-chain scalar state
SCA_STEP = 0        # working (jittered) step size
SCA_DA_LS = 1       # dual-averaging log_step
SCA_DA_LSA = 2      # dual-averaging log_step_adapted
SCA_DA_HBAR = 3
SCA_DA_MU = 4
SCA_DA_CNT = 5
SCA_CNT_FG = 6      # foreground estimator count
SCA_CNT_BG = 7
SCA_TID = 8         # transformation index (f32 counter)
SCA_LOGDET = 9
NSCA = 10

# est_ref planes (f32, [8, d, B]): fg draw mean/var, fg grad mean/var, bg x4
EST_FG_DM, EST_FG_DV, EST_FG_GM, EST_FG_GV = 0, 1, 2, 3
EST_BG_DM, EST_BG_DV, EST_BG_GM, EST_BG_GV = 4, 5, 6, 7


def make_warmup_kernel(logp_grad_batched: Callable, dim: int, K: int,
                       opts: NutsOptions, sset, use_grad_based: bool,
                       use_hw_prng: bool = True, n_model_args: int = 0,
                       layout: str = "cl"):
    """Warmup kernel body (lock-step draws + in-kernel adaptation).

    ``sset`` is the StepSizeSettings (dual-averaging constants + jitter);
    adaptation math mirrors adapt/mass_matrix.py and adapt/step_size.py
    exactly (which in turn mirror nuts-rs diagonal.rs / dual_avg.rs).

    ``layout="ld"`` (dim-on-lanes; see make_kernel) serves the large-d
    regime where the chains-on-lanes checkpoint stacks cannot fit VMEM:
    vectors become [B, d], per-chain scalars [B, 1], the packed scalar
    state [NSCA, B, 1] and the estimator planes [8, B, d].
    """
    import math as _math

    assert layout in ("cl", "ld")
    LD = layout == "ld"
    D = opts.maxdepth
    MAX_ERR = opts.max_energy_error
    CHECK = bool(opts.check_turning)
    # Same large-d cross-dot-matrix lever as make_kernel (see its comment).
    USE_CZ = LD and CHECK
    da = sset.dual_average
    jitter = sset.jitter
    f32 = jnp.float32
    LOWER, UPPER = 1e-20, 1e20

    salt_counter = [0]

    def kernel(seed_ref, flags_ref, q0_ref, g0_ref, logp0_ref, stds_ref,
               mean_ref, est_ref, sca_ref, *rest):
        model_arg_refs = rest[:n_model_args]
        (out_q_ref, out_stats_ref, fin_q_ref, fin_g_ref, fin_logp_ref,
         stds_out_ref, mean_out_ref, est_out_ref, sca_out_ref,
         iters_ref) = rest[n_model_args:]
        model_args = tuple(r[:] for r in model_arg_refs)
        B = q0_ref.shape[0] if LD else q0_ref.shape[1]
        VS = (B, dim) if LD else (dim, B)
        SS = (B, 1) if LD else (1, B)

        def csum(x):
            """Per-chain contraction along the layout's reduction axis."""
            return jnp.sum(x, 1 if LD else 0, keepdims=True)
        # Logical program id: grid position + the launcher's base offset
        # (seed_ref[0, 1]).  The offset keeps RNG streams identical when the
        # launcher splits chain groups into separate grid=1 pallas_calls —
        # the workaround for the Mosaic compile crash on multi-program grids
        # with VMEM-replicated model-arg windows (BASELINE.md round 5).
        pid = pl.program_id(0) + seed_ref[0, 1]
        if use_hw_prng:
            pltpu.prng_seed(seed_ref[0, 0] + pid)
        seed_u32 = (seed_ref[0, 0].astype(jnp.uint32)
                    + jnp.uint32(0x51ED2701) * pid.astype(jnp.uint32))
        it_box = [jnp.uint32(0)]

        def _uniform(shape):
            salt_counter[0] += 1
            if use_hw_prng:
                bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            else:
                bits = _hash_bits(shape, seed_u32, it_box[0], salt_counter[0])
            f = ((bits >> 8).astype(jnp.int32).astype(jnp.float32)
                 * (1.0 / (1 << 24)))
            return jnp.clip(f, 1e-12, 1.0 - 1e-7)

        def _normals(shape):
            u1 = _uniform(shape)
            u2 = _uniform(shape)
            return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)

        rows_s = jax.lax.broadcasted_iota(jnp.int32, (D + 1,) + SS, 0)
        # Non-replicated [SS] zeros for loop-carry inits.  jnp.zeros is a
        # splat constant that Mosaic lays out replicated ({*,*} / {*,0});
        # inside the nested tree while_loop the body produces genuinely
        # per-lane values, and the carry relayout concrete -> replicated is
        # rejected ("Invalid relayout ... replicated in destination but not
        # in source" / "Not implemented: Sublane broadcast").  A value
        # varying along BOTH sublanes and lanes (sum of the two iotas) gets
        # the concrete {0,0} layout; row/column 0 clamped to zero keeps it.
        # (A plain sublane iota stays lane-replicated {0,*}; a 1-row lane
        # iota stays sublane-replicated {*,0} — neither unifies with the
        # per-lane values the loop body produces.)
        if LD:
            _mix = (jax.lax.broadcasted_iota(jnp.int32, (B, 128), 0)
                    + jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1))
            ib = jnp.minimum(_mix[:, 0:1], 0)
        else:
            _mix = (jax.lax.broadcasted_iota(jnp.int32, (8, B), 0)
                    + jax.lax.broadcasted_iota(jnp.int32, (8, B), 1))
            ib = jnp.minimum(_mix[0:1], 0)
        zb = ib.astype(f32)

        def eval_z(z, stds, mean):
            q = z * stds + mean
            logp, g = logp_grad_batched(q, *model_args)
            return logp.reshape(SS), g * stds

        # ---- outer carry: q-space chain state + adaptation state ----
        # sca ships as [NSCA, 1, B] (rank-3): per-scalar reads index the
        # UNTILED leading axis and come out as offset-free [1, B] vectors.
        # As a packed [NSCA, B] block, every sca[i:i+1] row slice carried a
        # sublane offset i, and those offset layouts propagated through the
        # tree while_loop carry until Mosaic hit ops it cannot lower over
        # offset layouts (offset-input multi_reductions, sublane broadcasts,
        # replicated-destination relayouts).  The posterior kernel avoids
        # the whole class by using separate [1, B] refs per scalar.
        sca0 = sca_ref[:]
        outer = dict(
            it=jnp.uint32(1),
            q=q0_ref[:], g=g0_ref[:], logp=logp0_ref[:],
            stds=stds_ref[:], mean=mean_ref[:],
            est=est_ref[:],
            sca=sca0,
        )

        def draw_body(i, o):
            # Keep the hash-PRNG counter advancing across draws (interpret
            # mode; the hardware PRNG is stateful and ignores this).
            it_box[0] = o["it"]
            flag = lambda col: (flags_ref[i, col] != 0)
            f_upd_est = flag(FLAG_UPDATE_EST)
            f_do_upd = flag(FLAG_DO_UPDATE)
            f_adv_da = flag(FLAG_ADVANCE_DA)
            f_use_late = flag(FLAG_USE_LATE)
            f_use_best = flag(FLAG_USE_BEST)
            f_switch = flag(FLAG_DO_SWITCH)

            stds, mean = o["stds"], o["mean"]
            sca = o["sca"]
            logdet = sca[SCA_LOGDET]
            step = sca[SCA_STEP]

            # ---- fresh trajectory ----
            z0 = (o["q"] - mean) / stds
            zg0 = o["g"] * stds
            logp0 = o["logp"]
            v0 = _normals(VS)
            ke0 = 0.5 * csum(v0 * v0)
            e_init = ke0 - (logp0 + logdet)

            # done/div/turn carried as i32 0/1: Mosaic cannot round-trip
            # vector bools through a while_loop carry (stores i8, the
            # trunci i8 -> i1 reload fails to legalize); the posterior
            # kernel's carry is likewise bool-free.
            tree = dict(
                it=o["it"],
                done=ib,
                div=ib,
                turn=ib,
                e_z=z0, e_v=v0, e_zg=zg0, e_idx=ib,
                m_z=z0, m_v=v0, m_zg=zg0, m_idx=ib,
                p_z=z0, p_v=v0, p_zg=zg0, p_idx=ib,
                dm_z=z0, dm_zg=zg0, dm_logp=logp0, dm_ke=ke0, dm_idx=ib,
                ds_z=z0, ds_zg=zg0, ds_logp=logp0, ds_ke=ke0, ds_idx=ib,
                logw_m=zb, logw_s=zb + f32(-jnp.inf),
                depth=ib, leaf=ib,
                direction=jnp.where(_uniform(SS) < 0.5, f32(1.0),
                                    f32(-1.0)),
                n_steps=ib, s_acc=zb, s_sym=zb, mx_err=zb,
                lz=jnp.zeros((D + 1,) + VS, f32),
                lv=jnp.zeros((D + 1,) + VS, f32),
                bl=jnp.zeros((D + 1,) + SS, f32),
                mz=jnp.zeros((D + 1,) + VS, f32),
                mv=jnp.zeros((D + 1,) + VS, f32),
                bm=jnp.zeros((D + 1,) + SS, f32),
            )
            if USE_CZ:
                for _i in range(D + 1):
                    tree[f"cz{_i}"] = jnp.zeros((D + 1,) + SS, f32)

            def tree_body(c):
                it_box[0] = c["it"]
                act = c["done"] == 0                  # [SS] chains still working
                r_sel = _uniform(SS)
                r_acc = _uniform(SS)
                dirf = c["direction"]
                diri = dirf.astype(jnp.int32)

                eps = dirf * step
                v1 = c["e_v"] + (eps / 2.0) * c["e_zg"]
                z1 = c["e_z"] + eps * v1
                logp1, zg1 = eval_z(z1, stds, mean)
                v2 = v1 + (eps / 2.0) * zg1
                ke1 = 0.5 * csum(v2 * v2)
                energy1 = ke1 - (logp1 + logdet)
                err = energy1 - e_init
                diverged = act & ((err > MAX_ERR) | ~jnp.isfinite(err))
                idx1 = c["e_idx"] + diri

                diff = -err
                acc = jnp.exp(jnp.minimum(diff, 0.0))
                n_steps = c["n_steps"] + act.astype(jnp.int32)
                ok = act & ~diverged
                s_acc = c["s_acc"] + jnp.where(ok, acc, 0.0)
                s_sym = c["s_sym"] + jnp.where(
                    ok, 2.0 * acc / (1.0 + jnp.exp(diff)), 0.0)
                mx_err = jnp.where(
                    diverged, -jnp.inf,
                    jnp.where(act & (jnp.abs(diff) > jnp.abs(c["mx_err"])),
                              diff, c["mx_err"]))

                logw_leaf = -err
                first = c["leaf"] == 0
                logw_s = jnp.where(
                    act,
                    jnp.where(first, logw_leaf,
                              jnp.logaddexp(c["logw_s"], logw_leaf)),
                    c["logw_s"])
                take = act & (first | (jnp.log(r_sel) < logw_leaf - logw_s))
                ds_z = jnp.where(take, z1, c["ds_z"])
                ds_zg = jnp.where(take, zg1, c["ds_zg"])
                ds_logp = jnp.where(take, logp1, c["ds_logp"])
                ds_ke = jnp.where(take, ke1, c["ds_ke"])
                ds_idx = jnp.where(take, idx1, c["ds_idx"])

                d1 = csum(z1 * v2)
                row_l = jnp.minimum(_tz(c["leaf"], D), D).reshape((1,) + SS)
                tzn = _tz(c["leaf"] + 1, D)
                row_m = jnp.minimum(tzn + 1, D).reshape((1,) + SS)
                mask_l = (rows_s == row_l) & act[None]
                mask_m = (rows_s == row_m) & act[None]
                lz = jnp.where(mask_l, z1[None], c["lz"])
                lv = jnp.where(mask_l, v2[None], c["lv"])
                bl = jnp.where(mask_l, d1, c["bl"])
                mz = jnp.where(mask_m, z1[None], c["mz"])
                mv = jnp.where(mask_m, v2[None], c["mv"])
                bm = jnp.where(mask_m, d1, c["bm"])
                czs = ([c[f"cz{i}"] for i in range(D + 1)]
                       if USE_CZ else None)

                if CHECK:
                    turning_int = jnp.zeros(SS, bool)

                    def row_gather(stack, row):
                        m = rows_s == row
                        return jnp.sum(jnp.where(m, stack, 0.0), axis=0)

                    def row_gather1(vec, row):
                        # [D+1]+SS gathered by per-chain row index.  NOT a
                        # masked axis-0 jnp.sum: in this kernel the while
                        # carry gives `vec` a nonzero sublane-offset layout
                        # and Mosaic rejects sublane reductions over offset
                        # layouts ("input layout must have zero offsets over
                        # dimensions that are being reduced").  An unrolled
                        # select-accumulate over static [SS] row slices is
                        # layout-agnostic (elementwise ops only); D+1 ≤ 11
                        # rows keep the unroll tiny.
                        r2 = row[0]                      # [SS]
                        out = jnp.zeros(SS, f32)
                        for i in range(D + 1):
                            out = out + jnp.where(r2 == i, vec[i], 0.0)
                        return out

                    # Same static/dynamic row split as the posterior kernel
                    # (see its U-turn comment): rb == j-1 always, ra == j for
                    # j < tz(leaf+1); per-row dots precomputed once, only the
                    # boundary level j == tzn gathers dynamic rows.
                    def csum3(x):
                        return jnp.sum(x, 2 if LD else 1, keepdims=True)

                    z1v = csum3(z1[None] * lv)
                    zv2 = csum3(lz * v2[None])
                    m1 = csum3(z1[None] * mv)
                    m2 = csum3(mz * v2[None])
                    zero_row = jnp.zeros((1,) + SS, f32)
                    if USE_CZ:
                        # Cross-dot matrix czs[i][j] == csum(lz[i]*lv[j]),
                        # maintained from the z1v/zv2 passes exactly as in
                        # the posterior kernel (see its comment); updates
                        # gate on `act` like the stack writes above.
                        rl2 = row_l[0]
                        czs = [jnp.where(act & (rl2 == i), z1v,
                                         jnp.where(mask_l, zv2[i], czs[i]))
                               for i in range(D + 1)]
                        adj_bzav_v = jnp.concatenate(
                            [zero_row] + [czs[j - 1][j:j + 1]
                                          for j in range(1, D + 1)], axis=0)
                        adj_azbv_v = jnp.concatenate(
                            [zero_row] + [czs[j][j - 1:j]
                                          for j in range(1, D + 1)], axis=0)
                    else:
                        adj_bzav_v = jnp.concatenate(
                            [zero_row, csum3(lz[:-1] * lv[1:])], axis=0)
                        adj_azbv_v = jnp.concatenate(
                            [zero_row, csum3(lz[1:] * lv[:-1])], axis=0)

                    # static levels, vectorized over the row axis (see the
                    # posterior kernel's comment — identical arithmetic)
                    dirb = dirf[None]
                    d1b = d1[None]
                    blm1 = jnp.concatenate([zero_row, bl[:-1]], axis=0)
                    T1 = ((dirb * (z1v - bl) < 0)
                          | (dirb * (d1b - zv2) < 0))
                    T2 = ((dirb * (m1 - bm) < 0)
                          | (dirb * (d1b - m2) < 0))
                    T3 = ((dirb * (adj_bzav_v - bl) < 0)
                          | (dirb * (blm1 - adj_azbv_v) < 0))
                    TJ = T1 | ((rows_s >= 2) & (T2 | T3))
                    act_lvl = (rows_s >= 1) & (rows_s < tzn[None])
                    lvl_hit = jnp.zeros(SS, jnp.int32)
                    for j in range(D + 1):
                        # unrolled accumulate (the warmup kernel cannot
                        # axis-0-reduce carried/offset layouts — see
                        # row_gather1); still ~10x fewer ops than the old
                        # per-level ladder
                        lvl_hit = lvl_hit + (act_lvl[j] & TJ[j]).astype(
                            jnp.int32)
                    turning_int = turning_int | (lvl_hit > 0)

                    s_a = c["leaf"] + 1 - jnp.left_shift(1, tzn)
                    ra = jnp.minimum(_tz(s_a, D), D).reshape((1,) + SS)
                    a_b = row_gather1(bl, ra)
                    t1d = ((dirf * (row_gather1(z1v, ra) - a_b) < 0)
                           | (dirf * (d1 - row_gather1(zv2, ra)) < 0))
                    row_t = tzn.reshape((1,) + SS)
                    row_b = (tzn - 1).reshape((1,) + SS)
                    t2d = ((dirf * (row_gather1(m1, row_t)
                                    - row_gather1(bm, row_t)) < 0)
                           | (dirf * (d1 - row_gather1(m2, row_t)) < 0))
                    if USE_CZ:
                        # flat CZ gather: one masked select + unrolled
                        # row-sum over the (D+1)^2 concatenation (the
                        # unrolled sum keeps this kernel clear of offset-
                        # layout axis-0 reductions; see row_gather1)
                        czf = jnp.concatenate(czs, axis=0)
                        rows_cz = jax.lax.broadcasted_iota(
                            jnp.int32, ((D + 1) * (D + 1),) + SS, 0)

                        def cz_at(ri, rj):
                            sel = jnp.where(
                                rows_cz == (ri * (D + 1) + rj), czf, 0.0)
                            return jnp.sum(sel, axis=0)

                        t3d = ((dirf * (cz_at(row_b, ra) - a_b) < 0)
                               | (dirf * (row_gather1(bl, row_b)
                                          - cz_at(ra, row_b)) < 0))
                    else:
                        a_z = row_gather(lz, ra)
                        a_v = row_gather(lv, ra)
                        b_z = row_gather(lz, row_b)
                        b_v = row_gather(lv, row_b)
                        t3d = ((dirf * (csum(b_z * a_v) - a_b) < 0)
                               | (dirf * (row_gather1(bl, row_b)
                                          - csum(a_z * b_v)) < 0))
                    turning_int = turning_int | ((tzn >= 1) & t1d) | (
                        (tzn >= 2) & (t2d | t3d))
                    turning_int = turning_int & act
                else:
                    turning_int = jnp.zeros(SS, bool)

                subtree_done = (c["leaf"] + 1) == (1 << c["depth"])
                fwd = dirf > 0
                far_z = jnp.where(fwd, c["m_z"], c["p_z"])
                far_v = jnp.where(fwd, c["m_v"], c["p_v"])
                near_z = jnp.where(fwd, c["p_z"], c["m_z"])
                near_v = jnp.where(fwd, c["p_v"], c["m_v"])
                if CHECK:
                    far_zv = csum(far_z * far_v)
                    t_out = ((dirf * (csum(z1 * far_v) - far_zv) < 0)
                             | (dirf * (d1 - csum(far_z * v2)) < 0))
                    near_zv = csum(near_z * near_v)
                    t_nr = ((dirf * (csum(z1 * near_v) - near_zv) < 0)
                            | (dirf * (d1 - csum(near_z * v2)) < 0))
                    b0_z, b0_v = lz[D], lv[D]
                    t_b0 = ((dirf * (csum(b0_z * far_v) - far_zv) < 0)
                            | (dirf * (bl[D] - csum(far_z * b0_v)) < 0))
                    turning_top = t_out | ((c["depth"] > 0) & (t_nr | t_b0))
                else:
                    turning_top = jnp.zeros(SS, bool)

                do_merge = act & subtree_done & ~diverged & ~turning_int
                take_s = (logw_s >= c["logw_m"]) | (
                    jnp.log(r_acc) < logw_s - c["logw_m"])
                mt = do_merge & take_s
                dm_z = jnp.where(mt, ds_z, c["dm_z"])
                dm_zg = jnp.where(mt, ds_zg, c["dm_zg"])
                dm_logp = jnp.where(mt, ds_logp, c["dm_logp"])
                dm_ke = jnp.where(mt, ds_ke, c["dm_ke"])
                dm_idx = jnp.where(mt, ds_idx, c["dm_idx"])
                logw_m = jnp.where(do_merge,
                                   jnp.logaddexp(c["logw_m"], logw_s),
                                   c["logw_m"])
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
                tree_done = act & (diverged | turned | (depth >= D))

                new_dir = jnp.where(_uniform(SS) < 0.5, f32(1.0),
                                    f32(-1.0))
                new_doub = do_merge & (depth < D) & ~turned
                jump_p = new_dir > 0
                j_z = jnp.where(jump_p, p_z, m_z)
                j_v = jnp.where(jump_p, p_v, m_v)
                j_zg = jnp.where(jump_p, p_zg, m_zg)
                j_idx = jnp.where(jump_p, p_idx, m_idx)

                def cont2(doub, cont, old):
                    return jnp.where(act,
                                     jnp.where(new_doub, doub, cont), old)

                return dict(
                    it=c["it"] + jnp.uint32(1),
                    done=c["done"] | tree_done.astype(jnp.int32),
                    div=c["div"] | diverged.astype(jnp.int32),
                    turn=c["turn"] | turned.astype(jnp.int32),
                    e_z=cont2(j_z, z1, c["e_z"]),
                    e_v=cont2(j_v, v2, c["e_v"]),
                    e_zg=cont2(j_zg, zg1, c["e_zg"]),
                    e_idx=cont2(j_idx, idx1, c["e_idx"]),
                    m_z=m_z, m_v=m_v, m_zg=m_zg, m_idx=m_idx,
                    p_z=p_z, p_v=p_v, p_zg=p_zg, p_idx=p_idx,
                    dm_z=dm_z, dm_zg=dm_zg, dm_logp=dm_logp, dm_ke=dm_ke,
                    dm_idx=dm_idx,
                    ds_z=ds_z, ds_zg=ds_zg, ds_logp=ds_logp, ds_ke=ds_ke,
                    ds_idx=ds_idx,
                    logw_m=logw_m, logw_s=logw_s,
                    depth=depth,
                    leaf=jnp.where(act,
                                   jnp.where(new_doub, 0, c["leaf"] + 1),
                                   c["leaf"]),
                    direction=jnp.where(act & new_doub, new_dir,
                                        c["direction"]),
                    n_steps=n_steps, s_acc=s_acc, s_sym=s_sym, mx_err=mx_err,
                    lz=lz, lv=lv, bl=bl, mz=mz, mv=mv, bm=bm,
                    **({f"cz{i}": czs[i] for i in range(D + 1)}
                       if USE_CZ else {}),
                )

            t = jax.lax.while_loop(lambda c: jnp.any(c["done"] == 0),
                                   tree_body, tree)
            # Hash-PRNG counter for post-tree uniforms (jitter): must be the
            # loop's carried OUTPUT, not the leaked body tracer.
            it_box[0] = t["it"]

            # ---- draw results (q-space) ----
            dm_q = t["dm_z"] * stds + mean
            dm_g = t["dm_zg"] / stds
            div_b = t["div"] != 0
            diverging = t["div"]
            # Pure i1 logic, not jnp.where on bool branches: a bool-valued
            # select_n lowers to an i8 select + trunci i8 -> i1, which
            # Mosaic rejects ("Unsupported target bitwidth for truncation").
            is_good = ((div_b & (jnp.abs(t["dm_idx"]) > 4))
                       | (~div_b & (t["dm_idx"] != 0)))

            # ---- estimator updates (mass_matrix.py::add_sample, exact) ----
            est = o["est"]
            cnt_fg = sca[SCA_CNT_FG]
            cnt_bg = sca[SCA_CNT_BG]
            inc = f_upd_est & is_good                   # [1, B]

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

            fg_dm, fg_dv = add2(est[EST_FG_DM], est[EST_FG_DV], cnt_fg, dm_q)
            fg_gm, fg_gv = add2(est[EST_FG_GM], est[EST_FG_GV], cnt_fg, dm_g)
            bg_dm, bg_dv = add2(est[EST_BG_DM], est[EST_BG_DV], cnt_bg, dm_q)
            bg_gm, bg_gv = add2(est[EST_BG_GM], est[EST_BG_GV], cnt_bg, dm_g)
            cnt_fg = cnt_fg + jnp.where(inc, 1.0, 0.0)
            cnt_bg = cnt_bg + jnp.where(inc, 1.0, 0.0)

            # ---- window switch (diagonal.rs:143-148) ----
            def sw(fgv, bgv, zero):
                return (jnp.where(f_switch, bgv, fgv),
                        jnp.where(f_switch, zero, bgv))

            zd = jnp.zeros(VS, f32)
            fg_dm, bg_dm = sw(fg_dm, bg_dm, zd)
            fg_dv, bg_dv = sw(fg_dv, bg_dv, zd)
            fg_gm, bg_gm = sw(fg_gm, bg_gm, zd)
            fg_gv, bg_gv = sw(fg_gv, bg_gv, zd)
            cnt_fg, cnt_bg = sw(cnt_fg, cnt_bg, zb)

            # ---- mass-matrix update (adapt_diag + set_diag) ----
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
            tid_n = sca[SCA_TID] + jnp.where(enough, 1.0, 0.0)

            # ---- dual averaging (step_size.py::advance, exact) ----
            nst = jnp.maximum(t["n_steps"].astype(f32), 1.0)
            acc_mean = t["s_acc"] / nst
            acc_sym = t["s_sym"] / nst
            accept_stat = jnp.where(f_use_late, acc_sym, acc_mean)
            da_cnt = sca[SCA_DA_CNT]
            w = 1.0 / (da_cnt + da.t0)
            hbar_n = ((1.0 - w) * sca[SCA_DA_HBAR]
                      + w * (sset.target_accept - accept_stat))
            ls_n = (sca[SCA_DA_MU]
                    - hbar_n * jnp.sqrt(da_cnt) / da.gamma)
            ls_n = jnp.minimum(ls_n, _math.log(da.max_step_size))
            mk = jnp.exp(-da.k * jnp.log(da_cnt))
            lsa_n = mk * ls_n + (1.0 - mk) * sca[SCA_DA_LSA]

            adv = f_adv_da
            da_ls = jnp.where(adv, ls_n, sca[SCA_DA_LS])
            da_lsa = jnp.where(adv, lsa_n, sca[SCA_DA_LSA])
            da_hbar = jnp.where(adv, hbar_n, sca[SCA_DA_HBAR])
            da_cnt = jnp.where(adv, da_cnt + 1.0, da_cnt)

            # ---- next step size: current (or best guess) + jitter ----
            base = jnp.exp(jnp.where(f_use_best, da_lsa, da_ls))
            if jitter is not None:
                base = base * (1.0 - jitter + 2.0 * jitter * _uniform(SS))
            bar = jnp.exp(da_lsa)

            # ---- emit stats row i (post-adaptation values, matching the
            # XLA path in chain.py::make_draw_step) ----
            energy_m = t["dm_ke"] - (t["dm_logp"] + logdet)
            fisher = csum(jnp.square(t["dm_z"] + t["dm_zg"]))
            krows = jax.lax.broadcasted_iota(jnp.int32, (K,) + SS, 0)
            kmask = krows == i
            out_q_ref[:] = jnp.where(kmask, dm_q[None], out_q_ref[:])
            stats = jnp.concatenate([
                t["depth"].astype(f32), diverging.astype(f32),
                t["n_steps"].astype(f32), t["s_acc"], t["s_sym"], t["mx_err"],
                t["dm_logp"], energy_m, energy_m - e_init,
                t["dm_idx"].astype(f32), fisher, base,
                # maxdepth_reached = (~done) & (depth >= maxdepth): trees
                # that diverged or turned did not exit via maxdepth.
                ((t["depth"] >= D) & (t["div"] == 0)
                 & (t["turn"] == 0)).astype(f32), bar, tid_n,
            ], axis=1 if LD else 0)
            out_stats_ref[:] = jnp.where(kmask, stats[None],
                                         out_stats_ref[:])

            sca_n = jnp.stack([
                base, da_ls, da_lsa, da_hbar, sca[SCA_DA_MU],
                da_cnt, cnt_fg, cnt_bg, tid_n, logdet_n,
            ], axis=0)                                   # [NSCA, 1, B]
            est_n = jnp.stack([fg_dm, fg_dv, fg_gm, fg_gv,
                               bg_dm, bg_dv, bg_gm, bg_gv], axis=0)

            return dict(
                it=t["it"],
                q=dm_q, g=dm_g, logp=t["dm_logp"],
                stds=stds_n, mean=mean_n,
                est=est_n, sca=sca_n,
            )

        final = jax.lax.fori_loop(0, K, draw_body, outer)
        fin_q_ref[:] = final["q"]
        fin_g_ref[:] = final["g"]
        fin_logp_ref[:] = final["logp"]
        stds_out_ref[:] = final["stds"]
        mean_out_ref[:] = final["mean"]
        est_out_ref[:] = final["est"]
        sca_out_ref[:] = final["sca"]
        iters_ref[:] = jnp.broadcast_to(
            final["it"].astype(jnp.int32).reshape(1, 1), iters_ref.shape)

    return kernel


def nuts_pallas_warmup_run(
    seed,
    flags,                 # [K, NFLAGS] i32
    q, g, logp,            # [C, d], [C, d], [C]
    stds, mean,            # [C, d]
    est,                   # [C, 8, d] packed estimator planes
    sca,                   # [C, NSCA] packed scalar state
    logp_grad_batched: Callable,
    opts: NutsOptions,
    sset,
    use_grad_based: bool,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
    model_args: tuple = (),
    layout: str = "cl",
    _split=None,
):
    """Launch the fused warmup kernel for K = flags.shape[0] draws.

    Returns (q_f, g_f, logp_f, stds_f, mean_f, est_f, sca_f, draws, stats)
    with draws [C, K, d] and stats a dict of [C, K] arrays keyed by
    WARMUP_STAT_NAMES.  ``layout="ld"`` (dim-on-lanes) serves large d —
    see nuts_pallas_run."""
    C, d = q.shape
    K = flags.shape[0]
    B = min(block, C)
    assert C % B == 0, (C, B)
    LD = layout == "ld"

    # Multi-program grids with VMEM-replicated model-arg windows crash the
    # Mosaic compile of THIS kernel (posterior is unaffected; measured on
    # v5e round 5: GLM warmup fails at any grid >= 2, compiles at grid=1).
    # Workaround: launch each chain group as its own grid=1 pallas_call,
    # passing the group index as the kernel's program-id base so the RNG
    # streams are bit-identical to the multi-program launch.
    # ``_split``: None = auto (split when model args force it), False =
    # force the multi-program grid (interpret-mode tests pin split == grid).
    if _split is None:
        _split = len(model_args) > 0
    if _split and C > B:
        outs = []
        for gi in range(C // B):
            sl = slice(gi * B, (gi + 1) * B)
            outs.append(nuts_pallas_warmup_run(
                (seed, gi), flags, q[sl], g[sl], logp[sl], stds[sl],
                mean[sl], est[sl], sca[sl], logp_grad_batched, opts, sset,
                use_grad_based, block=B, interpret=interpret,
                model_args=model_args, layout=layout))
        cat = lambda idx: jnp.concatenate([o[idx] for o in outs], axis=0)
        stats_out = {k: jnp.concatenate([o[8][k] for o in outs], axis=0)
                     for k in outs[0][8]}
        return (cat(0), cat(1), cat(2), cat(3), cat(4), cat(5), cat(6),
                cat(7), stats_out)
    grid = (C // B,)

    if isinstance(seed, tuple):
        seed, pid_base = seed
    else:
        pid_base = 0

    if LD:
        def vec(x):
            return jnp.asarray(x, jnp.float32)

        def sca2(x):
            return jnp.asarray(x, jnp.float32).reshape(C, 1)

        est_t = jnp.moveaxis(jnp.asarray(est, jnp.float32), 0, 1)  # [8, C, d]
        # [NSCA, C, 1]: rank-3 so per-scalar reads index the untiled leading
        # axis (offset-free [B, 1] vectors; see make_warmup_kernel).
        sca_t = jnp.asarray(sca, jnp.float32).T[:, :, None]
    else:
        def vec(x):
            return jnp.asarray(x, jnp.float32).T.reshape(-1, C)

        def sca2(x):
            return jnp.asarray(x, jnp.float32).reshape(1, C)

        est_t = jnp.moveaxis(jnp.asarray(est, jnp.float32), 0, -1)  # [8, d, C]
        # [NSCA, 1, C]: rank-3 so in-kernel per-scalar reads index the
        # untiled leading axis (offset-free [1, B] vectors).
        sca_t = jnp.asarray(sca, jnp.float32).T[:, None, :]

    q_t, g_t, stds_t, mean_t = vec(q), vec(g), vec(stds), vec(mean)
    logp_t = sca2(logp)
    seed_arr = jnp.stack([jnp.asarray(seed, jnp.int32).reshape(()),
                          jnp.asarray(pid_base, jnp.int32).reshape(())]
                         ).reshape(1, 2)

    model_args = tuple(jnp.asarray(a, jnp.float32) for a in model_args)
    kernel = make_warmup_kernel(
        logp_grad_batched, d, K, opts, sset, use_grad_based,
        use_hw_prng=not interpret, n_model_args=len(model_args),
        layout=layout)

    if LD:
        vspec = lambda r: pl.BlockSpec((B, r), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
        out3 = lambda n, r: pl.BlockSpec((n, B, r), lambda i: (0, i, 0),
                                         memory_space=pltpu.VMEM)
        e3 = out3(8, d)
        sca_spec = out3(NSCA, 1)
        out_shapes = (
            jax.ShapeDtypeStruct((K, C, d), jnp.float32),         # draws
            jax.ShapeDtypeStruct((K, C, NSTATS_W), jnp.float32),  # stats
            jax.ShapeDtypeStruct((C, d), jnp.float32),            # final q
            jax.ShapeDtypeStruct((C, d), jnp.float32),            # final g
            jax.ShapeDtypeStruct((C, 1), jnp.float32),            # final logp
            jax.ShapeDtypeStruct((C, d), jnp.float32),            # stds
            jax.ShapeDtypeStruct((C, d), jnp.float32),            # mean
            jax.ShapeDtypeStruct((8, C, d), jnp.float32),         # est
            jax.ShapeDtypeStruct((NSCA, C, 1), jnp.float32),      # sca
            jax.ShapeDtypeStruct((C, 1), jnp.int32),              # iterations
        )
        out_specs = (out3(K, d), out3(K, NSTATS_W),
                     vspec(d), vspec(d), vspec(1), vspec(d), vspec(d), e3,
                     sca_spec, vspec(1))
    else:
        vspec = lambda r: pl.BlockSpec((r, B), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)
        e3 = pl.BlockSpec((8, d, B), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
        sca_spec = pl.BlockSpec((NSCA, 1, B), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
        out_shapes = (
            jax.ShapeDtypeStruct((K, d, C), jnp.float32),         # draws
            jax.ShapeDtypeStruct((K, NSTATS_W, C), jnp.float32),  # stats
            jax.ShapeDtypeStruct((d, C), jnp.float32),            # final q
            jax.ShapeDtypeStruct((d, C), jnp.float32),            # final g
            jax.ShapeDtypeStruct((1, C), jnp.float32),            # final logp
            jax.ShapeDtypeStruct((d, C), jnp.float32),            # stds
            jax.ShapeDtypeStruct((d, C), jnp.float32),            # mean
            jax.ShapeDtypeStruct((8, d, C), jnp.float32),         # est
            jax.ShapeDtypeStruct((NSCA, 1, C), jnp.float32),      # sca
            jax.ShapeDtypeStruct((1, C), jnp.int32),              # iterations
        )
        out_specs = (
            pl.BlockSpec((K, d, B), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NSTATS_W, B), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            vspec(d), vspec(d), vspec(1), vspec(d), vspec(d), e3,
            sca_spec,
            vspec(1),
        )
    in_specs = [
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((K, NFLAGS), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        vspec(d), vspec(d), vspec(1), vspec(d), vspec(d), e3,
        sca_spec,
    ] + [
        pl.BlockSpec(a.shape, (lambda i, nd=a.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for a in model_args
    ]
    (draws, stats, q_f, g_f, logp_f, stds_f, mean_f, est_f, sca_f,
     iters) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(seed_arr, jnp.asarray(flags, jnp.int32), q_t, g_t, logp_t, stds_t,
      mean_t, est_t, sca_t, *model_args)

    if LD:
        draws_out = jnp.swapaxes(draws, 0, 1)                 # [C, K, d]
        stats_out = {name: stats[:, :, i].T
                     for i, name in enumerate(WARMUP_STAT_NAMES)}
        stats_out["loop_iterations"] = iters[:, 0]
        return (q_f, g_f, logp_f[:, 0], stds_f, mean_f,
                jnp.moveaxis(est_f, 1, 0), sca_f[:, :, 0].T, draws_out,
                stats_out)
    draws_out = jnp.moveaxis(draws, 2, 0)                     # [C, K, d]
    stats_out = {name: stats[:, i, :].T
                 for i, name in enumerate(WARMUP_STAT_NAMES)}
    stats_out["loop_iterations"] = iters[0]
    return (q_f.T, g_f.T, logp_f[0], stds_f.T, mean_f.T,
            jnp.moveaxis(est_f, -1, 0), sca_f[:, 0, :].T, draws_out,
            stats_out)
