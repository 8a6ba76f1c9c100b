"""Benchmark: gradient-evals/sec/chip and ESS/sec for batched NUTS sampling.

Prints ONE JSON line with the headline metric.  Runs on whatever accelerator
jax picks (the TPU chip under the driver; CPU elsewhere).

Configs mirror the reference's criterion harness plus BASELINE.json:
  normal_d10    — sample_1000_10 (reference benches/sample.rs:190-193) scaled
                  to many vmapped chains (headline config)
  normal_d1000  — sample_1000_1000 (benches/sample.rs:195-198), the large-d
                  axis
  logreg_d100   — 100-d logistic regression, the MXU-bound GLM config

vs_baseline: the reference publishes no numbers and no Rust toolchain exists
here, so each config's baseline is the native C++ single-core NUTS anchor
(nuts_rs_tpu/native/nuts_anchor.cpp — same algorithm, optimized, -O3
-march=native) built and timed on THIS machine at bench time.
vs_baseline = chip_throughput / single_core_native_throughput; multiply the
denominator by the core count a reference deployment would use (one core per
chain, e.g. 6) for a fleet-level comparison.  Anchor measurements are
reported per config in "detail".
"""

import json
import os
import re
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_ANSI = re.compile(r"\x1b\[[0-9;]*m")


def _short_err(e, cap=400):
    """One short, JSON-safe line for an exception: prefer the salient Mosaic /
    XLA message over multi-kilobyte device-log reprs (a full repr once made
    the bench's single JSON line unparseable — BENCH_r02)."""
    s = _ANSI.sub("", str(e))
    for pat in ("Mosaic failed to compile TPU kernel",
                "RESOURCE_EXHAUSTED", "INVALID_ARGUMENT", "INTERNAL"):
        i = s.find(pat)
        if i >= 0:
            line = s[i:].splitlines()[0]
            return f"{type(e).__name__}: {line}"[:cap]
    first = s.splitlines()[0] if s else ""
    return f"{type(e).__name__}: {first}"[:cap]

# Persistent compile cache: repeat runs skip the (tunnel-bound, ~2s/kernel)
# TPU compilation entirely.
jax.config.update("jax_compilation_cache_dir", "/tmp/nuts_rs_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

_HERE = os.path.dirname(os.path.abspath(__file__))
_ANCHOR_SRC = os.path.join(_HERE, "nuts_rs_tpu", "native", "nuts_anchor.cpp")
_ANCHOR_BIN = "/tmp/nuts_rs_tpu_anchor"

# Fallbacks if g++ is unavailable at bench time (values measured on the dev
# container's CPU, 2026-08; keys are (dim, maxdepth, logreg_n)).
_ANCHOR_FALLBACK = {
    (10, 10, 0): 2.57e6,
    (1000, 10, 0): 4.6e4,
    (100, 10, 1000): 4.7e3,
    # n=1000 measurement scaled by data size (the dense mat-vec dominates);
    # also covers an anchor-run timeout at this n.
    (100, 10, 131072): 36.0,
}


def native_anchor_rate(dim, num_tune, num_draws, maxdepth, logreg_n=0):
    """Build (once) and run the native C++ single-core anchor; returns
    grad-evals/s, or the recorded fallback if the toolchain is missing."""
    try:
        if (not os.path.exists(_ANCHOR_BIN)
                or os.path.getmtime(_ANCHOR_BIN) < os.path.getmtime(_ANCHOR_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", _ANCHOR_SRC,
                 "-o", _ANCHOR_BIN], check=True, capture_output=True)
        out = subprocess.run(
            [_ANCHOR_BIN, str(dim), str(num_tune), str(num_draws),
             str(maxdepth), "42", str(logreg_n)],
            check=True, capture_output=True, timeout=300)
        return float(json.loads(out.stdout)["grad_evals_per_sec"])
    except Exception:
        return _ANCHOR_FALLBACK.get((dim, maxdepth, logreg_n), float("nan"))


def _make_model(name):
    from nuts_rs_tpu.models import gaussian

    if name == "normal_d10":
        return gaussian.normal_logp(10, mu=3.0), 3.0
    if name == "normal_d1000":
        return gaussian.normal_logp(1000, mu=3.0), 3.0
    if name == "logreg_d100":
        return gaussian.logistic_regression(n_data=1000, dim=100, seed=0), None
    if name == "logreg_big":
        # 131072x100 design matrix (52 MB): far beyond the fused engine's
        # VMEM-replication budget, so the posterior phase exercises the
        # HBM-streaming StreamSpec path (DMA'd row tiles per leapfrog).
        return gaussian.logistic_regression(
            n_data=131072, dim=100, seed=0), None
    if name == "mclmc_d10":
        return gaussian.normal_logp(10, mu=3.0), 3.0
    raise ValueError(name)


def run_config(name, num_chains=1024, num_tune=300, num_draws=700,
               maxdepth=10, attempts=2, kernel=None, sampler_kw=None):
    import nuts_rs_tpu as nt

    model, true_mean = _make_model(name.removesuffix("_thin"))
    on_tpu = jax.default_backend() == "tpu"
    if name == "mclmc_d10":
        # Unadjusted microcanonical sampler (the reference's experimental
        # MCLMC): tiny per-draw carry, so the XLA path already runs at fused
        # speeds (1.26M evals/s measured on v5e at 1024 chains).
        kernel = "mclmc"
        settings = nt.DiagMclmcSettings(
            num_tune=num_tune, num_draws=num_draws, num_chains=num_chains,
            seed=0)
    else:
        if kernel is None:
            # The fused Pallas engine is the fast path on real TPUs; at
            # d=1000 the runner selects its dim-on-lanes tier (layout="ld",
            # kernels/nuts_pallas.py) since the chains-on-lanes checkpoint
            # stacks cannot fit VMEM there.
            kernel = "pallas" if on_tpu else "sync"
        settings = nt.DiagNutsSettings(
            num_tune=num_tune, num_draws=num_draws, num_chains=num_chains,
            maxdepth=maxdepth, seed=0, posterior_kernel=kernel)

    # Device<->host transfers ride a TPU tunnel with large intermittent
    # stalls (observed 2x run-to-run spread on identical code); take the best
    # of `attempts` full passes, criterion-style.
    t_tune = None
    t_samples = []
    trace = None
    for _ in range(max(1, attempts)):
        # One chunk per phase: a chunk is ONE host dispatch (the runner's
        # VMEM-budgeted sub-launches live inside a single jit), so large
        # chunks amortize tunnel round-trips and let the pipelined transfers
        # overlap; the phase boundaries still split warmup at the schedule's
        # step-size re-init draw.
        sampler = nt.Sampler(model, settings, dtype=jnp.float32,
                             chunk_size=max(num_tune, num_draws),
                             **(sampler_kw or {}))
        t0 = time.monotonic()
        # The warmup phase may span several chunks (the fused warmup engine
        # splits at the schedule's step-size re-init draw) — run until the
        # tuning draws are exhausted so t_tune/t_sample split at the real
        # phase boundary.
        while sampler._next_draw < settings.num_tune:
            sampler.run_next_chunk()
        t_tune = time.monotonic() - t0 if t_tune is None else min(
            t_tune, time.monotonic() - t0)

        t0 = time.monotonic()
        while not sampler.finished:
            sampler.run_next_chunk()
        t_samples.append(time.monotonic() - t0)
        trace = sampler.trace.finalize()
    t_sample = min(t_samples)
    draws = trace.posterior["position"]  # [C, K, d]
    if draws.dtype == np.float16:  # f16 numpy reductions accumulate in f16
        draws = draws.astype(np.float32)
    n_steps = trace.sample_stats["n_steps"].astype(np.int64)
    grad_evals = int(n_steps.sum())
    grad_evals_per_sec = grad_evals / t_sample
    # End-to-end rate includes warmup work and warmup wall-clock (the fused
    # Pallas warmup engine makes tuning run at kernel speed too).
    tune_evals = int(
        trace.warmup_sample_stats["n_steps"].astype(np.int64).sum())
    e2e_evals_per_sec = (grad_evals + tune_evals) / (t_sample + t_tune)

    # Bulk ESS (rank-normalized Geyer estimator) on the first coordinate.
    from nuts_rs_tpu.diagnostics import ess_bulk

    ess_total = float(ess_bulk(draws[..., 0]))
    ess_per_sec = ess_total / t_sample

    # Device-level kernel rate: re-launch the final posterior chunk with the
    # adapted state and only block_until_ready — no device->host streaming.
    # On this rig the end-to-end numbers above are dominated by the TPU
    # tunnel (per-chunk dispatch + tens of MB of draws/stats per chunk at
    # tunnel bandwidth); a deployment with local PCIe DMA sees the kernel
    # rate.  Measured here so both ends of the range are on record.
    kernel_rate = float("nan")
    kernel_rate_error = None
    try:
        from nuts_rs_tpu.sampler import _schedule_chunk

        lo = settings.num_tune
        hi = min(lo + min(200, num_draws), num_tune + num_draws)
        runner = jax.jit(next(
            r for s_, e_, r in sampler._phase_runners if s_ <= lo < e_))
        # extra_flags adds runner-specific per-draw flags (e.g. MCLMC's
        # 'resample'); raw schedule rows alone KeyError in those runners.
        kflags = settings.extra_flags(
            _schedule_chunk(sampler.schedule, lo, hi), lo, hi)
        kstate, kstats = runner(sampler.state, kflags)   # compile + warm
        jax.block_until_ready(kstats)
        # Chain the warm call's OUTPUT state into the timed call: repeating
        # the identical (state, flags) request was served from a cache by
        # the remote-execution layer (measured: a 0.6 s stream-tier launch
        # "completed" in 0.7 ms on the second identical call, reporting an
        # impossible 500M evals/s).
        t0 = time.monotonic()
        _, kstats = runner(kstate, kflags)
        jax.block_until_ready(kstats)
        dt = time.monotonic() - t0
        kernel_rate = float(np.asarray(kstats["n_steps"]).sum()) / dt
    except Exception as e:
        kernel_rate_error = _short_err(e)

    if name == "logreg_big":
        # Anchor at n=131072 single-core: dominated by the dense 131072x100
        # mat-vec per eval — a handful of draws measures the steady rate.
        anchor = native_anchor_rate(model.dim, 3, 3, maxdepth,
                                    logreg_n=131072)
    else:
        anchor = native_anchor_rate(
            model.dim, 1000, 1000, maxdepth,
            logreg_n=1000 if name == "logreg_d100" else 0)

    detail = {
        "config": name,
        "kernel": kernel,
        "num_chains": num_chains,
        "dim": model.dim,
        "num_draws": num_draws,
        "grad_evals_per_sec": round(grad_evals_per_sec, 1),
        "end_to_end_evals_per_sec": round(e2e_evals_per_sec, 1),
        "device_kernel_evals_per_sec": round(kernel_rate, 1),
        "draws_per_sec": round(num_draws * num_chains / t_sample, 1),
        "ess_per_sec": round(ess_per_sec, 1),
        "tune_seconds": round(t_tune, 2),
        "sample_seconds": round(t_sample, 2),
        "sample_seconds_all_attempts": [round(t, 2) for t in t_samples],
        "native_anchor_evals_per_sec_1core": round(anchor, 1),
        "vs_native_anchor": round(grad_evals_per_sec / anchor, 3),
        "platform": jax.devices()[0].platform,
    }
    if kernel_rate_error is not None:
        detail["kernel_rate_error"] = kernel_rate_error
    if sampler._engine_fell_back:
        detail["kernel"] = f"{kernel}->sync(fallback)"
    if true_mean is not None:
        detail["posterior_mean_abs_error"] = round(
            abs(float(draws.mean()) - true_mean), 4)
    return grad_evals_per_sec, detail


def run_micro():
    """Kernel-level microbenchmarks (reference: benches/sample.rs:126-188
    times multiply/axpy/scalar_prods at d in {4,16,17,100,4567}).  Times the
    hot device primitives at 1024 chains so per-kernel regressions are
    visible between rounds, independent of the end-to-end configs."""
    C = 1024
    rows = []
    for d in (4, 16, 100, 1000, 4567):
        key = jax.random.key(0)
        ks = jax.random.split(key, 6)
        p, pg, m, mg, v, stds = (jax.random.normal(k, (C, d), jnp.float32)
                                 for k in ks)
        step = jnp.full((C, 1), 0.1, jnp.float32)

        def leapfrog(q, g, vv):
            v1 = vv + (step / 2.0) * g
            q1 = q + step * v1
            g1 = -q1  # iid-normal gradient: pure elementwise cost
            v2 = v1 + (step / 2.0) * g1
            return q1, g1, v2

        def uturn(a, b, cc, dd):
            # the 3 scalar products of the U-turn criterion (reference
            # benches/sample.rs scalar_prods3), batched over chains
            s1 = jnp.sum((a + b) * cc, axis=-1)
            s2 = jnp.sum((a + b) * dd, axis=-1)
            s3 = jnp.sum(cc * dd, axis=-1)
            return s1, s2, s3

        def lowrank_apply(x, U):
            # low-rank affine F(x) = U @ (U^T x) scaled — the MXU-bound op
            return x + (x @ U) @ U.T

        U = jax.random.normal(ks[0], (d, min(8, d)), jnp.float32)
        for name, fn, args in (
                ("leapfrog", jax.jit(leapfrog), (p, pg, v)),
                ("uturn_scalar_prods3", jax.jit(uturn), (p, pg, m, mg)),
                ("lowrank_apply", jax.jit(lowrank_apply), (p, U))):
            try:
                out = fn(*args)
                jax.block_until_ready(out)
                n, t0 = 50, time.monotonic()
                for _ in range(n):
                    out = fn(*args)
                jax.block_until_ready(out)
                dt = (time.monotonic() - t0) / n
                rows.append({"kernel": name, "dim": d, "chains": C,
                             "usec_per_call": round(dt * 1e6, 2),
                             "chain_calls_per_sec": round(C / dt, 1)})
            except Exception as e:
                rows.append({"kernel": name, "dim": d,
                             "error": _short_err(e)})
    return {"metric": "microbench", "value": len(rows), "unit": "kernels",
            "vs_baseline": 1.0, "detail": {"micro": rows,
                                           "platform": jax.devices()[0].platform}}


def run_bench():
    try:
        head_rate, head = run_config("normal_d10")
    except Exception as e:
        # The headline must never die with the whole bench: if the fused
        # engine fails to compile on this chip/toolchain, fall back to the
        # XLA sync kernel and report the error alongside.  (run_config
        # itself already falls back via Sampler._try_engine_fallback; this
        # catches anything that escapes even that.)
        head_rate, head = run_config("normal_d10", kernel="sync")
        head["fused_engine_error"] = _short_err(e)
    grid = [head]
    side = [("normal_d1000", {}), ("logreg_d100", {}), ("mclmc_d10", {}),
            ("logreg_big", dict(num_chains=256, attempts=1)),
            # Headline config with the device->host payload knobs on
            # (stats thinned on device + f16 draws): what end-to-end
            # recovers when the transfer link is the bottleneck.
            # attempts=2: a single pass is at the mercy of one tunnel
            # window (measured 2x run-to-run swings).
            ("normal_d10_thin", dict(attempts=2, sampler_kw=dict(
                keep_stats=(), draw_dtype=jnp.float16)))]
    for name, kw in side:
        try:
            grid.append(run_config(name, num_tune=300, num_draws=400,
                                   **kw)[1])
        except Exception as e:  # a failing side config must not kill the bench
            grid.append({"config": name, "error": _short_err(e)})
    return {
        "metric": "gradient_evals_per_sec_per_chip",
        "value": round(head_rate, 1),
        "unit": "grad_evals/s",
        "vs_baseline": head["vs_native_anchor"],
        "detail": {"configs": grid},
    }


if __name__ == "__main__":
    try:
        result = run_micro() if "--micro" in sys.argv else run_bench()
    except Exception as e:
        # The driver parses exactly one JSON line; emit one no matter what.
        result = {"metric": "gradient_evals_per_sec_per_chip", "value": 0.0,
                  "unit": "grad_evals/s", "vs_baseline": 0.0,
                  "detail": {"error": _short_err(e)}}
    print(json.dumps(result))
