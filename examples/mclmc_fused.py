"""MCLMC end-to-end on the fused Pallas engines (warmup + posterior).

The unadjusted microcanonical sampler (nuts-rs ``MclmcSettings``,
src/sampler.rs:268-318 — experimental in the reference too) with BOTH
phases on the fused VMEM-resident engines:

* posterior: ``kernels/mclmc_pallas.py`` draw-asynchronous engine
  (measured 47-51M device grad-evals/s at d=10, 1024 chains on v5e);
* warmup: the round-5 lock-step warmup engine — trajectory dynamics with
  the dynamic step-halving stack per draw, plus the fg/bg Welford
  estimators, window switches, and the diagonal mass-matrix rule
  in-kernel (same adaptation math as the XLA path; the deterministic
  transformation_index schedule matches it exactly).

Run on a TPU host; on CPU the kernels execute in interpret mode (slow but
correct, same code path the test suite pins).
"""

import numpy as np

import nuts_rs_tpu as nt
from nuts_rs_tpu.models import gaussian


def main():
    model = gaussian.normal_logp(10, mu=3.0)
    settings = nt.DiagMclmcSettings(
        num_tune=300,
        num_draws=700,
        num_chains=256,
        seed=0,
        # the fused engines; falls back to the XLA scan path with a
        # warning if a setting disqualifies (extra stores, non-diag
        # mass matrix, mesh_axis_name, ...)
        posterior_kernel="pallas",
    )
    sampler = nt.Sampler(model, settings, chunk_size=400,
                         # device->host payload knobs: drop optional stat
                         # arrays on device, ship draws as f16
                         keep_stats=(), draw_dtype=np.float16)
    # Phases: Euclidean warmup [0, 90), Microcanonical warmup [90, 300)
    # (the trajectory switch at 0.3 * num_tune), fused posterior [300, 1000).
    print("phases:", [(lo, hi) for lo, hi, _ in sampler._phase_runners])
    trace = sampler.run()

    pos = np.asarray(trace.posterior["position"], np.float64)
    print(f"posterior mean {pos.mean():+.3f} (target +3.000), "
          f"std {pos.std():.3f} (target 1.000)")
    print("divergences:", int(np.asarray(
        trace.sample_stats["diverging"]).sum()))
    print("warmup transformation updates:",
          int(np.asarray(
              trace.warmup_sample_stats["transformation_index"])[:, -1][0]))


if __name__ == "__main__":
    main()
