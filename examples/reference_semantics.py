"""Reference-exact warmup semantics + self-serve launch sizing.

Two knobs for users migrating from nuts-rs who want behavior as close to
the reference as this hardware allows:

* ``AdaptScheduleOptions(window_by_good_draws=True)`` runs the reference's
  per-chain warmup window counters ON DEVICE (``GlobalStrategy::adapt``,
  src/adapt_strategy.rs:121-216): fg/bg estimator windows advance by each
  chain's own count of good (non-divergent) draws instead of the default
  draw-index schedule.  On divergence-heavy targets the two differ; with no
  divergences they take identical decisions.

* ``Sampler(max_chains_per_launch="auto")`` probes the largest chain-batch
  size that launches without a device fault (full batch on a 2-draw chunk,
  halving on fault) — for models where one huge batched launch trips
  device limits, without guessing a divisor.

Run: python examples/reference_semantics.py
"""

import numpy as np

import nuts_rs_tpu as nt
from nuts_rs_tpu.adapt.schedule import AdaptScheduleOptions
from nuts_rs_tpu.models import gaussian


def main():
    model = gaussian.funnel(6)  # divergence-prone: the regime that matters
    settings = nt.DiagNutsSettings(
        num_tune=400, num_draws=400, num_chains=8, seed=0,
        max_energy_error=3.0,
        adapt=AdaptScheduleOptions(window_by_good_draws=True),
    )
    sampler = nt.Sampler(model, settings, chunk_size=200,
                         max_chains_per_launch="auto", fail_after=None)
    trace = sampler.run()

    div = trace.sample_stats["diverging"].mean()
    step = np.median(trace.sample_stats["step_size"])
    v = trace.posterior["position"][..., 0]
    print(f"funnel, reference warmup semantics: "
          f"divergence rate {div:.2%}, median step {step:.3f}")
    print(f"log-scale marginal: mean {v.mean():+.3f} (target 0), "
          f"std {v.std():.2f} (target 3)")
    print(f"resolved max_chains_per_launch: {sampler.max_chains_per_launch} "
          "(None = one full-batch launch)")


if __name__ == "__main__":
    main()
