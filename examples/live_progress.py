"""Live per-chain progress + batched-execution operational knobs.

The reference streams per-draw progress from each chain thread
(src/sampler.rs:1340-1363 feeds indicatif progress bars); here chains run
lock-step on the device, so ``progress_tick=N`` fires an async device
callback every N draws that updates ``ChainProgress`` while a chunk is
still executing.  Also shown: the device->host payload knobs
(``keep_stats`` / ``draw_dtype``) for transfer-bound hosts.
"""

from _model import jnp, np, nt, make_model

model = make_model()
settings = nt.DiagNutsSettings(num_tune=400, num_draws=600, num_chains=64,
                               seed=0)


def show(progress):
    p = progress[0]  # chains run lock-step; chain 0 is representative
    done = sum(pr.finished_draws for pr in progress)
    total = sum(pr.total_draws for pr in progress)
    divs = sum(pr.divergences for pr in progress)
    phase = "tune" if p.tuning else "sample"
    print(f"  [{phase}] {done}/{total} draws, {divs} divergences, "
          f"step_size={p.step_size:.3g}, latest tree {p.latest_num_steps} "
          "steps")


sampler = nt.Sampler(
    model, settings,
    chunk_size=500,            # big chunks for throughput ...
    progress_tick=50,          # ... ticks keep progress live inside them
    progress_callback=show,
    keep_stats=("energy",),    # drop every other stat array ON DEVICE
    draw_dtype=jnp.float16,    # halve the draw payload for the D2H move
)
trace = sampler.run()

pos = np.asarray(trace.posterior["position"], dtype=np.float32)
print("posterior mean:", pos.mean(axis=(0, 1)).round(3))
print("chain 0 summary:", sampler.progress[0])
