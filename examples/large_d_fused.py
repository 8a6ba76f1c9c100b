"""Large-d sampling through the fused engine's dim-on-lanes tier.

The reference's second headline bench is ``sample_1000_1000`` — 1000 NUTS
draws on a 1000-dimensional normal (``benches/sample.rs:195-198``, one CPU
core).  On TPU, d=1000 state cannot use the chains-on-lanes Pallas layout
(the 6 checkpoint stacks of (maxdepth+1) x d words per lane exceed VMEM),
so ``posterior_kernel="pallas"`` automatically selects the transposed
``layout="ld"`` tier: chains ride sublanes in blocks of 8-32, the parameter
axis fills the lanes, and the whole sampler state stays VMEM-resident —
HBM is touched once per multi-draw launch instead of ~40 times per leapfrog
on the XLA path (kernels/nuts_pallas.py).

Data-heavy likelihoods compose with the other large-axis escape hatch: a
``Model.pallas_stream`` (StreamSpec) DMAs the dataset tile-by-tile from HBM
per gradient evaluation (see ``models/gaussian.py::logistic_regression``).

Run anywhere (CPU interpret mode is slow but exact):

    python examples/large_d_fused.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), _os.pardir))  # repo-root import without install

import jax
import jax.numpy as jnp
import numpy as np

import nuts_rs_tpu as nt
from nuts_rs_tpu.models import gaussian

if jax.default_backend() == "tpu":
    D, CHAINS = 1000, 1024
else:
    # CPU runs the kernel in interpret mode (exact but slow emulation):
    # keep the demo small; the ld tier engages at d >= ~250 (maxdepth 10).
    D, CHAINS = 260, 8

model = gaussian.normal_logp(D, mu=3.0)
settings = nt.DiagNutsSettings(
    num_tune=300 if jax.default_backend() == "tpu" else 140,
    num_draws=300 if jax.default_backend() == "tpu" else 100,
    num_chains=CHAINS,
    seed=0,
    posterior_kernel="pallas",  # selects the ld tier at this d
)

trace = nt.sample(model, settings, dtype=jnp.float32)

pos = np.asarray(trace.posterior["position"])  # [chains, draws, d]
print("posterior mean error:", abs(pos.mean() - 3.0))
print("divergence rate:", np.asarray(trace.sample_stats["diverging"]).mean())
print("mean tree depth:", np.asarray(trace.sample_stats["depth"]).mean())
