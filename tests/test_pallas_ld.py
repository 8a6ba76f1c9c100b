"""Large-d (dim-on-lanes) tier of the fused Pallas engine.

At d in the hundreds-to-thousands the chains-on-lanes checkpoint stacks
(6 x (D+1) x d words per lane) cannot fit VMEM, so the runner switches to
the transposed ``layout="ld"`` kernel: chains ride sublanes in small blocks
while the parameter axis fills the lanes (kernels/nuts_pallas.py).  The
reference benches this regime as ``sample_1000_1000``
(benches/sample.rs:195-198).  Bit-exactness of the ld tree decisions is
covered by tests/test_kernel_equivalence.py; this file covers the runner's
tier selection and the end-to-end public API path.
"""

import jax.numpy as jnp
import numpy as np

import nuts_rs_tpu as nt
from nuts_rs_tpu.chain import make_pallas_posterior_runner
from nuts_rs_tpu.models import gaussian


def test_runner_picks_ld_tier_at_large_d():
    model = gaussian.normal_logp(300, 3.0)
    s = nt.DiagNutsSettings(posterior_kernel="pallas", maxdepth=10)
    r = make_pallas_posterior_runner(model, None, s.chain_config(),
                                     phase_start=s.num_tune, base_seed=0)
    assert r is not None, "d=300 must build on the ld tier (cl cannot fit)"


def test_ld_end_to_end_posterior():
    d = 260
    model = gaussian.normal_logp(d, 3.0)
    s = nt.DiagNutsSettings(num_tune=140, num_draws=100, num_chains=8,
                            seed=0, posterior_kernel="pallas")
    tr = nt.sample(model, s, dtype=jnp.float32)
    pos = np.asarray(tr.posterior["position"])
    assert abs(pos.mean() - 3.0) < 0.06
    assert abs(pos.std() - 1.0) < 0.06
    assert not np.asarray(tr.sample_stats["diverging"]).any()
