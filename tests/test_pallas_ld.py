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


def test_ld_block_env_override(monkeypatch):
    # NUTS_PALLAS_LD_BLOCK forces the chains-per-block tier and skips the
    # static VMEM pre-check (the formula is conservative; a block that
    # genuinely does not fit fails at Mosaic compile and the engine
    # fallback catches it — measured round 5: 32 rejected at d=1000).
    import nuts_rs_tpu.chain as chain_mod

    model = gaussian.normal_logp(1000, 3.0)
    s = nt.DiagNutsSettings(posterior_kernel="pallas", maxdepth=10)
    monkeypatch.setenv("NUTS_PALLAS_LD_BLOCK", "32")
    assert chain_mod._ld_tiers() == ((32,), True)
    r = make_pallas_posterior_runner(model, None, s.chain_config(),
                                     phase_start=s.num_tune, base_seed=0)
    assert r is not None, "forced tier must bypass the budget rejection"
    monkeypatch.delenv("NUTS_PALLAS_LD_BLOCK")
    assert chain_mod._ld_tiers() == ((32, 16, 8), False)


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


def test_ld_multi_block_grid():
    # Two ld grid blocks (C=8, block=4): per-block PRNG streams must differ
    # (program_id salt) and every emitted logp must match the model.
    import jax
    from nuts_rs_tpu.kernels.nuts import NutsOptions
    from nuts_rs_tpu.kernels.nuts_pallas import nuts_pallas_run

    d, C, K = 5, 8, 40
    model = gaussian.normal_logp(d, 3.0)
    rng = np.random.default_rng(3)
    q0 = jnp.asarray(np.full((C, d), 3.0), jnp.float32)  # identical starts
    lp0, g0 = jax.vmap(jax.value_and_grad(model.logp_fn))(q0)
    ones = jnp.ones((C, d), jnp.float32)
    zeros = jnp.zeros((C, d), jnp.float32)

    def lgb(q):
        return jax.vmap(jax.value_and_grad(model.logp_fn),
                        in_axes=0, out_axes=(0, 0))(q)

    _, _, _, draws, stats = nuts_pallas_run(
        9, q0, g0, lp0, ones, zeros, jnp.zeros((C,), jnp.float32),
        jnp.full((C,), 0.5, jnp.float32), jnp.full((C,), 0.5, jnp.float32),
        K, lgb, NutsOptions(maxdepth=6), None, block=4, interpret=True,
        layout="ld")
    pos = np.asarray(draws)
    lp_expect = jax.vmap(jax.vmap(model.logp_fn))(jnp.asarray(pos, jnp.float32))
    err = np.max(np.abs(np.asarray(stats["logp"]) - np.asarray(lp_expect)))
    assert err < 1e-3, err
    # identical inits: any stream duplication across the two blocks would
    # replay identical chains
    flat = pos.reshape(C, -1)
    for i in range(C):
        for j in range(i + 1, C):
            assert not np.allclose(flat[i], flat[j]), (i, j)
