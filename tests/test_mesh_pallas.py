"""Fused-engine x mesh composition on the virtual 8-device CPU mesh.

The production deployment path runs the fused Pallas posterior (and warmup)
engine per device while chains shard over the mesh ``chains`` axis with
``shard_map`` — the reference's rayon pool scaled across chips (SURVEY.md
§2.12).  These tests validate that composition end-to-end in interpret mode:

* posterior correctness through ``posterior_kernel="pallas"`` under a mesh;
* PRNG decorrelation across shards: the kernel streams derive from a scalar
  seed + program_id, which would replay identically on every device without
  the per-shard salt (chain.py make_pallas_posterior_runner);
* the draw-asynchronous kernel under a mesh (threefry keys shard naturally).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nuts_rs_tpu as nt
from nuts_rs_tpu.models import gaussian
from nuts_rs_tpu.parallel.mesh import make_mesh

MU = 3.0


def _run(kernel, num_chains=16, init_positions=None, num_tune=220,
         num_draws=300, d=3, seed=5):
    model = gaussian.normal_logp(d, MU)
    settings = nt.DiagNutsSettings(
        num_tune=num_tune, num_draws=num_draws, num_chains=num_chains,
        seed=seed, posterior_kernel=kernel)
    sampler = nt.Sampler(model, settings, mesh=make_mesh(),
                         dtype=jnp.float32, chunk_size=128,
                         init_positions=init_positions)
    return sampler.run()


@pytest.mark.parametrize("kernel", ["pallas", "async"])
def test_mesh_fused_kernels_posterior(kernel):
    trace = _run(kernel)
    pos = np.asarray(trace.posterior["position"])  # [chains, draws, d]
    assert pos.shape[0] == 16
    se = 1.0 / np.sqrt(pos.shape[0] * pos.shape[1] / 10.0)
    np.testing.assert_allclose(pos.mean(), MU, atol=5 * se + 0.05)
    np.testing.assert_allclose(pos.std(), 1.0, atol=0.1)
    # every chain moved and no chain is stuck
    assert (np.abs(np.diff(pos[:, :, 0], axis=1)).sum(axis=1) > 0).all()


def test_mesh_pallas_streams_decorrelated_across_devices():
    # All 16 chains start at the SAME point: identical trajectories can then
    # only come from duplicated PRNG streams.  Two chains per device — the
    # per-shard salt must decorrelate device pairs, the lane/program_id
    # structure decorrelates chains within a device.
    d = 3
    init = np.full((16, d), MU, dtype=np.float32)
    trace = _run("pallas", init_positions=init, num_tune=150, num_draws=60)
    pos = np.asarray(trace.posterior["position"])  # [16, 60, d]
    flat = pos.reshape(16, -1)
    for i in range(16):
        for j in range(i + 1, 16):
            assert not np.allclose(flat[i], flat[j]), (
                f"chains {i} and {j} replay the same stream")


def test_mesh_mclmc_posterior():
    # MCLMC's phase runners are sync scans; they must compose with the mesh
    # like the NUTS engines do.
    trace = nt.sample(gaussian.normal_logp(4, MU),
                      nt.DiagMclmcSettings(num_tune=300, num_draws=400,
                                           num_chains=16, seed=0),
                      mesh=make_mesh())
    pos = np.asarray(trace.posterior["position"])
    assert abs(pos.mean() - MU) < 0.25


def test_mesh_pallas_matches_unmeshed_statistics():
    # Same settings with and without the mesh: distributions must agree
    # (streams differ by construction — compare moments, not draws).
    model = gaussian.normal_logp(3, MU)
    settings = nt.DiagNutsSettings(num_tune=220, num_draws=400,
                                   num_chains=16, seed=11,
                                   posterior_kernel="pallas")
    t_mesh = nt.Sampler(model, settings, mesh=make_mesh(),
                        dtype=jnp.float32).run()
    t_flat = nt.Sampler(model, settings, dtype=jnp.float32).run()
    a = np.asarray(t_mesh.posterior["position"])
    b = np.asarray(t_flat.posterior["position"])
    assert abs(a.mean() - b.mean()) < 0.08
    assert abs(a.std() - b.std()) < 0.08


def test_mesh_pooled_flow_trains_one_shared_flow():
    # Pooled flow refits under a mesh must all-gather the training windows
    # and share one key, so every device holds the SAME flow (adapt/flow.py
    # gathers over the chains axis; without it each device would train its
    # own "shared" flow on 1/N of the windows).  Statistical check: the
    # meshed run must match the unmeshed pooled run.
    from nuts_rs_tpu.flows import diag_affine_flow

    model = gaussian.normal_logp(4, MU)

    def run(mesh):
        settings = nt.FlowNutsSettings(
            num_tune=200, num_draws=300, num_chains=8, seed=3,
            flow_spec=diag_affine_flow())
        return nt.sample(model, settings, mesh=mesh, chunk_size=100)

    t_mesh = run(make_mesh())
    t_flat = run(None)
    a = np.asarray(t_mesh.posterior["position"])
    b = np.asarray(t_flat.posterior["position"])
    assert abs(a.mean() - MU) < 0.15
    assert abs(a.mean() - b.mean()) < 0.12
    assert abs(a.std() - b.std()) < 0.15
    # the shared transform advances identically on every chain
    ti = np.asarray(t_mesh.sample_stats["transformation_index"])
    assert (ti == ti[:1]).all(), "chains disagree on the transformation id"
