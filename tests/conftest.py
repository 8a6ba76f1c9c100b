import os

# Tests run on a virtual 8-device CPU mesh with f64 enabled so they reproduce
# the reference's numerical behavior; TPU benchmarks run separately in f32.
#
# The environment registers an 'axon' TPU platform via sitecustomize and pins
# JAX_PLATFORMS=axon, so the env var alone is not enough — the jax config
# update below is what actually forces CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu"


# ---- fast/slow test tiers -------------------------------------------------
# The full suite costs ~30 min on the virtual CPU mesh; the quick lane
# (`pytest -m "not slow"`) finishes in ~8-10 min on this container (faster
# with a warm compile cache) for iteration and CI PR checks, with the full
# suite run nightly / by the round driver.
# Central list (measured >=10 s each) instead of scattered decorators so the
# tier assignment is auditable in one place.

import pytest  # noqa: E402

_SLOW_TESTS = {
    "test_mesh_pallas_matches_unmeshed_statistics",
    "test_three_kernels_agree_statistically",
    "test_extra_doublings",
    "test_sv_fused_engine_matches_xla",
    "test_checkpoint_resume_pallas_engines",
    "test_radon_fused_engine_matches_xla",
    "test_pallas_warmup_glm_model_args",
    "test_coupling_flow_pallas_posterior",
    "test_pallas_warmup_correlated_target",
    "test_pallas_warmup_adaptation_matches_xla",
    "test_mesh_fused_kernels_posterior",
    "test_ld_end_to_end_posterior",
    "test_pallas_glm_model_args",
    "test_pallas_warmup_posterior_moments",
    "test_pallas_posterior_kernel",
    "test_recovers_generating_parameters",
    "test_stream_only_model_public_api",
    "test_mesh_pallas_streams_decorrelated_across_devices",
    "test_async_posterior_kernel",
    "test_pallas_warmup_schedule_stats",
    "test_dryrun_multichip",
    "test_dim_sharded_with_cross_chain_adaptation",
    "test_zarr_matches_memory",
    "test_dim_sharded_nuts_posterior",
    "test_coupling_flow_sampling_funnel",
    "test_flow_async_posterior_chunk_invariance",
    "test_radon_parameter_recovery",
    "test_zarr_roundtrip_with_time_coord",
    "test_dim_sharded_deterministic",
    "test_dim_sharded_mclmc_large_d",
    "test_mesh_pooled_flow_trains_one_shared_flow",
    "test_pallas_request_on_low_rank_falls_back",
    "test_checkpoint_resume",
    "test_cross_chain_pooled_low_rank",
    "test_low_rank_store_mass_matrix_events",
    "test_flow_mclmc_defaults_constructible",
    "test_mesh_mclmc_posterior",
    "test_low_rank_exact_gaussian_whitening",
    "test_expand_fn",
    "test_pallas_forward_matches_reference_forward",
    "test_zarr_layout",
    "test_mesh_public_api",
    "test_smoke_reaches_mean_30",
    "test_mclmc_draws_normal",
    "test_mclmc_posterior_moments",
    "test_pallas_kernel_matches_naive_multidraw",
    "test_chains_differ",
    "test_diag_affine_flow_sampling",
    "test_mclmc_cross_chain_adaptation_on_mesh",
}


def pytest_collection_modifyitems(config, items):
    matched = set()
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS:
            matched.add(base)
            item.add_marker(pytest.mark.slow)
    # Self-check the tier list on full collections: a renamed test must not
    # silently drop a multi-minute case into the quick lane.  (Partial
    # collections — pytest path/file or -k selections — see only a subset,
    # so only enforce when everything was collected.)
    full = (not getattr(config.option, "keyword", "")
            and not config.getoption("--ignore", None)
            and not config.getoption("--ignore-glob", None)
            and all(os.path.isdir(a.split("::")[0]) for a in config.args))
    if full:
        stale = _SLOW_TESTS - matched
        if stale:
            # Warn, don't assert: a collection/import error elsewhere also
            # leaves entries unmatched, and the real error must stay the
            # headline.  The warning keeps renames from silently demoting a
            # slow test into the quick lane.
            import warnings

            warnings.warn(
                f"_SLOW_TESTS entries match no collected test: "
                f"{sorted(stale)}; update tests/conftest.py after "
                "renaming/removing tests", UserWarning)
