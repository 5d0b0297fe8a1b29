"""Test env: force CPU with 8 virtual devices BEFORE jax initializes.

Multi-chip sharding paths are validated on the virtual CPU mesh
(SURVEY.md section 4: XLA_FLAGS=--xla_force_host_platform_device_count).
Flows in tests are tiny (2-4 layers): XLA CPU compiles are ~10-30 s/program
on this host, so tests reuse a small set of shapes/programs.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# This image's sitecustomize registers a TPU-tunnel backend and forces
# jax_platforms='axon,cpu' programmatically, which overrides the env vars
# above - override it back. jax_num_cpu_devices is the config-level
# equivalent of xla_force_host_platform_device_count.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compilation cache: XLA CPU compiles are ~10-30 s/program here
# and dominate suite wall time - cache them across runs (round-4 dev-loop
# fix; first run populates, repeats hit disk).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

from fthmc_tpu.config import FlowSpec  # noqa: E402
from fthmc_tpu.models.flow import init_flow_params  # noqa: E402

# ---------------------------------------------------------------------------
# fast/slow split (round-3): `pytest -m "not slow"` is the <5 min dev loop;
# CI runs everything. Measured on this host (CPU, --durations): the tests
# below are the >=8 s tail - statistical windows, Pallas interpret-mode
# kernels, and whole-run drivers. Centralized here so the split tracks one
# list instead of scattered decorators.
# ---------------------------------------------------------------------------

_SLOW_MODULES = {"test_pallas_vjp"}          # 537 s: interpret-mode VJP grid
_SLOW_TESTS = {
    ("test_sampling", "test_multichain_keep_fields"),
    ("test_sampling", "test_multichain_ensemble_shapes_and_independence"),
    ("test_sampling", "test_generate_ensemble_multichain_reports"),
    ("test_sampling", "test_identity_flow_uniform_proposals_all_weights_equal"),
    ("test_train", "test_annealed_training_beta_schedule"),
    ("test_train", "test_grad_clip_trains"),
    ("test_train", "test_force_matching_step_runs"),
    ("test_train", "test_force_matching_with_distillation"),
    ("test_train", "test_training_improves_loss"),
    ("test_train", "test_resume_continues_era_numbering"),
    ("test_pallas", "test_pallas_leapfrog_cl_matches_xla"),
    ("test_fthmc", "test_run_fthmc_random_flow_exactness"),
    ("test_fthmc", "test_run_fthmc_chunked"),
    ("test_fthmc", "test_run_fthmc_identity_flow_exactness"),
    ("test_fthmc", "test_ft_force_matches_numeric_gradient"),
    ("test_hmc", "test_run_fthmc_thinned_summary_consistent"),
    ("test_hmc", "test_run_hmc_thinned_summary_consistent"),
    ("test_hmc", "test_run_hmc_physics"),
    ("test_hmc", "test_run_hmc_chunked_matches_shapes"),
    ("test_mesh", "test_sharded_train_era_matches_single_device"),
    ("test_mesh", "test_sharded_train_step"),
    ("test_mesh", "test_sharded_fthmc_runs"),
    ("test_mesh", "test_sharded_run_fthmc_exactness"),
    ("test_mesh", "test_sharded_hmc_matches_single_device"),
    ("test_spline", "test_logdet_matches_autodiff_jacobian"),
    ("test_spline", "test_fthmc_exact_with_spline_flow"),
    ("test_domain_flow", "test_ft_action_force_sharded_match"),
    ("test_domain_flow", "test_run_domain_fthmc_whole_run_driver"),
    ("test_domain", "test_domain_hmc_step_physics"),
    ("test_domain", "test_run_domain_hmc_whole_run_driver"),
    ("test_api", "test_field_transformation_facade"),
    ("test_pallas_coupling", "test_fused_flow_matches_xla"),
    ("test_omelyan", "test_run_hmc_omelyan_physics"),
    ("test_nan_guards", "test_train_step_nan_free"),
    ("test_mixed_precision", "test_bf16_fthmc_exactness"),
    ("test_coupling", "test_logdet_matches_autodiff_jacobian"),
    ("test_mesh", "test_sharded_run_hmc_matches_single_device_statistically"),
    ("test_mesh", "test_sharded_train_era_annealed"),
    ("test_lattice", "test_wilson_loop_area_law"),
    ("test_fthmc", "test_ft_force_identity_flow_matches_plain"),
    ("test_rncp", "test_force_is_smooth"),
    ("test_pallas_coupling",
     "test_fused_layer_logj_antisymmetric_with_reverse"),
    ("test_train", "test_train_step_metrics_and_update"),
    ("test_mixed_precision", "test_s_clip_noop_when_small"),
    ("test_nan_guards", "test_fthmc_step_nan_free"),
    ("test_cli", "test_pipeline_highbeta_smoke"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__
        base = item.name.split("[")[0]
        if mod in _SLOW_MODULES or (mod, base) in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spec2() -> FlowSpec:
    """Tiny 2-layer flow spec shared across tests (one compile cache)."""
    return FlowSpec(n_layers=2, n_mixture=2, hidden_sizes=(4,), kernel_size=3)


@pytest.fixture(scope="session")
def params2(spec2):
    return init_flow_params(jax.random.PRNGKey(7), spec2)


@pytest.fixture(scope="session")
def identity_params2(params2):
    """Zero the final conv of each coupling net -> s=0, t=0 -> the flow is
    exactly the identity with zero log-Jacobian."""
    out = []
    for net in params2:
        net = [dict(p) for p in net]
        net[-1] = {"w": jnp.zeros_like(net[-1]["w"]),
                   "b": jnp.zeros_like(net[-1]["b"])}
        out.append(net)
    return out


@pytest.fixture(scope="session")
def x_batch():
    """Random batch of link configs (4, 2, 8, 8) in (-pi, pi)."""
    import math
    return jax.random.uniform(
        jax.random.PRNGKey(3), (4, 2, 8, 8), jnp.float32,
        -math.pi, math.pi)
