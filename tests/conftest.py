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
import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

from fthmc_tpu.config import FlowSpec  # noqa: E402
from fthmc_tpu.models.flow import init_flow_params  # noqa: E402


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
