"""Reference-compatible API facade.

Users coming from nftqcd/fthmc find the familiar names here, mapped onto the
functional TPU core. Signatures are JAX-flavoured (explicit params/keys, no
modules), but the vocabulary and call patterns match the reference:

    fthmc/utils/qed_helpers.py: BatchAction, batch_plaqs, batch_charges,
        plaq_phase, action, force, regularize, torch_wrap -> wrap,
        ft_flow, ft_flow_inv, ft_action, ft_force, leapfrog, hmc
    fthmc/utils/layers.py: make_u1_equiv_layers (-> make_flow),
        gauge_transform, random_gauge_transform
    fthmc/utils/distributions.py: calc_dkl, calc_ess, bootstrap,
        MultivariateUniform (-> uniform_link_prior), SimpleNormal
    fthmc/utils/samplers.py: apply_flow_to_prior, make_mcmc_ensemble,
        generate_ensemble
    fthmc/ft_hmc.py: FieldTransformation
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from fthmc_tpu import lattice
from fthmc_tpu.config import (FlowSpec, HMCConfig, LeapfrogConfig,
                              SchedulerConfig, TrainConfig)
from fthmc_tpu.hmc import (TrajMetrics, ft_action, ft_force, fthmc_step,
                           hmc_step, leapfrog, run_fthmc, run_hmc)
from fthmc_tpu.models.flow import (count_parameters, flow_forward,
                                   flow_reverse, init_flow_params)
from fthmc_tpu.models.priors import normal_prior, uniform_link_prior
from fthmc_tpu.observables import bootstrap, calc_dkl, calc_ess
from fthmc_tpu.sampling import generate_ensemble, make_mcmc_ensemble

# --- qed_helpers-style names -------------------------------------------------

plaq_phase = lattice.plaq_phase
batch_plaqs = lattice.batch_plaqs
batch_charges = lattice.batch_charges
batch_action = lattice.batch_action
topo_charge = lattice.topo_charge
action = lattice.action
force = lattice.force
wrap = lattice.wrap
regularize = lattice.regularize
gauge_transform = lattice.gauge_transform
random_gauge_transform = lattice.random_gauge_transform
PLAQ_EXACT = lattice.PLAQ_EXACT


class BatchAction:
    """Callable Wilson action over a batch (reference BatchAction,
    qed_helpers.py:166-186)."""

    def __init__(self, beta: float):
        self.beta = beta

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return lattice.batch_action(x, self.beta)


def make_flow(key: jax.Array, *, n_layers: int = 24, n_mixture: int = 2,
              hidden_sizes=(8, 8), kernel_size: int = 3,
              activation: str = "silu"):
    """Build flow (params, spec) - the analogue of make_u1_equiv_layers
    (reference layers.py:399-429). Params are lattice-size independent."""
    spec = FlowSpec(n_layers=n_layers, n_mixture=n_mixture,
                    hidden_sizes=tuple(hidden_sizes),
                    kernel_size=kernel_size, activation=activation)
    return init_flow_params(key, spec), spec


def ft_flow(params, spec: FlowSpec, x: jnp.ndarray) -> jnp.ndarray:
    """Forward flow, field only (reference qed_helpers.py:191-198)."""
    y, _ = flow_forward(params, x, spec)
    return y


def ft_flow_inv(params, spec: FlowSpec, y: jnp.ndarray) -> jnp.ndarray:
    """Inverse flow, field only (reference qed_helpers.py:201-209)."""
    x, _ = flow_reverse(params, y, spec)
    return x


def apply_flow_to_prior(params, spec: FlowSpec, key: jax.Array, *,
                        batch_size: int, L: int):
    """(x, z, logq) triple (reference samplers.py:40-56)."""
    from fthmc_tpu.train import sample_and_logq
    return sample_and_logq(params, spec, key, batch_size, L)


# --- FieldTransformation facade ---------------------------------------------

@dataclass
class FieldTransformation:
    """OO facade over the FT-HMC kernels (reference ft_hmc.py:109-346).

    The chain state is latent (z); `run` returns the metric history as
    stacked device arrays. Construct via `FieldTransformation(params, spec,
    beta, lf)`.
    """
    params: Any
    spec: FlowSpec
    beta: float
    lf: LeapfrogConfig
    force_backend: str = "auto"   # 'auto' | 'xla' | 'pallas' (fused VJP
                                  # kernels, ops/pallas_coupling_vjp.py)

    def action(self, z: jnp.ndarray) -> jnp.ndarray:
        return ft_action(self.params, self.spec, z, self.beta)

    def force(self, z: jnp.ndarray) -> jnp.ndarray:
        from fthmc_tpu.hmc import resolve_force_backend
        if resolve_force_backend(self.force_backend, self.spec, z.shape,
                                 z.dtype) == "pallas":
            from fthmc_tpu.ops.pallas_coupling_vjp import ft_force_pallas
            return ft_force_pallas(self.params, self.spec, z, self.beta)
        return ft_force(self.params, self.spec, z, self.beta)

    def flow_forward(self, z: jnp.ndarray):
        return flow_forward(self.params, z, self.spec)

    def flow_backward(self, y: jnp.ndarray):
        return flow_reverse(self.params, y, self.spec)

    def hmc(self, key: jax.Array, z: jnp.ndarray, q_old=None):
        if q_old is None:
            y, _ = self.flow_forward(z)
            q_old = lattice.batch_charges(y)
        return fthmc_step(self.params, self.spec, key, z, q_old, self.beta,
                          self.lf.dt, self.lf.nstep,
                          force_backend=self.force_backend)

    def run(self, key: jax.Array, z0: jnp.ndarray, num_trajs: int = 1024):
        return run_fthmc(self.params, self.spec, self.lf, beta=self.beta,
                         ntraj=num_trajs, z0=z0, key=key,
                         force_backend=self.force_backend)

    def initializer(self, key: jax.Array, n_chains: int, L: int,
                    rand: bool = True) -> jnp.ndarray:
        if rand:
            return lattice.hot_start(key, n_chains, L)
        return jnp.zeros((n_chains, 2, L, L), jnp.float32)


__all__ = [
    "plaq_phase", "batch_plaqs", "batch_charges", "batch_action",
    "topo_charge", "action", "force", "wrap", "regularize",
    "gauge_transform", "random_gauge_transform", "PLAQ_EXACT", "BatchAction",
    "make_flow", "ft_flow", "ft_flow_inv", "ft_action", "ft_force",
    "apply_flow_to_prior", "FieldTransformation", "leapfrog", "hmc_step",
    "run_hmc", "run_fthmc", "fthmc_step", "calc_dkl", "calc_ess", "bootstrap",
    "uniform_link_prior", "normal_prior", "make_mcmc_ensemble",
    "generate_ensemble", "count_parameters", "TrajMetrics",
    "FlowSpec", "HMCConfig", "LeapfrogConfig", "SchedulerConfig",
    "TrainConfig",
]
