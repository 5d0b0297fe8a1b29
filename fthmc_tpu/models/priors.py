"""Prior distributions over link fields.

Reference: fthmc/utils/distributions.py:40-77 (BasePrior, MultivariateUniform,
SimpleNormal). Functional: a prior is a NamedTuple of (sample, log_prob)
closures over static shape info, safe to close over inside jit.
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

PI = math.pi
TWO_PI = 2.0 * math.pi


class Prior(NamedTuple):
    sample_n: Callable  # (key, batch) -> (batch, *event_shape)
    log_prob: Callable  # (x) -> (batch,)
    event_shape: tuple


def uniform_link_prior(L: int, dtype=jnp.float32) -> Prior:
    """Uniform(-pi, pi) on every link angle of a (2, L, L) field.

    log q(x) = -2 L^2 log(2pi), a constant (reference MultivariateUniform with
    a=-pi, b=pi, train.py:64-65).
    """
    event_shape = (2, L, L)
    n = 2 * L * L
    logp_const = -n * math.log(TWO_PI)

    def sample_n(key, batch):
        return jax.random.uniform(
            key, (batch, *event_shape), dtype, -PI, PI)

    def log_prob(x):
        return jnp.full(x.shape[0], logp_const, dtype=x.dtype)

    return Prior(sample_n, log_prob, event_shape)


def normal_prior(event_shape: tuple, dtype=jnp.float32) -> Prior:
    """Standard normal prior over an arbitrary event shape (reference
    SimpleNormal, distributions.py:51-62)."""
    n = 1
    for s in event_shape:
        n *= s
    const = -0.5 * n * math.log(2.0 * math.pi)

    def sample_n(key, batch):
        return jax.random.normal(key, (batch, *event_shape), dtype)

    def log_prob(x):
        return const - 0.5 * jnp.sum(
            x.reshape(x.shape[0], -1) ** 2, axis=-1)

    return Prior(sample_n, log_prob, event_shape)
