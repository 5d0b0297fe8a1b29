"""The full gauge-equivariant flow: a stack of coupling layers.

Re-design of reference make_u1_equiv_layers / ft_flow / ft_flow_inv /
apply_flow_to_prior (fthmc/utils/layers.py:399-429, qed_helpers.py:191-209,
samplers.py:40-56) as a pure pytree-of-params + apply functions.

Flow params are a list (one entry per coupling layer) of conv-net param
lists; they contain NO lattice-size information, so "volume transfer"
(reference train.py:434-455, main.py:159-227) is simply applying the same
params to a bigger field - masks are rebuilt from the input shape at trace
time.

Per-layer `jax.checkpoint` (remat) keeps the FT-HMC force (grad through all
n_layers couplings per leapfrog step) at O(1-layer) activation memory.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from fthmc_tpu.config import FlowSpec
from fthmc_tpu.models.coupling import (link_coupling_forward,
                                       link_coupling_reverse)
from fthmc_tpu.models.masks import layer_mask_params
from fthmc_tpu.ops.conv import init_conv_net

__all__ = ["init_flow_params", "flow_forward", "flow_reverse",
           "count_parameters"]

PI = math.pi


def flow_out_channels(spec: FlowSpec) -> int:
    """Conditioner-CNN output channels for the configured coupling family:
    n_mixture + 1 for NCP (s_1..s_M and t, reference layers.py:399-429),
    3*n_knots + 1 for the circular spline (models/spline.py)."""
    if spec.coupling == "spline":
        from fthmc_tpu.models.spline import spline_out_channels
        return spline_out_channels(spec.n_knots)
    if spec.coupling == "rncp":
        return 2 * spec.n_mixture + 1   # s_i, r_i, t
    return spec.n_mixture + 1


def init_flow_params(key: jax.Array, spec: FlowSpec, dtype=jnp.float32):
    """Initialize params for a `spec.n_layers`-deep flow.

    in_channels=2 (cos, sin of frozen plaqs); out channels per
    flow_out_channels. (reference layers.py:399-429 + set_weights :170-174)
    """
    keys = jax.random.split(key, spec.n_layers)
    return [
        init_conv_net(
            k,
            in_channels=2,
            hidden_sizes=spec.hidden_sizes,
            out_channels=flow_out_channels(spec),
            kernel_size=spec.kernel_size,
            init=spec.init,
            dtype=dtype,
        )
        for k in keys
    ]


def flow_forward(params, x: jnp.ndarray, spec: FlowSpec, remat: bool = True):
    """Apply the whole flow forward: x (B,2,L,L) -> (y, logdet (B,)).

    logdet accumulates sum_l log|J_l| of the forward map. The layer loop is a
    Python loop over a STATIC layer count - each layer has distinct masks
    (static constants), so this unrolls into one fused XLA program.
    """
    logdet = jnp.zeros(x.shape[0], x.dtype)

    def one_layer(i):
        mu, off = layer_mask_params(i)
        f = lambda p, h: link_coupling_forward(p, h, mu, off, spec)
        return jax.checkpoint(f) if remat else f

    for i, p in enumerate(params):
        x, logJ = one_layer(i)(p, x)
        logdet = logdet + logJ
    return x, logdet


def flow_reverse(params, y: jnp.ndarray, spec: FlowSpec,
                 tol: float = 1e-6, max_iter: int = 1000):
    """Apply the whole flow in reverse (bisection inverses, non-differentiable):
    y (B,2,L,L) -> (x, logdet_rev (B,)). logdet_rev = -logdet_fwd(x)."""
    logdet = jnp.zeros(y.shape[0], y.dtype)
    for i in reversed(range(len(params))):
        mu, off = layer_mask_params(i)
        y, logJ = link_coupling_reverse(
            params[i], y, mu, off, spec, tol=tol, max_iter=max_iter)
        logdet = logdet + logJ
    return y, logdet


def count_parameters(params) -> int:
    """Total trainable parameter count (reference config.py:98-99)."""
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
