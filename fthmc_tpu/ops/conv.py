"""Circular-padded 2D convolution for the coupling-layer CNNs.

XLA has no native circular padding mode, so we wrap-pad explicitly with
jnp.pad(mode='wrap') and run a VALID convolution; under jit the pad fuses
into the conv's input gather. Equivalent to the reference's
nn.Conv2d(padding_mode='circular') chain (fthmc/utils/layers.py:138-167).

Data layout is NCHW / OIHW, which XLA relayouts for the MXU as needed; the
channel counts here (2 -> hidden -> n_mix+1) are small, so these convs run on
the VPU/MXU with the spatial plane as the vectorized axis.
"""
from __future__ import annotations

from functools import lru_cache as _functools_lru_cache

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["circular_conv2d", "circular_conv2d_dense", "conv_net_apply",
           "init_conv_net", "ACTIVATIONS"]


def circular_conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                    accum_dtype=None) -> jnp.ndarray:
    """Periodic 2D conv. x: (B, Cin, H, W), w: (Cout, Cin, k, k), b: (Cout,).

    accum_dtype sets the conv accumulation/output type (pass float32 when
    feeding bf16 operands). Implementation note: a roll+einsum (im2col)
    formulation looks faster in isolated microbenchmarks but is ~40% SLOWER
    inside the fused FT-HMC program (the 9-way stacked tensor defeats XLA's
    fusion); wrap-pad + VALID conv is the measured winner end-to-end.
    """
    k = w.shape[-1]
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p)), mode="wrap")
    y = lax.conv_general_dilated(
        xp, w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=accum_dtype or x.dtype,
    )
    return y + b[None, :, None, None].astype(y.dtype)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "tanh": jnp.tanh,
}


@_functools_lru_cache(maxsize=None)
def _circulant_index(L: int, k: int):
    """Static neighbor table for the dense-circulant expansion: for each
    kernel tap (dy, dx), the flat site index q(p) = ((i+dy)%L)*L + (j+dx)%L.
    Returns numpy arrays (taps, L*L)."""
    import numpy as np
    r = k // 2
    p = np.arange(L * L)
    i, j = p // L, p % L
    qs = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            qs.append(((i + dy) % L) * L + ((j + dx) % L))
    return np.stack(qs), p


def dense_circulant(w: jnp.ndarray, L: int) -> jnp.ndarray:
    """Expand a (Cout, Cin, k, k) periodic-conv kernel into the equivalent
    dense matrix (Cin*L*L, Cout*L*L) so the conv becomes ONE matmul.

    Measured note: as a flow-CNN replacement this LOST 3x end-to-end at 8^2
    (XLA re-materializes the expansion inside the leapfrog scan rather than
    hoisting it, and the 64x FLOP overhead dominates); kept as a validated
    utility for contexts where the dense operator can be precomputed once.
    """
    O, C, k, _ = w.shape
    qs, p = _circulant_index(L, k)
    D = jnp.zeros((C, L * L, O, L * L), w.dtype)
    t = 0
    for dy in range(k):
        for dx in range(k):
            # y[b,o,p] += w[o,c,dy,dx] * x[b,c,q(p)]
            # (separated advanced indices move their joint axis to the
            # front: value shape is (L*L, C, O))
            D = D.at[:, qs[t], :, p].add(
                jnp.broadcast_to(w[:, :, dy, dx].T[None, :, :],
                                 (L * L, C, O)))
            t += 1
    return D.reshape(C * L * L, O * L * L)


def circular_conv2d_dense(x: jnp.ndarray, w: jnp.ndarray,
                          b: jnp.ndarray) -> jnp.ndarray:
    """Periodic conv via the dense-circulant matmul. x: (B, Cin, L, L)."""
    B, C, L, _ = x.shape
    O = w.shape[0]
    D = dense_circulant(w, L)
    y = jnp.dot(x.reshape(B, C * L * L), D,
                preferred_element_type=x.dtype)
    return y.reshape(B, O, L, L) + b[None, :, None, None]


def init_conv_net(
    key: jax.Array,
    in_channels: int,
    hidden_sizes: tuple[int, ...],
    out_channels: int,
    kernel_size: int,
    init: str = "reference",
    dtype=jnp.float32,
) -> list[dict]:
    """Initialize a conv-chain's params: list of {'w','b'} pytrees.

    init='reference' reproduces what the reference EFFECTIVELY runs: torch's
    default Conv2d init, i.e. weights and bias ~ U(-1/sqrt(fan_in),
    +1/sqrt(fan_in)). (The reference's intended custom init, set_weights with
    N(1,2) weights at layers.py:170-174, is dead code: train.py:72 calls
    `set_weights(layers)` on the nn.ModuleList itself -- which has no .weight
    attribute -- instead of `layers.apply(set_weights)`, so it is a silent
    no-op. Applying it for real makes |s| ~ 1e4 and the flow NaNs immediately,
    verified against the reference in torch.)

    init='set_weights_bug' applies the N(1,2)/-1 init literally, kept only to
    document the quirk. init='normal' is fan-in-scaled normal.
    """
    sizes = (in_channels, *hidden_sizes, out_channels)
    params = []
    for i in range(len(sizes) - 1):
        key, wk, bk = jax.random.split(key, 3)
        shape = (sizes[i + 1], sizes[i], kernel_size, kernel_size)
        fan_in = sizes[i] * kernel_size * kernel_size
        bound = 1.0 / (fan_in ** 0.5)
        if init == "reference":
            w = jax.random.uniform(wk, shape, dtype, -bound, bound)
            b = jax.random.uniform(bk, (sizes[i + 1],), dtype, -bound, bound)
        elif init == "set_weights_bug":
            w = 1.0 + 2.0 * jax.random.normal(wk, shape, dtype)
            b = -jnp.ones((sizes[i + 1],), dtype)
        else:  # 'normal'
            w = jax.random.normal(wk, shape, dtype) * bound
            b = jnp.zeros((sizes[i + 1],), dtype)
        params.append({"w": w, "b": b})
    return params


def conv_net_apply(params: list[dict], x: jnp.ndarray, activation: str,
                   compute_dtype=None) -> jnp.ndarray:
    """Apply the conv chain with `activation` between layers (none after the
    last, matching reference use_final_tanh=False, layers.py:161-166).

    With compute_dtype=bfloat16, inputs/weights are cast to bf16 per conv
    (MXU-native) while the conv accumulates and returns fp32.
    """
    act = ACTIVATIONS[activation]
    out_dtype = x.dtype
    n = len(params)
    for i, p in enumerate(params):
        if compute_dtype is not None and compute_dtype != out_dtype:
            # fully-bf16 conv (the MXU accumulates wide internally); cast
            # back up afterwards - mixed-dtype operands would break the
            # conv transpose (VJP) rule
            x = circular_conv2d(x.astype(compute_dtype),
                                p["w"].astype(compute_dtype),
                                p["b"].astype(compute_dtype)
                                ).astype(out_dtype)
        else:
            x = circular_conv2d(x, p["w"], p["b"])
        if i != n - 1:
            x = act(x)
    return x
