"""Fused Pallas kernel for one gauge-equivariant NCP coupling layer.

The FT-HMC hot loop applies n_layers coupling layers per leapfrog force
evaluation; under XLA each layer materializes ~8 HBM intermediates (plaq,
cos/sin stack, three conv activations, s/t, transform, link update). This
kernel keeps the WHOLE layer resident in VMEM: HBM sees one read of the
link block and one write of (links', logJ) per layer.

Layout: chains-last (2, L, L, TB) with the chain block TB=128 riding the
lane axis - the conv taps and the plaquette stencil are then sublane rolls
(cheap), and every elementwise op runs at full lane occupancy regardless of
L. The conv is computed as 9 tap-rolls + unrolled scalar-weight FMAs over
the channel pairs (VPU formulation; the channel counts 2..64 are too small
for useful MXU tiles at this layout - see ROADMAP round-1 ceiling
analysis).

Scope: FORWARD only (flow application / sampling / the y = f(z) legs of
FT-HMC). The force backward stays on XLA autodiff for now; wiring a
custom_vjp with a mirrored backward kernel is the follow-up if the forward
wins end-to-end.

Cites: reference layer semantics fthmc/utils/layers.py:188-210 (link lift),
:324-371 (NCP transform), :138-167 (circular conv chain).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fthmc_tpu.config import FlowSpec
from fthmc_tpu.models.masks import (layer_mask_params, link_active_stripes,
                                    plaq_masks)

__all__ = ["pallas_flow_forward", "pallas_link_coupling_forward"]

PI = math.pi
TWO_PI = 2.0 * math.pi


def _roll(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _atan(u):
    """Elementwise arctan via two half-angle reductions + odd Taylor/Horner.

    Mosaic has no atan/atan2 lowering (NotImplementedError on real TPU -
    found in round 2; interpret mode silently accepted arctan2), so the
    kernels compute it explicitly. Two reductions map |u| <= 1 onto
    [0, 0.199], where the degree-13 odd polynomial truncation error is
    ~2.6e-11 - exact at fp32 and ~1e-11 at fp64 (validated in
    tests/test_pallas_vjp.py). |u| > 1 folds via atan(u) = pi/2 - atan(1/u);
    u = +-inf is handled (1/inf = 0 -> +-pi/2)."""
    au = jnp.abs(u)
    inv = au > 1.0
    v = jnp.where(inv, 1.0 / au, au)
    v = v / (1.0 + jnp.sqrt(1.0 + v * v))       # [0, 1]    -> [0, 0.4142]
    v = v / (1.0 + jnp.sqrt(1.0 + v * v))       # -> [0, 0.1989]
    t = v * v
    poly = v * (1.0 + t * (-1.0 / 3.0 + t * (0.2 + t * (-1.0 / 7.0
               + t * (1.0 / 9.0 + t * (-1.0 / 11.0 + t * (1.0 / 13.0)))))))
    a = 4.0 * poly                               # undo the two reductions
    a = jnp.where(inv, 0.5 * PI - a, a)
    return jnp.sign(u) * a


def tan_transform_delta(y, e):
    """delta(y) = h_s(y) - y for the NCP tan transform h_s = 2 atan(e^s
    tan(y/2)), atan2-free: tan(delta/2) = (e-1) sin(y/2)cos(y/2) /
    (cos^2(y/2) + e sin^2(y/2)), whose denominator is > 0 for all y and
    e = e^s > 0 (no division-by-zero edge cases, no quadrant logic: both
    h_s(y) and y lie in (-pi, pi] with the same sign, so |delta| < pi).
    Returns delta; callers form h = y + delta (== the wrapped 2*atan2
    value exactly)."""
    cy, sy = jnp.cos(0.5 * y), jnp.sin(0.5 * y)
    num = (e - 1.0) * sy * cy
    den = cy * cy + e * (sy * sy)
    return 2.0 * _atan(num / den)


def _roll2(a, s0, s1):
    """Circular shift of (L, L, TB) on the two lattice axes."""
    if s0:
        a = _roll(a, s0, 0)
    if s1:
        a = _roll(a, s1, 1)
    return a


def _conv_chain(h, weights, activation):
    """Circular 3x3 conv chain on channels-leading (Cin, L, L, TB) VMEM
    arrays. weights: list of (w (Cout,Cin,3,3) numpy-like, b (Cout,)) jnp
    arrays read from refs. Unrolled scalar-weight FMAs; the 9 tap-rolls are
    shared across all channel pairs of a layer."""
    act = {
        "relu": jax.nn.relu,
        "silu": jax.nn.silu,
        "swish": jax.nn.silu,
        "leaky_relu": lambda v: jax.nn.leaky_relu(v, negative_slope=0.01),
        "tanh": jnp.tanh,
    }[activation]
    n = len(weights)
    for li, (w, b) in enumerate(weights):
        cout, cin, _, _ = w.shape
        # 9 shared tap shifts of the full input stack
        taps = {}
        for dy in range(3):
            for dx in range(3):
                taps[(dy, dx)] = [
                    _roll2(h[c], 1 - dy, 1 - dx) for c in range(cin)]
        outs = []
        for o in range(cout):
            acc = jnp.full(h[0].shape, 0.0, h[0].dtype) + b[o]
            for dy in range(3):
                for dx in range(3):
                    sh = taps[(dy, dx)]
                    for c in range(cin):
                        acc = acc + w[o, c, dy, dx] * sh[c]
            outs.append(acc)
        if li != n - 1:
            outs = [act(v) for v in outs]
        h = outs
    return h


def _ncp_kernel(x_ref, masks_ref, *wb_and_out, spec: FlowSpec,
                n_convs: int):
    """One coupling layer. x_ref: (2, L, L, TB) links block; masks_ref:
    (5, L, L) [frozen, active, passive, active_link_mu0, active_link_mu1].
    wb_and_out: 2*n_convs weight/bias refs, then (fx_ref, logj_ref)."""
    w_refs = wb_and_out[:2 * n_convs]
    fx_ref, logj_ref = wb_and_out[2 * n_convs], wb_and_out[2 * n_convs + 1]
    mk = masks_ref[:]
    frozen, active, passive = mk[0][:, :, None], mk[1][:, :, None], mk[2][:, :, None]
    active_l0, active_l1 = mk[3][:, :, None], mk[4][:, :, None]

    x = x_ref[:]
    x0, x1 = x[0], x[1]
    plaq = x0 + _roll(x1, -1, 0) - _roll(x0, -1, 1) - x1   # (L, L, TB)

    x2 = frozen * plaq
    h = [jnp.cos(x2), jnp.sin(x2)]
    weights = [(w_refs[2 * i][:], w_refs[2 * i + 1][:])
               for i in range(n_convs)]
    out = _conv_chain(h, weights, spec.activation)

    M = spec.n_mixture
    t = out[-1]
    if spec.coupling == "rncp":
        s_list, r_list = out[:M], out[M:2 * M]
    else:
        s_list, r_list = out[:M], None
    if spec.s_clip is not None:
        c = spec.s_clip
        s_list = [c * jnp.tanh(s / c) for s in s_list]

    xa = active * plaq
    # mixture NCP transform + logJ, component-unrolled
    hsum = jnp.zeros_like(xa)
    # logsumexp over components, streaming max-free (M small: do exact)
    ljs = []
    for i in range(M):
        s = s_list[i]
        if r_list is not None:
            y = xa - r_list[i]
            y = jnp.remainder(y + PI, TWO_PI) - PI
        else:
            y = xa
        sc = jnp.clip(s, -30.0, 30.0)
        dlt = tan_transform_delta(y, jnp.exp(sc))
        if r_list is not None:
            hsum = hsum + dlt
        else:
            hsum = hsum + (y + dlt)
        cy, sy = jnp.cos(0.5 * y), jnp.sin(0.5 * y)
        m_abs = jnp.abs(s)
        inner = (jnp.exp(-s - m_abs) * cy * cy
                 + jnp.exp(s - m_abs) * sy * sy)
        ljs.append(-(m_abs + jnp.log(inner + 1e-30)))
    inv_m = 1.0 / M
    if r_list is not None:
        fx1 = xa + inv_m * hsum
    else:
        fx1 = inv_m * hsum
    mx = ljs[0]
    for i in range(1, M):
        mx = jnp.maximum(mx, ljs[i])
    se = jnp.zeros_like(mx)
    for i in range(M):
        se = se + jnp.exp(ljs[i] - mx)
    local_logj = active * (mx + jnp.log(se) - jnp.log(float(M)))
    # sublane-merging reshape: the sum(sum(keepdims)) form trips a Mosaic
    # relayout bug on real TPU (see pallas_coupling_vjp._fwd_res_kernel)
    logj = jnp.sum(local_logj.reshape(-1, local_logj.shape[-1]), axis=0,
                   keepdims=True)

    new_plaq = (active * (jnp.remainder(fx1 + t + PI, TWO_PI) - PI)
                + (passive + frozen) * plaq)
    delta = new_plaq - plaq
    fx0 = active_l0 * (jnp.remainder(delta + x0 + PI, TWO_PI) - PI) \
        + (1.0 - active_l0) * x0
    fx1_l = active_l1 * (jnp.remainder(-delta + x1 + PI, TWO_PI) - PI) \
        + (1.0 - active_l1) * x1
    fx_ref[0] = fx0
    fx_ref[1] = fx1_l
    logj_ref[:] = logj  # (1, TB)


@functools.partial(jax.jit,
                   static_argnames=("mu", "off", "spec", "interpret"))
def pallas_link_coupling_forward(net_params, x_cl: jnp.ndarray, mu: int,
                                 off: int, spec: FlowSpec,
                                 interpret: bool = False):
    """One fused coupling layer on chains-last links x_cl: (2, L, L, B).
    Returns (fx_cl, logJ (B,)). B must be a multiple of 128 (lane width)."""
    two, L, _, B = x_cl.shape
    assert two == 2
    TB = min(128, B)
    assert B % TB == 0, (B, TB)
    lat = (L, L)
    import numpy as _np
    masks = _np.stack(plaq_masks(lat, mu, off) + (
        link_active_stripes((2,) + lat, mu, off)[0],
        link_active_stripes((2,) + lat, mu, off)[1],
    )).astype(_np.float32)
    n_convs = len(net_params)
    grid = (B // TB,)
    xspec = pl.BlockSpec((2, L, L, TB), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((5, L, L), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    wspecs = []
    w_args = []
    for p in net_params:
        w, b = p["w"], p["b"]
        wspecs.append(pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                   memory_space=pltpu.VMEM))
        wspecs.append(pl.BlockSpec(b.shape, lambda i: (0,) * b.ndim,
                                   memory_space=pltpu.VMEM))
        w_args.extend([w, b])
    ljspec = pl.BlockSpec((1, TB), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    fx, logj = pl.pallas_call(
        functools.partial(_ncp_kernel, spec=spec, n_convs=n_convs),
        out_shape=(jax.ShapeDtypeStruct(x_cl.shape, x_cl.dtype),
                   jax.ShapeDtypeStruct((1, B), x_cl.dtype)),
        grid=grid,
        in_specs=[xspec, mspec] + wspecs,
        out_specs=(xspec, ljspec),
        interpret=interpret,
    )(x_cl, jnp.asarray(masks), *w_args)
    return fx, logj[0]


def pallas_flow_forward(params, x: jnp.ndarray, spec: FlowSpec,
                        interpret: bool = False):
    """Whole-flow forward via the fused per-layer kernels. x: (B, 2, L, L)
    (framework-standard); transposes to chains-last ONCE at entry/exit.
    Returns (y, logdet (B,)) - drop-in for models.flow.flow_forward
    (forward only; not differentiable)."""
    B = x.shape[0]
    xc = jnp.transpose(x, (1, 2, 3, 0))
    logdet = jnp.zeros((B,), x.dtype)
    for i, p in enumerate(params):
        mu, off = layer_mask_params(i)
        xc, lj = pallas_link_coupling_forward(p, xc, mu, off, spec,
                                              interpret=interpret)
        logdet = logdet + lj
    return jnp.transpose(xc, (3, 0, 1, 2)), logdet
