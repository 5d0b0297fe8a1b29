"""Fused Pallas forward+backward (VJP) for the gauge-equivariant coupling
layer: the FT-HMC force hot loop.

The FT-HMC force is dS_eff/dz with S_eff(z) = S(f(z)) - log|det df/dz|
(reference ft_hmc.py:162-171); under XLA autodiff every coupling layer
materializes ~15 HBM intermediates in each direction. This module runs the
whole layer VJP as two VMEM-resident kernels per layer:

  forward kernel:  x -> (f(x), logJ, residuals)
  backward kernel: (x, residuals, g_y, g_logJ) -> g_x

The force only needs d/dz - NOT d/dparams - so the backward is a pure
input-cotangent kernel (half the work of a full VJP) and the residuals are
chosen so the backward does ZERO conv recompute: we store the conv chain's
hidden pre-activations plus the raw conditioner outputs (s_raw, r, t). The
conv is where the FLOPs are (9 k^2-taps x Cin x Cout FMAs/site); everything
else is elementwise.

Layout: chains-last (2, L, L, TB), TB <= 128 chains on the lane axis (same
as ops/pallas_coupling.py) - lattice rolls ride the sublane axes and every
op runs at full lane occupancy.

Gating: `vjp_kernel_fits(spec, L, B)` estimates the VMEM working set; the
force dispatcher falls back to XLA autodiff when the estimate exceeds the
budget (large hidden widths / large L) or the coupling family is not
ncp/rncp.

Math parity targets (validated in tests/test_pallas_vjp.py against
jax.vjp of the XLA modules):
  - models/coupling.py link_coupling_forward / rncp_plaq_coupling_forward
  - tan_transform's hard +-30 value clip (zero gradient outside)
  - tan_transform_logJ's stop_gradient(|s|) factoring and +1e-30 floor
  - FlowSpec.s_clip smooth cap s -> c*tanh(s/c)
Cites: reference fthmc/utils/layers.py:188-210 (link lift), :324-371 (NCP),
:66-90 (tan transforms); force loop ipynb/ft_hmc.py:394-418.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fthmc_tpu.config import FlowSpec
from fthmc_tpu.models.masks import (layer_mask_params, link_active_stripes,
                                    plaq_masks)
from fthmc_tpu.ops.pallas_coupling import tan_transform_delta

__all__ = ["pallas_link_coupling_fwd_res", "pallas_link_coupling_bwd",
           "ft_force_pallas", "vjp_kernel_fits"]

PI = math.pi
TWO_PI = 2.0 * math.pi
_HARD_CLIP = 30.0   # models/coupling.py _S_CLIP: value-path hard clip on s
_TINY = 1e-30       # models/coupling.py _TINY: logJ log floor


def _roll(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _roll2(a, s0, s1):
    """Circular shift of (L, L, TB) on the two lattice axes."""
    if s0:
        a = _roll(a, s0, 0)
    if s1:
        a = _roll(a, s1, 1)
    return a


_ACT = {
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "leaky_relu": lambda v: jax.nn.leaky_relu(v, negative_slope=0.01),
    "tanh": jnp.tanh,
}


def _act_grad(name, pre):
    """d act/d pre, recomputed from the stored pre-activation."""
    if name == "relu":
        return (pre > 0).astype(pre.dtype)
    if name in ("silu", "swish"):
        sg = jax.nn.sigmoid(pre)
        return sg * (1.0 + pre * (1.0 - sg))
    if name == "leaky_relu":
        return jnp.where(pre > 0, 1.0, 0.01).astype(pre.dtype)
    if name == "tanh":
        t = jnp.tanh(pre)
        return 1.0 - t * t
    raise ValueError(name)


def _masks_stack(L: int, mu: int, off: int) -> np.ndarray:
    """(5, L, L): frozen, active, passive, active_link_mu0, active_link_mu1."""
    lat = (L, L)
    return np.stack(plaq_masks(lat, mu, off) + (
        link_active_stripes((2,) + lat, mu, off)[0],
        link_active_stripes((2,) + lat, mu, off)[1],
    )).astype(np.float32)


def _out_channels(spec: FlowSpec) -> int:
    M = spec.n_mixture
    return (2 * M + 1) if spec.coupling == "rncp" else (M + 1)


def _split_sraw_r_t(out, spec: FlowSpec):
    """out: list of channel arrays from the last conv -> (s_raw list, r list
    or None, t)."""
    M = spec.n_mixture
    if spec.coupling == "rncp":
        return out[:M], out[M:2 * M], out[2 * M]
    return out[:M], None, out[M]


def _conv_chain_into(h2, w_vals, activation, pre_refs, out_list_sink):
    """Streaming circular 3x3 conv chain. h2: list of 2 input channel arrays
    (cos, sin). w_vals: list of (w (Cout,Cin,3,3), b (Cout,)) jnp values.
    Hidden pre-activations are written into pre_refs[l][c]; the final conv's
    channel arrays are appended to out_list_sink (and the caller writes them
    to the out_raw ref). Live working set: Cout accumulators + 2 transients.
    """
    act = _ACT[activation]
    n = len(w_vals)
    read = lambda c: h2[c]
    cin = 2
    for li, (w, b) in enumerate(w_vals):
        cout = w.shape[0]
        accs = [None] * cout
        for c in range(cin):
            hc = read(c)
            if li > 0:
                hc = act(hc)
            for dy in range(3):
                for dx in range(3):
                    sh = _roll2(hc, 1 - dy, 1 - dx)
                    for o in range(cout):
                        t = w[o, c, dy, dx] * sh
                        accs[o] = t if accs[o] is None else accs[o] + t
        accs = [a + b[o] for o, a in enumerate(accs)]
        if li != n - 1:
            ref = pre_refs[li]
            for o in range(cout):
                ref[o] = accs[o]
            read = (lambda ref_: lambda c: ref_[c])(ref)
            cin = cout
        else:
            out_list_sink.extend(accs)


def _transform_pieces(y, s):
    """Shared per-component quantities of the tan transform at (y, s):
    returns (delta = h_s(y) - y, lj, dh_dy, dh_ds, dlj_dy, dlj_ds). s is
    the post-s_clip log-scale; the value path additionally hard-clips at
    +-30 with zero gradient outside (models/coupling.py:54-72). delta is
    atan2-free (Mosaic has no atan2 lowering; see pallas_coupling._atan)."""
    sc = jnp.clip(s, -_HARD_CLIP, _HARD_CLIP)
    gate = (jnp.abs(s) < _HARD_CLIP).astype(s.dtype)
    cy, sy = jnp.cos(0.5 * y), jnp.sin(0.5 * y)
    e = jnp.exp(sc)
    delta = tan_transform_delta(y, e)
    denom = cy * cy + (e * e) * (sy * sy)
    dh_dy = e / denom
    dh_ds = (2.0 * sy * cy) * dh_dy * gate
    # logJ path: factored form with m = stopgrad(|s|) (coupling.py:64-72)
    m = jnp.abs(s)
    ep, en = jnp.exp(s - m), jnp.exp(-s - m)
    inner = en * cy * cy + ep * sy * sy
    lj = -(m + jnp.log(inner + _TINY))
    inv_inner = 1.0 / (inner + _TINY)
    dlj_dy = -(sy * cy) * (ep - en) * inv_inner
    dlj_ds = (en * cy * cy - ep * sy * sy) * inv_inner
    return delta, lj, dh_dy, dh_ds, dlj_dy, dlj_ds


def _fwd_res_kernel(x_ref, masks_ref, *rest, spec: FlowSpec, n_convs: int):
    """Forward coupling layer with residual outputs.
    rest = 2*n_convs weight/bias refs, then outputs:
    (fx_ref, logj_ref, pre_ref_1..pre_ref_{n_convs-1}, out_raw_ref)."""
    w_refs = rest[:2 * n_convs]
    outs = rest[2 * n_convs:]
    fx_ref, logj_ref = outs[0], outs[1]
    pre_refs = outs[2:2 + (n_convs - 1)]
    out_raw_ref = outs[2 + (n_convs - 1)]

    mk = masks_ref[:]
    frozen = mk[0][:, :, None]
    active = mk[1][:, :, None]
    passive = mk[2][:, :, None]
    a0, a1 = mk[3][:, :, None], mk[4][:, :, None]

    x = x_ref[:]
    x0, x1 = x[0], x[1]
    p = x0 + _roll(x1, -1, 0) - _roll(x0, -1, 1) - x1

    x2 = frozen * p
    w_vals = [(w_refs[2 * i][:], w_refs[2 * i + 1][:])
              for i in range(n_convs)]
    out = []
    _conv_chain_into([jnp.cos(x2), jnp.sin(x2)], w_vals, spec.activation,
                     pre_refs, out)
    for c, v in enumerate(out):
        out_raw_ref[c] = v

    s_raw, r_list, t = _split_sraw_r_t(out, spec)
    if spec.s_clip is not None:
        c_ = spec.s_clip
        s_list = [c_ * jnp.tanh(s / c_) for s in s_raw]
    else:
        s_list = s_raw

    M = spec.n_mixture
    xa = active * p
    hsum = jnp.zeros_like(xa)
    ljs = []
    for i in range(M):
        if r_list is not None:
            y = jnp.remainder(xa - r_list[i] + PI, TWO_PI) - PI
        else:
            y = xa
        dlt, lj, *_ = _transform_pieces(y, s_list[i])
        hsum = hsum + (dlt if r_list is not None else y + dlt)
        ljs.append(lj)
    inv_m = 1.0 / M
    fx1 = xa + inv_m * hsum if r_list is not None else inv_m * hsum

    mx = ljs[0]
    for i in range(1, M):
        mx = jnp.maximum(mx, ljs[i])
    se = jnp.zeros_like(mx)
    for i in range(M):
        se = se + jnp.exp(ljs[i] - mx)
    local_logj = active * (mx + jnp.log(se) - jnp.log(float(M)))
    # (L, L, TB) -> (1, TB): the nested sum-sum-keepdims form trips a Mosaic
    # relayout bug ("Non-singleton logical dimension is replicated"); the
    # sublane-merging reshape compiles fine (micro-tested on v5e).
    flat = local_logj.reshape(-1, local_logj.shape[-1])
    logj_ref[:] = jnp.sum(flat, axis=0, keepdims=True)

    new_plaq = (active * (jnp.remainder(fx1 + t + PI, TWO_PI) - PI)
                + (passive + frozen) * p)
    delta = new_plaq - p
    fx_ref[0] = a0 * (jnp.remainder(delta + x0 + PI, TWO_PI) - PI) \
        + (1.0 - a0) * x0
    fx_ref[1] = a1 * (jnp.remainder(-delta + x1 + PI, TWO_PI) - PI) \
        + (1.0 - a1) * x1


def _bwd_kernel(x_ref, masks_ref, gy_ref, gl_ref, *rest, spec: FlowSpec,
                n_convs: int):
    """Backward (input-cotangent only): g_x given (g_y, g_logJ) and the
    forward residuals. rest = 2*n_convs weight refs, n_convs-1 pre refs,
    out_raw ref, then the single output gx_ref."""
    w_refs = rest[:2 * n_convs]
    pre_refs = rest[2 * n_convs:2 * n_convs + n_convs - 1]
    out_raw_ref = rest[2 * n_convs + n_convs - 1]
    gx_ref = rest[2 * n_convs + n_convs]

    mk = masks_ref[:]
    frozen = mk[0][:, :, None]
    active = mk[1][:, :, None]
    a0, a1 = mk[3][:, :, None], mk[4][:, :, None]

    x = x_ref[:]
    x0, x1 = x[0], x[1]
    p = x0 + _roll(x1, -1, 0) - _roll(x0, -1, 1) - x1
    xa = active * p

    gy = gy_ref[:]
    gy0, gy1 = gy[0], gy[1]
    gl = gl_ref[:]          # (1, TB): broadcasts over (L, L, TB)

    M = spec.n_mixture
    n_out = _out_channels(spec)
    out = [out_raw_ref[c] for c in range(n_out)]
    s_raw, r_list, _t = _split_sraw_r_t(out, spec)
    if spec.s_clip is not None:
        c_ = spec.s_clip
        s_list = [c_ * jnp.tanh(s / c_) for s in s_raw]
    else:
        s_list = s_raw

    # --- link lift backward (coupling.py _apply_delta_links) ---
    g_delta = a0 * gy0 - a1 * gy1
    g_f = active * g_delta          # cotangent on wrap(fx1 + t)
    g_p = -active * g_delta
    g_t = g_f

    # --- per-component transform pieces (recomputed: elementwise only) ---
    ys, pieces = [], []
    for i in range(M):
        if r_list is not None:
            y = jnp.remainder(xa - r_list[i] + PI, TWO_PI) - PI
        else:
            y = xa
        ys.append(y)
        pieces.append(_transform_pieces(y, s_list[i]))

    # softmax weights of the logsumexp over components
    mx = pieces[0][1]
    for i in range(1, M):
        mx = jnp.maximum(mx, pieces[i][1])
    exps = [jnp.exp(pc[1] - mx) for pc in pieces]
    se = exps[0]
    for i in range(1, M):
        se = se + exps[i]
    inv_se = 1.0 / se
    gl_act = gl[None, :, :] * active   # (L, L, TB) via (1,TB) broadcast

    inv_m = 1.0 / M
    g_xa = g_f if r_list is not None else jnp.zeros_like(g_f)
    g_out = [None] * n_out
    for i in range(M):
        _hy, _lj, dh_dy, dh_ds, dlj_dy, dlj_ds = pieces[i]
        g_hy = g_f * inv_m
        g_lj = gl_act * (exps[i] * inv_se)
        g_y = g_hy * dh_dy + g_lj * dlj_dy
        if r_list is not None:
            g_y = g_y - g_f * inv_m     # hsum accumulates (hy - y)
        g_s = g_hy * dh_ds + g_lj * dlj_ds
        g_xa = g_xa + g_y
        if r_list is not None:
            g_out[M + i] = -g_y         # r_i channel
        if spec.s_clip is not None:
            u = s_list[i] / spec.s_clip
            g_s = g_s * (1.0 - u * u)   # d/ds [c*tanh(s/c)]
        g_out[i] = g_s
    g_out[n_out - 1] = g_t

    # --- conv chain transpose (no recompute: gates from stored pre-acts) ---
    g_cur = g_out                       # cotangent on the last conv's output
    for li in range(n_convs - 1, -1, -1):
        w = w_refs[2 * li][:]
        cout, cin = w.shape[0], w.shape[1]
        accs = [None] * cin
        for o in range(cout):
            go = g_cur[o]
            for dy in range(3):
                for dx in range(3):
                    sh = _roll2(go, dy - 1, dx - 1)
                    for c in range(cin):
                        t2 = w[o, c, dy, dx] * sh
                        accs[c] = t2 if accs[c] is None else accs[c] + t2
        if li > 0:
            pre = pre_refs[li - 1]
            g_cur = [accs[c] * _act_grad(spec.activation, pre[c])
                     for c in range(cin)]
        else:
            g_cur = accs                # (cos, sin) input cotangents

    x2 = frozen * p
    g_x2 = -jnp.sin(x2) * g_cur[0] + jnp.cos(x2) * g_cur[1]
    g_p = g_p + frozen * g_x2 + active * g_xa

    # plaquette stencil transpose: p = x0 + R(x1,-1,0) - R(x0,-1,1) - x1
    gx_ref[0] = gy0 + g_p - _roll(g_p, 1, 1)
    gx_ref[1] = gy1 + _roll(g_p, 1, 0) - g_p


def _weight_specs_args(net_params):
    wspecs, w_args = [], []
    for prm in net_params:
        w, b = prm["w"], prm["b"]
        wspecs.append(pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                   memory_space=pltpu.VMEM))
        wspecs.append(pl.BlockSpec(b.shape, lambda i: (0,) * b.ndim,
                                   memory_space=pltpu.VMEM))
        w_args.extend([w, b])
    return wspecs, w_args


def _res_shapes(net_params, spec: FlowSpec, L: int, B: int, dtype):
    """ShapeDtypeStructs + BlockSpecs of the residuals (pre-acts + out_raw)."""
    shapes, specs = [], []
    for prm in net_params[:-1]:
        c = prm["w"].shape[0]
        shapes.append(jax.ShapeDtypeStruct((c, L, L, B), dtype))
        specs.append(pl.BlockSpec((c, L, L, min(128, B)),
                                  lambda i: (0, 0, 0, i),
                                  memory_space=pltpu.VMEM))
    c = _out_channels(spec)
    shapes.append(jax.ShapeDtypeStruct((c, L, L, B), dtype))
    specs.append(pl.BlockSpec((c, L, L, min(128, B)),
                              lambda i: (0, 0, 0, i),
                              memory_space=pltpu.VMEM))
    return shapes, specs


def vjp_kernel_fits(spec: FlowSpec, L: int, B: int,
                    budget_bytes: int = 11 * 2 ** 20) -> bool:
    """VMEM estimate for the backward kernel at (L, TB=min(128,B)): block
    inputs/outputs plus the transpose working set (Cout live cotangents +
    Cin accumulators at the widest conv). Lane padding: TB pads to 128."""
    if spec.coupling not in ("ncp", "rncp"):
        return False
    if spec.conv_dtype == "bfloat16":
        return False
    # Mosaic stack allocation for the unrolled kernel body scales with
    # L^2 * TB and blows the 16M scoped-VMEM limit beyond the validated
    # envelope (measured on v5e: L=16/B=1024 OOMs at 49.7M while L=8/B=1024
    # and L=16/B<=128 compile and run) - gate to that envelope.
    if not (L <= 8 or B <= 128):
        return False
    widths = [2, *spec.hidden_sizes, _out_channels(spec)]
    arr = L * L * 128 * 4                       # one (L, L, TB) fp32 buffer
    n_res = sum(widths[1:-1]) + widths[-1]
    n_io = 2 + 2 + 2 + n_res                    # x, gy, gx, residuals
    work = max(a + b for a, b in zip(widths[:-1], widths[1:]))
    # transform stage holds ~6 arrays per mixture component
    work = max(work, 6 * spec.n_mixture + _out_channels(spec))
    return (n_io + work + 4) * arr <= budget_bytes


@functools.partial(jax.jit,
                   static_argnames=("mu", "off", "spec", "interpret"))
def pallas_link_coupling_fwd_res(net_params, x_cl: jnp.ndarray, mu: int,
                                 off: int, spec: FlowSpec,
                                 interpret: bool = False):
    """Fused coupling-layer forward with residuals. x_cl: (2, L, L, B)
    chains-last. Returns (fx_cl, logJ (B,), residuals tuple)."""
    two, L, _, B = x_cl.shape
    assert two == 2
    TB = min(128, B)
    assert B % TB == 0, (B, TB)
    masks = _masks_stack(L, mu, off)
    n_convs = len(net_params)
    xspec = pl.BlockSpec((2, L, L, TB), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((5, L, L), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    wspecs, w_args = _weight_specs_args(net_params)
    ljspec = pl.BlockSpec((1, TB), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    res_shapes, res_specs = _res_shapes(net_params, spec, L, B, x_cl.dtype)
    fx, logj, *res = pl.pallas_call(
        functools.partial(_fwd_res_kernel, spec=spec, n_convs=n_convs),
        out_shape=(jax.ShapeDtypeStruct(x_cl.shape, x_cl.dtype),
                   jax.ShapeDtypeStruct((1, B), x_cl.dtype),
                   *res_shapes),
        grid=(B // TB,),
        in_specs=[xspec, mspec] + wspecs,
        out_specs=(xspec, ljspec, *res_specs),
        interpret=interpret,
    )(x_cl, jnp.asarray(masks), *w_args)
    return fx, logj[0], tuple(res)


@functools.partial(jax.jit,
                   static_argnames=("mu", "off", "spec", "interpret"))
def pallas_link_coupling_bwd(net_params, x_cl: jnp.ndarray, residuals,
                             gy_cl: jnp.ndarray, gl: jnp.ndarray, mu: int,
                             off: int, spec: FlowSpec,
                             interpret: bool = False):
    """Input-cotangent backward of one coupling layer: returns gx_cl
    (2, L, L, B). gl: (B,) cotangent on the layer's logJ output."""
    two, L, _, B = x_cl.shape
    assert two == 2
    TB = min(128, B)
    assert B % TB == 0, (B, TB)
    masks = _masks_stack(L, mu, off)
    n_convs = len(net_params)
    xspec = pl.BlockSpec((2, L, L, TB), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((5, L, L), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    ljspec = pl.BlockSpec((1, TB), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    wspecs, w_args = _weight_specs_args(net_params)
    _res_sh, res_specs = _res_shapes(net_params, spec, L, B, x_cl.dtype)
    gx = pl.pallas_call(
        functools.partial(_bwd_kernel, spec=spec, n_convs=n_convs),
        out_shape=jax.ShapeDtypeStruct(x_cl.shape, x_cl.dtype),
        grid=(B // TB,),
        in_specs=[xspec, mspec, xspec, ljspec] + wspecs + list(res_specs),
        out_specs=xspec,
        interpret=interpret,
    )(x_cl, jnp.asarray(masks), gy_cl, gl[None, :], *w_args, *residuals)
    return gx


def _plain_force_cl(y_cl: jnp.ndarray, beta: float) -> jnp.ndarray:
    """dS/dy of the Wilson action in chains-last layout (2, L, L, B):
    S = -beta sum cos(p), dS/dp = beta sin(p), then the stencil transpose
    (lattice.py force, validated vs autograd there)."""
    y0, y1 = y_cl[0], y_cl[1]
    sp = jnp.sin(y0 + jnp.roll(y1, -1, axis=0) - jnp.roll(y0, -1, axis=1)
                 - y1)
    g0 = beta * (sp - jnp.roll(sp, 1, axis=1))
    g1 = beta * (jnp.roll(sp, 1, axis=0) - sp)
    return jnp.stack([g0, g1])


@functools.partial(jax.jit, static_argnames=("spec", "beta", "interpret"))
def ft_force_pallas(params, spec: FlowSpec, z: jnp.ndarray, beta: float,
                    interpret: bool = False) -> jnp.ndarray:
    """FT-HMC force dS_eff/dz via the fused per-layer VJP kernels. Drop-in
    for hmc.ft_force (z: (B, 2, L, L)); NOT itself differentiable.

    Raises ValueError for coupling families the kernels don't implement
    (explicit force_backend='pallas' must fail LOUDLY: a spline spec would
    silently mis-slice the conditioner channels and return a wrong force -
    MH keeps sampling exact but acceptance collapses; round-2 advisor)."""
    if spec.coupling not in ("ncp", "rncp"):
        raise ValueError(
            f"force_backend='pallas' supports coupling 'ncp'/'rncp', not "
            f"{spec.coupling!r}; use the XLA backend")
    if spec.conv_dtype != "float32":
        raise ValueError("force_backend='pallas' requires fp32 conv_dtype")
    B = z.shape[0]
    xc = jnp.transpose(z, (1, 2, 3, 0))
    xs, residuals = [], []
    for i, prm in enumerate(params):
        mu, off = layer_mask_params(i)
        xs.append(xc)
        xc, _lj, res = pallas_link_coupling_fwd_res(prm, xc, mu, off, spec,
                                                    interpret=interpret)
        residuals.append(res)
    gy = _plain_force_cl(xc, beta)
    gl = -jnp.ones((B,), z.dtype)       # S_eff = S(y) - sum_i logJ_i
    for i in range(len(params) - 1, -1, -1):
        mu, off = layer_mask_params(i)
        gy = pallas_link_coupling_bwd(params[i], xs[i], residuals[i], gy,
                                      gl, mu, off, spec,
                                      interpret=interpret)
    return jnp.transpose(gy, (3, 0, 1, 2))
