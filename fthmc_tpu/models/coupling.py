"""Gauge-equivariant coupling layers: NCP plaquette transform + link lift.

Pure-functional JAX re-design of the reference's torch modules
(fthmc/utils/layers.py:188-210 GaugeEquivCouplingLayer, :324-396
NCPPlaqCouplingLayer, :62-90 tan transforms). A layer is (params, static
mask indices); all functions are batched over a leading chain axis and are
jit/vmap/grad-safe. The inverse transform uses a tolerance-early-exit
bisection under lax.while_loop (reference layers.py:294-320).

Math (non-compact projection mixture transform on active plaquettes):
    h_s(x)   = 2 atan(e^s tan(x/2))                   (monotone on (-pi, pi))
    f(x)     = wrap( mean_i h_{s_i}(x) + t )
    log|J|   = logsumexp_i( -log(e^{-s_i} cos^2(x/2) + e^{s_i} sin^2(x/2)) )
               - log(n_mix)
with (s_1..s_nmix, t) produced by a circular CNN fed stack(cos, sin) of the
frozen plaquettes.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fthmc_tpu.config import FlowSpec
from fthmc_tpu.models.masks import link_active_stripes, plaq_masks
from fthmc_tpu.models.spline import spline_forward, spline_inverse
from fthmc_tpu.ops.conv import conv_net_apply

PI = math.pi
TWO_PI = 2.0 * math.pi


def wrap_pi(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap to (-pi, pi] (reference layers.py torch_mod, :41-43)."""
    return jnp.remainder(x + PI, TWO_PI) - PI


def stack_cos_sin(x: jnp.ndarray) -> jnp.ndarray:
    """(B, L, L) -> (B, 2, L, L) channels (cos x, sin x). (layers.py:58-59)"""
    return jnp.stack((jnp.cos(x), jnp.sin(x)), axis=1)


# Soft range cap for the log-scale s inside the *value* computation of the
# transform: by |s| ~ 30 the transform output has saturated to its limit far
# below fp32 resolution, so clipping changes nothing numerically while keeping
# exp() finite. The log-Jacobian does NOT clip (its dependence on s stays
# linear for large |s|) -- it uses a factored, overflow-free form instead.
_S_CLIP = 30.0
_TINY = 1e-30


def tan_transform(x: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """h_s(x) = wrap(2 atan(e^s tan(x/2))) (layers.py:66-69), computed as
    2*atan2(e^s sin(x/2), cos(x/2)) which is exact on (-pi, pi] (cos(x/2) >= 0
    there) and avoids the reference formula's inf*0 = NaN at masked x=0 sites
    when e^s overflows."""
    sc = jnp.clip(s, -_S_CLIP, _S_CLIP)
    return wrap_pi(2.0 * jnp.arctan2(jnp.exp(sc) * jnp.sin(0.5 * x),
                                     jnp.cos(0.5 * x)))


def tan_transform_logJ(x: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """log dh_s/dx = -log(e^-s cos^2(x/2) + e^s sin^2(x/2)) (layers.py:72-76),
    factored by m = stopgrad(|s|) so both exponents are <= 0: no overflow for
    any s, finite values and gradients at masked sites, and d logJ/ds -> -+1
    (the true asymptote) for large |s|."""
    c, sn = jnp.cos(0.5 * x), jnp.sin(0.5 * x)
    m = jax.lax.stop_gradient(jnp.abs(s))
    inner = jnp.exp(-s - m) * c * c + jnp.exp(s - m) * sn * sn
    return -(m + jnp.log(inner + _TINY))


def mixture_tan_transform(x: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Mean over mixture axis 1; x: (B,1,L,L), s: (B,M,L,L) -> (B,1,L,L)."""
    return jnp.mean(tan_transform(x, s), axis=1, keepdims=True)


def mixture_tan_transform_logJ(x: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """log d(mean_i h_{s_i})/dx via logsumexp. (layers.py:85-90) -> (B,L,L)."""
    return (jax.nn.logsumexp(tan_transform_logJ(x, s), axis=1)
            - jnp.log(jnp.asarray(s.shape[1], x.dtype)))


class CouplingOut(NamedTuple):
    x: jnp.ndarray      # transformed field
    logJ: jnp.ndarray   # per-chain log-Jacobian, shape (B,)


def _clip_s(s: jnp.ndarray, spec: FlowSpec) -> jnp.ndarray:
    if spec.s_clip is None:
        return s
    c = spec.s_clip
    return c * jnp.tanh(s / c)


def plaq_net_split(net_out, spec: FlowSpec):
    """Single source for the per-family conditioner channel split + s_clip:
    (s, t) for ncp, (s, r, t) for rncp. Forward (plaq_transform_apply) and
    reverse (_net_s_t / _net_s_r_t) paths both go through here so the
    channel order and clip form cannot drift between them."""
    if spec.coupling == "rncp":
        M = spec.n_mixture
        s, r, t = net_out[:, :M], net_out[:, M:2 * M], net_out[:, 2 * M]
        return _clip_s(s, spec), r, t
    s, t = net_out[:, :-1], net_out[:, -1]
    return _clip_s(s, spec), t


def plaq_transform_apply(net_out, plaq, active, spec: FlowSpec):
    """Active-plaquette transform from the raw conditioner output channels.

    Single source of truth for the per-family channel split, s_clip, and
    value/log-Jacobian math — shared by the single-device couplings below
    and the row-sharded flow (parallel/domain_flow), so the replicated and
    domain-decomposed paths cannot drift.

    net_out: (B, C, L, L) raw CNN output; plaq/active: (B, L, L)/(L, L).
    Returns (fx1 (B,L,L) transform of the active plaquettes (pre-mask),
             local_logJ (B,L,L) active-masked, t (B,L,L) offset channel).
    """
    x1 = (active * plaq)[:, None]
    if spec.coupling == "rncp":
        s, r, t = plaq_net_split(net_out, spec)
        local_logJ = active * rotated_mixture_logJ(x1, s, r)
        fx1 = rotated_mixture_transform(x1, s, r)
    elif spec.coupling == "ncp":
        s, t = plaq_net_split(net_out, spec)
        local_logJ = active * mixture_tan_transform_logJ(x1, s)
        fx1 = active * mixture_tan_transform(x1, s)[:, 0]
    else:
        raise NotImplementedError(
            f"shared plaquette transform for coupling={spec.coupling!r} "
            "(spline couplings are sampling-only; see models/spline.py)")
    return fx1, local_logJ, t


# ---------------------------------------------------------------------------
# NCP plaquette coupling (acts on the plaquette-angle field)
# ---------------------------------------------------------------------------

def _net_s_t(net_params, frozen, plaq, spec: FlowSpec):
    """CNN on the frozen plaquettes -> (s, t). s: (B,M,L,L), t: (B,L,L).

    With spec.s_clip, the log-slope is smoothly bounded: s -> c*tanh(s/c),
    capping the transform derivative in [e^-c, e^c] (and so the effective
    force curvature) while leaving small s unchanged.
    """
    x2 = frozen * plaq
    compute_dtype = (jnp.bfloat16 if spec.conv_dtype == "bfloat16" else None)
    out = conv_net_apply(net_params, stack_cos_sin(x2), spec.activation,
                         compute_dtype=compute_dtype)
    return plaq_net_split(out, spec)


def plaq_coupling_forward(
    net_params, plaq: jnp.ndarray, mu: int, off: int, spec: FlowSpec
) -> CouplingOut:
    """Forward NCP transform of the active plaquettes.

    plaq: (B, L0, L1) plaquette angles. (reference layers.py:348-371)
    """
    shape = tuple(plaq.shape[-2:])
    frozen, active, passive = (jnp.asarray(m, plaq.dtype)
                               for m in plaq_masks(shape, mu, off))
    compute_dtype = (jnp.bfloat16 if spec.conv_dtype == "bfloat16" else None)
    net_out = conv_net_apply(net_params, stack_cos_sin(frozen * plaq),
                             spec.activation, compute_dtype=compute_dtype)
    fx1, local_logJ, t = plaq_transform_apply(net_out, plaq, active, spec)
    logJ = jnp.sum(local_logJ, axis=(1, 2))
    fx = active * wrap_pi(fx1 + t) + passive * plaq + frozen * plaq
    return CouplingOut(fx, logJ)


def _bisect_invert(y, transform, tol: float, max_iter: int):
    """Invert monotone `transform` on (-pi, pi) by bisection with tolerance
    early exit (lax.while_loop; reference layers.py:294-320, no_grad there ->
    stop_gradient here)."""
    lo = jnp.full_like(y, -PI)
    hi = jnp.full_like(y, PI)

    def cond(state):
        i, lo, hi, err = state
        return jnp.logical_and(i < max_iter, err >= tol)

    def body(state):
        i, lo, hi, _ = state
        mid = 0.5 * (lo + hi)
        val = transform(mid)
        greater = (y > val).astype(y.dtype)
        err = jnp.max(jnp.abs(y - val))
        lo = greater * mid + (1.0 - greater) * lo
        hi = (1.0 - greater) * mid + greater * hi
        return i + 1, lo, hi, err

    init = (jnp.asarray(0, jnp.int32), lo, hi,
            jnp.asarray(jnp.inf, y.dtype))
    _, lo, hi, _ = jax.lax.while_loop(cond, body, init)
    return jax.lax.stop_gradient(0.5 * (lo + hi))


def plaq_coupling_reverse(
    net_params, fplaq: jnp.ndarray, mu: int, off: int, spec: FlowSpec,
    tol: float = 1e-6, max_iter: int = 1000,
) -> CouplingOut:
    """Inverse NCP transform (bisection on the masked mixture transform).
    (reference layers.py:373-396)"""
    shape = tuple(fplaq.shape[-2:])
    frozen, active, passive = (jnp.asarray(m, fplaq.dtype)
                               for m in plaq_masks(shape, mu, off))
    s, t = _net_s_t(net_params, frozen, fplaq, spec)

    y1 = wrap_pi(active * (fplaq - t))[:, None]          # target, (B,1,L,L)
    transform = lambda x: active * mixture_tan_transform(x, s)
    x1 = _bisect_invert(y1, transform, tol, max_iter)
    local_logJ = active * mixture_tan_transform_logJ(x1, s)
    logJ = -jnp.sum(local_logJ, axis=(1, 2))
    x = active * x1[:, 0] + passive * fplaq + frozen * fplaq
    return CouplingOut(x, logJ)


# ---------------------------------------------------------------------------
# Rotated-mixture NCP ("rncp"): the smooth high-capacity family.
#
# Measured round-2 finding: C^1 rational-quadratic splines have a
# DISCONTINUOUS force (logJ' kinks at bin boundaries), so FT-HMC dH scales
# like dt instead of dt^2 (~23000*dt at 16^2 beta=3 across 512 dof x 24
# layers) - leapfrog cannot integrate them at any useful step count. The
# NCP transform is C-infinity but all mixture components steepen at the
# same place (x=0), which caps its expressivity.
#
# rncp fixes both: f(x) = x + mean_i [h_{s_i}(y_i) - y_i],  y_i = wrap(x - r_i)
# with per-component learned rotations r_i from the CNN. Each term is a
# smooth circle diffeomorphism contribution with its steep region at r_i -
# spline-like "learned knots" with an everywhere-smooth force. r_i = 0
# recovers the reference NCP exactly. h' > 0 gives monotonicity; the
# delta = h(y)-y form is 2pi-periodic and continuous at the seam (h(+-pi)
# = +-pi), so the mixture mean needs no branch tracking.
# logJ = logsumexp_i log h'_{s_i}(y_i) - log M (per-component arguments).
# ---------------------------------------------------------------------------

def rotated_mixture_transform(x: jnp.ndarray, s: jnp.ndarray,
                              r: jnp.ndarray) -> jnp.ndarray:
    """x: (B,1,L,L), s/r: (B,M,L,L) -> f(x): (B,L,L) (unwrapped; the caller
    wraps after adding t)."""
    y = wrap_pi(x - r)
    delta = tan_transform(y, s) - y
    return x[:, 0] + jnp.mean(delta, axis=1)


def rotated_mixture_logJ(x: jnp.ndarray, s: jnp.ndarray,
                         r: jnp.ndarray) -> jnp.ndarray:
    """log f'(x) = log mean_i h'_{s_i}(y_i): (B,L,L)."""
    y = wrap_pi(x - r)
    return (jax.nn.logsumexp(tan_transform_logJ(y, s), axis=1)
            - jnp.log(jnp.asarray(s.shape[1], x.dtype)))


def _net_s_r_t(net_params, frozen, plaq, spec: FlowSpec):
    """CNN -> (s (B,M,L,L), r (B,M,L,L), t (B,L,L)) for the rncp coupling.
    s_clip bounds the log-slopes as for NCP; rotations are unconstrained
    (periodic)."""
    x2 = frozen * plaq
    compute_dtype = (jnp.bfloat16 if spec.conv_dtype == "bfloat16" else None)
    out = conv_net_apply(net_params, stack_cos_sin(x2), spec.activation,
                         compute_dtype=compute_dtype)
    return plaq_net_split(out, spec)


# The forward body is coupling-family-agnostic: plaq_transform_apply
# dispatches on spec.coupling, so NCP and rncp share plaq_coupling_forward.
rncp_plaq_coupling_forward = plaq_coupling_forward


def rncp_plaq_coupling_reverse(
    net_params, fplaq: jnp.ndarray, mu: int, off: int, spec: FlowSpec,
    tol: float = 1e-6, max_iter: int = 1000,
) -> CouplingOut:
    """Bisection inverse of the rotated-mixture transform. f maps (-pi, pi]
    onto an interval [f(-pi), f(-pi)+2pi); lift the target into that window
    before bisecting (the plain-NCP transform fixes f(-pi) = -pi so the
    reference never needed this)."""
    shape = tuple(fplaq.shape[-2:])
    frozen, active, passive = (jnp.asarray(m, fplaq.dtype)
                               for m in plaq_masks(shape, mu, off))
    s, r, t = _net_s_r_t(net_params, frozen, fplaq, spec)

    y_t = wrap_pi(active * (fplaq - t))[:, None]         # (B,1,L,L)
    f_lo = rotated_mixture_transform(
        jnp.full_like(y_t, -PI + 1e-7), s, r)[:, None]
    y_adj = f_lo + jnp.remainder(y_t - f_lo, TWO_PI)
    transform = lambda x: rotated_mixture_transform(x, s, r)[:, None]
    # same bisection as ncp: bracketing on x in (-pi, pi) is valid for the
    # shifted output interval too (y_adj was aligned above)
    x1 = _bisect_invert(y_adj, transform, tol, max_iter)
    local_logJ = active * rotated_mixture_logJ(x1, s, r)
    logJ = -jnp.sum(local_logJ, axis=(1, 2))
    x = active * x1[:, 0] + passive * fplaq + frozen * fplaq
    return CouplingOut(x, logJ)


# ---------------------------------------------------------------------------
# Circular-spline plaquette coupling (higher-capacity alternative to NCP;
# see models/spline.py. Same mask scheme, same CNN conditioner, analytic
# inverse instead of bisection.)
# ---------------------------------------------------------------------------

def _net_spline_raw(net_params, frozen, plaq, spec: FlowSpec):
    """CNN on the frozen plaquettes -> (raw spline channels (B,3K,L,L),
    t (B,L,L)). With spec.s_clip ALL spline logits are smoothly bounded
    (c*tanh(raw/c)): width/height logits to +-c caps the bin aspect ratio at
    e^{2c} (hence the max spline slope - unclipped softmax widths can reach
    the 1e-3 floor, slopes O(1000), and the FT-HMC force then blows up:
    measured |dH| ~ 1e4 at 16^2 beta=3), and derivative logits likewise.
    The FT-HMC integrability knob, same role as for NCP."""
    K = spec.n_knots
    x2 = frozen * plaq
    compute_dtype = (jnp.bfloat16 if spec.conv_dtype == "bfloat16" else None)
    out = conv_net_apply(net_params, stack_cos_sin(x2), spec.activation,
                         compute_dtype=compute_dtype)
    raw, t = out[:, :3 * K], out[:, 3 * K]
    if spec.s_clip is not None:
        c = spec.s_clip
        raw = c * jnp.tanh(raw / c)
    return raw, t


def spline_plaq_coupling_forward(
    net_params, plaq: jnp.ndarray, mu: int, off: int, spec: FlowSpec
) -> CouplingOut:
    """Forward circular-RQ-spline transform of the active plaquettes."""
    shape = tuple(plaq.shape[-2:])
    frozen, active, passive = (jnp.asarray(m, plaq.dtype)
                               for m in plaq_masks(shape, mu, off))
    raw, t = _net_spline_raw(net_params, frozen, plaq, spec)

    x1 = active * plaq
    fx1, local_logJ = spline_forward(x1, raw, spec.n_knots)
    logJ = jnp.sum(active * local_logJ, axis=(1, 2))
    fx = active * wrap_pi(fx1 + t) + passive * plaq + frozen * plaq
    return CouplingOut(fx, logJ)


def spline_plaq_coupling_reverse(
    net_params, fplaq: jnp.ndarray, mu: int, off: int, spec: FlowSpec,
    tol: float = 1e-6, max_iter: int = 1000,
) -> CouplingOut:
    """Analytic inverse of spline_plaq_coupling_forward (no bisection;
    tol/max_iter accepted for NCP signature parity and ignored)."""
    del tol, max_iter
    shape = tuple(fplaq.shape[-2:])
    frozen, active, passive = (jnp.asarray(m, fplaq.dtype)
                               for m in plaq_masks(shape, mu, off))
    raw, t = _net_spline_raw(net_params, frozen, fplaq, spec)

    y1 = wrap_pi(active * (fplaq - t))
    x1, local_logJ = spline_inverse(y1, raw, spec.n_knots)
    logJ = -jnp.sum(active * local_logJ, axis=(1, 2))
    x = active * x1 + passive * fplaq + frozen * fplaq
    return CouplingOut(x, logJ)


def plaq_transform_forward(net_params, plaq, mu, off, spec: FlowSpec):
    if spec.coupling == "spline":
        return spline_plaq_coupling_forward(net_params, plaq, mu, off, spec)
    return plaq_coupling_forward(net_params, plaq, mu, off, spec)


def plaq_transform_reverse(net_params, fplaq, mu, off, spec: FlowSpec,
                           tol: float = 1e-6, max_iter: int = 1000):
    if spec.coupling == "spline":
        return spline_plaq_coupling_reverse(net_params, fplaq, mu, off, spec)
    if spec.coupling == "rncp":
        return rncp_plaq_coupling_reverse(net_params, fplaq, mu, off, spec,
                                          tol=tol, max_iter=max_iter)
    return plaq_coupling_reverse(net_params, fplaq, mu, off, spec,
                                 tol=tol, max_iter=max_iter)


# ---------------------------------------------------------------------------
# Gauge-equivariant link coupling (lifts the plaquette update onto links)
# ---------------------------------------------------------------------------

def _plaq_of_links(x: jnp.ndarray) -> jnp.ndarray:
    """Batched plaquette phase (B,2,L,L) -> (B,L,L); same convention as
    fthmc_tpu.lattice.plaq_phase."""
    return (x[:, 0]
            + jnp.roll(x[:, 1], -1, axis=1)
            - jnp.roll(x[:, 0], -1, axis=2)
            - x[:, 1])


def _apply_delta_links(x, delta_plaq, active_links):
    """Distribute a plaquette-angle change onto the active links: the mu link
    gets +delta, its parallel-transported partner -delta (U vs U^dagger,
    reference layers.py:199-201)."""
    delta_links = jnp.stack((delta_plaq, -delta_plaq), axis=1)
    return active_links * wrap_pi(delta_links + x) + (1.0 - active_links) * x


def link_coupling_forward(
    net_params, x: jnp.ndarray, mu: int, off: int, spec: FlowSpec
) -> CouplingOut:
    """One forward gauge-equivariant coupling on links x: (B, 2, L0, L1).
    (reference layers.py:196-202)"""
    shape = (2,) + tuple(x.shape[-2:])
    active_links = jnp.asarray(link_active_stripes(shape, mu, off), x.dtype)
    plaq = _plaq_of_links(x)
    new_plaq, logJ = plaq_transform_forward(net_params, plaq, mu, off, spec)
    fx = _apply_delta_links(x, new_plaq - plaq, active_links)
    return CouplingOut(fx, logJ)


def link_coupling_reverse(
    net_params, fx: jnp.ndarray, mu: int, off: int, spec: FlowSpec,
    tol: float = 1e-6, max_iter: int = 1000,
) -> CouplingOut:
    """Exact inverse of link_coupling_forward. (reference layers.py:204-210)"""
    shape = (2,) + tuple(fx.shape[-2:])
    active_links = jnp.asarray(link_active_stripes(shape, mu, off), fx.dtype)
    new_plaq = _plaq_of_links(fx)
    plaq, logJ = plaq_transform_reverse(
        net_params, new_plaq, mu, off, spec, tol=tol, max_iter=max_iter)
    x = _apply_delta_links(fx, plaq - new_plaq, active_links)
    return CouplingOut(x, logJ)
