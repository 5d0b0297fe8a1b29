"""Circular rational-quadratic-spline plaquette coupling.

A higher-capacity alternative to the reference's NCP transform
(/root/reference/fthmc/utils/layers.py:324-396): the active plaquette
angles are transformed by a monotone circle diffeomorphism built from a
K-bin rational-quadratic spline (Durkan et al., "Neural Spline Flows",
arXiv:1906.04032, Appendix A) with circular boundary conditions
(matching endpoint derivatives, Rezende et al., "Normalizing Flows on
Tori and Spheres", arXiv:2002.02428), followed by the same additive
phase shift t as the NCP layer.

Why it exists: the 2-component NCP mixture cannot represent the target
density at beta >= 3 on 16^2 (measured in round 1 - FT-HMC acceptance 0
at practical step counts); a K-knot spline has O(3K) shape parameters
per site and can concentrate probability sharply while staying a C^1
circle map. Bonus over NCP: the inverse is ANALYTIC (solve one quadratic
per site) - no 1000-iteration bisection.

Parameterization (per active site, from the conditioner CNN):
  raw (3K+1 channels) -> K bin widths (softmax), K bin heights (softmax),
  K knot derivatives (shifted softplus, derivative at knot K == knot 0),
  and the phase shift t.
With a zero CNN output the spline is EXACTLY the identity (uniform bins,
unit derivatives, t=0) - new layers initialize as no-ops, which keeps
S_eff integrable from the first training step.

Shapes follow the NCP layer: angles x (B, L, L) in [-pi, pi); parameter
maps keep the knot axis at axis 1 ((B, K, L, L)) so the lattice plane
stays on the TPU lane/sublane axes and knot reductions are cheap
cross-channel ops.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["spline_knots", "spline_forward", "spline_inverse",
           "spline_out_channels"]

PI = math.pi
TWO_PI = 2.0 * math.pi

_MIN_BIN = 1e-3     # minimum bin width/height (keeps the map invertible)
_MIN_DERIV = 1e-4   # floor on knot derivatives
# softplus(_D_SHIFT) + _MIN_DERIV == 1 exactly -> zero raw input gives unit
# derivative (identity spline together with uniform bins).
_D_SHIFT = math.log(math.expm1(1.0 - _MIN_DERIV))


def spline_out_channels(n_knots: int) -> int:
    """Conditioner-CNN output channels for a K-knot circular spline (+1 for
    the phase shift t)."""
    return 3 * n_knots + 1


def spline_knots(raw: jnp.ndarray, n_knots: int):
    """Map raw CNN channels -> spline knot arrays.

    raw: (B, 3K, L, L). Returns (cum_w, cum_h, w, h, d) where
      cum_w, cum_h: (B, K+1, L, L) knot positions in [0, 1] (exact 0/1 ends),
      w, h:         (B, K, L, L)   bin widths/heights,
      d:            (B, K+1, L, L) knot derivatives with d[K] == d[0]
                    (circular C^1 seam).
    """
    K = n_knots
    wl, hl, dl = raw[:, :K], raw[:, K:2 * K], raw[:, 2 * K:3 * K]
    scale = 1.0 - K * _MIN_BIN
    w = jax.nn.softmax(wl, axis=1) * scale + _MIN_BIN
    h = jax.nn.softmax(hl, axis=1) * scale + _MIN_BIN
    d = jax.nn.softplus(dl + _D_SHIFT) + _MIN_DERIV
    d = jnp.concatenate([d, d[:, :1]], axis=1)

    def cum(b):
        c = jnp.cumsum(b, axis=1)
        zeros = jnp.zeros_like(c[:, :1])
        # force the last knot to land exactly on 1.0 (cumsum rounds off)
        c = jnp.concatenate([zeros, c[:, :-1], jnp.ones_like(c[:, :1])],
                            axis=1)
        return c

    return cum(w), cum(h), w, h, d


def _select_bin(cum: jnp.ndarray, u: jnp.ndarray, K: int) -> jnp.ndarray:
    """One-hot bin membership. cum: (B, K+1, L, L) knots, u: (B, L, L) in
    [0, 1). Returns (B, K, L, L) with exactly one 1 along axis 1."""
    uu = u[:, None]
    return ((uu >= cum[:, :K]) & (uu < cum[:, 1:])).astype(u.dtype)


def _gather(onehot: jnp.ndarray, arr: jnp.ndarray) -> jnp.ndarray:
    """Branchless per-site bin gather: sum over the knot axis. With K <= 16
    this is cheaper and fuses better than take_along_axis gathers."""
    return jnp.sum(onehot * arr, axis=1)


def spline_forward(x: jnp.ndarray, raw: jnp.ndarray, n_knots: int):
    """Forward circular RQ spline. x: (B, L, L) angles in [-pi, pi);
    raw: (B, 3K, L, L). Returns (y, logJ) with y in [-pi, pi) and logJ the
    per-site log |dy/dx| (the 2pi rescalings cancel)."""
    K = n_knots
    cw, ch, w, h, d = spline_knots(raw, K)
    # wrap to [-pi, pi) first: plaquette angles are sums of 4 link angles and
    # can exceed the principal range (the NCP transform is wrap-invariant via
    # trig periodicity; the spline must wrap explicitly - derivative is 1)
    xw = jnp.remainder(x + PI, TWO_PI) - PI
    u = jnp.clip((xw + PI) / TWO_PI, 0.0, 1.0 - 1e-6)
    oh = _select_bin(cw, u, K)

    u0 = _gather(oh, cw[:, :K])
    y0 = _gather(oh, ch[:, :K])
    wb = _gather(oh, w)
    hb = _gather(oh, h)
    d0 = _gather(oh, d[:, :K])
    d1 = _gather(oh, d[:, 1:])

    s = hb / wb
    xi = (u - u0) / wb
    xi1m = xi * (1.0 - xi)
    denom = s + (d1 + d0 - 2.0 * s) * xi1m
    v = y0 + hb * (s * xi * xi + d0 * xi1m) / denom
    # log g' = 2 log s + log(d1 xi^2 + 2 s xi(1-xi) + d0 (1-xi)^2) - 2 log denom
    numer = d1 * xi * xi + 2.0 * s * xi1m + d0 * (1.0 - xi) ** 2
    logJ = 2.0 * jnp.log(s) + jnp.log(numer) - 2.0 * jnp.log(denom)
    y = TWO_PI * v - PI
    return y, logJ


def spline_inverse(y: jnp.ndarray, raw: jnp.ndarray, n_knots: int):
    """Analytic inverse of spline_forward (quadratic solve per site;
    Durkan et al. arXiv:1906.04032 eq. 29-31). Returns (x, logJ_fwd(x)) -
    the caller negates logJ for the reverse-map Jacobian."""
    K = n_knots
    cw, ch, w, h, d = spline_knots(raw, K)
    yw = jnp.remainder(y + PI, TWO_PI) - PI
    v = jnp.clip((yw + PI) / TWO_PI, 0.0, 1.0 - 1e-6)
    oh = _select_bin(ch, v, K)

    u0 = _gather(oh, cw[:, :K])
    y0 = _gather(oh, ch[:, :K])
    wb = _gather(oh, w)
    hb = _gather(oh, h)
    d0 = _gather(oh, d[:, :K])
    d1 = _gather(oh, d[:, 1:])

    s = hb / wb
    t = v - y0
    q = d1 + d0 - 2.0 * s
    a = hb * (s - d0) + t * q
    b = hb * d0 - t * q
    c = -s * t
    # stable quadratic root in [0, 1]: xi = 2c / (-b - sqrt(b^2 - 4ac))
    disc = b * b - 4.0 * a * c
    xi = (2.0 * c) / (-b - jnp.sqrt(jnp.maximum(disc, 0.0)))
    xi = jnp.clip(xi, 0.0, 1.0)

    u = u0 + xi * wb
    x = TWO_PI * u - PI

    xi1m = xi * (1.0 - xi)
    denom = s + q * xi1m
    numer = d1 * xi * xi + 2.0 * s * xi1m + d0 * (1.0 - xi) ** 2
    logJ = 2.0 * jnp.log(s) + jnp.log(numer) - 2.0 * jnp.log(denom)
    return x, logJ
