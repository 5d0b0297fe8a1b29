"""L0 lattice physics ops for 2D U(1) gauge theory, TPU-native.

Pure jax.numpy functions over link-angle fields. A single configuration is an
array ``x`` of shape ``(2, L0, L1)`` (direction axis first); batched chains add
a leading axis via ``jax.vmap``. Everything is jit-safe (static shapes, no
Python control flow on traced values).

Capability parity (reference: nftqcd/fthmc):
  - plaquette phase      ~ fthmc/utils/qed_helpers.py:80-90 (compute_u1_plaq)
  - Wilson action        ~ fthmc/utils/qed_helpers.py:166-186 (BatchAction)
  - gauge force          ~ fthmc/utils/qed_helpers.py:265-272 -- but here the
    derivative is the analytic sin-stencil, not autograd (autograd `grad_force`
    is kept as a cross-check).
  - topological charge   ~ fthmc/utils/qed_helpers.py:108-116 (batch_charges)
  - wrap/regularize      ~ fthmc/utils/qed_helpers.py:40-50

Convention (used EVERYWHERE; the reference has two sign-inconsistent variants,
see SURVEY.md "quirks"): with mu=0, nu=1,

    P(x) = theta_0(x) + theta_1(x + e0) - theta_0(x + e1) - theta_1(x)

so ``P = x[0] + roll(x[1], -1, axis=0) - roll(x[0], -1, axis=1) - x[1]``
(array axis 0 of the (L0, L1) plane is the 0-direction coordinate).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

PI = math.pi
TWO_PI = 2.0 * math.pi

# Exact <plaq> = I_1(beta)/I_0(beta) for validation, values from the reference
# table fthmc/config.py:37-47 (analytic ratio of modified Bessel functions).
PLAQ_EXACT = {
    1.0: 0.44638990, 1.5: 0.59613320,
    2.0: 0.69777477, 2.5: 0.76499665,
    3.0: 0.80998540, 3.5: 0.84110373,
    4.0: 0.86352290, 4.5: 0.88033150,
    5.0: 0.89338326, 5.5: 0.90381753,
    6.0: 0.91235965, 6.5: 0.91948840,
    7.0: 0.92553246, 7.5: 0.93072510,
    8.0: 0.93523590, 8.5: 0.93919160,
    9.0: 0.94268996, 9.5: 0.94580620,
}


def wrap(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to [-pi, pi). (reference torch_mod, qed_helpers.py:40-43;
    the reference's torch_wrap maps to [-2pi, 0) and is itself quirky)"""
    return jnp.remainder(x + PI, TWO_PI) - PI


# `regularize` in the reference (qed_helpers.py:40-42) is the same map
# expressed via floor; keep the name as an alias for API parity.
regularize = wrap


def mod_2pi(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to [0, 2pi). (reference torch_mod, qed_helpers.py:45-46)"""
    return jnp.remainder(x, TWO_PI)


def plaq_phase(x: jnp.ndarray) -> jnp.ndarray:
    """Plaquette phase field P of a single config ``x: (2, L0, L1) -> (L0, L1)``."""
    return (x[0]
            + jnp.roll(x[1], -1, axis=0)
            - jnp.roll(x[0], -1, axis=1)
            - x[1])


def action(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Wilson action S(x) = -beta * sum_P cos(P) for one config. Returns scalar."""
    return -beta * jnp.sum(jnp.cos(plaq_phase(x)))


def action_density(x: jnp.ndarray) -> jnp.ndarray:
    """cos(P) field; S = -beta * sum(action_density)."""
    return jnp.cos(plaq_phase(x))


def delta_action(x1: jnp.ndarray, x0: jnp.ndarray, beta: float) -> jnp.ndarray:
    """S(x1) - S(x0) via an elementwise-difference reduction.

    Summing cos(P1) - cos(P0) pointwise keeps the Metropolis energy difference
    well-conditioned in fp32 even when |S| ~ beta*V is large (the per-site
    difference after one trajectory is O(dt^2), so no catastrophic
    cancellation of large partial sums). This replaces the reference's
    fp64-on-CPU strategy (hmc_2dU1.py:684) with a TPU-friendly one.
    """
    d = jnp.cos(plaq_phase(x1)) - jnp.cos(plaq_phase(x0))
    return -beta * jnp.sum(d)


def plaq_mean(x: jnp.ndarray) -> jnp.ndarray:
    """Average plaquette <cos P> of one config (the PLAQ_EXACT observable)."""
    return jnp.mean(jnp.cos(plaq_phase(x)))


def topo_charge(x: jnp.ndarray) -> jnp.ndarray:
    """Geometric topological charge Q = sum_P wrap(P) / 2pi of one config."""
    return jnp.sum(wrap(plaq_phase(x))) / TWO_PI


def force(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Analytic gauge force dS/dtheta as a sin-stencil (no autograd).

    With S = -beta sum_x cos P(x) and the convention above:
      dS/dtheta_0(y) = beta * [ sin P(y) - sin P(y - e1) ]
      dS/dtheta_1(y) = beta * [ sin P(y - e0) - sin P(y) ]
    One sin + 2 rolls total, vs. the reference's full autograd backward pass
    (qed_helpers.py:265-272). Verified against jax.grad in tests.
    """
    sp = jnp.sin(plaq_phase(x))
    f0 = sp - jnp.roll(sp, 1, axis=1)   # sin P(y) - sin P(y - e1)
    f1 = jnp.roll(sp, 1, axis=0) - sp   # sin P(y - e0) - sin P(y)
    return beta * jnp.stack((f0, f1))


def grad_force(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Autograd force dS/dx, for cross-checking the analytic stencil."""
    return jax.grad(lambda y: action(y, beta))(x)


# ---------------------------------------------------------------------------
# Batched variants (chains axis first): thin vmap wrappers, kept explicit so
# call sites read naturally and XLA sees one fused program.
# ---------------------------------------------------------------------------

batch_plaqs = jax.vmap(plaq_phase)


def batch_action(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    """S per chain: (B, 2, L0, L1) -> (B,). (reference BatchAction.__call__)"""
    return jax.vmap(partial(action, beta=beta))(x)


def batch_charges(x: jnp.ndarray) -> jnp.ndarray:
    """Q per chain: (B, 2, L0, L1) -> (B,). (reference batch_charges)"""
    return jax.vmap(topo_charge)(x)


def batch_plaq_mean(x: jnp.ndarray) -> jnp.ndarray:
    """<cos P> per chain: (B, 2, L0, L1) -> (B,)."""
    return jax.vmap(plaq_mean)(x)


def batch_force(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Analytic force per chain: (B, 2, L0, L1) -> same shape."""
    return jax.vmap(partial(force, beta=beta))(x)


def wilson_loop_phase(x: jnp.ndarray, R: int, T: int) -> jnp.ndarray:
    """Phase of the R x T rectangular Wilson loop at every site of one
    config x: (2, L0, L1) -> (L0, L1).

    theta_loop(y) = sum_{r<R} t0(y+r e0) + sum_{t<T} t1(y+R e0+t e1)
                  - sum_{r<R} t0(y+r e0+T e1) - sum_{t<T} t1(y+t e1)
    R=T=1 reduces to plaq_phase. (Beyond-reference observable: the
    reference computes only plaquettes and Q.)
    """
    x0, x1 = x[0], x[1]
    bottom = sum(jnp.roll(x0, -r, axis=0) for r in range(R))
    top = jnp.roll(bottom, -T, axis=1)
    left = sum(jnp.roll(x1, -t, axis=1) for t in range(T))
    right = jnp.roll(left, -R, axis=0)
    return bottom + right - top - left


def wilson_loop(x: jnp.ndarray, R: int, T: int) -> jnp.ndarray:
    """<cos theta_loop> of the R x T Wilson loop for one config (scalar).
    In 2D U(1), <W(R,T)> = (I1/I0)^{R*T} at weak coupling - an area law
    usable as an extra validation observable."""
    return jnp.mean(jnp.cos(wilson_loop_phase(x, R, T)))


def batch_wilson_loops(x: jnp.ndarray, R: int, T: int) -> jnp.ndarray:
    """(B, 2, L0, L1) -> (B,) mean R x T Wilson loop per chain."""
    return jax.vmap(lambda y: wilson_loop(y, R, T))(x)


def polyakov_loop(x: jnp.ndarray, mu: int = 0) -> jnp.ndarray:
    """Volume-averaged Polyakov loop winding the mu direction of one
    config: (2, L0, L1) -> real (2,) array [Re P, Im P].

    P(y_perp) = exp(i sum_{y_mu} theta_mu(y)); returns mean_perp P as a
    real pair (the axon TPU backend has no complex-op lowering outside
    jit, so all complex observables ship in packed-real form). Gauge
    invariant (the transform telescopes around the winding cycle). Its
    modulus/correlators probe the static-charge free energy; a beyond-
    reference observable (the reference computes only plaquettes and Q).
    """
    theta = jnp.sum(x[mu], axis=mu)
    return jnp.stack([jnp.mean(jnp.cos(theta)), jnp.mean(jnp.sin(theta))])


def batch_polyakov_loops(x: jnp.ndarray, mu: int = 0) -> jnp.ndarray:
    """(B, 2, L0, L1) -> real (B, 2) volume-averaged Polyakov loops
    packed as [Re P, Im P] per chain."""
    return jax.vmap(lambda y: polyakov_loop(y, mu))(x)


def gauge_transform(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Apply a gauge transformation alpha: (L0, L1) to links x: (2, L0, L1).

    theta_mu(y) -> alpha(y) + theta_mu(y) - alpha(y + e_mu); the plaquette
    phase is exactly invariant. (reference layers.py:177-185)
    """
    return jnp.stack([
        alpha + x[mu] - jnp.roll(alpha, -1, axis=mu) for mu in range(2)
    ])


def random_gauge_transform(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Gauge-transform each chain in a batch by an independent random alpha."""
    alpha = jax.random.uniform(
        key, x.shape[:1] + x.shape[2:], x.dtype, 0.0, TWO_PI)
    return jax.vmap(gauge_transform)(x, alpha)


def cold_start(L: int, dtype=jnp.float32) -> jnp.ndarray:
    """Zero-link (unit gauge) single configuration (2, L, L)."""
    return jnp.zeros((2, L, L), dtype=dtype)


def hot_start(key: jax.Array, batch: int, L: int, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform(-pi, pi) random batch of configurations (batch, 2, L, L)."""
    return jax.random.uniform(key, (batch, 2, L, L), dtype, -PI, PI)
