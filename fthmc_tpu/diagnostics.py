"""Per-trajectory integrator diagnostics.

Reference parity: the prototype's per-leapfrog-step traces
(ipynb/ft_hmc.py:114-141 hmc_info_list: ||F||, S, momentum-overlap per step;
:158-166 show_hmc_stats action-sigma + RMS-force summaries) - device-side
here via scan outputs instead of Python-loop printing.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["StepInfo", "leapfrog_with_diagnostics", "summarize_step_info",
           "reversibility_error"]


class StepInfo(NamedTuple):
    force_norm: jnp.ndarray   # (nstep, B) ||F|| per chain per step
    action: jnp.ndarray       # (nstep, B) S(x) per chain per step
    mom_overlap: jnp.ndarray  # (nstep, B) <v0, v>/(|v0||v|)


def leapfrog_with_diagnostics(
        x: jnp.ndarray, v: jnp.ndarray, dt: float, nstep: int,
        force_fn: Callable, action_fn: Callable):
    """Same integrator as hmc.leapfrog but also returns per-step StepInfo.

    action_fn/force_fn act on batched (B, ...) states; metrics are per chain.
    """
    v0 = v
    v0n = jnp.sqrt(jnp.sum((v0 * v0).reshape(v0.shape[0], -1), axis=-1))
    x = x + 0.5 * dt * v

    def body(carry, _):
        x, v = carry
        f = force_fn(x)
        v = v - dt * f
        fn = jnp.sqrt(jnp.sum((f * f).reshape(f.shape[0], -1), axis=-1))
        s = action_fn(x)
        vn = jnp.sqrt(jnp.sum((v * v).reshape(v.shape[0], -1), axis=-1))
        ov = (jnp.sum((v0 * v).reshape(v.shape[0], -1), axis=-1)
              / (v0n * vn))
        x = x + dt * v
        return (x, v), StepInfo(fn, s, ov)

    (x, v), info = jax.lax.scan(body, (x, v), None, length=nstep)
    x = x - 0.5 * dt * v
    return x, v, info


def summarize_step_info(info: StepInfo, drop_frac: float = 0.5) -> dict:
    """Action sigma + RMS force over the last (1-drop_frac) of the steps
    (reference show_hmc_stats, ipynb/ft_hmc.py:158-166)."""
    f = np.asarray(info.force_norm).ravel()
    s = np.asarray(info.action).ravel()
    n0 = int(len(f) * drop_frac)
    f, s = f[n0:], s[n0:]
    return {
        "action_sigma": float(np.sqrt(np.mean((s - s.mean()) ** 2))),
        "rms_force": float(np.sqrt(np.mean(f ** 2))),
        "final_mom_overlap": float(np.asarray(info.mom_overlap)[-1].mean()),
    }


def flow_inverse_residual(params, spec, y: jnp.ndarray, tol: float = 1e-6,
                          max_iter: int = 1000) -> float:
    """Bisection-inverse quality check: max |wrap(f(f^-1(y)) - y)|.

    The reference prints non-convergence warnings from inside the bisection
    (layers.py:308-319), which is impossible under jit; instead this exposes
    the measurable residual to assert on (tests / pre-run validation).
    """
    from fthmc_tpu.models.flow import flow_forward, flow_reverse
    from fthmc_tpu.lattice import wrap
    x, _ = flow_reverse(params, y, spec, tol=tol, max_iter=max_iter)
    y2, _ = flow_forward(params, x, spec)
    return float(jnp.max(jnp.abs(wrap(y2 - y))))


def reversibility_error(x, v, dt: float, nstep: int, force_fn) -> float:
    """Integrate forward, flip momentum, integrate back; max |x - x0|.
    (validation pattern from hmc_2dU1.py:719-745)"""
    from fthmc_tpu.hmc import leapfrog
    x1, v1 = leapfrog(x, v, dt, nstep, force_fn)
    x2, v2 = leapfrog(x1, -v1, dt, nstep, force_fn)
    return float(jnp.max(jnp.abs(x2 - x)))
