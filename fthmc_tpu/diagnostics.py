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
           "reversibility_error", "sanity_report"]


def _hist_get(hist, name):
    v = getattr(hist, name, None)
    if v is None and hasattr(hist, "get"):
        v = hist.get(name)
    if v is None:
        return None
    a = np.asarray(v)
    return a.reshape(a.shape[0], -1)  # (ntraj, B); single chain -> B=1


def sanity_report(hist, *, plaq_ref: float | None = None,
                  therm_frac: float = 0.25, acc_floor: float = 0.05,
                  drift_nsigma: float = 5.0, ref_nsigma: float = 5.0,
                  mdh_tol: float = 0.25) -> dict:
    """Run-validity failure detection over per-trajectory metric histories.

    Motivated by a real round-3 incident: a measurement harness
    thermalized with a config below the integrator's acceptance cliff, so
    acceptance was exactly 0, the fields never left the ordered start, and
    the artifact silently measured the free theory (BENCH.md session-9
    retraction). Every check here would have caught it.

    `hist`: dict or NamedTuple with (ntraj, B) float arrays among
    {acc, plaq, exp_mdh}; missing keys are skipped. Checks, on the
    post-thermalization slice:
      - nonfinite values in any metric;
      - acceptance collapse (mean acc < acc_floor): the chain is not
        moving, so whatever is measured is the initial condition;
      - plaquette equilibration drift: paired per-chain first-half vs
        second-half means, flagged beyond drift_nsigma (cross-chain
        t-statistic; needs >= 2 chains);
      - plaquette vs a known reference value (e.g. lattice.PLAQ_EXACT for
        quenched runs) beyond ref_nsigma cross-chain errors;
      - |<exp(-dH)> - 1| > mdh_tol: integration-error accounting is off
        (loose by design: at low acceptance this estimator is tail-noisy,
        BENCH.md "warm-start reversibility exonerated").

    Returns {"ok": bool, "flags": [str, ...], "stats": {...}}. A heuristic
    report for harnesses and CLI summaries, not a statistical test.

    No reference counterpart (nftqcd/fthmc prints histories and leaves
    validity to the reader); closest is the non-convergence warning inside
    its bisection (layers.py:308-319).
    """
    flags: list[str] = []
    stats: dict = {}

    acc = _hist_get(hist, "acc")
    plaq = _hist_get(hist, "plaq")
    mdh = _hist_get(hist, "exp_mdh")
    for name, a in (("acc", acc), ("plaq", plaq), ("exp_mdh", mdh)):
        if a is not None and not np.all(np.isfinite(a)):
            flags.append(f"nonfinite:{name}")

    def post(a):
        return a[int(a.shape[0] * therm_frac):]

    if acc is not None and np.all(np.isfinite(acc)):
        m = float(post(acc).mean())
        stats["acc"] = m
        if m < acc_floor:
            flags.append(
                f"acceptance-collapse: mean acc {m:.4f} < {acc_floor} - "
                "the chain is frozen at its initial condition")

    if plaq is not None and np.all(np.isfinite(plaq)):
        p = post(plaq)
        n, B = p.shape
        stats["plaq"] = float(p.mean())
        if n >= 8 and B >= 2:
            h = n // 2
            d = p[:h].mean(axis=0) - p[h:2 * h].mean(axis=0)  # per chain
            derr = float(d.std(ddof=1) / np.sqrt(B))
            tstat = abs(float(d.mean())) / max(derr, 1e-12)
            stats["plaq_drift_sigma"] = tstat
            if tstat > drift_nsigma:
                flags.append(
                    f"plaq-drift: halves differ by {tstat:.1f} sigma - "
                    "not equilibrated over the measured window")
        if plaq_ref is not None and B >= 2:
            cm = p.mean(axis=0)
            err = float(cm.std(ddof=1) / np.sqrt(B))
            pull = abs(float(cm.mean()) - plaq_ref) / max(err, 1e-12)
            stats["plaq_ref_pull"] = pull
            if pull > ref_nsigma:
                flags.append(
                    f"plaq-mismatch: {cm.mean():.5f} vs ref {plaq_ref:.5f} "
                    f"({pull:.1f} sigma by cross-chain error; note the "
                    "error ignores autocorrelation - treat as a screen)")

    if mdh is not None and np.all(np.isfinite(mdh)):
        m = float(post(mdh).mean())
        stats["exp_mdh"] = m
        if abs(m - 1.0) > mdh_tol:
            flags.append(f"exp_mdh-off: <exp(-dH)> = {m:.3f} "
                         "(integration-error accounting suspect)")

    return {"ok": not flags, "flags": flags, "stats": stats}


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
