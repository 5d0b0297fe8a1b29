"""Flow-only sampling: independence Metropolis over flow proposals.

Reference parity: fthmc/utils/samplers.py:129-259 + fthmc/utils/inference.py:
34-153 (serial_sample_generator / make_mcmc_ensemble), and generate_ensemble
(samplers.py:80-102) for the topological-susceptibility evaluation.

TPU design: proposals are generated in device batches by the flow; the
inherently serial accept/reject chain is a lax.scan over the proposal axis
(the reference's Python generator + `if draw < p_accept` branch becomes a
branchless scan). Multiple independent chains vmap for free, but the default
matches the reference's single-chain semantics for validation.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import lattice
from fthmc_tpu.config import FlowSpec
from fthmc_tpu.observables import acceptance_rate, topo_susceptibility
from fthmc_tpu.train import sample_and_logq

__all__ = ["mcmc_chain_scan", "make_mcmc_ensemble", "generate_ensemble"]


class ChainHistory(NamedTuple):
    x: jnp.ndarray       # (N, 2, L, L) chain states
    q: jnp.ndarray       # (N,)
    dqsq: jnp.ndarray    # (N,)  (q_t - q_{t-1})^2
    logq: jnp.ndarray    # (N,)
    logp: jnp.ndarray    # (N,)
    acc: jnp.ndarray     # (N,)


@partial(jax.jit, static_argnames=())
def mcmc_chain_scan(key, proposals, logq, logp, x0, logq0, logp0):
    """Serial independence-Metropolis over a pre-generated proposal batch.

    Accept prob = min(1, exp[(logp' - logq') - (logp - logq)]) (reference
    inference.py:97-127). Carry = (x, logq, logp, q); scan over proposals.
    """
    n = proposals.shape[0]
    keys = jax.random.split(key, n)
    q0 = lattice.topo_charge(x0)

    def body(carry, inp):
        x, lq, lp, q = carry
        key, x_new, lq_new, lp_new = inp
        p_acc = jnp.exp((lp_new - lq_new) - (lp - lq))
        u = jax.random.uniform(key, (), p_acc.dtype)
        acc = u < jnp.minimum(p_acc, 1.0)
        x = jnp.where(acc, x_new, x)
        lq = jnp.where(acc, lq_new, lq)
        lp = jnp.where(acc, lp_new, lp)
        q_new = lattice.topo_charge(x)
        out = ChainHistory(x=x, q=q_new, dqsq=(q_new - q) ** 2, logq=lq,
                           logp=lp, acc=acc.astype(x.dtype))
        return (x, lq, lp, q_new), out

    (_, _, _, _), hist = jax.lax.scan(
        body, (x0, logq0, logp0, q0), (keys, proposals, logq, logp))
    return hist


def make_mcmc_ensemble(params, spec: FlowSpec, *, beta: float, L: int,
                       batch_size: int, num_samples: int, key: jax.Array,
                       keep_fields: bool = False) -> dict[str, np.ndarray]:
    """Build a serial Markov chain of `num_samples` flow proposals.

    Proposals come in jitted batches of `batch_size`; the serial chain scans
    each batch on device, carrying the chain state across batches. The first
    proposal is always accepted (chain start; reference inference.py:102-104).

    Returns host numpy history {'q','dqsq','logq','logp','acc'} (+ 'x' if
    keep_fields).
    """
    history: dict[str, list] = {k: [] for k in
                                ("q", "dqsq", "logq", "logp", "acc")}
    if keep_fields:
        history["x"] = []

    carry = None
    remaining = num_samples
    while remaining > 0:
        n = min(batch_size, remaining)
        key, kprop, kchain = jax.random.split(key, 3)
        x, _, logq = sample_and_logq(params, spec, kprop, n, L)
        logp = -lattice.batch_action(x, beta)
        if carry is None:
            # chain starts at the first proposal, accepted by definition
            x0, lq0, lp0 = x[0], logq[0], logp[0]
            hist0 = ChainHistory(
                x=x0[None], q=lattice.topo_charge(x0)[None],
                dqsq=jnp.zeros((1,), x.dtype), logq=lq0[None], logp=lp0[None],
                acc=jnp.ones((1,), x.dtype))
            _append(history, hist0, keep_fields)
            x, logq, logp = x[1:], logq[1:], logp[1:]
            carry = (x0, lq0, lp0)
            remaining -= 1
            if x.shape[0] == 0:
                continue
        hist = mcmc_chain_scan(kchain, x, logq, logp, *carry)
        _append(history, hist, keep_fields)
        carry = (hist.x[-1], hist.logq[-1], hist.logp[-1])
        remaining -= x.shape[0]

    out = {k: np.concatenate([np.atleast_1d(np.asarray(v)) for v in vals])
           for k, vals in history.items() if vals}
    return out


def _append(history, hist: ChainHistory, keep_fields: bool):
    for k in ("q", "dqsq", "logq", "logp", "acc"):
        history[k].append(jax.device_get(getattr(hist, k)))
    if keep_fields:
        history["x"].append(jax.device_get(hist.x))


def generate_ensemble(params, spec: FlowSpec, *, beta: float, L: int,
                      ensemble_size: int = 1024, batch_size: int = 64,
                      nboot: int = 100, binsize: int = 16,
                      key: jax.Array | None = None) -> dict:
    """Flow-sampling evaluation: acceptance + bootstrap chi_Q (reference
    generate_ensemble, samplers.py:80-102)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    history = make_mcmc_ensemble(
        params, spec, beta=beta, L=L, batch_size=batch_size,
        num_samples=ensemble_size, key=key)
    mean, err = topo_susceptibility(history["q"], nboot=nboot,
                                    binsize=binsize)
    return {
        "history": history,
        "accept_rate": acceptance_rate(history["acc"]),
        "suscept_mean": mean,
        "suscept_err": err,
    }
