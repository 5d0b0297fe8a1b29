"""Flow-only sampling: independence Metropolis over flow proposals.

Reference parity: fthmc/utils/samplers.py:129-259 + fthmc/utils/inference.py:
34-153 (serial_sample_generator / make_mcmc_ensemble), and generate_ensemble
(samplers.py:80-102) for the topological-susceptibility evaluation.

TPU design (round 3 - beyond the reference, whose chain is inherently
single-chain and host-driven): the ENTIRE ensemble runs as one jitted
program - an outer lax.scan over proposal blocks, an inner lax.scan over the
serial accept/reject chain, and `n_chains` independent chains vectorized
across the batch axis. Each block evaluates the flow once on
(batch * n_chains) fields (one big MXU-friendly call); the chains share
nothing but that proposal-generation batch (each chain consumes its OWN
proposal stream and uniforms, so per-chain detailed balance is untouched).
Cross-chain scatter then gives honest error bars via observables.chain_stats.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import lattice
from fthmc_tpu.config import FlowSpec
from fthmc_tpu.observables import (acceptance_rate, chain_stats,
                                   topo_susceptibility)
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
    """Serial independence-Metropolis over a pre-generated proposal batch
    (single chain; kept for API parity with the reference's
    serial_sample_generator, inference.py:97-127).

    Accept prob = min(1, exp[(logp' - logq') - (logp - logq)]).
    Carry = (x, logq, logp, q); scan over proposals.
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


@partial(jax.jit, static_argnames=("spec", "beta", "L", "nblocks", "batch",
                                   "n_chains", "keep_fields"))
def _ensemble_scan(params, key, spec: FlowSpec, beta: float, L: int,
                   nblocks: int, batch: int, n_chains: int,
                   keep_fields: bool = False):
    """The whole multi-chain ensemble as ONE compiled program.

    Outer scan: nblocks proposal blocks, each one flow evaluation on
    (batch * n_chains) prior draws. Inner scan: the serial chain over the
    batch axis with all n_chains advanced in lockstep (independent
    proposals + uniforms per chain -> independent Markov chains).
    Returns ((x, lq, lp, q) final carry, history dict of
    (nblocks*batch, n_chains[, ...]) arrays, init sample).
    """
    kinit, kscan = jax.random.split(key)
    # chain start: first proposal per chain, accepted by definition
    # (reference inference.py:102-104)
    x0, _, lq0 = sample_and_logq(params, spec, kinit, n_chains, L)
    lp0 = -lattice.batch_action(x0, beta)
    q0 = lattice.batch_charges(x0)

    def block(carry, kb):
        kprop, kacc = jax.random.split(kb)
        xp, _, lqp = sample_and_logq(params, spec, kprop, batch * n_chains, L)
        lpp = -lattice.batch_action(xp, beta)
        # charge of every proposal in ONE vectorized reduction; the serial
        # scan then only SELECTS (post-accept charge = proposal's charge if
        # accepted else the carried one) instead of re-reducing the lattice
        # once per serial step
        qpp = lattice.batch_charges(xp).reshape(batch, n_chains)
        xp = xp.reshape(batch, n_chains, *xp.shape[1:])
        lqp = lqp.reshape(batch, n_chains)
        lpp = lpp.reshape(batch, n_chains)
        us = jax.random.uniform(kacc, (batch, n_chains), lqp.dtype)

        def step(c, inp):
            x, lq, lp, q = c
            xn, lqn, lpn, qpn, u = inp
            p_acc = jnp.exp((lpn - lqn) - (lp - lq))
            acc = u < jnp.minimum(p_acc, 1.0)
            x = jnp.where(acc[:, None, None, None], xn, x)
            lq = jnp.where(acc, lqn, lq)
            lp = jnp.where(acc, lpn, lp)
            qn = jnp.where(acc, qpn, q)
            out = {"q": qn, "dqsq": (qn - q) ** 2, "logq": lq, "logp": lp,
                   "acc": acc.astype(x.dtype)}
            if keep_fields:
                out["x"] = x
            return (x, lq, lp, qn), out

        return jax.lax.scan(step, carry, (xp, lqp, lpp, qpp, us))

    keys = jax.random.split(kscan, nblocks)
    carry, hist = jax.lax.scan(block, (x0, lq0, lp0, q0), keys)
    hist = {k: v.reshape(nblocks * batch, *v.shape[2:])
            for k, v in hist.items()}
    init = {"q": q0, "dqsq": jnp.zeros_like(q0), "logq": lq0, "logp": lp0,
            "acc": jnp.ones_like(q0)}
    if keep_fields:
        init["x"] = x0
    return carry, hist, init


def make_mcmc_ensemble(params, spec: FlowSpec, *, beta: float, L: int,
                       batch_size: int, num_samples: int, key: jax.Array,
                       n_chains: int = 1,
                       keep_fields: bool = False) -> dict[str, np.ndarray]:
    """Independence-Metropolis chains over flow proposals, fully on device.

    `num_samples` samples PER CHAIN (including the always-accepted initial
    proposal), generated in jitted blocks of `batch_size` proposals per
    chain. Returns host numpy history {'q','dqsq','logq','logp','acc'}
    (+ 'x' if keep_fields) with shape (num_samples,) for the default single
    chain (reference semantics, samplers.py:182-259) or (num_samples,
    n_chains) for the vectorized multi-chain ensemble.
    """
    n_prop = num_samples - 1
    nblocks = max(1, -(-n_prop // batch_size))
    _, hist, init = _ensemble_scan(params, key, spec, beta, L, nblocks,
                                   batch_size, n_chains, keep_fields)
    out = {}
    for k, v in hist.items():
        v = np.asarray(jax.device_get(v))[:n_prop]
        v0 = np.asarray(jax.device_get(init[k]))[None]
        v = np.concatenate([v0, v], axis=0)
        if n_chains == 1:
            v = v[:, 0]
        out[k] = v
    return out


def generate_ensemble(params, spec: FlowSpec, *, beta: float, L: int,
                      ensemble_size: int = 1024, batch_size: int = 64,
                      nboot: int = 100, binsize: int = 16,
                      n_chains: int = 1,
                      key: jax.Array | None = None) -> dict:
    """Flow-sampling evaluation: acceptance + chi_Q (reference
    generate_ensemble, samplers.py:80-102).

    n_chains=1 reproduces the reference's single serial chain with its
    binned-bootstrap chi_Q error; n_chains>1 runs `ensemble_size` samples
    PER CHAIN and reports cross-chain errors (observables.chain_stats) plus
    tau_int of the chain - strictly more information at the same device
    cost per sample.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    history = make_mcmc_ensemble(
        params, spec, beta=beta, L=L, batch_size=batch_size,
        num_samples=ensemble_size, key=key, n_chains=n_chains)
    out = {
        "history": history,
        "accept_rate": acceptance_rate(history["acc"]),
    }
    if n_chains == 1:
        mean, err = topo_susceptibility(history["q"], nboot=nboot,
                                        binsize=binsize)
        out.update(suscept_mean=mean, suscept_err=err)
    else:
        cs = chain_stats(history["q"], n_boot=max(nboot, 100))
        out.update(suscept_mean=cs["chi_q"], suscept_err=cs["chi_q_err"],
                   tau_int_q=cs["tau_int_q"],
                   tau_int_q_err=cs["tau_int_q_err"], chain_stats=cs)
    return out
