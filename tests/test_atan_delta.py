"""Pure-function tests for the kernel math helpers in ops/pallas_coupling:
the polynomial _atan (Mosaic has no atan lowering) and the atan2-free
delta-form tan transform. These run as plain jnp functions (no pallas_call),
so they are fast and exercise exactly the code the kernels trace."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu.models.coupling import tan_transform, wrap_pi
from fthmc_tpu.ops.pallas_coupling import _atan, tan_transform_delta

PI = math.pi


def test_atan_accuracy_fp64():
    with jax.enable_x64():
        u = jnp.concatenate([
            jnp.linspace(-50.0, 50.0, 20001, dtype=jnp.float64),
            jnp.array([0.0, 1.0, -1.0, 1e-12, -1e-12, 1e12, -1e12],
                      dtype=jnp.float64),
        ])
        err = np.abs(np.asarray(_atan(u)) - np.arctan(np.asarray(u)))
        assert err.max() < 5e-11, err.max()


def test_atan_handles_infinities():
    out = np.asarray(_atan(jnp.array([np.inf, -np.inf], jnp.float32)))
    np.testing.assert_allclose(out, [np.pi / 2, -np.pi / 2], rtol=1e-6)


def test_delta_form_matches_tan_transform():
    """y + delta(y) must equal the wrapped mixture transform h_s(y)
    (models/coupling.tan_transform) for all y in (-pi, pi) and a wide
    range of log-scales, including the +-30 hard-clip region."""
    with jax.enable_x64():
        y = jnp.linspace(-PI + 1e-9, PI - 1e-9, 4001, dtype=jnp.float64)
        for s_val in [-30.0, -5.0, -1.0, 0.0, 1e-6, 1.0, 3.0, 10.0, 30.0]:
            s = jnp.full_like(y, s_val)
            h_ref = np.asarray(tan_transform(y, s))
            h_new = np.asarray(wrap_pi(y + tan_transform_delta(
                y, jnp.exp(jnp.clip(s, -30.0, 30.0)))))
            d = np.abs(np.asarray(wrap_pi(jnp.asarray(h_new - h_ref))))
            assert d.max() < 1e-9, (s_val, d.max())
