"""Diagnostics / plotting / logger / profiling utility tests."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import lattice
from fthmc_tpu.diagnostics import (leapfrog_with_diagnostics,
                                   reversibility_error, summarize_step_info)
from fthmc_tpu.hmc import leapfrog
from fthmc_tpu.utils.logger import Logger, MetricsWriter, format_metrics
from fthmc_tpu.utils.profiling import Timer


def test_leapfrog_with_diagnostics_matches_plain():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 2, 8, 8),
                           jnp.float32, -3.0, 3.0)
    v = jax.random.normal(jax.random.PRNGKey(1), x.shape, x.dtype)
    beta = 2.0
    force_fn = lambda y: lattice.batch_force(y, beta)
    action_fn = lambda y: lattice.batch_action(y, beta)
    x1, v1, info = leapfrog_with_diagnostics(x, v, 0.1, 6, force_fn,
                                             action_fn)
    x2, v2 = leapfrog(x, v, 0.1, 6, force_fn)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
    assert info.force_norm.shape == (6, 2)
    assert np.all(np.isfinite(np.asarray(info.mom_overlap)))
    summary = summarize_step_info(info)
    assert summary["rms_force"] > 0
    assert -1.01 <= summary["final_mom_overlap"] <= 1.01


def test_reversibility_error_small():
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 2, 8, 8),
                           jnp.float32, -3.0, 3.0)
    v = jax.random.normal(jax.random.PRNGKey(3), x.shape, x.dtype)
    err = reversibility_error(x, v, 0.1, 10,
                              lambda y: lattice.batch_force(y, 2.0))
    assert err < 1e-3


def test_metrics_writer_and_format(tmp_path):
    path = os.path.join(str(tmp_path), "m.jsonl")
    with MetricsWriter(path) as w:
        w.write(1, {"loss": 0.5, "ess": np.asarray([0.1, 0.3])},
                prefix="training")
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1
    assert abs(lines[0]["training/ess"] - 0.2) < 1e-9
    s = format_metrics({"a": 1.23456, "b": np.asarray([2.0, 4.0])})
    assert "a=1.235" in s and "b=3" in s


def test_plotting_headless(tmp_path):
    from fthmc_tpu.utils.plotting import (plot_action_logq_regression,
                                          plot_history)
    hist = {"plaq": np.random.rand(50, 3), "acc": np.random.rand(50)}
    out = plot_history(hist, outdir=str(tmp_path))
    assert os.path.exists(out["plaq"]) and os.path.exists(out["acc"])
    S = np.random.randn(100) * 2 + 5
    slope, intercept, fname = plot_action_logq_regression(
        S, -(S + np.random.randn(100) * 0.1), outdir=str(tmp_path))
    assert abs(slope - 1.0) < 0.2
    assert os.path.exists(fname)


def test_timer():
    t = Timer()
    r = t.tick(10)
    assert r > 0


def test_logger_prints(capsys):
    log = Logger()
    log.rule("hello")
    log.print_metrics({"x": 1.0})
    out = capsys.readouterr().out
    assert "hello" in out and "x=1" in out


def test_moving_average():
    from fthmc_tpu.utils.plotting import moving_average
    x = np.arange(10.0)
    y = moving_average(x, window=3)
    assert len(y) == 8 and abs(y[0] - 1.0) < 1e-12   # mean(0,1,2)
    # shorter-than-window passes through
    assert np.array_equal(moving_average(x[:2], window=5), x[:2])


def test_live_joint_plot_headless(tmp_path):
    """Live loss/ESS monitor (reference plot_helpers.py:287-343,:444-481):
    headless fallback saves a PNG per update throttle."""
    from fthmc_tpu.utils.plotting import LiveJointPlot
    lp = LiveJointPlot(outdir=str(tmp_path), save_every=2)
    loss, ess = [], []
    for i in range(6):
        loss.append(1.0 / (i + 1))
        ess.append(0.1 * (i + 1))
        lp.update(loss, ess)
    fname = os.path.join(str(tmp_path), "live_training.png")
    assert os.path.exists(fname)
    # 2D (chain-axis) histories are averaged, longer series still render
    lp.update(np.tile(np.asarray(loss)[:, None], (1, 4)), ess)
    lp.close()
