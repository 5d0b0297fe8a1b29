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


# ---------------------------------------------------------------- sanity


def _healthy_hist(n=400, B=8, seed=0, plaq0=0.91236):
    rng = np.random.default_rng(seed)
    return {
        "acc": (rng.random((n, B)) < 0.8).astype(np.float32),
        "plaq": plaq0 + 0.002 * rng.standard_normal((n, B)),
        "exp_mdh": 1.0 + 0.05 * rng.standard_normal((n, B)),
    }


def test_sanity_report_healthy():
    from fthmc_tpu.diagnostics import sanity_report
    rep = sanity_report(_healthy_hist(), plaq_ref=0.91236)
    assert rep["ok"], rep["flags"]
    assert rep["stats"]["plaq_ref_pull"] < 5


def test_sanity_report_acceptance_collapse():
    # The round-3 session-9 incident class: acc == 0, fields frozen at the
    # ordered start, plaq pinned at 1 (BENCH.md retraction).
    from fthmc_tpu.diagnostics import sanity_report
    h = _healthy_hist()
    h["acc"] = np.zeros_like(h["acc"])
    h["plaq"] = np.ones_like(h["plaq"])
    rep = sanity_report(h, plaq_ref=0.91236)
    assert not rep["ok"]
    assert any(f.startswith("acceptance-collapse") for f in rep["flags"])
    assert any(f.startswith("plaq-mismatch") for f in rep["flags"])


def test_sanity_report_drift():
    from fthmc_tpu.diagnostics import sanity_report
    h = _healthy_hist()
    n = h["plaq"].shape[0]
    # monotone relaxation toward equilibrium across the whole window
    h["plaq"] += np.linspace(0.05, 0.0, n)[:, None]
    rep = sanity_report(h)
    assert any(f.startswith("plaq-drift") for f in rep["flags"])


def test_sanity_report_nonfinite_and_mdh():
    from fthmc_tpu.diagnostics import sanity_report
    h = _healthy_hist()
    h["exp_mdh"] = h["exp_mdh"] + 2.0       # far from 1
    rep = sanity_report(h)
    assert any(f.startswith("exp_mdh-off") for f in rep["flags"])
    h2 = _healthy_hist()
    h2["plaq"][3, 2] = np.nan
    rep2 = sanity_report(h2)
    assert "nonfinite:plaq" in rep2["flags"]


def test_sanity_report_namedtuple_and_single_chain():
    # TrajMetrics-style NamedTuple access + (ntraj,) single-chain arrays
    from collections import namedtuple
    from fthmc_tpu.diagnostics import sanity_report
    H = namedtuple("H", ["acc", "plaq", "exp_mdh"])
    h = _healthy_hist(B=1)
    rep = sanity_report(H(h["acc"][:, 0], h["plaq"][:, 0],
                          h["exp_mdh"][:, 0]))
    assert rep["ok"], rep["flags"]  # single chain: drift/ref checks skip


def test_format_table_dict_rows_and_alignment():
    from fthmc_tpu.utils.logger import format_table
    rows = [{"beta": 6.0, "acc": 0.94521, "who": "plain"},
            {"beta": 8.0, "acc": 0.812, "who": "FT"}]
    out = format_table(rows, title="ladder")
    lines = out.splitlines()
    assert lines[0] == "ladder"
    assert "beta" in lines[2] and "acc" in lines[2] and "who" in lines[2]
    assert "0.9452" in out and "plain" in out      # 4-sig-fig floats
    # all box lines equal width
    widths = {len(l) for l in lines[1:]}
    assert len(widths) == 1


def test_format_table_list_rows_requires_headers():
    import pytest
    from fthmc_tpu.utils.logger import format_table
    assert "x" in format_table([[1, 2]], headers=["x", "y"])
    with pytest.raises(ValueError):
        format_table([[1, 2]])


def test_color_off_for_non_tty(capsys):
    from fthmc_tpu.utils.logger import Logger, supports_color
    log = Logger()
    assert not supports_color(log.stream)           # capsys stream: no tty
    log.log("hello")
    out = capsys.readouterr().out
    assert "\033[" not in out                        # plain fallback
    assert "hello" in out


def test_colorize_respects_enabled_flag():
    from fthmc_tpu.utils.logger import colorize
    assert colorize("x", "red", enabled=False) == "x"
    assert "\033[31m" in colorize("x", "red", enabled=True)


def test_logger_table_prints(capsys):
    from fthmc_tpu.utils.logger import Logger
    Logger().table([{"a": 1.0}], title="T")
    out = capsys.readouterr().out
    assert "T" in out and "| a" in out
