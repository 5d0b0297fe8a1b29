"""CLI parser + config-system tests (no device work)."""
import json
import os

from fthmc_tpu.cli import build_parser
from fthmc_tpu.config import (FlowSpec, load_json_configs, make_configs)


def test_parser_subcommands():
    p = build_parser()
    a = p.parse_args(["hmc", "--beta", "3.0", "--L", "16", "--ntraj", "10"])
    assert a.beta == 3.0 and a.L == 16 and a.ntraj == 10
    a = p.parse_args(["train", "--n-layers", "8", "--hidden", "4", "4"])
    assert a.n_layers == 8 and a.hidden == [4, 4]
    a = p.parse_args(["fthmc", "--nstep", "32"])
    assert a.nstep == 32
    a = p.parse_args(["pipeline", "--transfer-epochs", "0"])
    assert a.transfer_epochs == 0
    a = p.parse_args(["bench", "--which", "all"])
    assert a.which == "all"


def test_parser_restore_mode_flow_flags_default_none():
    """sample/fthmc/pipeline default flow flags to None so a
    self-describing --ckpt's stored spec wins; train keeps real defaults."""
    p = build_parser()
    a = p.parse_args(["fthmc", "--ckpt", "x"])
    assert a.n_layers is None and a.hidden is None and a.coupling is None
    a = p.parse_args(["fthmc", "--coupling", "rncp"])
    assert a.coupling == "rncp"
    a = p.parse_args(["train"])
    assert a.n_layers == 24 and a.coupling == "ncp"
    a = p.parse_args(["pipeline", "--mode", "highbeta", "--beta", "6"])
    assert a.mode == "highbeta" and a.flow_beta == 3.0


def test_cli_spec_overrides_layering():
    import argparse
    from fthmc_tpu.cli import _cli_spec_overrides, _flow_spec
    ns = argparse.Namespace(n_layers=None, n_mixture=None, hidden=None,
                            kernel=None, activation=None, coupling="rncp",
                            n_knots=None, s_clip=-1.0, conv_dtype=None)
    ov = _cli_spec_overrides(ns)
    assert ov == {"coupling": "rncp", "s_clip": None}
    base = FlowSpec(n_layers=24, coupling="ncp", s_clip=3.0)
    spec = _flow_spec(ns, base)
    assert spec.coupling == "rncp" and spec.s_clip is None  # -1 clears
    assert spec.n_layers == 24                              # base preserved


def test_pipeline_highbeta_smoke(tmp_path):
    """--mode highbeta end-to-end on CPU with a toy flow: train -> FT-HMC
    at the target beta -> plain baseline -> head-to-head stats."""
    from fthmc_tpu.cli import main
    out = main(["pipeline", "--mode", "highbeta", "--L", "8", "--beta",
                "2.0", "--flow-beta", "2.0", "--flow-L", "8",
                "--n-layers", "2", "--hidden", "4", "--n-mixture", "2",
                "--train-steps", "4", "--flow-batch", "4",
                "--ntraj", "8", "--ft-nstep", "4", "--ft-chains", "2",
                "--plain-ntraj", "16", "--plain-nstep", "4",
                "--plain-chains", "2", "--start", "hot",
                "--outdir", str(tmp_path)])
    assert "fthmc" in out and "hmc" in out
    assert 0.0 <= out["fthmc"]["acc"] <= 1.0
    assert "tau_int_q_err" in out["hmc"]
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "pipeline_results.json"))
    # the trained flow checkpoint is self-describing
    from fthmc_tpu.checkpoint import load_checkpoint_auto
    found = load_checkpoint_auto(
        os.path.join(str(tmp_path), "flow", "checkpoints"))
    assert found is not None and found[2].coupling == "rncp"


def test_json_config_roundtrip(tmp_path):
    raw = {
        "L": 16, "beta": 3.0,
        "hmc": {"tau": 1.0, "nstep": 20, "ntraj": 64},
        "train": {"n_era": 2, "n_epoch": 5, "n_layers": 8,
                  "n_s_nets": 3, "activation_fn": "relu",
                  "hidden_sizes": [4, 4]},
        "fthmc": {"tau": 0.5, "nstep": 16},
        "scheduler": {"factor": 0.7, "patience": 3},
    }
    path = os.path.join(str(tmp_path), "c.json")
    with open(path, "w") as f:
        json.dump(raw, f)
    hmc, train, lf, sched = load_json_configs(path)
    assert hmc.L == 16 and hmc.beta == 3.0 and hmc.nstep == 20
    assert train.n_era == 2 and train.flow.n_layers == 8
    assert train.flow.n_mixture == 3         # reference spelling n_s_nets
    assert train.flow.activation == "relu"   # reference spelling activation_fn
    assert lf.tau == 0.5 and lf.nstep == 16
    assert sched.factor == 0.7 and sched.patience == 3


def test_repo_example_config():
    hmc, train, lf, sched = load_json_configs("configs/example.json")
    assert hmc.ntraj == 1024
    assert train.flow == FlowSpec(n_layers=16, n_mixture=2,
                                  hidden_sizes=(8, 8), kernel_size=3,
                                  activation="silu")
    assert lf.nstep == 64 and sched is not None


def test_flat_config_routing():
    hmc, train, lf, _ = make_configs({"L": 4, "beta": 1.5, "tau": 3.0})
    assert hmc.L == train.L == 4
    assert hmc.beta == train.beta == 1.5
    assert lf.tau == 3.0


def test_parser_schwinger():
    p = build_parser()
    a = p.parse_args(["schwinger", "--beta", "4.0", "--mass", "0.2",
                      "--nstep", "12", "--cg-backend", "mixed"])
    assert a.beta == 4.0 and a.mass == 0.2 and a.nstep == 12
    assert a.integrator == "omelyan" and not a.no_warm_start
    assert a.cg_backend == "mixed"


def test_cli_schwinger_smoke(tmp_path):
    """Plain dynamical HMC end-to-end through the CLI on CPU (tiny)."""
    from fthmc_tpu.cli import main
    out = main(["schwinger", "--L", "4", "--beta", "2.0", "--mass", "0.4",
                "--ntraj", "4", "--chains", "2", "--nstep", "4",
                "--block", "4", "--outdir", str(tmp_path)])
    assert 0.0 <= out["acc"] <= 1.0
    assert abs(out["exp_mdh"] - 1.0) < 0.5
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "schwinger_history.npz"))


def test_cli_schwinger_state_resume(tmp_path):
    """--state runs through the resilient runner and a re-invocation
    resumes at the persisted block instead of restarting."""
    import numpy as np

    from fthmc_tpu.cli import main
    sp = str(tmp_path / "run_state.npz")
    argv = ["schwinger", "--L", "4", "--beta", "2.0", "--mass", "0.4",
            "--chains", "2", "--nstep", "4", "--block", "4",
            "--state", sp]
    main(argv + ["--ntraj", "4"])
    data = np.load(sp)
    assert int(data["done"]) == 4
    out = main(argv + ["--ntraj", "8", "--outdir", str(tmp_path)])
    data = np.load(sp)
    assert int(data["done"]) == 8
    assert data["acc"].shape == (8, 2)
    assert 0.0 <= out["acc"] <= 1.0
    # --state + --devices is an explicit error, not a silent pick
    import pytest
    with pytest.raises(SystemExit):
        main(argv + ["--ntraj", "4", "--devices", "2"])


def test_cli_schwinger_state_ft(tmp_path):
    """FT-HMC --state path (self-describing tiny checkpoint)."""
    import jax
    import numpy as np

    from fthmc_tpu.checkpoint import save_checkpoint
    from fthmc_tpu.cli import main
    from fthmc_tpu.config import FlowSpec, TrainConfig
    from fthmc_tpu.train import init_train_state
    spec = FlowSpec(n_layers=2, n_mixture=2, hidden_sizes=(4,))
    cfg = TrainConfig(L=4, beta=2.0, flow=spec)
    st = init_train_state(jax.random.PRNGKey(0), cfg)
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, st, era=0, epoch=0, spec=spec)
    sp = str(tmp_path / "ft_state.npz")
    out = main(["schwinger", "--L", "4", "--beta", "2.0", "--mass", "0.4",
                "--ntraj", "4", "--chains", "2", "--nstep", "4",
                "--block", "2", "--state", sp, "--ckpt", ck])
    data = np.load(sp)
    assert int(data["done"]) == 4
    assert abs(out["exp_mdh"] - 1.0) < 0.5


def test_cli_schwinger_devices_smoke(tmp_path):
    """--devices wires the sharded chunked dynamical drivers (round-3
    review finding: it used to be silently ignored)."""
    from fthmc_tpu.cli import main
    out = main(["schwinger", "--L", "4", "--beta", "2.0", "--mass", "0.4",
                "--ntraj", "4", "--chains", "8", "--nstep", "4",
                "--block", "2", "--devices", "4", "--outdir", str(tmp_path)])
    assert 0.0 <= out["acc"] <= 1.0
    assert abs(out["exp_mdh"] - 1.0) < 0.5


def test_cli_queue_status(tmp_path, capsys):
    import json
    from fthmc_tpu import cli
    qf = tmp_path / "q.json"
    qf.write_text(json.dumps({
        "marker_dir": str(tmp_path / "m"),
        "stages": [{"name": "s1", "cmd": ["true"]}]}))
    res = cli.main(["queue", "--queue", str(qf), "--status"])
    assert res == {"s1": "pending"}
