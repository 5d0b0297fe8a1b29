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
