"""Resumable scan rows (experiments/schwinger_mts_scan.py, round-5): the
axon worker dies silently under sustained load, so each row persists
chain state + timed histories per call-block and a rerun RESUMES (zero
device blocks for completed rows) instead of restarting. Subprocess-level
test: same CLI surface the queue stages use."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCAN = os.path.join(REPO, "experiments", "schwinger_mts_scan.py")


def _run(out, extra=()):
    cmd = [sys.executable, SCAN, "--platform", "cpu", "--out", str(out),
           "--L", "8", "--beta", "2", "--mass", "0.3", "--chains", "4",
           "--ntraj", "8", "--therm", "4", "--call-block", "4",
           "--cg-maxiter", "200", "--row", "plain:4:0:tau=1.0",
           *extra]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)     # --platform cpu does the override
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=420, cwd=REPO)


@pytest.mark.slow
def test_scan_rerun_resumes_and_reproduces(tmp_path):
    out = tmp_path / "scan"
    r1 = _run(out)
    assert r1.returncode == 0, r1.stderr[-2000:]
    doc1 = json.load(open(out / "scan.json"))
    assert doc1["rows"][0]["ntraj_timed"] == 8
    # a state file was persisted for the row
    states = [f for f in os.listdir(out) if f.startswith("row0_")]
    assert len(states) == 1

    r2 = _run(out)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "RESUME" in r2.stdout
    doc2 = json.load(open(out / "scan.json"))
    # identical physics numbers: the rerun reduced the persisted
    # histories without advancing the chain
    for k in ("acc", "plaq", "q_mobility", "n_events", "ntraj_timed"):
        assert doc1["rows"][0][k] == doc2["rows"][0][k]


@pytest.mark.slow
def test_scan_no_row_persist_opt_out(tmp_path):
    out = tmp_path / "scan"
    r = _run(out, extra=("--no-row-persist",))
    assert r.returncode == 0, r.stderr[-2000:]
    assert not [f for f in os.listdir(out) if f.startswith("row0_")]
