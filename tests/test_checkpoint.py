"""Checkpoint save/restore round-trip tests."""
import os
import time

import jax
import numpy as np
import pytest

from fthmc_tpu.checkpoint import (find_and_load_checkpoint, latest_checkpoint,
                                  load_checkpoint, load_checkpoint_auto,
                                  load_history, save_checkpoint)
from fthmc_tpu.config import FlowSpec, TrainConfig
from fthmc_tpu.train import init_train_state


def _state(spec):
    cfg = TrainConfig(L=8, beta=2.0, flow=spec, seed=0)
    return init_train_state(jax.random.PRNGKey(0), cfg)


def test_checkpoint_roundtrip(tmp_path, spec2):
    state = _state(spec2)
    path = save_checkpoint(str(tmp_path), state, era=0, epoch=9,
                           history={"loss": [1.0, 0.5]})
    assert os.path.isdir(path)
    target = _state(spec2)
    restored, meta = load_checkpoint(path, target)
    assert meta == {"era": 0, "epoch": 9}
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
    # history rides as a SIDECAR next to the orbax dir (orbax owns its
    # directory contents; foreign files inside it are not upgrade-safe)
    hist = load_history(path + ".history.npz")
    np.testing.assert_allclose(hist["loss"], [1.0, 0.5])


def test_latest_checkpoint_discovery(tmp_path, spec2):
    state = _state(spec2)
    p0 = save_checkpoint(str(tmp_path), state, era=0, epoch=1)
    time.sleep(0.05)
    p1 = save_checkpoint(str(tmp_path), state, era=1, epoch=1)
    assert latest_checkpoint(str(tmp_path)) == p1
    out = find_and_load_checkpoint(str(tmp_path), _state(spec2))
    assert out is not None
    _, meta = out
    assert meta["era"] == 1


def test_find_in_empty_dir(tmp_path, spec2):
    assert find_and_load_checkpoint(str(tmp_path), None) is None


def test_self_describing_roundtrip(tmp_path):
    """A checkpoint saved with train_cfg restores with NO caller template:
    the exact FlowSpec (family/widths/s_clip) and the optimizer structure
    (grad_clip) come back from meta.json alone."""
    spec = FlowSpec(n_layers=2, coupling="rncp", n_mixture=3,
                    hidden_sizes=(4,), s_clip=2.5)
    cfg = TrainConfig(L=8, beta=3.0, flow=spec, grad_clip=1.0, seed=0)
    state = init_train_state(jax.random.PRNGKey(1), cfg)
    save_checkpoint(str(tmp_path), state, era=4, epoch=7, train_cfg=cfg)

    out = load_checkpoint_auto(str(tmp_path))
    assert out is not None
    restored, meta, rspec, rcfg = out
    assert rspec == spec            # the WHOLE spec survives the round-trip
    assert rcfg.grad_clip == cfg.grad_clip and rcfg.beta == cfg.beta
    assert meta["era"] == 4
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt_state structure restored too (grad_clip changes the optax tree)
    assert (jax.tree_util.tree_structure(restored.opt_state)
            == jax.tree_util.tree_structure(state.opt_state))

    # spec overrides: explicit flags beat metadata
    out2 = load_checkpoint_auto(str(tmp_path),
                                spec_overrides={"s_clip": 1.0})
    assert out2[2].s_clip == 1.0 and out2[2].coupling == "rncp"


def test_auto_restore_bare_dir_and_legacy(tmp_path, spec2):
    state = _state(spec2)
    # legacy checkpoint (no spec metadata) -> auto restore declines
    p = save_checkpoint(str(tmp_path / "legacy"), state, era=0, epoch=1)
    assert load_checkpoint_auto(p) is None
    # bare checkpoint dir (no ckpt_era* parent) with metadata -> works
    cfg = TrainConfig(L=8, beta=2.0, flow=spec2, seed=0)
    p2 = save_checkpoint(str(tmp_path / "new"), state, era=1, epoch=1,
                         train_cfg=cfg)
    out = load_checkpoint_auto(p2)
    assert out is not None and out[2] == spec2


def test_corrupt_checkpoint_raises(tmp_path, spec2):
    """A dir that looks like a checkpoint but fails to load must RAISE, not
    be silently reported as 'not found' (round-2 advisor finding)."""
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "_METADATA").write_text("{}")
    with pytest.raises(Exception):
        find_and_load_checkpoint(str(bad), _state(spec2))
    # while a dir that does NOT look like a checkpoint is just 'not found'
    assert find_and_load_checkpoint(str(tmp_path / "plain"), None) is None
