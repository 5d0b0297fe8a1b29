"""Checkpoint save/restore round-trip tests."""
import os
import time

import jax
import numpy as np

from fthmc_tpu.checkpoint import (find_and_load_checkpoint, latest_checkpoint,
                                  load_checkpoint, load_history,
                                  save_checkpoint)
from fthmc_tpu.config import TrainConfig
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
