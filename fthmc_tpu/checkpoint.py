"""Checkpoint / resume with orbax.

Reference parity: fthmc/utils/io.py:74-219 (save_checkpoint/load_checkpoint/
find_and_load_checkpoint: torch .tar of {era, epoch, model_state_dict,
optimizer_state_dict, history}, newest-by-mtime discovery) and
train.py:77-92 (restore_model_from_checkpoint).

Here a checkpoint is an orbax StandardCheckpointer save of the full
TrainState (params + opt_state + RNG key + step + scheduler state) plus
metadata {era, epoch}; discovery is the same newest-wins rule over per-era
directories. meta.json / history.npz sidecars live NEXT TO the orbax
directory (ckpt_...meta.json), never inside it - orbax owns its directory
contents and foreign files are not guaranteed to survive upgrades.
"""
from __future__ import annotations

import json
import os
import re

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint",
           "find_and_load_checkpoint", "save_history", "load_history"]

_CKPT_RE = re.compile(r"ckpt_era(\d+)_epoch(\d+)$")


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))


def save_checkpoint(outdir: str, state, *, era: int, epoch: int,
                    history: dict | None = None) -> str:
    """Save state under outdir/ckpt_era{era}_epoch{epoch}. Returns the path.
    (reference io.py:114-172; history rides along like the reference's
    checkpoint['history'])"""
    os.makedirs(outdir, exist_ok=True)
    path = os.path.abspath(os.path.join(outdir, f"ckpt_era{era}_epoch{epoch}"))
    tree = _to_host(state)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
    else:  # pragma: no cover - orbax is baked into the image
        os.makedirs(path, exist_ok=True)
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        np.savez(os.path.join(path, "leaves.npz"),
                 **{str(i): l for i, l in enumerate(leaves)})
    with open(path + ".meta.json", "w") as f:
        json.dump({"era": era, "epoch": epoch}, f)
    if history is not None:
        save_history(history, path + ".history.npz")
    return path


def load_checkpoint(path: str, target):
    """Restore a checkpoint into the structure of `target` (a template
    TrainState with correctly-shaped arrays). Returns (state, meta)."""
    path = os.path.abspath(path)  # orbax requires absolute paths
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        tree = ckptr.restore(path, _to_host(target))
    else:  # pragma: no cover
        data = np.load(os.path.join(path, "leaves.npz"))
        leaves = [data[str(i)] for i in range(len(data.files))]
        tree = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(target), leaves)
    state = jax.tree_util.tree_map(
        lambda t, v: jax.numpy.asarray(v, getattr(t, "dtype", None)),
        target, tree)
    meta = {}
    # sidecar first; fall back to the legacy inside-the-dir location
    for meta_path in (path + ".meta.json", os.path.join(path, "meta.json")):
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            break
    return state, meta


def latest_checkpoint(outdir: str) -> str | None:
    """Newest checkpoint dir by mtime (reference io.py:96-111 newest-wins;
    ties broken by (era, epoch))."""
    if not os.path.isdir(outdir):
        return None
    cands = []
    for name in os.listdir(outdir):
        m = _CKPT_RE.match(name)
        full = os.path.join(outdir, name)
        if m and os.path.isdir(full):
            cands.append((os.path.getmtime(full), int(m.group(1)),
                          int(m.group(2)), full))
    if not cands:
        return None
    return max(cands)[-1]


def find_and_load_checkpoint(outdir: str, target):
    """Discover + restore the newest checkpoint, or None.
    (reference io.py:96-111 + train.py:77-92)

    If `outdir` contains no ckpt_era* subdirectories but is itself a
    checkpoint directory (e.g. an artifacts/ entry saved directly by
    save_checkpoint), restore it directly - so CLI --ckpt accepts both a
    checkpoints/ parent and a bare checkpoint path."""
    path = latest_checkpoint(outdir)
    if path is None:
        if os.path.isdir(outdir):
            try:
                return load_checkpoint(outdir, target)
            except Exception:
                return None
        return None
    return load_checkpoint(path, target)


def save_history(history: dict, path: str):
    """Persist a metrics history dict as compressed npz (the reference uses
    joblib .z files, io.py:74-84; npz is the numpy-native equivalent)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path, **{k: np.asarray(v) for k, v in history.items()})


def load_history(path: str) -> dict:
    data = np.load(path, allow_pickle=False)
    return {k: data[k] for k in data.files}
