"""Checkpoint / resume with orbax.

Reference parity: fthmc/utils/io.py:74-219 (save_checkpoint/load_checkpoint/
find_and_load_checkpoint: torch .tar of {era, epoch, model_state_dict,
optimizer_state_dict, history}, newest-by-mtime discovery) and
train.py:77-92 (restore_model_from_checkpoint).

Here a checkpoint is an orbax StandardCheckpointer save of the full
TrainState (params + opt_state + RNG key + step + scheduler state) plus
metadata {era, epoch, flow_spec, train_config}; discovery is the same
newest-wins rule over per-era directories. meta.json / history.npz sidecars
live NEXT TO the orbax directory (ckpt_...meta.json), never inside it -
orbax owns its directory contents and foreign files are not guaranteed to
survive upgrades.

Checkpoints are SELF-DESCRIBING (beyond the reference, whose .tar stores
only state dicts and so silently restores into whatever architecture the
caller rebuilt, io.py:114-172): save_checkpoint records the full FlowSpec +
TrainConfig in meta.json, and load_checkpoint_auto reconstructs the exact
flow (family, mixture size, hidden widths, s_clip, grad_clip - everything
that defines WHICH flow the params are) from the checkpoint alone.
"""
from __future__ import annotations

import dataclasses
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

__all__ = ["save_checkpoint", "load_checkpoint", "load_checkpoint_auto",
           "latest_checkpoint", "find_and_load_checkpoint",
           "spec_from_meta", "train_config_from_meta",
           "save_history", "load_history"]

_CKPT_RE = re.compile(r"ckpt_era(\d+)_epoch(\d+)$")


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))


def save_checkpoint(outdir: str, state, *, era: int, epoch: int,
                    history: dict | None = None,
                    train_cfg=None, spec=None) -> str:
    """Save state under outdir/ckpt_era{era}_epoch{epoch}. Returns the path.
    (reference io.py:114-172; history rides along like the reference's
    checkpoint['history'])

    `train_cfg` (TrainConfig) / `spec` (FlowSpec) make the checkpoint
    self-describing: load_checkpoint_auto restores it with no caller-side
    template. Passing train_cfg implies its .flow as the spec.
    """
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
    meta: dict = {"era": era, "epoch": epoch}
    if train_cfg is not None and spec is None:
        spec = train_cfg.flow
    if spec is not None:
        meta["flow_spec"] = dataclasses.asdict(spec)
    if train_cfg is not None:
        meta["train_config"] = dataclasses.asdict(train_cfg)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)
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
    return state, read_meta(path)


def read_meta(path: str) -> dict:
    """Checkpoint metadata: the sidecar first, then the legacy
    inside-the-dir location."""
    for meta_path in (path + ".meta.json", os.path.join(path, "meta.json")):
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                return json.load(f)
    return {}


def spec_from_meta(meta: dict):
    """FlowSpec recorded in checkpoint metadata, or None (legacy/foreign
    checkpoints)."""
    fs = meta.get("flow_spec")
    if not fs:
        return None
    from fthmc_tpu.config import FlowSpec, filter_kwargs
    return FlowSpec(**filter_kwargs(FlowSpec, fs))


def train_config_from_meta(meta: dict, spec=None):
    """TrainConfig recorded in checkpoint metadata (flow replaced by `spec`
    when given), or None."""
    tc = meta.get("train_config")
    if tc is None and spec is None:
        return None
    from fthmc_tpu.config import FlowSpec, TrainConfig, filter_kwargs
    kw = {k: v for k, v in filter_kwargs(TrainConfig, tc or {}).items()
          if k != "flow"}
    if spec is None:
        spec = FlowSpec(**filter_kwargs(FlowSpec, (tc or {}).get("flow", {})))
    return TrainConfig(flow=spec, **kw)


def resolve_checkpoint_dir(path: str) -> str | None:
    """`path` may be a checkpoints/ parent (newest ckpt_era* wins) or a bare
    checkpoint directory. Returns the concrete checkpoint dir or None."""
    latest = latest_checkpoint(path)
    if latest is not None:
        return latest
    if os.path.isdir(path) and _looks_like_checkpoint(path):
        return os.path.abspath(path)
    return None


def load_checkpoint_auto(path: str, spec_overrides: dict | None = None):
    """Restore a SELF-DESCRIBING checkpoint: rebuild the exact TrainState
    (flow family/widths/s_clip + optimizer structure incl. grad_clip) from
    the FlowSpec/TrainConfig stored in meta.json, with no caller-side
    template. `path` as in resolve_checkpoint_dir.

    `spec_overrides`: explicit field overrides ({'s_clip': 2.0, ...}) applied
    on top of the stored spec - CLI flags beat metadata, metadata beats
    defaults. Returns (state, meta, spec, train_cfg), or None when the
    checkpoint isn't found or has no flow_spec metadata (legacy checkpoints:
    fall back to template-based load_checkpoint).
    """
    ckpt = resolve_checkpoint_dir(path)
    if ckpt is None:
        return None
    meta = read_meta(ckpt)
    spec = spec_from_meta(meta)
    if spec is None:
        return None
    if spec_overrides:
        spec = dataclasses.replace(spec, **spec_overrides)
    cfg = train_config_from_meta(meta, spec)
    from fthmc_tpu.train import init_train_state
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    state, _ = load_checkpoint(ckpt, state)
    return state, meta, spec, cfg


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


def _looks_like_checkpoint(path: str) -> bool:
    """True when `path` itself is a checkpoint directory (orbax metadata
    markers, or the no-orbax fallback's leaves.npz)."""
    return any(os.path.exists(os.path.join(path, m))
               for m in ("_METADATA", "_CHECKPOINT_METADATA", "leaves.npz"))


def find_and_load_checkpoint(outdir: str, target):
    """Discover + restore the newest checkpoint, or None.
    (reference io.py:96-111 + train.py:77-92)

    `outdir` may be a checkpoints/ parent with ckpt_era* subdirectories or
    itself a bare checkpoint directory (e.g. an artifacts/ entry) - so CLI
    --ckpt accepts both. Only directories that actually look like
    checkpoints are attempted, and load errors (corrupt data, template/spec
    mismatch) PROPAGATE instead of being swallowed into 'not found'."""
    path = resolve_checkpoint_dir(outdir)
    if path is None:
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
