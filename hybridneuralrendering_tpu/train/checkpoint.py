"""Checkpoint / resume.

One orbax checkpoint per save holds {params, points, optimizer states, step,
best_psnr} — the TPU-native analog of the reference's per-network .pth files
where the `ray_marching` file *contains the whole neural point cloud*
(/root/reference/models/base_model.py:91-125; SURVEY §5).  Unlike the
reference, optimizer moments ARE checkpointed; grow/prune still reset them
explicitly (train/state.reset_optimizers) to preserve its semantics.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from hybridneuralrendering_tpu.train.state import TrainState


import dataclasses as _dc


def _flatten(tree, prefix=""):
    out = {}
    if tree is None:  # optional fields (e.g. NeuralPoints.rw2c outside edit)
        return out
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)) and not hasattr(tree, "_fields"):
        items = enumerate(tree)
    elif hasattr(tree, "_fields"):  # NamedTuple
        items = zip(tree._fields, tree)
    elif _dc.is_dataclass(tree):   # e.g. NeuralPoints (array fields only;
        # static metadata is carried by the load template, not the file)
        items = [(f.name, getattr(tree, f.name)) for f in _dc.fields(tree)
                 if not isinstance(getattr(tree, f.name),
                                   (bool, int, float, str, tuple))]
    else:
        from hybridneuralrendering_tpu.parallel.distributed import \
            host_local_array
        out[prefix.rstrip("/")] = host_local_array(tree)
        return out
    for k, v in items:
        out.update(_flatten(v, f"{prefix}{k}/"))
    return out


def save_checkpoint(ckpt_dir: str, state: TrainState,
                    best_psnr: float = 0.0) -> str:
    """Write `<dir>/<step>_state.npz` (flat pytree) — robust, dependency-light
    (orbax is available but npz keeps checkpoints greppable and fast for
    per-scene sizes ~100-400MB)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step)
    flat = _flatten(state._asdict())
    flat["__best_psnr__"] = np.asarray(best_psnr)
    path = os.path.join(ckpt_dir, f"{step}_state.npz")
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **flat)
    os.replace(tmp, path)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Newest checkpoint by integer step prefix (reference get_latest_epoch,
    run/train_ft.py:584-588)."""
    if not os.path.isdir(ckpt_dir):
        return None
    cands = []
    for f in os.listdir(ckpt_dir):
        if f.endswith("_state.npz"):
            try:
                cands.append((int(f.split("_")[0]), f))
            except ValueError:
                continue
    if not cands:
        return None
    return os.path.join(ckpt_dir, max(cands)[1])


def load_checkpoint(path: str, template: TrainState
                    ) -> Tuple[TrainState, float]:
    """Restore into the template's pytree structure (shapes must match —
    capacity-bucketed points keep them stable across grow/prune)."""
    data = np.load(path)
    best = float(data["__best_psnr__"]) if "__best_psnr__" in data else 0.0

    def leaf(key, tmpl=None):
        if key in data:
            return jax.numpy.asarray(data[key])
        # migration: round-<=2 checkpoints stored the point attributes (and
        # their Adam moments) as separate xyz/embedding/conf/color/dirs
        # arrays; the stacked-table layout assembles them (zero pad lanes)
        if key.endswith("/table"):
            base = key[: -len("table")]
            names = ("xyz", "embedding", "conf", "color", "dirs")
            if f"{base}xyz" in data or f"{base}embedding" in data:
                n = None
                parts = []
                for nm in names:
                    if f"{base}{nm}" in data:
                        p = data[f"{base}{nm}"]
                        n = p.shape[0]
                        parts.append(p.reshape(n, -1))
                    else:
                        parts.append(None)
                fdim = (parts[1].shape[1] if parts[1] is not None else 32)
                widths = [3, fdim, 1, 3, 3]
                parts = [p if p is not None else
                         np.zeros((n, w), np.float32)
                         for p, w in zip(parts, widths)]
                used = sum(widths)
                tw = (tmpl.shape[1] if tmpl is not None
                      else used + (-used) % 64)
                pad = np.zeros((n, tw - used), np.float32)
                return jax.numpy.asarray(
                    np.concatenate(parts + [pad], axis=1))
        raise KeyError(f"checkpoint {path} missing {key}")

    def rebuild(tree, prefix=""):
        if tree is None:
            return None
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if _dc.is_dataclass(tree) and not isinstance(tree, type):
            kw = {}
            for f in _dc.fields(tree):
                v = getattr(tree, f.name)
                if isinstance(v, (bool, int, float, str, tuple)):
                    kw[f.name] = v        # static metadata from the template
                else:
                    kw[f.name] = rebuild(v, f"{prefix}{f.name}/")
            return _dc.replace(tree, **kw)
        if hasattr(tree, "_fields"):
            return type(tree)(*[rebuild(getattr(tree, f), f"{prefix}{f}/")
                                for f in tree._fields])
        if isinstance(tree, (list, tuple)):
            return type(tree)(rebuild(v, f"{prefix}{i}/")
                              for i, v in enumerate(tree))
        key = prefix.rstrip("/")
        return leaf(key, tree if hasattr(tree, "shape") else None)

    state = TrainState(**rebuild(template._asdict()))
    return state, best
