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

    def rebuild(tree, prefix=""):
        if tree is None:
            return None
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if hasattr(tree, "_fields"):
            return type(tree)(*[rebuild(getattr(tree, f), f"{prefix}{f}/")
                                for f in tree._fields])
        if isinstance(tree, (list, tuple)):
            return type(tree)(rebuild(v, f"{prefix}{i}/")
                              for i, v in enumerate(tree))
        key = prefix.rstrip("/")
        arr = data[key]
        return jax.numpy.asarray(arr)

    state = TrainState(**rebuild(template._asdict()))
    return state, best
