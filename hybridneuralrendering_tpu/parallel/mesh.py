"""Device mesh + sharding rules.

The scaling model (SURVEY §2.10/§5): rays are embarrassingly parallel, so the
batch shards over a single `data` mesh axis (the context-parallel analog);
the neural point cloud, voxel-grid tables, and network parameters replicate
(they fit HBM comfortably); XLA inserts the gradient psum over ICI inside the
jitted train step.  This replaces the reference's `torch.nn.DataParallel`
ceiling (neural_points_volumetric_model.py:165-167) with true SPMD.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hybridneuralrendering_tpu.config import ParallelConfig


def make_mesh(cfg: ParallelConfig,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = cfg.mesh_shape or (len(devices),)
    arr = np.asarray(devices).reshape(shape)
    axis_names = (cfg.data_axis,) if len(shape) == 1 else (
        "replica", cfg.data_axis)[: len(shape)]
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharded(mesh: Mesh, cfg: ParallelConfig) -> NamedSharding:
    return NamedSharding(mesh, P(cfg.data_axis))


# Batch keys whose leading dim is the ray axis R.
RAY_AXIS_KEYS = frozenset({
    "raydir", "pixel_idx", "gt_image"})


def batch_shardings(batch: Dict, mesh: Mesh, cfg: ParallelConfig) -> Dict:
    """Per-key shardings: ray-major tensors split over `data`, rest replicated."""
    out = {}
    for k, v in batch.items():
        if k in RAY_AXIS_KEYS:
            out[k] = ray_sharded(mesh, cfg)
        else:
            out[k] = replicated(mesh)
    return out


def shard_batch(batch: Dict, mesh: Mesh, cfg: ParallelConfig) -> Dict:
    sh = batch_shardings(batch, mesh, cfg)
    return {k: jax.device_put(v, sh[k]) for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def make_sharded_train_step(mesh: Mesh, cfg, example_state, example_grid,
                            example_batch, example_kernels):
    """Jit the train step with EXPLICIT in/out shardings: the ray batch
    pinned to the `data` axis, state/grid/kernels replicated, the updated
    state constrained to stay replicated.  Input `device_put` alone lets
    GSPMD pick layouts; declaring them here makes the intended distribution
    part of the program (SURVEY §2.10 plan) and fails loudly on layout
    regressions.  Returns a jitted fn(train_state, grid, batch, key,
    blur_kernels) -> (train_state, items)."""
    from hybridneuralrendering_tpu.train import step as step_mod

    rep = replicated(mesh)
    b_sh = batch_shardings(example_batch, mesh, cfg.parallel)
    as_rep = lambda tree: jax.tree_util.tree_map(lambda _: rep, tree)
    in_shardings = (as_rep(example_state), as_rep(example_grid), b_sh,
                    rep, as_rep(example_kernels))
    out_shardings = (as_rep(example_state), None)

    raw = step_mod.train_step.__wrapped__

    def body(train_state, grid, batch, key, kernels):
        return raw(train_state, grid, batch, key, kernels, cfg)

    return jax.jit(body, in_shardings=in_shardings,
                   out_shardings=out_shardings,
                   donate_argnums=(0,))
