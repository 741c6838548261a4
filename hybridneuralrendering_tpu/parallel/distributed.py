"""Multi-host distributed training: process init, global batches, per-host IO.

The reference's ceiling is single-process `torch.nn.DataParallel`
(/root/reference/models/neural_points_volumetric_model.py:165-167).  Here the
scaling model is SPMD over a global `data` mesh axis (SURVEY §2.10):

  - every host calls `initialize()` (jax.distributed) and then the SAME
    jitted train step on globally-sharded arrays; XLA inserts the gradient
    psums over ICI;
  - the point cloud, voxel grid, and params replicate; the ray batch shards;
  - per-host data loading: in multi-frame mode (--frames-per-step F) the
    frame axis shards across processes, so each host decodes and uploads
    ONLY its own frames (`local_frame_ids`, `global_frame_batch`) — frame
    loading is the expensive host work, making IO scale with hosts.

Single-process use is unchanged: `initialize()` is a no-op without
coordinator settings, and `global_frame_batch` degrades to device_put.

Verified without a TPU pod by `tests/test_distributed.py`, which launches
real multi-process CPU workers (this module's `__main__`) against a local
coordinator and checks loss parity with the single-process step.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from hybridneuralrendering_tpu.config import Config, ParallelConfig
from hybridneuralrendering_tpu.parallel import mesh as pmesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """jax.distributed.initialize with env-var fallbacks
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Returns True if a multi-process runtime was initialized."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "-1"))
    if not coordinator_address or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def global_mesh(cfg: ParallelConfig) -> jax.sharding.Mesh:
    """Mesh over ALL global devices (every process must build the same)."""
    return pmesh.make_mesh(cfg, jax.devices())


def local_frame_ids(num_frames: int, mesh) -> range:
    """The frame indices THIS process should load for a frame-sharded batch.

    Frames split evenly over processes (num_frames must divide by process
    count for fixed shapes)."""
    n_proc = jax.process_count()
    assert num_frames % n_proc == 0, (
        f"frames_per_step={num_frames} must divide over {n_proc} processes")
    per = num_frames // n_proc
    start = jax.process_index() * per
    return range(start, start + per)


def global_frame_batch(local_batches: Dict, mesh,
                       cfg: ParallelConfig) -> Dict:
    """Per-host frame-stacked batch dict -> globally frame-sharded arrays.

    local_batches: this host's frames stacked on the leading axis (from
    step.stack_batches over `local_frame_ids` frames).  Every leaf shards on
    its leading (frame) axis over `data`; each host supplies only its local
    shard (jax.make_array_from_process_local_data)."""
    sh = NamedSharding(mesh, P(cfg.data_axis))

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.make_array_from_process_local_data(sh, x)

    return {k: put(v) for k, v in local_batches.items()}


def replicate_host_tree(tree, mesh):
    """Replicate host arrays onto every device of a (possibly multi-host)
    mesh.  With multiple processes each host must contribute its addressable
    shard of the SAME value."""
    rep = NamedSharding(mesh, P())

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, rep)
        return jax.make_array_from_process_local_data(rep, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


# ---------------------------------------------------------------------------
# Multi-process CPU worker (tests/test_distributed.py launches N of these)
# ---------------------------------------------------------------------------

def _worker_main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator", required=True)
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--frames", type=int, default=2)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    jax.config.update("jax_platforms", "cpu")
    ok = initialize(args.coordinator, args.num_processes, args.process_id)
    assert ok and jax.process_count() == args.num_processes

    import jax.numpy as jnp

    from hybridneuralrendering_tpu import config as C
    from hybridneuralrendering_tpu.data.synthetic import (
        make_synthetic_batch, make_synthetic_scene)
    from hybridneuralrendering_tpu.models import blur as blur_mod
    from hybridneuralrendering_tpu.models import renderer
    from hybridneuralrendering_tpu.train import state as state_mod
    from hybridneuralrendering_tpu.train import step as step_mod

    cfg = C.tiny_test()
    m = global_mesh(cfg.parallel)

    # identical scene/params on every host (same seed)
    points, grid = make_synthetic_scene(cfg, num_points=1500)
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    ts = state_mod.create_train_state(params, points, cfg)
    kernels = jnp.asarray(blur_mod.generate_kernel_bank(cfg.blur))

    # deterministic per-frame batches; THIS host stacks only its own frames
    frames = [make_synthetic_batch(cfg, seed=fi)
              for fi in local_frame_ids(args.frames, m)]
    local = step_mod.stack_batches(frames)
    batches = global_frame_batch(local, m, cfg.parallel)

    ts_r = replicate_host_tree(ts, m)
    grid_r = replicate_host_tree(grid, m)
    kern_r = replicate_host_tree(kernels, m)

    new_ts, items = step_mod.train_step_multi(
        ts_r, grid_r, batches, jax.random.PRNGKey(7), kern_r, cfg)
    loss = float(items["loss_total"])

    # single-process reference value computed locally for parity
    frames_all = [make_synthetic_batch(cfg, seed=fi)
                  for fi in range(args.frames)]
    ts2 = state_mod.create_train_state(
        renderer.init_params(jax.random.PRNGKey(0), cfg), points, cfg)
    _, items_ref = step_mod.train_step_multi(
        ts2, grid, step_mod.stack_batches(frames_all),
        jax.random.PRNGKey(7), kernels, cfg)
    loss_ref = float(items_ref["loss_total"])

    with open(args.out, "w") as f:
        f.write(f"{loss:.8f} {loss_ref:.8f}\n")
    print(f"proc {args.process_id}: sharded={loss:.6f} local={loss_ref:.6f}",
          flush=True)


if __name__ == "__main__":
    _worker_main()
