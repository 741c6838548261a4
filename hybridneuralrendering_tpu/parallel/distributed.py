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


def host_local_array(x) -> np.ndarray:
    """Materialize a (possibly multi-process global) array on this host.

    `np.asarray` raises on global arrays whose shards live on other hosts;
    for the replicated state trees used here every process's addressable
    shard 0 IS the full value.  Host-side lifecycle code (probe/grow, grid
    geometry, checkpointing) funnels through this so it works unchanged
    under a multi-process mesh."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return np.asarray(x.addressable_data(0))
    return np.asarray(x)


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
    parser.add_argument("--scenario", default="parity",
                        choices=("parity", "lifecycle", "mesh2d"))
    parser.add_argument("--workdir", default=None,
                        help="shared dir for the lifecycle checkpoint")
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
    if args.scenario == "mesh2d":
        # 2-axis (replica, data) mesh (parallel/mesh.py:27-28): frames shard
        # over `data`, the replica axis exercises the 2-D layout path
        import dataclasses
        cfg = cfg.replace(parallel=dataclasses.replace(
            cfg.parallel, mesh_shape=(1, jax.device_count())))
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

    if args.scenario == "lifecycle":
        _lifecycle_scenario(args, cfg, new_ts, grid_r, kern_r, m, loss)
        return

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


def _lifecycle_scenario(args, cfg, ts, grid_r, kern_r, m, step_loss):
    """Multi-process lifecycle surface (VERDICT r2 #4): N sharded steps ->
    probe/grow on every host -> checkpoint save on process 0 + restore on
    all -> one eval chunk.  Writes per-host state digests; the test asserts
    they are IDENTICAL across hosts (divergence here would desync the
    replicated state)."""
    import jax.numpy as jnp

    from hybridneuralrendering_tpu.data.synthetic import make_synthetic_batch
    from hybridneuralrendering_tpu.models import renderer
    from hybridneuralrendering_tpu.train import checkpoint as ckpt_mod
    from hybridneuralrendering_tpu.train import lifecycle
    from hybridneuralrendering_tpu.train import step as step_mod
    from jax.experimental import multihost_utils

    # two more sharded steps
    for i in range(2):
        frames = [make_synthetic_batch(cfg, seed=10 + i * 7 + fi)
                  for fi in local_frame_ids(args.frames, m)]
        batches = global_frame_batch(
            step_mod.stack_batches(frames), m, cfg.parallel)
        ts, items = step_mod.train_step_multi(
            ts, grid_r, batches, jax.random.PRNGKey(100 + i), kern_r, cfg)

    # probe-and-grow against a deterministic stub dataset; every host must
    # grow the exact same points (lifecycle pulls host-local copies of the
    # replicated state via host_local_array)
    class StubDS:
        height, width = cfg.image_hw
        id_list = [0]

        def __len__(self):
            return 1

        def image(self, vid):
            # gt differs from bg so missed rays become growth candidates
            return np.full((self.height, self.width, 3), 0.25, np.float32)

        def get_batch(self, idx, rng=None, pixelcoords=None):
            H, W = self.height, self.width
            pc = pixelcoords.reshape(-1, 2).astype(np.float32)
            x = (pc[:, 0] + 0.5 - W / 2) / (0.9 * W)
            y = (pc[:, 1] + 0.5 - H / 2) / (0.9 * W)
            dirs = np.stack([x, y, np.ones_like(x)], -1)
            dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
            return {
                "campos": np.array([0, 0, -2.5], np.float32),
                "camrotc2w": np.eye(3, dtype=np.float32),
                "raydir": dirs.astype(np.float32),
                "pixel_idx": pc.astype(np.int32),
                "gt_image": np.full((len(pc), 3), 0.25, np.float32),
                "bg_color": np.ones(3, np.float32),
            }

    import dataclasses
    probe_cfg = cfg.replace(probe=dataclasses.replace(
        cfg.probe, prob_thresh=0.0))   # untrained opacities still grow
    new_points, new_grid, n_added = lifecycle.probe_and_grow(
        ts.params, ts.points, grid_r, StubDS(), probe_cfg,
        rng=np.random.default_rng(0))
    ts = ts._replace(points=new_points)

    # checkpoint: process 0 writes, everyone restores the same file
    assert args.workdir
    ckpt_dir = args.workdir
    if jax.process_index() == 0:
        ckpt_mod.save_checkpoint(ckpt_dir, ts, best_psnr=1.25)
    multihost_utils.sync_global_devices("ckpt_written")
    latest = ckpt_mod.latest_checkpoint(ckpt_dir)
    ts_restored, best = ckpt_mod.load_checkpoint(latest, ts)

    # one deterministic eval chunk on the restored state
    eb = StubDS().get_batch(0, pixelcoords=np.stack(
        np.meshgrid(np.arange(8), np.arange(8), indexing="xy"), -1))
    out = step_mod.eval_step(ts_restored.params, ts_restored.points, new_grid,
                             eb, cfg)

    digest = [
        step_loss,
        float(n_added),
        float(host_local_array(ts.points.num_live)),
        float(np.sum(host_local_array(ts.points.xyz))),
        float(np.sum(np.abs(host_local_array(
            jax.tree_util.tree_leaves(ts.params)[0])))),
        float(best),
        float(np.sum(host_local_array(ts_restored.points.xyz))),
        float(np.mean(host_local_array(out["coarse_raycolor"]))),
    ]
    with open(args.out, "w") as f:
        f.write(" ".join(f"{v:.8f}" for v in digest) + "\n")
    print(f"proc {args.process_id}: lifecycle digest {digest}", flush=True)


if __name__ == "__main__":
    _worker_main()
