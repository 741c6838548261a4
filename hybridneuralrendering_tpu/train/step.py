"""One training / eval step, jit-compiled with donated state.

Composition mirrors `optimize_parameters` + `forward`
(/root/reference/models/mvs_points_volumetric_model.py:111-152): render ->
blur-degrade the prediction -> masked losses -> two Adam updates (network
params at lr, point attributes at plr).  Blur simulation and frame weights ride
inside the differentiated function exactly as in the reference.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hybridneuralrendering_tpu.config import Config
from hybridneuralrendering_tpu.models import blur as blur_mod
from hybridneuralrendering_tpu.models import losses as losses_mod
from hybridneuralrendering_tpu.models import renderer
from hybridneuralrendering_tpu.ops.voxel_grid import PointGrid
from hybridneuralrendering_tpu.train import state as state_mod
from hybridneuralrendering_tpu.train.state import TrainState


def forward_with_blur(params: Dict, points, grid: PointGrid, batch: Dict,
                      cfg: Config, key, blur_kernels: Optional[jnp.ndarray],
                      train: bool,
                      img_feat_n: Optional[jnp.ndarray] = None) -> Dict:
    """Render + (train-time) blur degradation of the predicted colors
    (mvs_points_volumetric_model.py:133-152)."""
    out = renderer.render(params, points, grid, batch, cfg, key=key,
                          train=train, img_feat_n=img_feat_n)
    if train:
        pn, ps = cfg.sampling.dilation_patch_num, cfg.sampling.dilation_patch_size
        if cfg.agg.learnable_blur_kernel:
            out["coarse_raycolor"] = blur_mod.learnable_blur_update(
                params["aggregator"], cfg.agg, out["coarse_raycolor"],
                batch["gt_image"], pn, ps)
        elif cfg.blur.add_blur_sim and blur_kernels is not None:
            out["coarse_raycolor"] = blur_mod.blur_bank_update(
                out["coarse_raycolor"], batch["gt_image"], blur_kernels, pn, ps)
    return out


def loss_fn(params: Dict, pts_tree: Dict, static_points, grid: PointGrid,
            batch: Dict, cfg: Config, key,
            blur_kernels: Optional[jnp.ndarray],
            img_feat_n: Optional[jnp.ndarray] = None
            ) -> Tuple[jnp.ndarray, Dict]:
    points = state_mod.merge_point_params(static_points, pts_tree)
    out = forward_with_blur(params, points, grid, batch, cfg, key,
                            blur_kernels, train=True, img_feat_n=img_feat_n)
    frame_weight = batch.get("frame_weight") if cfg.loss.use_frame_weight else None
    total, items = losses_mod.compute_losses(
        out, batch["gt_image"], cfg.loss, frame_weight)
    items["ray_hit_frac"] = jnp.mean(out["ray_mask"].astype(jnp.float32))
    return total, items


@partial(jax.jit, static_argnames=("cfg",),
         donate_argnames=("train_state",))
def train_step(train_state: TrainState, grid: PointGrid, batch: Dict,
               key, blur_kernels, cfg: Config
               ) -> Tuple[TrainState, Dict]:
    opt_net, opt_pts = state_mod.make_optimizers(cfg.optim)
    pts_tree = state_mod.point_param_tree(train_state.points, cfg)

    (total, items), (g_net, g_pts) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(
        train_state.params, pts_tree, train_state.points, grid, batch, cfg,
        key, blur_kernels)

    up_net, os_net = opt_net.update(g_net, train_state.opt_state_net,
                                    train_state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u,
                                    train_state.params, up_net)
    up_pts, os_pts = opt_pts.update(g_pts, train_state.opt_state_pts, pts_tree)
    pts_tree = jax.tree_util.tree_map(lambda p, u: p + u, pts_tree, up_pts)
    points = state_mod.merge_point_params(train_state.points, pts_tree)

    new_state = TrainState(
        step=train_state.step + 1, params=params, points=points,
        opt_state_net=os_net, opt_state_pts=os_pts)
    return new_state, items


@partial(jax.jit, static_argnames=("cfg", "prob"))
def eval_step(params: Dict, points, grid: PointGrid, batch: Dict,
              cfg: Config, prob: bool = False) -> Dict:
    """Deterministic render for test/probe (no jitter, no drop, no blur)."""
    return renderer.render(params, points, grid, batch, cfg, key=None,
                           train=False, prob=prob)


# ---------------------------------------------------------------------------
# Multi-frame batched training.  The reference is locked to one frame per
# step (torch DataParallel over a single batch); on TPU the latency-bound
# query amortizes across frames vmapped in one executable — a pure
# throughput lever with identical per-frame math (gradients average over
# frames like a larger batch).
# ---------------------------------------------------------------------------

def multi_loss_fn(params: Dict, pts_tree: Dict, static_points,
                  grid: PointGrid, batches: Dict, cfg: Config, key,
                  blur_kernels) -> Tuple[jnp.ndarray, Dict]:
    """batches: per-frame-stacked batch dict (leading axis F on every leaf)."""
    points = state_mod.merge_point_params(static_points, pts_tree)
    F = batches["raydir"].shape[0]
    keys = jax.random.split(key, F)

    def one(batch_f, key_f):
        out = forward_with_blur(params, points, grid, batch_f, cfg, key_f,
                                blur_kernels, train=True)
        fw = batch_f.get("frame_weight") if cfg.loss.use_frame_weight else None
        total, items = losses_mod.compute_losses(
            out, batch_f["gt_image"], cfg.loss, fw)
        return total, items

    totals, items = jax.vmap(one)(batches, keys)
    items = jax.tree_util.tree_map(jnp.mean, items)
    return jnp.mean(totals), items


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("train_state",))
def train_step_multi(train_state: TrainState, grid: PointGrid, batches: Dict,
                     key, blur_kernels, cfg: Config
                     ) -> Tuple[TrainState, Dict]:
    """One optimizer step over F frames' ray batches at once."""
    opt_net, opt_pts = state_mod.make_optimizers(cfg.optim)
    pts_tree = state_mod.point_param_tree(train_state.points, cfg)
    (total, items), (g_net, g_pts) = jax.value_and_grad(
        multi_loss_fn, argnums=(0, 1), has_aux=True)(
        train_state.params, pts_tree, train_state.points, grid, batches, cfg,
        key, blur_kernels)
    up_net, os_net = opt_net.update(g_net, train_state.opt_state_net,
                                    train_state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u,
                                    train_state.params, up_net)
    up_pts, os_pts = opt_pts.update(g_pts, train_state.opt_state_pts, pts_tree)
    pts_tree = jax.tree_util.tree_map(lambda p, u: p + u, pts_tree, up_pts)
    points = state_mod.merge_point_params(train_state.points, pts_tree)
    new_state = TrainState(
        step=train_state.step + 1, params=params, points=points,
        opt_state_net=os_net, opt_state_pts=os_pts)
    return new_state, items


def stack_batches(batch_list):
    """List of per-frame batch dicts -> frame-stacked dict for
    train_step_multi."""
    import numpy as np
    keys = batch_list[0].keys()
    return {k: np.stack([np.asarray(b[k]) for b in batch_list])
            for k in keys}
