"""One training / eval step, jit-compiled with donated state.

Composition mirrors `optimize_parameters` + `forward`
(/root/reference/models/mvs_points_volumetric_model.py:111-152): render ->
blur-degrade the prediction -> masked losses -> two Adam updates (network
params at lr, point attributes at plr).  Blur simulation and frame weights ride
inside the differentiated function exactly as in the reference.

Pyramid caching (a deliberate improvement over the reference, which re-runs
the aux CNN every step — point_aggregators.py:1059-1068): pass
`img_feat_staged` = (images [V,H,W,3], (s1,s2,s3) stage maps from
`renderer.compute_image_feature_stages`) and the step consumes cached
features; the pyramid CNN gets gradients only on refresh steps where the
caller omits the cache (see cli/train.py).
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


HOST_KEYS = ("vid", "nearest_vids")


def device_batch(batch: Dict) -> Dict:
    """Drop host-only batch keys (frame/nearest-view ids) before jit."""
    return {k: v for k, v in batch.items() if k not in HOST_KEYS}


def maybe_add_bg_ray(batch: Dict, points, cfg: Config) -> Dict:
    """Plane-background preprocessing (reference run/train_ft.py:972-980 /
    run/test_ft.py:88-97): when `bgmodel` ends with 'plane' and the dataset
    supplies plane metadata, replace the plane keys with a per-ray `bg_ray`
    color map computed from the nearest-view stack; the renderer then
    composites it under the background transmission."""
    if (not cfg.render.bgmodel.endswith("plane")
            or "plane_pnt" not in batch or "images_nearest" not in batch):
        return batch
    import numpy as np

    from hybridneuralrendering_tpu.core import bg_plane
    w2cs = jnp.linalg.inv(jnp.asarray(batch["c2w_nearest"]))
    bg = bg_plane.compute_bg_ray(
        jnp.asarray(batch["campos"]), jnp.asarray(batch["raydir"]),
        jnp.asarray(batch["plane_pnt"]), jnp.asarray(batch["plane_normal"]),
        jnp.asarray(batch["plane_color"]),
        jnp.asarray(batch["images_nearest"]), w2cs,
        jnp.asarray(batch["intrinsic_nearest"]), points.xyz, points.mask)
    out = {k: v for k, v in batch.items() if not k.startswith("plane_")}
    out["bg_ray"] = bg
    return out


def forward_with_blur(params: Dict, points, grid: PointGrid, batch: Dict,
                      cfg: Config, key, blur_kernels: Optional[jnp.ndarray],
                      train: bool,
                      img_feat_n: Optional[jnp.ndarray] = None,
                      img_feat_staged=None) -> Dict:
    """Render + (train-time) blur degradation of the predicted colors
    (mvs_points_volumetric_model.py:133-152)."""
    out = renderer.render(params, points, grid, batch, cfg, key=key,
                          train=train, img_feat_n=img_feat_n,
                          img_feat_staged=img_feat_staged)
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
            img_feat_n: Optional[jnp.ndarray] = None,
            img_feat_staged=None) -> Tuple[jnp.ndarray, Dict]:
    points = state_mod.merge_point_params(static_points, pts_tree)
    out = forward_with_blur(params, points, grid, batch, cfg, key,
                            blur_kernels, train=True, img_feat_n=img_feat_n,
                            img_feat_staged=img_feat_staged)
    frame_weight = batch.get("frame_weight") if cfg.loss.use_frame_weight else None
    total, items = losses_mod.compute_losses(
        out, batch["gt_image"], cfg.loss, frame_weight)
    items["ray_hit_frac"] = jnp.mean(out["ray_mask"].astype(jnp.float32))
    return total, items


def multi_loss_fn(params: Dict, pts_tree: Dict, static_points,
                  grid: PointGrid, batches: Dict, cfg: Config, key,
                  blur_kernels,
                  img_feat_staged=None) -> Tuple[jnp.ndarray, Dict]:
    """batches: per-frame-stacked batch dict (leading axis F on every leaf).
    img_feat_staged leaves, when given, also carry the leading F axis."""
    points = state_mod.merge_point_params(static_points, pts_tree)
    F = batches["raydir"].shape[0]
    keys = jax.random.split(key, F)

    def one(batch_f, key_f, staged_f):
        out = forward_with_blur(params, points, grid, batch_f, cfg, key_f,
                                blur_kernels, train=True,
                                img_feat_staged=staged_f)
        fw = batch_f.get("frame_weight") if cfg.loss.use_frame_weight else None
        total, items = losses_mod.compute_losses(
            out, batch_f["gt_image"], cfg.loss, fw)
        return total, items

    if img_feat_staged is None:
        totals, items = jax.vmap(
            lambda b, k: one(b, k, None))(batches, keys)
    else:
        totals, items = jax.vmap(one)(batches, keys, img_feat_staged)
    items = jax.tree_util.tree_map(jnp.mean, items)
    return jnp.mean(totals), items


def _apply_updates(train_state: TrainState, pts_tree: Dict,
                   g_net, g_pts, items: Dict, cfg: Config) -> TrainState:
    """Shared two-Adam update body (net params at lr, point attrs at plr —
    mvs_points_volumetric_model.py:49-104)."""
    opt_net, opt_pts = state_mod.make_optimizers(cfg.optim)
    up_net, os_net = opt_net.update(g_net, train_state.opt_state_net,
                                    train_state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u,
                                    train_state.params, up_net)
    up_pts, os_pts = opt_pts.update(g_pts, train_state.opt_state_pts,
                                    pts_tree)
    pts_tree = jax.tree_util.tree_map(lambda p, u: p + u, pts_tree, up_pts)
    points = state_mod.merge_point_params(train_state.points, pts_tree)
    return TrainState(
        step=train_state.step + 1, params=params, points=points,
        opt_state_net=os_net, opt_state_pts=os_pts)


@partial(jax.jit, static_argnames=("cfg",),
         donate_argnames=("train_state",))
def train_step(train_state: TrainState, grid: PointGrid, batch: Dict,
               key, blur_kernels, cfg: Config,
               img_feat_staged=None) -> Tuple[TrainState, Dict]:
    pts_tree = state_mod.point_param_tree(train_state.points, cfg)
    (total, items), (g_net, g_pts) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(
        train_state.params, pts_tree, train_state.points, grid, batch, cfg,
        key, blur_kernels, None, img_feat_staged)
    return _apply_updates(train_state, pts_tree, g_net, g_pts, items,
                          cfg), items


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("train_state",))
def train_step_multi(train_state: TrainState, grid: PointGrid, batches: Dict,
                     key, blur_kernels, cfg: Config,
                     img_feat_staged=None) -> Tuple[TrainState, Dict]:
    """One optimizer step over F frames' ray batches at once.

    The reference is locked to one frame per step (torch DataParallel over a
    single batch); on TPU the latency-bound query amortizes across frames
    vmapped in one executable — identical per-frame math, gradients average
    over frames like a larger batch."""
    pts_tree = state_mod.point_param_tree(train_state.points, cfg)
    (total, items), (g_net, g_pts) = jax.value_and_grad(
        multi_loss_fn, argnums=(0, 1), has_aux=True)(
        train_state.params, pts_tree, train_state.points, grid, batches, cfg,
        key, blur_kernels, img_feat_staged)
    return _apply_updates(train_state, pts_tree, g_net, g_pts, items,
                          cfg), items


@partial(jax.jit, static_argnames=("cfg", "prob"))
def eval_step(params: Dict, points, grid: PointGrid, batch: Dict,
              cfg: Config, prob: bool = False) -> Dict:
    """Deterministic render for test/probe (no jitter, no drop, no blur)."""
    return renderer.render(params, points, grid, batch, cfg, key=None,
                           train=False, prob=prob)


def stack_batches(batch_list):
    """List of per-frame batch dicts -> frame-stacked dict for
    train_step_multi.  Device-resident leaves (e.g. the trainer's view-bank
    image stacks) stack on device — no round trip to host."""
    import numpy as np
    keys = batch_list[0].keys()
    out = {}
    for k in keys:
        vals = [b[k] for b in batch_list]
        if any(isinstance(v, jnp.ndarray) for v in vals):
            out[k] = jnp.stack([jnp.asarray(v) for v in vals])
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    return out
