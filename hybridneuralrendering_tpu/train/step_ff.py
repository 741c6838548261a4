"""Feed-forward training mode: MVS nets regenerate the point cloud per batch.

The reference's `mvs_points_volumetric_model` keeps a third Adam group at
`mvs_lr` for the MVS networks and, in feed-forward mode, re-runs point
generation inside every forward pass
(/root/reference/models/mvs_points_volumetric_model.py:49-104 optimizers,
:133-152 forward with per-batch gen_points).  Here the whole chain —
FeatureNet -> learned/GT depth -> query_embedding -> voxel-grid build ->
hybrid render -> loss — is ONE jitted function; gradients flow to the MVS
parameters through the generated point attributes and positions (the grid
build consumes stop_gradient(xyz): its tables only produce neighbor indices,
matching the reference where the CUDA querier is non-differentiable).

Per-scene optimization (the shipped configs) does not use this mode; it
exists for capability parity with `--manual_depth_view -1` feed-forward
training.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from hybridneuralrendering_tpu.config import Config
from hybridneuralrendering_tpu.models import losses as losses_mod
from hybridneuralrendering_tpu.models import neural_points as npts
from hybridneuralrendering_tpu.models import renderer
from hybridneuralrendering_tpu.mvs import point_gen
from hybridneuralrendering_tpu.ops import voxel_grid as VG
from hybridneuralrendering_tpu.train import state as state_mod


class FFTrainState(NamedTuple):
    step: jnp.ndarray
    params: Dict                       # rendering networks (lr group)
    mvs_params: point_gen.MvsPointsParams   # MVS nets (mvs_lr group)
    opt_state_net: object
    opt_state_mvs: object


def make_ff_optimizers(cfg: Config):
    opt_net = optax.adam(state_mod.lr_schedule(cfg.optim.lr, cfg.optim),
                         b1=cfg.optim.beta1, b2=cfg.optim.beta2)
    opt_mvs = optax.adam(state_mod.lr_schedule(cfg.optim.mvs_lr, cfg.optim),
                         b1=cfg.optim.beta1, b2=cfg.optim.beta2)
    return opt_net, opt_mvs


def create_ff_state(params: Dict, mvs_params, cfg: Config) -> FFTrainState:
    opt_net, opt_mvs = make_ff_optimizers(cfg)
    return FFTrainState(
        step=jnp.asarray(0, jnp.int32), params=params, mvs_params=mvs_params,
        opt_state_net=opt_net.init(params),
        opt_state_mvs=opt_mvs.init(mvs_params))


def generate_points(mvs_params, group: Dict, cfg: Config,
                    num_depths: int, learned: bool,
                    conf_thresh: float) -> npts.NeuralPoints:
    """Per-batch point generation: depth -> unproject -> query_embedding,
    assembled into a fixed-capacity masked NeuralPoints (M = h*w of the
    reference view's depth map)."""
    images = group["images"]                    # [V, H, W, 3]
    intr = group["intrinsic"]
    w2cs = group["w2cs"]
    near, far = cfg.render.near_plane, cfg.render.far_plane
    cam_xyz, conf, mask = point_gen.gen_points(
        mvs_params, images, intr, w2cs, near, far, num_depths=num_depths,
        depth_gt=group.get("depth_gt"), conf_thresh=conf_thresh,
        learned=learned)
    c2ws = jnp.linalg.inv(w2cs)
    emb, color, dirs, conf_col = point_gen.query_embedding(
        mvs_params, cam_xyz, images, c2ws, w2cs, intr, 0, confidence=conf)
    ones = jnp.ones_like(cam_xyz[..., :1])
    xyz_w = (jnp.concatenate([cam_xyz, ones], -1) @ c2ws[0].T)[..., :3]
    M = xyz_w.shape[0]
    table = npts.build_table(
        cfg.points.feature_dim, xyz_w, emb[:, : cfg.points.feature_dim],
        conf_col, color, dirs)
    return npts.NeuralPoints(
        table=table, mask=mask, num_live=jnp.sum(mask.astype(jnp.int32)),
        feature_dim=cfg.points.feature_dim,
        # feed-forward mode differentiates point positions too
        trainable=(True, True, True, True, True))


def ff_loss_fn(params: Dict, mvs_params, group: Dict, ray_batch: Dict,
               geom, cfg: Config, key, num_depths: int, learned: bool,
               conf_thresh: float) -> Tuple[jnp.ndarray, Dict]:
    points = generate_points(mvs_params, group, cfg, num_depths, learned,
                             conf_thresh)
    # the grid only yields neighbor INDICES (non-differentiable in the
    # reference's CUDA querier too) — build it outside the gradient
    grid = VG.build_grid(jax.lax.stop_gradient(points.xyz), points.mask,
                         geom, cfg.querier)
    out = renderer.render(params, points, grid, ray_batch, cfg, key=key,
                          train=True)
    total, items = losses_mod.compute_losses(
        out, ray_batch["gt_image"], cfg.loss, None)
    items["num_points"] = points.num_live.astype(jnp.float32)
    return total, items


@partial(jax.jit, static_argnames=("cfg", "num_depths", "learned",
                                   "conf_thresh"),
         donate_argnames=("ff_state",))
def train_step_ff(ff_state: FFTrainState, group: Dict, ray_batch: Dict,
                  geom, key, cfg: Config, num_depths: int = 64,
                  learned: bool = True, conf_thresh: float = 0.0
                  ) -> Tuple[FFTrainState, Dict]:
    """One feed-forward optimizer step: render nets at lr, MVS nets at
    mvs_lr (the reference's first and third Adam groups)."""
    opt_net, opt_mvs = make_ff_optimizers(cfg)
    (total, items), (g_net, g_mvs) = jax.value_and_grad(
        ff_loss_fn, argnums=(0, 1), has_aux=True)(
        ff_state.params, ff_state.mvs_params, group, ray_batch, geom, cfg,
        key, num_depths, learned, conf_thresh)
    up_net, os_net = opt_net.update(g_net, ff_state.opt_state_net,
                                    ff_state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, ff_state.params,
                                    up_net)
    up_mvs, os_mvs = opt_mvs.update(g_mvs, ff_state.opt_state_mvs,
                                    ff_state.mvs_params)
    mvs_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        ff_state.mvs_params, up_mvs)
    return FFTrainState(step=ff_state.step + 1, params=params,
                        mvs_params=mvs_params, opt_state_net=os_net,
                        opt_state_mvs=os_mvs), items


def save_ff_checkpoint(ckpt_dir: str, ffs: FFTrainState) -> str:
    """Single-file .npz of the feed-forward state (flattened pytree leaves;
    same style as train/checkpoint.py for the per-scene state)."""
    import os

    import numpy as np
    os.makedirs(ckpt_dir, exist_ok=True)
    leaves = jax.tree_util.tree_leaves(ffs)
    path = os.path.join(ckpt_dir, f"ff_{int(ffs.step):08d}.npz")
    np.savez(path, *[np.asarray(l) for l in leaves])
    return path


def load_ff_checkpoint(path: str, template: FFTrainState) -> FFTrainState:
    import numpy as np
    data = np.load(path)
    leaves = [data[k] for k in data.files]
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(l) for l in leaves])
