"""End-to-end hybrid point-based renderer.

Functional composition mirroring `NeuralPointsRayMarching.forward`
(/root/reference/models/neural_points_volumetric_model.py:219-427):

  query voxel grid -> gather point attributes -> reproject shading points into
  nearest training views -> aggregate (viewmlp + hybrid fusion) -> cummax ray
  distances -> alpha compositing -> output dict.

One jittable function, fixed shapes; miss rays stay masked (`ray_mask`) and
naturally composite to the background color — the reference's `fill_invalid`
scatter (:87-126) is unnecessary.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from hybridneuralrendering_tpu.config import Config
from hybridneuralrendering_tpu.core import march
from hybridneuralrendering_tpu.core.cameras import (delta_viewdirs, w2iproject,
                                                    w2pers)
from hybridneuralrendering_tpu.models import aggregator as agg
from hybridneuralrendering_tpu.models import feature_pyramid
from hybridneuralrendering_tpu.models import neural_points as npts
from hybridneuralrendering_tpu.ops import query as Q
from hybridneuralrendering_tpu.ops.voxel_grid import PointGrid


def init_params(key, cfg: Config) -> Dict:
    return {"aggregator": agg.init(key, cfg.agg)}


def _pyramid_dtypes(cfg: Config):
    cdt = jnp.bfloat16 if cfg.agg.compute_dtype == "bfloat16" else None
    chain = jnp.bfloat16 if cfg.agg.pyramid_dtype == "bfloat16" else None
    return cdt, chain


def compute_image_features(params: Dict, cfg: Config,
                           images_nearest: jnp.ndarray) -> jnp.ndarray:
    """[V, H, W, 3] -> [V, H, W, 45].  Split out so the trainer can cache
    per-image pyramids instead of recomputing each step (the reference
    recomputes every step — SURVEY hot-loop (c))."""
    cdt, chain = _pyramid_dtypes(cfg)
    return feature_pyramid.apply(params["aggregator"]["pyramid"],
                                 images_nearest, cfg.agg.act_type,
                                 compute_dtype=cdt, chain_dtype=chain)


def compute_image_feature_stages(params: Dict, cfg: Config,
                                 images_nearest: jnp.ndarray):
    """[V, H, W, 3] -> pre-upsample stage maps (s1, s2, s3) — the compact
    cacheable form (16x smaller than the 45-ch full-res concat)."""
    cdt, chain = _pyramid_dtypes(cfg)
    return feature_pyramid.apply_stages(params["aggregator"]["pyramid"],
                                        images_nearest, cfg.agg.act_type,
                                        compute_dtype=cdt, chain_dtype=chain)


def render(params: Dict, points: npts.NeuralPoints, grid: PointGrid,
           batch: Dict, cfg: Config, key: Optional[jax.Array] = None,
           train: bool = False,
           img_feat_n: Optional[jnp.ndarray] = None,
           img_feat_staged=None,
           prob: bool = False) -> Dict:
    """Render one batch of rays.

    batch keys: 'campos' [3], 'camrotc2w' [3,3], 'raydir' [R,3],
    'bg_color' [3]; hybrid adds 'images_nearest' [V,H,W,3], 'c2w_nearest'
    [V,4,4], 'campos_nearest' [V,3], 'intrinsic_nearest' [3,3],
    'frame_weight_nearest' [V].  `prob` adds the point-growing outputs
    (reference :394-425).
    """
    acfg, qcfg, rcfg = cfg.agg, cfg.querier, cfg.render
    campos = batch["campos"]
    raydir = batch["raydir"]
    R = raydir.shape[0]

    # neural-point query (reference neural_points.py:702-733)
    qres = Q.query_points(grid, points.xyz, campos, raydir, qcfg,
                          rcfg.near_plane, rcfg.far_plane, key=key,
                          train=train)
    # Unique-row dedup pays on the pyramid-cached step (+3.4% bench r5)
    # but LOSES on the CNN-burst step (-7%: the added sort/int passes
    # don't overlap with the CNN's conv work) — gate it to the cached
    # executable unless dedup_uncached opts the other graphs in.
    dd = acfg.dedup_gather if (img_feat_staged is not None
                               or acfg.dedup_uncached) else 0
    sampled = npts.gather(points, qres.sample_pidx, dedup=dd)
    sample_loc = w2pers(qres.sample_loc_w, batch["camrotc2w"], campos)
    sampled_xyz_pers = w2pers(sampled.xyz, batch["camrotc2w"], campos)
    sample_ray_dirs = jnp.broadcast_to(
        raydir[:, None, :], (R, qcfg.SR, 3))

    # hybrid: reproject shading points into nearest views (:283-310)
    use_nearest = acfg.use_nearest
    sample_loc_i_n = delta_vd_n = frame_w_n = None
    if use_nearest > 0 and "c2w_nearest" in batch:
        intr_n = batch["intrinsic_nearest"]
        c2w_n = batch["c2w_nearest"]              # [V, 4, 4]
        campos_n = batch["campos_nearest"]        # [V, 3]
        frame_w_n = batch.get("frame_weight_nearest")

        def proj_one(c2w):
            xy, _ = w2iproject(qres.sample_loc_w, intr_n, c2w)
            return xy

        sample_loc_i_n = jax.vmap(proj_one)(c2w_n)            # [V, R, SR, 2]
        delta_vd_n = jax.vmap(
            lambda cn: delta_viewdirs(qres.sample_loc_w, campos, cn))(
            campos_n)                                          # [V, R, SR, 3]
        if img_feat_n is None and img_feat_staged is None:
            img_feat_n = compute_image_features(
                params, cfg, batch["images_nearest"])

    drop_mask = None
    if train and acfg.drop_ratio > 0:
        dm = agg.drop_ray_mask(acfg, R, cfg.sampling.dilation_patch_num,
                               cfg.sampling.dilation_patch_size)
        drop_mask = jnp.asarray(dm)

    # (remat with dots-saveable policy was measured ~4% slower here — the
    # backward is not activation-IO bound; plain apply wins)
    def agg_call(p, arrays):
        return agg.apply(
            p, acfg, vsize=qcfg.query_vsize, train=train, **arrays)

    out = agg_call(params["aggregator"], dict(
        sampled_xyz=sampled.xyz, sampled_xyz_pers=sampled_xyz_pers,
        sampled_embedding=sampled.embedding, sampled_color=sampled.color,
        sampled_dir=sampled.dirs, sampled_conf=sampled.conf,
        pnt_mask=qres.pnt_mask, sample_loc=sample_loc,
        sample_loc_w=qres.sample_loc_w, sample_ray_dirs=sample_ray_dirs,
        img_feat_n=img_feat_n, img_feat_staged=img_feat_staged,
        sample_loc_i_n=sample_loc_i_n,
        delta_viewdir_n=delta_vd_n, frame_weight_n=frame_w_n,
        view_mask=batch.get("view_mask"),
        drop_mask=drop_mask, sampled_rw2c=sampled.rw2c))

    # per-sample marching distance from perspective depth (:331-339)
    ray_dist = march.ray_dist_from_depth(
        sample_loc[..., 2], out.ray_valid, qcfg.query_vsize[2],
        rcfg.raydist_mode_unit)

    bg_color = batch.get("bg_color", jnp.asarray(rcfg.bg_color))
    bg_ray = batch.get("bg_ray")
    if bg_ray is not None:
        # plane-background compositing (neural_points_volumetric_model.py:
        # 103-105 + :345-347): march with no constant background, then add
        # the per-ray plane color under the background transmission
        bg_color = None
    (ray_color, point_color, opacity, acc_trans, blend_weight, bg_trans,
     _) = march.ray_march(
        ray_dist, out.ray_valid, out.features,
        march.get_render_func(rcfg.which_render_func),
        march.get_blend_func(rcfg.which_blend_func), bg_color)
    if bg_ray is not None:
        ray_color = ray_color + bg_trans * bg_ray
    ray_color = march.get_tonemap_func(rcfg.which_tonemap_func)(ray_color)

    output = {
        "coarse_raycolor": ray_color,                 # [R, 3]
        "coarse_point_opacity": opacity,              # [R, SR]
        "coarse_is_background": bg_trans,             # [R, 1]
        "ray_mask": qres.ray_mask,                    # [R]
        "ray_valid": out.ray_valid,                   # [R, SR]
        "weight": jax.lax.stop_gradient(out.weight),
        "blend_weight": jax.lax.stop_gradient(blend_weight),
        "conf_coefficient": out.conf_coefficient,
        "queried_shading": jnp.logical_not(
            jnp.any(out.ray_valid, axis=-1, keepdims=True)),
    }

    if prob:
        # point-growing outputs: stats at the max-opacity sample (:394-425)
        op_ind = jnp.argmax(opacity, axis=-1)                     # [R]
        r_ix = jnp.arange(R)
        output["ray_max_shading_opacity"] = opacity[r_ix, op_ind][:, None]
        max_loc = qres.sample_loc_w[r_ix, op_ind]                 # [R, 3]
        output["ray_max_sample_loc_w"] = max_loc
        wsel = (out.weight * out.conf_coefficient)[r_ix, op_ind][..., None]
        xyz_sel = sampled.xyz[r_ix, op_ind]                       # [R, K, 3]
        output["ray_max_far_dist"] = jnp.min(
            jnp.linalg.norm(xyz_sel - max_loc[:, None, :], axis=-1),
            axis=-1, keepdims=True)
        for nm, arr in (("color", sampled.color), ("dir", sampled.dirs),
                        ("conf", sampled.conf[..., None]),
                        ("embedding", sampled.embedding)):
            output[f"shading_avg_{nm}"] = jnp.sum(
                arr[r_ix, op_ind] * wsel, axis=-2)
    return output
