"""The viewmlp point aggregator with hybrid image-feature fusion.

TPU-native re-design of /root/reference/models/aggregators/point_aggregators.py
(viewmlp_init :484-751, forward :1427-1523, viewmlp :892-1344).  Differences
from the reference, all deliberate:

  - Dense masked compute: the reference compacts valid neighbors into a
    [valid_pts, F] matrix per step (dynamic shapes); here every MLP runs over
    the full [R*SR*K, F] block with `pnt_mask` zeroing — static shapes mean one
    XLA executable and full MXU utilization.
  - The train-time image-feature drop (point_aggregators.py:1099-1135,
    1222-1255) becomes a pure function of the ray layout: the reference's
    `drop_patch_rays` deterministically drops the first ⌊num_patches*ratio⌋
    patches (the randomness comes from the patches' random image placement).
  - RNG is an explicit key; no host numpy in the hot path (the reference's
    pixel gather bounced through .cpu().numpy(), :1092-1096).

Distance kernels (:759-846) and the straight-through confidence clamp (:1420-
1424) are numerically exact ports.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hybridneuralrendering_tpu.config import AggregatorConfig
from hybridneuralrendering_tpu.core.cameras import pers_delta
from hybridneuralrendering_tpu.core.encoding import positional_encoding
from hybridneuralrendering_tpu.models import feature_pyramid, mlp


# ---------------------------------------------------------------------------
# Distance kernels (point_aggregators.py:759-846)
# ---------------------------------------------------------------------------

def dist_weight(name: str, dists: jnp.ndarray, pnt_mask: jnp.ndarray,
                axis_weight=None) -> jnp.ndarray:
    """dists: [R, SR, K, C]; pnt_mask: [R, SR, K] -> weights [R, SR, K]."""
    m = pnt_mask.astype(dists.dtype)
    # norms clamp UNDER the sqrt: masked slots carry exactly-zero dists and
    # sqrt'(0)=inf NaNs the xyz cotangent (feed-forward mode differentiates
    # point positions; per-scene mode discards that cotangent)
    if name == "linear":
        w = 1.0 / jnp.sqrt(jnp.maximum(
            jnp.sum(jnp.square(dists[..., :3]), axis=-1), 1e-12))
        return m * w
    if name == "numlinear":
        w = m / jnp.sqrt(jnp.maximum(
            jnp.sum(jnp.square(dists), axis=-1), 1e-12))
        return w / jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)
    if name == "quadric":
        return m / jnp.maximum(
            jnp.sum(jnp.square(dists[..., :3]), axis=-1), 1e-8)
    if name == "numquadric":
        return m / jnp.maximum(jnp.sum(jnp.square(dists), axis=-1), 1e-8)
    if name == "avg":
        return m
    if name == "trilinear":
        # point_aggregators.py:758-793: product of (1 - |d|/grid_vox) weights,
        # normalized over K.  `dists` must be pre-scaled by grid voxel size by
        # the caller (handled in dist_weight_ex).
        d = 1.0 - jnp.abs(dists[..., :3])
        w = m * d[..., 0] * d[..., 1] * d[..., 2]
        return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-8)
    raise KeyError(f"unknown distance kernel {name}")


def dist_weight_ex(name: str, dists: jnp.ndarray, pnt_mask: jnp.ndarray,
                   embedding: jnp.ndarray, vsize, grid_vox_sz: float,
                   sh_degree: int = 4):
    """Extended kernels that consume embedding channels
    (point_aggregators.py:864-891).  Returns (weights, remaining_embedding)."""
    m = pnt_mask.astype(dists.dtype)
    if name == "trilinear":
        scaled = dists * m[..., None] / grid_vox_sz
        return dist_weight("trilinear", scaled, pnt_mask), embedding
    if name == "sh_intrp":
        from hybridneuralrendering_tpu.core.sh import sh_basis
        dist_norm = jnp.sqrt(jnp.maximum(
            jnp.sum(jnp.square(dists), axis=-1), 1e-16))
        dirs = dists / jnp.maximum(dist_norm[..., None], 1e-8)
        nb = sh_degree ** 2
        shall = sh_basis(dirs, sh_degree, flip_dir=False)
        coefs = embedding[..., :nb]
        w = m * jnp.sum(jax.nn.sigmoid(shall * coefs), axis=-1) * (
            1.0 / jnp.maximum(dist_norm, 1e-8))
        return w, embedding[..., nb:]
    if name == "gau_intrp":
        from hybridneuralrendering_tpu.core.geometrics import (
            compute_world2local_dist)
        scale = jnp.abs(embedding[..., 0])
        radii = vsize[2] * 20.0 * jax.nn.sigmoid(embedding[..., 1:4])
        rot = jnp.clip(embedding[..., 4:7], -np.pi / 4, np.pi / 4)
        gau = compute_world2local_dist(dists[..., :3], radii, rot)
        w = m * scale * jnp.exp(-0.5 * jnp.sum(jnp.square(gau), axis=-1))
        return w, embedding[..., 7:]
    return dist_weight(name, dists, pnt_mask), embedding


def gradient_clamp(conf: jnp.ndarray, lo=0.0001, hi=1.0) -> jnp.ndarray:
    """Straight-through clamp: clamped value forward, identity gradient
    (point_aggregators.py:1420-1424)."""
    diff = conf - jnp.clip(conf, lo, hi)
    return conf - jax.lax.stop_gradient(diff)


def raw2density(raw: jnp.ndarray, act_super: bool) -> jnp.ndarray:
    if act_super:
        return jax.nn.softplus(raw - 1.0)
    return jax.nn.relu(raw)


def raw2color(raw: jnp.ndarray, act_super: bool) -> jnp.ndarray:
    c = jax.nn.sigmoid(raw)
    if act_super:
        c = c * (1 + 2 * 0.001) - 0.001
    return c


# ---------------------------------------------------------------------------
# Parameter init (viewmlp_init, point_aggregators.py:484-751)
# ---------------------------------------------------------------------------

def block1_in_dim(cfg: AggregatorConfig, sh_degree: int = 4) -> int:
    dist_xyz_dim = (cfg.dist_dim if cfg.dist_xyz_freq == 0
                    else 2 * abs(cfg.dist_xyz_freq) * cfg.dist_dim)
    in_ch = cfg.point_features_dim
    # sh/gau kernels consume leading embedding channels (viewmlp_init :546)
    if cfg.agg_distance_kernel == "sh_intrp":
        in_ch -= sh_degree ** 2
    elif cfg.agg_distance_kernel == "gau_intrp":
        in_ch -= 7
    in_ch += 2 * cfg.num_feat_freqs * in_ch if cfg.num_feat_freqs > 0 else 0
    in_ch += dist_xyz_dim if cfg.agg_intrp_order > 0 else 0
    return in_ch


def viewdir_channels(cfg: AggregatorConfig) -> int:
    return 2 * cfg.num_viewdir_freqs * 3 if cfg.num_viewdir_freqs > 0 else 3


def init(key, cfg: AggregatorConfig) -> Dict:
    keys = jax.random.split(key, 12)
    act = cfg.act_type
    F = cfg.shading_feature_num
    half = F // 2
    aux_c = cfg.aux_feature_channels
    params: Dict = {}

    if cfg.shading_feature_mlp_layer1 > 0:
        dims = [block1_in_dim(cfg)] + [F] * cfg.shading_feature_mlp_layer1
        params["block1"] = mlp.mlp_init(keys[0], dims, act, final_act=True)
    if cfg.shading_feature_mlp_layer2 > 0:
        dims = [F] + [F] * cfg.shading_feature_mlp_layer2
        params["block2"] = mlp.mlp_init(keys[1], dims, act, final_act=True)
    if cfg.shading_feature_mlp_layer3 > 0:
        in3 = F + (3 if "1" in cfg.point_color_mode else 0) + (
            4 if "1" in cfg.point_dir_mode else 0)
        dims = [in3] + [F] * cfg.shading_feature_mlp_layer3
        params["block3"] = mlp.mlp_init(keys[2], dims, act, final_act=True)

    # alpha head: (layer-1) hidden of width F/2, final Linear(·, 1)
    a_dims = [F] + [half] * (cfg.shading_alpha_mlp_layer - 1) + [1]
    params["alpha"] = mlp.mlp_init(keys[3], a_dims, act)

    # color branch (full RGB head, kept for point-only mode parity)
    c_in = F + viewdir_channels(cfg)
    c_dims = [c_in] + [half] * (cfg.shading_color_mlp_layer - 1) + [3]
    params["color"] = mlp.mlp_init(keys[4], c_dims, act)

    # color-feature branch: Linear+act pairs only (no head), output F/2
    cf_dims = [c_in] + [half] * (cfg.shading_color_mlp_layer - 1)
    params["color_feature"] = mlp.mlp_init(keys[5], cf_dims, act,
                                           final_act=True)

    if cfg.use_nearest >= 0:
        if cfg.tradition_attention:
            # QKV attention fusion (attention.py:87-131): point feature is the
            # query, per-view image features (+ delta view) are K/V
            from hybridneuralrendering_tpu.models import attention
            ctx = aux_c + (3 if cfg.use_delta_view else 0)
            params["attention"] = attention.init(keys[6], half, ctx,
                                                 inner_channels=16)
        else:
            # fusion-weight MLP over [img_feat, 3D feat, delta viewdir]
            fin = aux_c + half + (3 if cfg.use_delta_view else 0)
            fdims = [fin, half // 2, half // 2, half // 2, 1]
            params["fusion_weight"] = mlp.mlp_init(keys[6], fdims, act)
        params["pyramid"] = feature_pyramid.init(
            keys[7], act, in_ch=3 + (2 if cfg.add_idx else 0))

    # mixup block
    if cfg.mixup_mode == "partial":
        # reference asserts F/2 > aux channels (point_aggregators.py:637)
        assert half > aux_c, (
            f"partial mixup needs shading_feature_num/2 ({half}) > "
            f"aux channels ({aux_c})")
        mix_in, mix_out = 2 * aux_c, aux_c
    else:
        mix_in, mix_out = half + aux_c, half
    if cfg.dynamic_weight:
        mdims = [mix_in, mix_out, mix_out, mix_out, 1]
    else:
        mdims = [mix_in, mix_out, mix_out, mix_out]
    # reference: learn_residuals variant ends without activation; plain variant
    # keeps a trailing activation — handled in apply
    params["mixup"] = mlp.mlp_init(keys[8], mdims, act,
                                   final_act=not cfg.learn_residuals
                                   and not cfg.dynamic_weight)

    final_in = half if cfg.feature_guidance else aux_c
    if cfg.large_color_final_block:
        params["color_final"] = mlp.mlp_init(
            keys[9], [final_in, final_in, 3], act)
    else:
        params["color_final"] = mlp.mlp_init(keys[9], [final_in, 3], act)
    if cfg.separate_color_decoder:
        params["color_final_2"] = mlp.mlp_init(keys[10], [final_in, 3], act)

    if cfg.learnable_blur_kernel:
        bin_ = 2 * cfg.learnable_blur_patch_size ** 2
        bout = cfg.learnable_blur_kernel_size ** 2
        if cfg.learnable_blur_kernel_mode in (2, 4):
            bout += 1
        params["blur_kernel"] = mlp.mlp_init(
            keys[11], [bin_, 128, 128, 128, bout], act)
    return params


class AggOutput(NamedTuple):
    features: jnp.ndarray          # [R, SR, 1+3] (sigma, rgb)
    ray_valid: jnp.ndarray         # [R, SR] bool
    weight: jnp.ndarray            # [R, SR, K]
    conf_coefficient: jnp.ndarray  # [R, SR, K]


def build_dists(cfg: AggregatorConfig, sampled_xyz, sampled_xyz_pers,
                sample_loc, sample_loc_w, sample_ray_dirs) -> jnp.ndarray:
    """agg_dist_pers dispatch (point_aggregators.py:1447-1495)."""
    p = cfg.agg_dist_pers
    wd = sampled_xyz - sample_loc_w[..., None, :]
    if p == 0:
        return wd
    if p == 1:
        return sampled_xyz_pers - sample_loc[..., None, :]
    if p == 2:
        return pers_delta(sampled_xyz_pers, sample_loc)
    if p == 10:
        return jnp.concatenate(
            [wd, sampled_xyz_pers - sample_loc[..., None, :]], axis=-1)
    if p == 20:
        return jnp.concatenate(
            [wd, pers_delta(sampled_xyz_pers, sample_loc)], axis=-1)
    if p == 30:
        proj = jnp.sum(wd * sample_ray_dirs[..., None, :], axis=-1,
                       keepdims=True)
        return jnp.concatenate([proj, wd], axis=-1)
    raise ValueError(f"illegal agg_dist_pers {p}")


def drop_ray_mask(cfg: AggregatorConfig, num_rays: int, patch_num: int,
                  patch_size: int) -> np.ndarray:
    """Rays whose image features are dropped during training.

    Port of drop_patch_rays (point_aggregators.py:14-23): with patch layout
    [patch_num*patch_size]^2 row-major, zero the first
    ⌊patch_num²*ratio⌋ patches.  Returns a static bool [num_rays] mask."""
    if cfg.drop_ratio <= 0:
        return np.zeros(num_rays, bool)
    side = patch_num * patch_size
    if cfg.drop_patch and side * side == num_rays:
        flag = np.zeros((side, side), bool)
        n_drop = int(patch_num * patch_num * cfg.drop_ratio)
        row, col = n_drop // patch_num, n_drop % patch_num
        flag[: row * patch_size, :] = True
        flag[row * patch_size: (row + 1) * patch_size, : col * patch_size] = True
        return flag.reshape(-1)
    flag = np.zeros(num_rays, bool)
    flag[: int(num_rays * cfg.drop_ratio)] = True
    return flag


def apply(params: Dict, cfg: AggregatorConfig, *,
          sampled_xyz, sampled_xyz_pers, sampled_embedding, sampled_color,
          sampled_dir, sampled_conf, pnt_mask, sample_loc, sample_loc_w,
          sample_ray_dirs, vsize,
          img_feat_n: Optional[jnp.ndarray] = None,
          img_feat_staged=None,
          sample_loc_i_n: Optional[jnp.ndarray] = None,
          delta_viewdir_n: Optional[jnp.ndarray] = None,
          frame_weight_n: Optional[jnp.ndarray] = None,
          view_mask: Optional[jnp.ndarray] = None,
          drop_mask: Optional[jnp.ndarray] = None,
          sampled_rw2c: Optional[jnp.ndarray] = None,
          train: bool = False) -> AggOutput:
    """Shade all [R, SR] samples from their K gathered neighbors.

    img_feat_n: [V, H, W, 45] precomputed pyramid features of nearest views
    (cache-friendly split from the CNN — see feature_pyramid.apply).
    img_feat_staged: alternative to img_feat_n — (images [V,H,W,3],
    (s1,s2,s3) pre-upsample stage maps); per-sample bilinear gathers replace
    the full-res upsample+lookup (16x smaller cache, same values).
    sample_loc_i_n: [V, R, SR, 2] reprojected pixel positions.
    drop_mask: [R] bool — rays whose image features are dropped (train only).
    """
    R, SR, K, _ = sampled_xyz.shape
    f32 = sampled_xyz.dtype
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    sdt = jnp.bfloat16 if cfg.shading_dtype == "bfloat16" else None

    ray_valid = jnp.any(pnt_mask, axis=-1)                       # [R, SR]
    dists = build_dists(cfg, sampled_xyz, sampled_xyz_pers, sample_loc,
                        sample_loc_w, sample_ray_dirs)           # [R,SR,K,C]
    dists = dists * pnt_mask[..., None].astype(f32)

    weight, sampled_embedding = dist_weight_ex(
        cfg.agg_distance_kernel, dists, pnt_mask, sampled_embedding, vsize,
        grid_vox_sz=vsize[2])
    if (cfg.agg_weight_norm and cfg.agg_distance_kernel != "trilinear"
            and not cfg.agg_distance_kernel.startswith("num")):
        weight = weight / jnp.maximum(
            jnp.sum(weight, axis=-1, keepdims=True), 1e-8)

    conf_coefficient = gradient_clamp(sampled_conf)              # [R, SR, K]
    # per-neighbor scalars stay 3-D [R,SR,K]: a trailing singleton would tile
    # its minor dim to 128 lanes (T(8,128)) and any materialization of the
    # [R*SR*K, 1] form costs 128x its logical bytes (round-2 trace tail:
    # fusion.53 alone 3.2 ms)
    w = weight * conf_coefficient                                # [R, SR, K]

    # ---- per-neighbor feature MLP (block1 [+ block3]) ----
    dists_flat = dists
    if cfg.dist_xyz_deno > 0:
        dists_flat = dists_flat / (
            cfg.dist_xyz_deno * float(np.linalg.norm(vsize)))
    if sampled_rw2c is not None:
        # scene editing: rotate world-space deltas into each part's original
        # frame (point_aggregators.py:927; per-point Rw2c from editing)
        rot = jnp.einsum("rskij,rskj->rski", sampled_rw2c,
                         dists_flat[..., :3])
        dists_flat = jnp.concatenate([rot, dists_flat[..., 3:]], axis=-1)
    # viewdirs: PE with raw prefix; ori part feeds the dir-delta features.
    # In edit mode, view dirs rotate into each part's original frame by its
    # first neighbor's Rw2c (point_aggregators.py:894-910)
    vdirs_in = sample_ray_dirs
    sampled_dir_in = sampled_dir
    if sampled_rw2c is not None:
        vdirs_in = jnp.einsum("rsij,rsj->rsi", sampled_rw2c[:, :, 0],
                              sample_ray_dirs)
        sampled_dir_in = jnp.einsum("rskij,rskj->rski", sampled_rw2c,
                                    sampled_dir)
    vdirs = positional_encoding(vdirs_in, cfg.num_viewdir_freqs, ori=True)
    ori_viewdirs, vdirs_enc = vdirs[..., :3], vdirs[..., 3:]     # [R,SR,·]

    extra_parts = []
    if cfg.shading_feature_mlp_layer3 > 0:
        if "1" in cfg.point_color_mode:
            extra_parts.append(sampled_color)
        if "1" in cfg.point_dir_mode:
            dir_delta = sampled_dir_in - ori_viewdirs[..., None, :]
            dir_dot = jnp.sum(sampled_dir_in * ori_viewdirs[..., None, :],
                              axis=-1, keepdims=True)
            extra_parts += [dir_delta, dir_dot]

    mask_w = pnt_mask.astype(f32) * w                            # [R,SR,K]
    # NOTE: a fused Pallas pass for this whole chain (block1[+2]+block3+
    # alpha with a recompute backward and on-chip PE) was bench-NEUTRAL —
    # XLA 13113 vs fused 12850-13223 across f32/bf16 variants; the chain's
    # residual traffic was not the binding cost.  Kernel retired to
    # tools/pallas_shading.py (round-2 log).
    def chain_fn(p, emb, dflat, extras, mw):
        """Per-neighbor MLP chain THROUGH the K-aggregation: in/out stay
        at [R,SR,·] sizes so remat_chain can drop every [R,SR,K,256]
        intermediate from the residual set."""
        if cfg.dist_xyz_freq != 0:
            dists_enc = positional_encoding(dflat, abs(cfg.dist_xyz_freq))
        else:
            dists_enc = dflat
        # NOTE: first-layer splits (mlp_apply_split) were bench-tested
        # here for block1/block3 and LOST (21859 -> 20145 rays/s): the
        # small part widths (32/66-ch contractions) waste the MXU, while
        # XLA already folds these same-leading-shape concats efficiently.
        # The split only pays off for the fusion MLP below, where it
        # removes a broadcast across the V axis.
        ft = emb
        if cfg.num_feat_freqs > 0:
            ft = jnp.concatenate(
                [ft, positional_encoding(ft, cfg.num_feat_freqs)],
                axis=-1)
        ft = jnp.concatenate([ft, dists_enc], axis=-1)
        ccdt = cdt
        if sdt is not None:
            # shading_dtype: ONE cast of inputs + weights at chain entry;
            # every inter-layer activation (and the remat recompute) then
            # stays bf16 — no per-matmul cast traffic, genuine one-pass
            # bf16 MXU dots.  PE above runs in f32; the K-aggregation
            # below accumulates in f32 (mw is f32, products promote).
            ft = ft.astype(sdt)
            extras = tuple(e.astype(sdt) for e in extras)
            p = jax.tree_util.tree_map(lambda x: x.astype(sdt), p)
            ccdt = None
        fvjp = cfg.fused_leaky_vjp
        ft = mlp.mlp_apply(p["block1"], ft, cfg.act_type,
                           final_act=True, compute_dtype=ccdt,
                           fused_vjp=fvjp)
        if cfg.shading_feature_mlp_layer2 > 0:
            ft = mlp.mlp_apply(p["block2"], ft, cfg.act_type,
                               final_act=True, compute_dtype=ccdt,
                               fused_vjp=fvjp)
        if cfg.shading_feature_mlp_layer3 > 0:
            ft = mlp.mlp_apply(p["block3"],
                               jnp.concatenate((ft,) + extras, axis=-1),
                               cfg.act_type, final_act=True,
                               compute_dtype=ccdt, fused_vjp=fvjp)
        # alpha head without a trailing singleton: the canonical head is a
        # single Linear(F, 1) — as a matvec einsum it lands at [R,SR,K]
        # directly instead of a 128x-lane-padded [R*SR*K, 1] dot output
        if len(p["alpha"]) == 1:
            a_raw = jnp.einsum("...c,c->...", ft, p["alpha"][0]["w"][:, 0])
            a_raw = a_raw + p["alpha"][0]["b"][0]
        else:
            a_raw = mlp.mlp_apply(p["alpha"], ft, cfg.act_type,
                                  compute_dtype=ccdt)[..., 0]
        a_raw = a_raw.astype(f32)
        # per-neighbor alpha, aggregated with conf-scaled weights
        # (agg_intrp_order 2); mw rides 3-D, broadcasting only inside the
        # reduce fusions.  ft*mw promotes bf16->f32, so the K-reduction
        # accumulates in f32 under shading_dtype too.
        return (jnp.sum(raw2density(a_raw, cfg.act_super) * mw,
                        axis=-1)[..., None],
                jnp.sum(ft * mw[..., None], axis=-2))

    if cfg.remat_chain:
        chain_fn = jax.checkpoint(
            chain_fn, policy=jax.checkpoint_policies.nothing_saveable)
    chain_params = {k: params[k] for k in
                    ("block1", "block2", "block3", "alpha")
                    if k in params}
    nc = cfg.chain_chunks
    if nc > 1 and R % nc == 0:
        # sequential ray chunks bound peak HBM (see chain_chunks doc)
        def scan_body(_, xs):
            emb_c, dflat_c, mw_c = xs[:3]
            return 0, chain_fn(chain_params, emb_c, dflat_c,
                               tuple(xs[3:]), mw_c)

        leaves = (sampled_embedding, dists_flat, mask_w) + \
            tuple(extra_parts)
        xs = tuple(x.reshape((nc, R // nc) + x.shape[1:])
                   for x in leaves)
        _, (alpha, feat_agg) = jax.lax.scan(scan_body, 0, xs)
        alpha = alpha.reshape(R, SR, 1)
        feat_agg = feat_agg.reshape(R, SR, -1)
    else:
        alpha, feat_agg = chain_fn(chain_params, sampled_embedding,
                                   dists_flat, tuple(extra_parts),
                                   mask_w)

    # ---- 3D color-feature branch ----
    vd = jnp.zeros_like(vdirs_enc) if cfg.disable_viewdirs else vdirs_enc
    color_in = jnp.concatenate([feat_agg, vd], axis=-1)
    color_feature = mlp.mlp_apply(params["color_feature"], color_in,
                                  cfg.act_type, final_act=True,
                                  compute_dtype=cdt)              # [R,SR,half]
    if cfg.disable_color_feature:
        color_feature = color_feature * 0.0

    # ---- hybrid image-feature fusion + mixup (models/fusion.py) ----
    from hybridneuralrendering_tpu.models import fusion as fusion_mod
    merged = fusion_mod.image_fusion(
        params, cfg, color_feature, img_feat_n, img_feat_staged,
        sample_loc_i_n, delta_viewdir_n, frame_weight_n, view_mask,
        drop_mask, train, compute_dtype=cdt)
    color_feature_mix = fusion_mod.mixup(params, cfg, color_feature, merged,
                                         compute_dtype=cdt)

    if cfg.separate_color_decoder and train and drop_mask is not None:
        rgb_mix = raw2color(mlp.mlp_apply(params["color_final"],
                                          color_feature_mix, cfg.act_type),
                            cfg.act_super)
        rgb_pnt = raw2color(mlp.mlp_apply(params["color_final_2"],
                                          color_feature, cfg.act_type),
                            cfg.act_super)
        dm = drop_mask[:, None, None].astype(f32)
        rgb = rgb_pnt * dm + rgb_mix * (1 - dm)
    else:
        rgb = raw2color(mlp.mlp_apply(params["color_final"],
                                      color_feature_mix, cfg.act_type,
                                      compute_dtype=cdt),
                        cfg.act_super)

    out = jnp.concatenate([alpha, rgb], axis=-1)                 # [R, SR, 4]
    out = out * ray_valid[..., None].astype(f32)
    return AggOutput(features=out, ray_valid=ray_valid, weight=weight,
                     conf_coefficient=conf_coefficient)
