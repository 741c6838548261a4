"""Multi-view geometric-consistency depth filtering.

TPU-native port of /root/reference/models/mvs/filter_utils.py:157-299: project
each reference pixel's depth into a source view, sample the source depth there,
reproject back, and accept if pixel error < 1px and relative depth error < 1%.
The per-view python loop becomes a `lax.scan` over source views; the boolean
compactions of the reference become masks (fixed shapes).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from hybridneuralrendering_tpu.mvs.warp import bilinear_sample


def reproject_with_depth(depth_ref: jnp.ndarray, k_ref: jnp.ndarray,
                         e_ref: jnp.ndarray, depth_src: jnp.ndarray,
                         k_src: jnp.ndarray, e_src: jnp.ndarray):
    """reproject_with_depth_gpu (filter_utils.py:157-201).

    depth_*: [H, W]; k_*: [3,3] intrinsics; e_*: [4,4] world->cam extrinsics.
    Returns (depth_reprojected [H,W], xy_reprojected [H,W,2])."""
    H, W = depth_ref.shape
    ys, xs = jnp.mgrid[0:H, 0:W].astype(depth_ref.dtype)
    pix1 = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)   # [H, W, 3]
    xyz_ref = (pix1 @ jnp.linalg.inv(k_ref).T) * depth_ref[..., None]
    ones = jnp.ones_like(depth_ref[..., None])
    xyz_src = (jnp.concatenate([xyz_ref, ones], -1)
               @ (e_src @ jnp.linalg.inv(e_ref)).T)[..., :3]
    k_xyz = xyz_src @ k_src.T
    xy_src = k_xyz[..., :2] / k_xyz[..., 2:3]                # [H, W, 2]

    sampled = bilinear_sample(depth_src[..., None],
                              xy_src.reshape(-1, 2)).reshape(H, W)
    xyz_src2 = (jnp.concatenate([xy_src, jnp.ones_like(sampled[..., None])],
                                -1) @ jnp.linalg.inv(k_src).T
                ) * sampled[..., None]
    xyz_rep = (jnp.concatenate([xyz_src2, ones], -1)
               @ (e_ref @ jnp.linalg.inv(e_src)).T)[..., :3]
    depth_rep = xyz_rep[..., 2]
    k_rep = xyz_rep @ k_ref.T
    xy_rep = k_rep[..., :2] / k_rep[..., 2:3]
    return depth_rep, xy_rep


def check_geometric_consistency(depth_ref, k_ref, e_ref, depth_src, k_src,
                                e_src) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(geo_mask [H,W], depth_reprojected-zeroed-outside-mask [H,W])
    (filter_utils.py:203-220)."""
    H, W = depth_ref.shape
    ys, xs = jnp.mgrid[0:H, 0:W].astype(depth_ref.dtype)
    depth_rep, xy_rep = reproject_with_depth(
        depth_ref, k_ref, e_ref, depth_src, k_src, e_src)
    dist = jnp.sqrt((xy_rep[..., 0] - xs) ** 2 + (xy_rep[..., 1] - ys) ** 2)
    rel = jnp.abs(depth_rep - depth_ref) / jnp.maximum(depth_ref, 1e-8)
    mask = (dist < 1.0) & (rel < 0.01)
    return mask, jnp.where(mask, depth_rep, 0.0)


def filter_depths(depths: jnp.ndarray, intrinsics: jnp.ndarray,
                  extrinsics: jnp.ndarray, confidences: jnp.ndarray,
                  conf_thresh: float = 0.8, geo_cnsst_num: int = 0):
    """All-pairs consistency filter (filter_by_masks_gpu, :222-291).

    depths: [V, H, W]; intrinsics: [V, 3, 3]; extrinsics: [V, 4, 4] (w2c);
    confidences: [V, H, W].  Returns (final_mask [V, H, W],
    depth_avg [V, H, W], geo_sum [V, H, W]) — depth averaged over the views
    that matched, geo_sum = per-pixel match count (feeds reassign_conf)."""
    V = depths.shape[0]

    def per_ref(ref):
        def body(carry, src):
            geo_sum, depth_sum = carry
            mask, dep = check_geometric_consistency(
                depths[ref], intrinsics[ref], extrinsics[ref],
                depths[src], intrinsics[src], extrinsics[src])
            same = src == ref
            mask = jnp.where(same, False, mask)
            dep = jnp.where(same, 0.0, dep)
            return (geo_sum + mask.astype(jnp.int32), depth_sum + dep), None

        (geo_sum, depth_sum), _ = jax.lax.scan(
            body, (jnp.zeros(depths.shape[1:], jnp.int32),
                   jnp.zeros(depths.shape[1:])), jnp.arange(V))
        depth_avg = (depth_sum + depths[ref]) / (geo_sum + 1)
        geo_mask = geo_sum >= geo_cnsst_num
        final = (confidences[ref] > conf_thresh) & geo_mask
        if V <= 1:
            final = confidences[ref] > conf_thresh
        return final, depth_avg, geo_sum

    masks, depth_avgs, geo_sums = jax.vmap(per_ref)(jnp.arange(V))
    return masks, depth_avgs, geo_sums


def reassign_conf(conf: jnp.ndarray, geo_mask_sum: jnp.ndarray,
                  geo_cnsst_num: int) -> jnp.ndarray:
    """Confidence boost by match count (filter_utils.py:294-297)."""
    s = jnp.clip(geo_mask_sum - geo_cnsst_num + 1, 1, 10).astype(conf.dtype)
    return conf * (1.0 - 1.0 / jnp.power(1.14869, s))
