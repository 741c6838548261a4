"""Neural-point generation from posed images (+ optional depth).

TPU rewrite of /root/reference/models/mvs/mvs_points_model.py: per-view depth
(GT sensor depth, or MVSNet plane sweep), geometric-consistency filtering,
unprojection to world, and `query_embedding` — warping the FeatureNet pyramid
('imgfeat_0_0123'), per-view direction features ('dir_0'), and photometric
confidence ('point_conf') onto each point, optionally compressed by a pre-MLP
to point_features_dim (mvs_points_model.py:225-259).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hybridneuralrendering_tpu.models import mlp
from hybridneuralrendering_tpu.mvs import features as F
from hybridneuralrendering_tpu.mvs import mvsnet
from hybridneuralrendering_tpu.mvs.warp import bilinear_sample, project_to_view


class MvsPointsParams(NamedTuple):
    feature: Dict          # FeatureNet
    mvsnet: Optional[Dict]  # depth estimator (None with GT depth)
    premlp: Optional[list]  # embedding compressor


# imgfeat_0_0123 channels: RGB(3 -> colors) + 8 + 16 + 32 = 56 feats
IMGFEAT_CHANNELS = 8 + 16 + 32


def init(key, point_features_dim: int = 32, use_mvsnet: bool = True,
         use_premlp: bool = True, act: str = "leaky_relu") -> MvsPointsParams:
    k1, k2, k3 = jax.random.split(key, 3)
    prem = None
    if use_premlp:
        # premlp input: imgfeats + colors(3) + dirs(3) + conf(1)
        in_dim = IMGFEAT_CHANNELS + 3 + 3 + 1
        prem = mlp.mlp_init(k3, [in_dim, point_features_dim], act)
    return MvsPointsParams(
        feature=F.feature_net_init(k1),
        mvsnet=mvsnet.init(k2) if use_mvsnet else None,
        premlp=prem)


def query_embedding(params: MvsPointsParams, cam_xyz: jnp.ndarray,
                    images: jnp.ndarray, c2ws: jnp.ndarray, w2cs: jnp.ndarray,
                    intrinsic: jnp.ndarray, cam_vid: int,
                    confidence: Optional[jnp.ndarray] = None,
                    act: str = "leaky_relu"
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                               jnp.ndarray]:
    """Per-point (embedding, color, dir, conf) from view `cam_vid`'s features.

    cam_xyz: [N, 3] points in cam_vid's camera space; images: [V, H, W, 3];
    c2ws/w2cs: [V, 4, 4].  Feature spec fixed to the canonical
    'imgfeat_0_0123 dir_0 point_conf' (scene241_full.sh:36)."""
    H, W = images.shape[1:3]
    pyr = F.feature_net_apply(params.feature, images, intermediate=True)
    # view 0 of the group supplies features (view_ids = [0])
    vid = 0
    if vid == cam_vid:
        xy, mask = project_to_view(cam_xyz, jnp.eye(4), jnp.eye(4),
                                   intrinsic, H, W)
    else:
        xy, mask = project_to_view(cam_xyz, c2ws[cam_vid], w2cs[vid],
                                   intrinsic, H, W)

    feats, colors = [], None
    for lid, fmap in enumerate(pyr):
        scale = fmap.shape[0] / H
        sampled = bilinear_sample(fmap[vid], xy * scale, mask)
        if lid == 0:
            colors = sampled
        else:
            feats.append(sampled)
    embedding = jnp.concatenate(feats, axis=-1)              # [N, 56]

    # dir_0: unit vector point -> view-0 camera, rotated into world
    cam_pos_world = c2ws[vid, :3, 3]
    cam_pos_cam = (jnp.append(cam_pos_world, 1.0) @ w2cs[cam_vid].T)[:3]
    dirs = cam_xyz - cam_pos_cam
    dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-6)
    dirs = dirs @ c2ws[cam_vid, :3, :3].T                    # world coords

    if confidence is None:
        conf = jnp.ones_like(embedding[..., :1])
    else:
        conf = confidence.reshape(-1, 1)

    if params.premlp is not None:
        embedding = mlp.mlp_apply(
            params.premlp,
            jnp.concatenate([embedding, colors, dirs, conf], axis=-1), act)
    return embedding, colors, dirs, conf


def gen_depth(params: MvsPointsParams, images: jnp.ndarray,
              intrinsic: jnp.ndarray, w2cs: jnp.ndarray,
              near: float, far: float, num_depths: int = 192):
    """MVSNet depth + confidence maps for the group's reference view at 1/4
    resolution.  Returns (depth [h, w], conf [h, w], k_quarter [3, 3])."""
    depth_values = jnp.linspace(near, far, num_depths)
    depth, conf = mvsnet.depth_from_views(
        params.mvsnet, images, intrinsic, w2cs, depth_values)
    return depth, conf, intrinsic.at[:2].multiply(0.25)


def gen_points(params: MvsPointsParams, images: jnp.ndarray,
               intrinsic: jnp.ndarray, w2cs: jnp.ndarray,
               near: float, far: float, num_depths: int = 192,
               depth_gt: Optional[jnp.ndarray] = None,
               conf_thresh: float = 0.8):
    """Depth -> camera-space points + confidence for the reference view
    (gen_points, mvs_points_model.py:262-341).

    With `depth_gt` (manual_depth_view=0) the sensor depth is used directly;
    otherwise the MVSNet plane sweep estimates it at 1/4 resolution.
    Returns (cam_xyz [M, 3], conf [M], mask [M]) at fixed M = H*W (masked)."""
    if depth_gt is not None:
        depth = depth_gt
        conf = jnp.ones_like(depth)
        k = intrinsic
    else:
        depth, conf, k = gen_depth(params, images, intrinsic, w2cs, near,
                                   far, num_depths)
    cam_xyz = mvsnet.depth_to_cam_xyz(depth, k)
    mask = (depth.reshape(-1) > 0) & (conf.reshape(-1) > conf_thresh)
    return cam_xyz, conf.reshape(-1), mask
