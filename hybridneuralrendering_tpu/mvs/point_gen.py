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
from hybridneuralrendering_tpu.mvs import warp as W
from hybridneuralrendering_tpu.mvs.warp import bilinear_sample, project_to_view


class MvsPointsParams(NamedTuple):
    feature: Dict          # FeatureNet
    mvsnet: Optional[Dict]  # depth estimator (None with GT depth)
    premlp: Optional[list]  # embedding compressor
    # manual_depth_view = -1 (learned depth, mvs_points_model.py:282-296):
    # cost-volume regularizer + ProbNet over the FPN features
    cost_reg: Optional[Dict] = None
    prob_net: Optional[Dict] = None


# imgfeat_0_0123 channels: RGB(3 -> colors) + 8 + 16 + 32 = 56 feats
IMGFEAT_CHANNELS = 8 + 16 + 32


def init(key, point_features_dim: int = 32, use_mvsnet: bool = True,
         use_premlp: bool = True, act: str = "leaky_relu",
         use_probnet: bool = False) -> MvsPointsParams:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    prem = None
    if use_premlp:
        # premlp input: imgfeats + colors(3) + dirs(3) + conf(1)
        in_dim = IMGFEAT_CHANNELS + 3 + 3 + 1
        prem = mlp.mlp_init(k3, [in_dim, point_features_dim], act)
    return MvsPointsParams(
        feature=F.feature_net_init(k1),
        mvsnet=mvsnet.init(k2) if use_mvsnet else None,
        premlp=prem,
        cost_reg=F.cost_reg_init(k4, 32) if use_probnet else None,
        prob_net=F.prob_net_init(k5, 8) if use_probnet else None)


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


def gen_depth_learned(params: MvsPointsParams, images: jnp.ndarray,
                      intrinsic: jnp.ndarray, w2cs: jnp.ndarray,
                      near: float, far: float, num_depths: int = 128,
                      train: bool = False):
    """manual_depth_view = -1: depth from the *learned* probability volume
    (mvs_points_model.py:282-296 — MVSNet cost volume -> ProbNet).

    The FPN FeatureNet's 1/4-res features build a plane-sweep variance
    volume, the mvs/models.py CostRegNet regularizes it to 8 channels, and
    ProbNet turns it into a per-depth probability; expected depth +
    probability peak mass give (depth, conf) like the pretrained path.
    Trainable end-to-end (the third optimizer group's parameters).
    Returns (depth [h, w], conf [h, w], k_quarter)."""
    feats = F.feature_net_apply(params.feature, images, train,
                                intermediate=False)[0]     # [V, h, w, 32]
    depth_values = jnp.linspace(near, far, num_depths)
    ref_proj = mvsnet.build_proj(intrinsic, w2cs[0])
    ref_proj_inv = jnp.linalg.inv(ref_proj)
    V = images.shape[0]
    D = num_depths
    h, w = feats.shape[1], feats.shape[2]
    zero = jnp.zeros((D, h, w, feats.shape[-1]), feats.dtype)

    def body(carry, inp):
        feat_v, w2c_v = inp
        s, s2 = carry
        proj = (mvsnet.build_proj(intrinsic, w2c_v) @ ref_proj_inv)[:3]
        warped = W.plane_sweep_warp(feat_v, proj, depth_values)
        return (s + warped, s2 + warped ** 2), None

    (vsum, vsum2), _ = jax.lax.scan(body, (zero, zero), (feats, w2cs))
    variance = vsum2 / V - (vsum / V) ** 2
    reg = F.cost_reg_apply(params.cost_reg, variance, train)   # [D, h, w, 8]
    prob = F.prob_net_apply(params.prob_net, reg, train)[..., 0]  # [D, h, w]
    depth = W.depth_regression(prob, depth_values)
    idx = W.depth_regression(prob, jnp.arange(D, dtype=prob.dtype))
    conf = W.photometric_confidence(prob, idx)
    return depth, conf, intrinsic.at[:2].multiply(0.25)


def gen_points(params: MvsPointsParams, images: jnp.ndarray,
               intrinsic: jnp.ndarray, w2cs: jnp.ndarray,
               near: float, far: float, num_depths: int = 192,
               depth_gt: Optional[jnp.ndarray] = None,
               conf_thresh: float = 0.8, learned: bool = False):
    """Depth -> camera-space points + confidence for the reference view
    (gen_points, mvs_points_model.py:262-341).

    With `depth_gt` (manual_depth_view=0) the sensor depth is used directly;
    `learned=True` (manual_depth_view=-1) uses the trainable ProbNet volume;
    otherwise the pretrained MVSNet plane sweep estimates it at 1/4 res.
    Returns (cam_xyz [M, 3], conf [M], mask [M]) at fixed M = H*W (masked)."""
    if depth_gt is not None:
        depth = depth_gt
        conf = jnp.ones_like(depth)
        k = intrinsic
    elif learned:
        depth, conf, k = gen_depth_learned(params, images, intrinsic, w2cs,
                                           near, far, num_depths)
    else:
        depth, conf, k = gen_depth(params, images, intrinsic, w2cs, near,
                                   far, num_depths)
    cam_xyz = mvsnet.depth_to_cam_xyz(depth, k)
    mask = (depth.reshape(-1) > 0) & (conf.reshape(-1) > conf_thresh)
    return cam_xyz, conf.reshape(-1), mask
