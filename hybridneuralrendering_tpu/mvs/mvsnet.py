"""MVSNet depth estimator: plane-sweep variance cost volume + 3D U-Net.

TPU rewrite of /root/reference/models/depth_estimators/mvsnet.py:98-143 (the
pretrained depth net used with manual_depth_view>=1) sharing the FeatureNet /
CostRegNet blocks.  The per-view python loop of the reference becomes a
`lax.scan` accumulating sum and sum-of-squares — the variance volume never
materializes per-view warps simultaneously (HBM-friendly)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hybridneuralrendering_tpu.mvs import features as F
from hybridneuralrendering_tpu.mvs import warp as W


def init(key) -> Dict:
    k1, k2 = jax.random.split(key)
    return {"feature": F.feature_net_init(k1),
            "cost_reg": F.cost_reg_init(k2, 32)}


def build_proj(intrinsic: jnp.ndarray, w2c: jnp.ndarray,
               scale: float = 0.25) -> jnp.ndarray:
    """[4,4] projection with intrinsics scaled to the feature resolution
    (reference builds proj mats at 1/4, nerf_synth360_ft_dataset.py:497-501)."""
    k = intrinsic.at[:2].multiply(scale)
    proj = jnp.eye(4, dtype=intrinsic.dtype)
    proj = proj.at[:3, :4].set(k @ w2c[:3, :4])
    return proj


def depth_from_views(params: Dict, images: jnp.ndarray, intrinsic: jnp.ndarray,
                     w2cs: jnp.ndarray, depth_values: jnp.ndarray,
                     train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Estimate the reference view's depth map from V posed views.

    images: [V, H, W, 3] (view 0 = reference); intrinsic: [3,3] full-res;
    w2cs: [V, 4, 4]; depth_values: [D] sweep planes.
    Returns (depth [H/4, W/4], confidence [H/4, W/4])."""
    V, H, Wd, _ = images.shape
    feats = F.feature_net_apply(params["feature"], images, train,
                                intermediate=False)[0]       # [V, H/4, W/4, 32]
    ref_feat = feats[0]
    D = depth_values.shape[0]

    ref_proj = build_proj(intrinsic, w2cs[0])
    ref_proj_inv = jnp.linalg.inv(ref_proj)

    # accumulate sum and sum^2 over views with a scan (variance volume)
    init_sum = jnp.broadcast_to(ref_feat[None], (D,) + ref_feat.shape)
    carry0 = (init_sum, init_sum ** 2)

    def body(carry, inp):
        feat_v, w2c_v = inp
        s, s2 = carry
        proj = (build_proj(intrinsic, w2c_v) @ ref_proj_inv)[:3]
        warped = W.plane_sweep_warp(feat_v, proj, depth_values)
        return (s + warped, s2 + warped ** 2), None

    (vsum, vsum2), _ = jax.lax.scan(body, carry0, (feats[1:], w2cs[1:]))
    volume_variance = vsum2 / V - (vsum / V) ** 2            # [D, h, w, 32]

    reg = F.cost_reg_apply(params["cost_reg"], volume_variance, train)
    # reference collapses the 8-ch regularized volume to 1 score per voxel
    score = jnp.mean(reg, axis=-1)                           # [D, h, w]
    prob = jax.nn.softmax(score, axis=0)
    depth = W.depth_regression(prob, depth_values)
    idx = W.depth_regression(prob, jnp.arange(D, dtype=prob.dtype))
    conf = W.photometric_confidence(prob, idx)
    return depth, conf


def depth_to_cam_xyz(depth: jnp.ndarray, intrinsic: jnp.ndarray
                     ) -> jnp.ndarray:
    """depth [H, W] -> camera-space points [H*W, 3]
    (depth2point, mvs_points_model.py:171-182)."""
    H, Wd = depth.shape
    ys, xs = jnp.mgrid[0:H, 0:Wd].astype(depth.dtype)
    pix = jnp.stack([xs * depth, ys * depth, depth], axis=-1)
    return (pix @ jnp.linalg.inv(intrinsic).T).reshape(-1, 3)
