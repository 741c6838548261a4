"""Official MVSNet depth estimator: plane-sweep variance cost volume + 3D U-Net.

TPU rewrite of /root/reference/models/depth_estimators/mvsnet.py (the
pretrained depth net used with manual_depth_view>=1; checkpoint
`checkpoints/MVSNet/model_000014.ckpt`, run/train_ft.py:86-96 via
mvs_points_model.load_pretrained_d_est).  The parameter tree mirrors the
torch module layer-for-layer (ConvBnReLU blocks with plain ReLU, 3D U-Net
with transpose-conv upsampling, 1-channel `prob` head) so the released torch
checkpoint imports directly — see io/torch_import.import_mvsnet.

The per-view python loop of the reference becomes a `lax.scan` accumulating
sum and sum-of-squares — the variance volume never materializes per-view
warps simultaneously (HBM-friendly).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hybridneuralrendering_tpu.mvs import warp as W
from hybridneuralrendering_tpu.mvs.features import bn_apply, bn_init
from hybridneuralrendering_tpu.models import mlp


# ---------------------------------------------------------------------------
# ConvBnReLU blocks (depth_estimators/module.py:6-33; plain ReLU, bias-free
# convs with BN)
# ---------------------------------------------------------------------------

def _conv_bn_init(key, cin: int, cout: int, k: int = 3) -> Dict:
    return {"conv": {"w": mlp.conv2d_init(key, cin, cout, k)["w"]},
            "bn": bn_init(cout)}


def _conv_bn_apply(p: Dict, x, stride=1, train=False):
    k = p["conv"]["w"].shape[0]
    y = jax.lax.conv_general_dilated(
        x, p["conv"]["w"], (stride, stride),
        ((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(bn_apply(p["bn"], y, train))


def _conv3d_bn_init(key, cin: int, cout: int, k: int = 3) -> Dict:
    fan_in = cin * k ** 3
    w = mlp.xavier_uniform(key, (k, k, k, cin, cout), fan_in, cout * k ** 3)
    return {"conv": {"w": w}, "bn": bn_init(cout)}


def _conv3d_bn_apply(p: Dict, x, stride=1, train=False):
    """x: [D, H, W, C]."""
    k = p["conv"]["w"].shape[0]
    y = jax.lax.conv_general_dilated(
        x[None], p["conv"]["w"], (stride,) * 3, ((k // 2, k // 2),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]
    return jax.nn.relu(bn_apply(p["bn"], y, train))


def _deconv3d_bn_apply(p: Dict, x, train=False):
    """torch ConvTranspose3d(k=3, stride=2, padding=1, output_padding=1):
    exactly lhs_dilation=2 with asymmetric padding (k-1-p, k-1-p+op) = (1, 2)
    and the spatially-flipped kernel.  Kernel stored DHWIO with I = the
    transpose-conv's IN channels (io/torch_import handles the flip+permute)."""
    y = jax.lax.conv_general_dilated(
        x[None], p["conv"]["w"], (1, 1, 1), ((1, 2),) * 3,
        lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]
    return jax.nn.relu(bn_apply(p["bn"], y, train))


def _deconv3d_bn_init(key, cin: int, cout: int, k: int = 3) -> Dict:
    fan_in = cin * k ** 3
    w = mlp.xavier_uniform(key, (k, k, k, cin, cout), fan_in, cout * k ** 3)
    return {"conv": {"w": w}, "bn": bn_init(cout)}


# ---------------------------------------------------------------------------
# FeatureNet (depth_estimators/mvsnet.py:7-27): 3->8->16->32 at 1/4 res
# ---------------------------------------------------------------------------

def feature_init(key) -> Dict:
    ks = jax.random.split(key, 8)
    kf = jax.random.split(ks[7])[0]
    return {
        "conv0": _conv_bn_init(ks[0], 3, 8, 3),
        "conv1": _conv_bn_init(ks[1], 8, 8, 3),
        "conv2": _conv_bn_init(ks[2], 8, 16, 5),
        "conv3": _conv_bn_init(ks[3], 16, 16, 3),
        "conv4": _conv_bn_init(ks[4], 16, 16, 3),
        "conv5": _conv_bn_init(ks[5], 16, 32, 5),
        "conv6": _conv_bn_init(ks[6], 32, 32, 3),
        "feature": mlp.conv2d_init(kf, 32, 32, 3),   # biased conv, no BN
    }


def feature_apply(p: Dict, images: jnp.ndarray, train: bool = False
                  ) -> jnp.ndarray:
    """images: [V, H, W, 3] -> [V, H/4, W/4, 32]."""
    x = _conv_bn_apply(p["conv1"], _conv_bn_apply(p["conv0"], images, 1, train),
                       1, train)
    x = _conv_bn_apply(p["conv2"], x, 2, train)
    x = _conv_bn_apply(p["conv4"], _conv_bn_apply(p["conv3"], x, 1, train),
                       1, train)
    x = _conv_bn_apply(p["conv5"], x, 2, train)
    x = _conv_bn_apply(p["conv6"], x, 1, train)
    return mlp.conv2d_apply(p["feature"], x)


# ---------------------------------------------------------------------------
# CostRegNet (depth_estimators/mvsnet.py:30-71): 3D U-Net + 1-ch prob head
# ---------------------------------------------------------------------------

def cost_reg_init(key) -> Dict:
    ks = jax.random.split(key, 11)
    kp = jax.random.split(ks[10])
    fan_in = 8 * 27
    return {
        "conv0": _conv3d_bn_init(ks[0], 32, 8),
        "conv1": _conv3d_bn_init(ks[1], 8, 16),
        "conv2": _conv3d_bn_init(ks[2], 16, 16),
        "conv3": _conv3d_bn_init(ks[3], 16, 32),
        "conv4": _conv3d_bn_init(ks[4], 32, 32),
        "conv5": _conv3d_bn_init(ks[5], 32, 64),
        "conv6": _conv3d_bn_init(ks[6], 64, 64),
        "conv7": _deconv3d_bn_init(ks[7], 64, 32),
        "conv9": _deconv3d_bn_init(ks[8], 32, 16),
        "conv11": _deconv3d_bn_init(ks[9], 16, 8),
        "prob": {"w": mlp.xavier_uniform(kp[0], (3, 3, 3, 8, 1), fan_in, 27),
                 "b": jnp.zeros((1,))},
    }


def _crop_to(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Guard for odd extents (torch's output_padding arithmetic requires the
    upsampled size to match the skip; crop if the caller fed odd dims)."""
    return x[: ref.shape[0], : ref.shape[1], : ref.shape[2]]


def cost_reg_apply(p: Dict, vol: jnp.ndarray, train: bool = False
                   ) -> jnp.ndarray:
    """vol: [D, H, W, 32] -> cost scores [D, H, W] (1-ch prob head)."""
    c0 = _conv3d_bn_apply(p["conv0"], vol, 1, train)
    c2 = _conv3d_bn_apply(p["conv2"],
                          _conv3d_bn_apply(p["conv1"], c0, 2, train), 1, train)
    c4 = _conv3d_bn_apply(p["conv4"],
                          _conv3d_bn_apply(p["conv3"], c2, 2, train), 1, train)
    x = _conv3d_bn_apply(p["conv6"],
                         _conv3d_bn_apply(p["conv5"], c4, 2, train), 1, train)
    x = c4 + _crop_to(_deconv3d_bn_apply(p["conv7"], x, train), c4)
    x = c2 + _crop_to(_deconv3d_bn_apply(p["conv9"], x, train), c2)
    x = c0 + _crop_to(_deconv3d_bn_apply(p["conv11"], x, train), c0)
    y = jax.lax.conv_general_dilated(
        x[None], p["prob"]["w"], (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0] + p["prob"]["b"]
    return y[..., 0]


def init(key) -> Dict:
    k1, k2 = jax.random.split(key)
    return {"feature": feature_init(k1), "cost_reg": cost_reg_init(k2)}


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
    """Estimate the reference view's depth map from V posed views
    (depth_estimators/mvsnet.py:98-135).

    images: [V, H, W, 3] (view 0 = reference); intrinsic: [3,3] full-res;
    w2cs: [V, 4, 4]; depth_values: [D] sweep planes.
    Returns (depth [H/4, W/4], confidence [H/4, W/4])."""
    V = images.shape[0]
    feats = feature_apply(params["feature"], images, train)  # [V, h, w, 32]
    D = depth_values.shape[0]

    ref_proj = build_proj(intrinsic, w2cs[0])
    ref_proj_inv = jnp.linalg.inv(ref_proj)

    # accumulate sum and sum^2 over views with a scan (variance volume).
    # The reference warps the ref view too (vid 0, identity relative proj,
    # mvsnet.py:113-121) — kept for bit-parity with its grid_sample taps.
    h, w = feats.shape[1], feats.shape[2]
    zero = jnp.zeros((D, h, w, feats.shape[-1]), feats.dtype)
    carry0 = (zero, zero)

    def body(carry, inp):
        feat_v, w2c_v = inp
        s, s2 = carry
        proj = (build_proj(intrinsic, w2c_v) @ ref_proj_inv)[:3]
        warped = W.plane_sweep_warp(feat_v, proj, depth_values)
        return (s + warped, s2 + warped ** 2), None

    (vsum, vsum2), _ = jax.lax.scan(body, carry0, (feats, w2cs))
    volume_variance = vsum2 / V - (vsum / V) ** 2            # [D, h, w, 32]

    score = cost_reg_apply(params["cost_reg"], volume_variance, train)
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
