"""MVS feature networks: FPN FeatureNet, 3D cost regularization U-Net.

TPU rewrite of /root/reference/models/mvs/models.py:685-822.  The reference's
InPlaceABN (a CUDA memory trick fusing BN + LeakyReLU in place) is plain
BN + leaky_relu(0.01) here — XLA fuses it without the in-place hack
(SURVEY §2.9 item 5).  BN carries explicit running stats in the param tree;
`train=True` normalizes with batch statistics (stat updates are the trainer's
job, mirroring torch's momentum update outside the graph).
NHWC / NDHWC layouts throughout.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from hybridneuralrendering_tpu.models import mlp

ABN_SLOPE = 0.01


def bn_init(ch: int) -> Dict:
    return {"scale": jnp.ones(ch), "bias": jnp.zeros(ch),
            "mean": jnp.zeros(ch), "var": jnp.ones(ch)}


def bn_apply(p: Dict, x: jnp.ndarray, train: bool = False,
             eps: float = 1e-5) -> jnp.ndarray:
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axes)
        var = jnp.var(x, axes)
    else:
        mean, var = p["mean"], p["var"]
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * p["scale"] + p["bias"]


def _abn(x):
    return jax.nn.leaky_relu(x, ABN_SLOPE)


def conv_bn_init(key, cin: int, cout: int, k: int = 3) -> Dict:
    return {"conv": mlp.conv2d_init(key, cin, cout, k),
            "bn": bn_init(cout)}


def conv_bn_apply(p: Dict, x, stride=1, train=False):
    # bias-free conv in the reference; the BN bias absorbs it.
    # torch-style symmetric k//2 padding (XLA SAME shifts under stride>1)
    k = p["conv"]["w"].shape[0]
    y = jax.lax.conv_general_dilated(
        x, p["conv"]["w"], (stride, stride),
        ((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _abn(bn_apply(p["bn"], y, train))


def conv3d_init(key, cin: int, cout: int, k: int = 3) -> Dict:
    kw, _ = jax.random.split(key)
    fan_in = cin * k ** 3
    w = mlp.xavier_uniform(kw, (k, k, k, cin, cout), fan_in, cout * k ** 3)
    return {"w": w, "bn": bn_init(cout)}


def conv3d_apply(p: Dict, x, stride=1, train=False, transpose=False):
    """x: [D, H, W, C] (leading batch handled by vmap if needed)."""
    x4 = x[None]
    k = p["w"].shape[0]
    pad = ((k // 2, k // 2),) * 3
    if transpose:
        y = jax.lax.conv_transpose(
            x4, p["w"], (stride,) * 3, "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    else:
        y = jax.lax.conv_general_dilated(
            x4, p["w"], (stride,) * 3, pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return _abn(bn_apply(p["bn"], y[0], train))


# ---------------------------------------------------------------------------
# FeatureNet (models.py:713-765)
# ---------------------------------------------------------------------------

def feature_net_init(key) -> Dict:
    ks = jax.random.split(key, 9)
    return {
        "c0a": conv_bn_init(ks[0], 3, 8, 3), "c0b": conv_bn_init(ks[1], 8, 8, 3),
        "c1a": conv_bn_init(ks[2], 8, 16, 5), "c1b": conv_bn_init(ks[3], 16, 16, 3),
        "c1c": conv_bn_init(ks[4], 16, 16, 3),
        "c2a": conv_bn_init(ks[5], 16, 32, 5), "c2b": conv_bn_init(ks[6], 32, 32, 3),
        "c2c": conv_bn_init(ks[7], 32, 32, 3),
        "top": mlp.conv2d_init(ks[8], 32, 32, 1),
    }


def feature_net_apply(p: Dict, images: jnp.ndarray, train: bool = False,
                      intermediate: bool = True):
    """images: [V, H, W, 3].  Returns pyramid [x(3), x1(8,H), x2(16,H/2),
    x3(32,H/4)] — the `intermediate` mode used by query_embedding
    (mvs_points_model.py:221-259, feature string 'imgfeat_0_0123')."""
    x1 = conv_bn_apply(p["c0b"], conv_bn_apply(p["c0a"], images, 1, train),
                       1, train)
    x2 = conv_bn_apply(p["c1a"], x1, 2, train)
    x2 = conv_bn_apply(p["c1b"], x2, 1, train)
    x2 = conv_bn_apply(p["c1c"], x2, 1, train)
    x3 = conv_bn_apply(p["c2a"], x2, 2, train)
    x3 = conv_bn_apply(p["c2b"], x3, 1, train)
    x3 = conv_bn_apply(p["c2c"], x3, 1, train)
    x3 = mlp.conv2d_apply(p["top"], x3)
    if intermediate:
        return [images, x1, x2, x3]
    return [x3]


# ---------------------------------------------------------------------------
# CostRegNet 3D U-Net (models.py:767-811)
# ---------------------------------------------------------------------------

def cost_reg_init(key, in_ch: int) -> Dict:
    ks = jax.random.split(key, 10)
    return {
        "c0": conv3d_init(ks[0], in_ch, 8),
        "c1": conv3d_init(ks[1], 8, 16), "c2": conv3d_init(ks[2], 16, 16),
        "c3": conv3d_init(ks[3], 16, 32), "c4": conv3d_init(ks[4], 32, 32),
        "c5": conv3d_init(ks[5], 32, 64), "c6": conv3d_init(ks[6], 64, 64),
        "c7": conv3d_init(ks[7], 64, 32),
        "c9": conv3d_init(ks[8], 32, 16),
        "c11": conv3d_init(ks[9], 16, 8),
    }


def _crop_to(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Crop a stride-2 transpose-conv output (2*ceil(n/2)) back to the skip
    connection's odd/even extent (torch handles this with output_padding)."""
    return x[: ref.shape[0], : ref.shape[1], : ref.shape[2]]


def cost_reg_apply(p: Dict, vol: jnp.ndarray, train: bool = False
                   ) -> jnp.ndarray:
    """vol: [D, H, W, C] -> regularized [D, H, W, 8]."""
    c0 = conv3d_apply(p["c0"], vol, 1, train)
    c2 = conv3d_apply(p["c2"], conv3d_apply(p["c1"], c0, 2, train), 1, train)
    c4 = conv3d_apply(p["c4"], conv3d_apply(p["c3"], c2, 2, train), 1, train)
    x = conv3d_apply(p["c6"], conv3d_apply(p["c5"], c4, 2, train), 1, train)
    x = c4 + _crop_to(conv3d_apply(p["c7"], x, 2, train, transpose=True), c4)
    x = c2 + _crop_to(conv3d_apply(p["c9"], x, 2, train, transpose=True), c2)
    x = c0 + _crop_to(conv3d_apply(p["c11"], x, 2, train, transpose=True), c0)
    return x


def prob_net_init(key, in_ch: int) -> Dict:
    return {"c0": conv3d_init(key, in_ch, 1)}


def prob_net_apply(p: Dict, vol: jnp.ndarray, train: bool = False):
    """Softmax depth probability along D (ProbNet, models.py:813-822)."""
    x = conv3d_apply(p["c0"], vol, 1, train)
    return jax.nn.softmax(x, axis=0)
