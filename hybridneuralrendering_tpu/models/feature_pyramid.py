"""Image-feature pyramid for hybrid rendering.

TPU rewrite of the reference's aux CNN
(models/aggregators/point_aggregators.py:598-630 init, :1059-1068 forward):
three stride-2 conv stages with x2 channel expansion over each nearby training
image, bilinearly upsampled back to full resolution and concatenated with the
RGB — a 45-channel per-pixel feature map.

The reference recomputes this every training step (SURVEY hot-loop (c));
here `apply` is a standalone jittable function so the trainer can cache
per-image features across steps and refresh them on a schedule.
NHWC layout throughout (TPU conv-native).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from hybridneuralrendering_tpu.models import mlp

EXPAND = 2


def init(key, act: str = "leaky_relu", in_ch: int = 3) -> Dict:
    ks = jax.random.split(key, 6)
    g = mlp._gain(act)
    c1, c2, c3 = 3 * EXPAND, 3 * EXPAND ** 2, 3 * EXPAND ** 3
    return {
        "s1a": mlp.conv2d_init(ks[0], in_ch, c1, 3, g),
        "s1b": mlp.conv2d_init(ks[1], c1, c1, 3, g),
        "s2a": mlp.conv2d_init(ks[2], c1, c2, 3, g),
        "s2b": mlp.conv2d_init(ks[3], c2, c2, 3, g),
        "s3a": mlp.conv2d_init(ks[4], c2, c3, 3, g),
        "s3b": mlp.conv2d_init(ks[5], c3, c3, 3, g),
    }


def apply(params: Dict, images: jnp.ndarray, act: str = "leaky_relu",
          compute_dtype=None) -> jnp.ndarray:
    """images: [V, H, W, 3] -> [V, H, W, 45] feature pyramid."""
    f = mlp.activation(act)
    cdt = compute_dtype
    V, H, W, _ = images.shape
    s1 = f(mlp.conv2d_apply(params["s1a"], images, stride=2, compute_dtype=cdt))
    s1 = f(mlp.conv2d_apply(params["s1b"], s1, compute_dtype=cdt))
    s2 = f(mlp.conv2d_apply(params["s2a"], s1, stride=2, compute_dtype=cdt))
    s2 = f(mlp.conv2d_apply(params["s2b"], s2, compute_dtype=cdt))
    s3 = f(mlp.conv2d_apply(params["s3a"], s2, stride=2, compute_dtype=cdt))
    s3 = f(mlp.conv2d_apply(params["s3b"], s3, compute_dtype=cdt))
    return jnp.concatenate([
        images,
        mlp.bilinear_resize(s1, H, W),
        mlp.bilinear_resize(s2, H, W),
        mlp.bilinear_resize(s3, H, W),
    ], axis=-1)
