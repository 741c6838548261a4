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


def apply_stages(params: Dict, images: jnp.ndarray, act: str = "leaky_relu",
                 compute_dtype=None, chain_dtype=None):
    """images: [V, H, W, 3] -> pre-upsample stage maps
    (s1 [V,H/2,W/2,6], s2 [V,H/4,W/4,12], s3 [V,H/8,W/8,24]).

    The pre-upsample maps are what the trainer caches per view: 16x smaller
    than the full-res 45-channel concat (6/4 + 12/16 + 24/64 = 2.6 channel-
    equivalents vs 42), so a whole ScanNet train split fits on-device.

    `chain_dtype` (cfg.agg.pyramid_dtype): cast params+images ONCE and keep
    every intermediate map in that dtype — unlike `compute_dtype`, which
    casts back to f32 after each conv, this halves inter-layer HBM traffic
    (the maps lane-pad to 128 channels, so bytes dominate FLOPs here).
    Stage maps come back in chain_dtype; consumers upcast at the per-sample
    boundary."""
    f = mlp.activation(act)
    cdt = compute_dtype
    if chain_dtype is not None:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(chain_dtype), params)
        images = images.astype(chain_dtype)
        cdt = None
    s1 = f(mlp.conv2d_apply(params["s1a"], images, stride=2, compute_dtype=cdt))
    s1 = f(mlp.conv2d_apply(params["s1b"], s1, compute_dtype=cdt))
    s2 = f(mlp.conv2d_apply(params["s2a"], s1, stride=2, compute_dtype=cdt))
    s2 = f(mlp.conv2d_apply(params["s2b"], s2, compute_dtype=cdt))
    s3 = f(mlp.conv2d_apply(params["s3a"], s2, stride=2, compute_dtype=cdt))
    s3 = f(mlp.conv2d_apply(params["s3b"], s3, compute_dtype=cdt))
    return s1, s2, s3


def apply(params: Dict, images: jnp.ndarray, act: str = "leaky_relu",
          compute_dtype=None, chain_dtype=None) -> jnp.ndarray:
    """images: [V, H, W, 3] -> [V, H, W, 45] feature pyramid.

    Under `chain_dtype` the upsampling and the concatenated full-res table
    stay in that dtype too (the table is ~315 MB at V=4 f32 — the burst
    step's biggest tensor); the fusion gather upcasts per-sample."""
    V, H, W, _ = images.shape
    s1, s2, s3 = apply_stages(params, images, act, compute_dtype, chain_dtype)
    img_part = images if chain_dtype is None else images.astype(chain_dtype)
    return jnp.concatenate([
        img_part,
        mlp.bilinear_resize(s1, H, W),
        mlp.bilinear_resize(s2, H, W),
        mlp.bilinear_resize(s3, H, W),
    ], axis=-1)


def materialize(images: jnp.ndarray, stages, pad_to: int = 64,
                dtype=None) -> jnp.ndarray:
    """Cached stage maps -> full-res [V, H, W, pad_to] feature map.

    Dense-VPU alternative to `gather_staged` for the per-step nearest views:
    upsampling V=4 stage maps is pure bandwidth (~300 MB) while the staged
    corner gathers issue 4 views x 3 stages x 4 corners = 48 tiny-row
    gathers per step.  Numerically identical to `apply` (same
    bilinear_resize + concat), so nearest-pixel lookups of the result match
    the uncached path exactly.  Zero-padded to a 64-lane multiple for the
    row-gather lane rule (CLAUDE.md).  `dtype` (cfg.agg.pyramid_dtype)
    builds the table in bf16 — half the build traffic and gather bytes."""
    V, H, W, _ = images.shape
    td = images.dtype if dtype is None else dtype
    parts = [images.astype(td)]
    for stage in stages:
        parts.append(mlp.bilinear_resize(stage.astype(td), H, W))
    feat = jnp.concatenate(parts, axis=-1)
    pad = (-feat.shape[-1]) % pad_to
    if pad:
        feat = jnp.concatenate(
            [feat, jnp.zeros(feat.shape[:-1] + (pad,), feat.dtype)], axis=-1)
    return feat


def _bilinear_gather(stage: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray,
                     H: int, W: int) -> jnp.ndarray:
    """Sample `stage` [V, h, w, C] at full-res integer pixels (py, px) [V, ...]
    exactly as nearest-pixel lookup of bilinear_resize(stage, H, W) would —
    jax.image.resize 'bilinear' uses half-pixel centers with edge clamp:
    src = (dst + 0.5) * (h_small / H) - 0.5."""
    V, h, w, C = stage.shape
    sy = (py.astype(jnp.float32) + 0.5) * (h / H) - 0.5
    sx = (px.astype(jnp.float32) + 0.5) * (w / W) - 0.5
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    vidx = jnp.arange(V).reshape((V,) + (1,) * (py.ndim - 1))
    f00 = stage[vidx, y0i, x0i]
    f01 = stage[vidx, y0i, x1i]
    f10 = stage[vidx, y1i, x0i]
    f11 = stage[vidx, y1i, x1i]
    wy = wy[..., None]
    wx = wx[..., None]
    top = f00 * (1 - wx) + f01 * wx
    bot = f10 * (1 - wx) + f11 * wx
    return top * (1 - wy) + bot * wy


def gather_staged(images: jnp.ndarray, stages, py: jnp.ndarray,
                  px: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Per-sample feature gather from cached stage maps.

    images: [V, H, W, 3]; stages: (s1, s2, s3) from apply_stages; py/px:
    [V, ...] integer pixel coords (already clipped in-bounds).  Returns
    [V, ..., 45], numerically matching
    `apply(...)[vidx, py, px]` (the aggregator's nearest-pixel lookup of the
    upsampled concat) to bilinear-interpolation rounding.  `dtype`
    (cfg.agg.pyramid_dtype) runs the bilinear gathers in bf16 — keeps this
    fallback path's precision behavior aligned with `materialize`."""
    V, H, W, _ = images.shape
    td = images.dtype if dtype is None else dtype
    vidx = jnp.arange(V).reshape((V,) + (1,) * (py.ndim - 1))
    parts = [images.astype(td)[vidx, py, px]]
    for stage in stages:
        parts.append(_bilinear_gather(stage.astype(td), py, px, H, W))
    return jnp.concatenate(parts, axis=-1)
