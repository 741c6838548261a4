"""Loss engine (reference models/base_rendering_model.py:1022-1262).

All losses are fixed-shape masked reductions — the reference's
`masked_select(...).reshape(1, -1, 3)` compactions become mask-weighted means,
which are identical in value and jit-stable.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from hybridneuralrendering_tpu.config import LossConfig


def masked_l2(pred: jnp.ndarray, gt: jnp.ndarray,
              mask: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over rays where mask is set (MSELoss-on-selection
    equivalent).  pred/gt: [R, C]; mask: [R]."""
    m = mask.astype(pred.dtype)[:, None]
    num = jnp.sum(jnp.square(pred - gt) * m)
    den = jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)
    return num / den


def compute_losses(output: Dict, gt_image: jnp.ndarray, cfg: LossConfig,
                   frame_weight=None) -> Tuple[jnp.ndarray, Dict]:
    """Total training loss + per-item dict.

    output: renderer output dict (needs 'coarse_raycolor', 'ray_mask',
    optionally 'conf_coefficient'/'weight').  Mirrors compute_losses
    (base_rendering_model.py:1022-1262): masked-ray L2, miss-ray L2 scaled by
    miss count, plain L2, zero-one regularizer, sparse conf loss; the color
    portion scaled by the per-frame quality weight (:1204-1206)."""
    items: Dict[str, jnp.ndarray] = {}
    ray_mask = output["ray_mask"].astype(jnp.float32)
    total = 0.0

    for name, w in zip(cfg.color_loss_items, cfg.color_loss_weights):
        if name.startswith("ray_masked"):
            base = name[len("ray_masked_"):]
            loss = masked_l2(output[base], gt_image, ray_mask > 0)
        elif name.startswith("ray_miss"):
            base = name[len("ray_miss_"):]
            miss = ray_mask == 0
            # reference multiplies the mean by the miss count (:1151-1159)
            loss = masked_l2(output[base], gt_image, miss) * jnp.sum(
                miss.astype(jnp.float32))
        else:
            loss = jnp.mean(jnp.square(output[name] - gt_image))
        items["loss_" + name] = loss
        total = total + loss * w + 1e-6

    if frame_weight is not None:
        total = total * frame_weight

    for name, w in zip(cfg.zero_one_loss_items, cfg.zero_one_loss_weights):
        if name not in output:
            continue
        val = jnp.clip(output[name], cfg.zero_epsilon, 1 - cfg.zero_epsilon)
        loss = jnp.mean(jnp.log(val) + jnp.log(1 - val))
        items["loss_" + name] = loss
        total = total + loss * w

    if cfg.sparse_loss_weight > 0 and "weight" in output:
        wgt = output["weight"]
        conf = output["conf_coefficient"]
        loss = jnp.sum(wgt * jnp.abs(1 - jnp.exp(-2 * conf))) / (
            jnp.sum(wgt) + 1e-6)
        items["loss_sparse"] = loss
        total = total + loss * cfg.sparse_loss_weight

    items["loss_total"] = total
    return total, items


def psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
