"""QKV cross-attention fusion (reference models/aggregators/attention.py).

Alternative to the sigmoid fusion-weight MLP: the 3D point feature queries the
per-view image features (K/V over <=4 nearest views), with optional
gumbel-softmax hard selection and frame-level two-stage aggregation.
Functional param-dict style; batch = every shading sample, so the whole block
is three einsums on the MXU.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def _group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm(num_groups=1) over the channel axis (attention.py:7-14)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def init(key, query_channels: int, context_channels: int,
         inner_channels: int = 16, num_heads: int = 1) -> Dict:
    k1, k2 = jax.random.split(key)
    lim_q = 1.0 / math.sqrt(query_channels)
    lim_kv = 1.0 / math.sqrt(context_channels)
    return {
        "num_heads": num_heads,
        "norm_q": {"scale": jnp.ones(query_channels),
                   "bias": jnp.zeros(query_channels)},
        "norm_c": {"scale": jnp.ones(context_channels),
                   "bias": jnp.zeros(context_channels)},
        "q": {"w": jax.random.uniform(k1, (query_channels, inner_channels),
                                      minval=-lim_q, maxval=lim_q),
              "b": jnp.zeros(inner_channels)},
        "kv": {"w": jax.random.uniform(k2,
                                       (context_channels, inner_channels * 2),
                                       minval=-lim_kv, maxval=lim_kv),
               "b": jnp.zeros(inner_channels * 2)},
        # proj_out zero-initialized (attention.py:17-22): the block starts as
        # an identity-free residual
        "proj": {"w": jnp.zeros((inner_channels, context_channels)),
                 "b": jnp.zeros(context_channels)},
    }


def apply(params: Dict, pt_feat: jnp.ndarray, img_feats: jnp.ndarray,
          valid: Optional[jnp.ndarray] = None,
          use_gumbel: bool = False, train: bool = False,
          key: Optional[jax.Array] = None) -> jnp.ndarray:
    """pt_feat: [B, Cq]; img_feats: [B, T, Cc] (T = views); valid: [B, T].
    Returns fused [B, Cc]."""
    nh = params["num_heads"]
    q_in = _group_norm(pt_feat, params["norm_q"]["scale"],
                       params["norm_q"]["bias"])
    c_in = _group_norm(img_feats, params["norm_c"]["scale"],
                       params["norm_c"]["bias"])
    q = q_in @ params["q"]["w"] + params["q"]["b"]           # [B, Ci]
    kv = c_in @ params["kv"]["w"] + params["kv"]["b"]        # [B, T, 2Ci]
    k, v = jnp.split(kv, 2, axis=-1)

    B, T, Ci = k.shape
    ch = Ci // nh
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    qh = (q * scale).reshape(B, nh, ch)
    kh = (k * scale).reshape(B, T, nh, ch)
    logits = jnp.einsum("bhc,bthc->bht", qh, kh)
    if valid is not None:
        logits = jnp.where(valid[:, None, :], logits, -1e9)
    weight = jax.nn.softmax(logits, axis=-1)                 # [B, nh, T]

    if use_gumbel:
        if train and key is not None:
            g = -jnp.log(-jnp.log(
                jax.random.uniform(key, weight.shape, minval=1e-10,
                                   maxval=1.0)))
            onehot = jax.nn.softmax(jnp.log(weight + 1e-12) + g, axis=-1)
        else:
            onehot = (weight == jnp.max(weight, axis=-1, keepdims=True)
                      ).astype(weight.dtype)
        a = jnp.einsum("bht,bthc->bhc", onehot,
                       v.reshape(B, T, nh, ch))
    else:
        a = jnp.einsum("bht,bthc->bhc", weight, v.reshape(B, T, nh, ch))

    out = a.reshape(B, Ci) @ params["proj"]["w"] + params["proj"]["b"]
    return out
