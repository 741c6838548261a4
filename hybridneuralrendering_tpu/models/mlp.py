"""Parameter-pytree MLP/conv building blocks.

Functional equivalents of the reference's `nn.Sequential` stacks with
`init_seq` xavier-uniform initialization (reference
models/helpers/networks.py:163-172): hidden layers preceding an activation get
the activation's gain; the final layer gets gain 1.  Params are plain nested
dicts so they compose with optax/pjit without framework magic.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp


LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU default


def activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, LEAKY_SLOPE)
    if name == "relu":
        return jax.nn.relu
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "tanh":
        return jnp.tanh
    raise KeyError(f"unknown activation {name}")


def _gain(act: str) -> float:
    # torch.nn.init.calculate_gain equivalents
    if act == "relu":
        return math.sqrt(2.0)
    if act == "leaky_relu":
        return math.sqrt(2.0 / (1.0 + LEAKY_SLOPE ** 2))
    return 1.0


def xavier_uniform(key, shape, fan_in, fan_out, gain=1.0, dtype=jnp.float32):
    limit = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def linear_init(key, in_dim: int, out_dim: int, gain: float = 1.0) -> Dict:
    kw, kb = jax.random.split(key)
    w = xavier_uniform(kw, (in_dim, out_dim), in_dim, out_dim, gain)
    # torch Linear bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    bound = 1.0 / math.sqrt(in_dim)
    b = jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def linear_apply(p: Dict, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """x @ w + b; with `compute_dtype` (e.g. bf16) the matmul runs in that
    dtype on the MXU while accumulating in f32 (master weights stay f32)."""
    if compute_dtype is not None:
        y = jax.lax.dot_general(
            x.astype(compute_dtype), p["w"].astype(compute_dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y + p["b"]
    return x @ p["w"] + p["b"]


def mlp_init(key, dims: Sequence[int], act: str,
             final_act: bool = False) -> List[Dict]:
    """Stack of Linear layers; activation after each except (optionally) last.

    Matches init_seq: layers followed by an activation get the activation gain,
    the last layer gets gain 1 when `final_act` is False.
    """
    layers = []
    keys = jax.random.split(key, len(dims) - 1)
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        has_act = final_act or i < len(dims) - 2
        layers.append(linear_init(keys[i], a, b, _gain(act) if has_act else 1.0))
    return layers


@jax.custom_vjp
def _linear_leaky(w, b, x):
    """Fused Linear + LeakyReLU with an output-sign backward.

    leaky_relu preserves sign (slope > 0), so the activation mask
    `z > 0` equals `y > 0` — the backward can rebuild it from the layer
    OUTPUT and never needs the pre-activation z.  Saved residuals per
    layer drop from {x, z} (default autodiff: x for the weight grad, z
    for the leaky mask) to {x, y}, and y IS the next layer's x, so a
    stack saves ONE tensor per layer instead of two.  Halves the
    residual traffic of the no-remat shading chain (PERF.md NeRF
    section, round 5)."""
    return jax.nn.leaky_relu(x @ w + b, LEAKY_SLOPE)


def _linear_leaky_fwd(w, b, x):
    y = jax.nn.leaky_relu(x @ w + b, LEAKY_SLOPE)
    return y, (w, b, x, y)


def _linear_leaky_bwd(res, g):
    w, b, x, y = res
    gz = g * jnp.where(y > 0, jnp.asarray(1.0, g.dtype),
                       jnp.asarray(LEAKY_SLOPE, g.dtype))
    dx = gz @ w.T
    gz2 = gz.reshape(-1, gz.shape[-1])
    x2 = x.reshape(-1, x.shape[-1])
    # weight grad accumulates in f32 on the MXU even when the chain runs
    # bf16; the cotangent itself must match the (possibly bf16) primal
    dw = jax.lax.dot_general(x2, gz2, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    db = jnp.sum(gz2.astype(jnp.float32), axis=0)
    return dw.astype(w.dtype), db.astype(b.dtype), dx


_linear_leaky.defvjp(_linear_leaky_fwd, _linear_leaky_bwd)


def mlp_apply(layers: List[Dict], x: jnp.ndarray, act: str,
              final_act: bool = False, compute_dtype=None,
              fused_vjp: bool = False) -> jnp.ndarray:
    fn = activation(act)
    n = len(layers)
    for i, p in enumerate(layers):
        has_act = final_act or i < n - 1
        if fused_vjp and has_act and act == "leaky_relu" \
                and compute_dtype is None:
            x = _linear_leaky(p["w"], p["b"], x)
            continue
        x = linear_apply(p, x, compute_dtype)
        if has_act:
            x = fn(x)
    return x


def mlp_apply_split(layers: List[Dict], parts: List[jnp.ndarray], act: str,
                    final_act: bool = False,
                    compute_dtype=None) -> jnp.ndarray:
    """mlp_apply over concat(parts, axis=-1) WITHOUT materializing the
    concat: the first layer's weight splits by input rows, one part matmul
    each, summed.  Parts broadcast against each other over leading dims
    (a view-independent part can ride at [R,SR,·] against [V,R,SR,·]
    siblings).  Same math as mlp_apply-on-concat up to f32 addition order.
    """
    w0, b0 = layers[0]["w"], layers[0]["b"]

    def dot(x, w):
        if compute_dtype is not None:
            return jax.lax.dot_general(
                x.astype(compute_dtype), w.astype(compute_dtype),
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return x @ w

    o = 0
    y = None
    for p in parts:
        c = p.shape[-1]
        t = dot(p, w0[o:o + c])
        y = t if y is None else y + t
        o += c
    assert o == w0.shape[0], (o, w0.shape)
    y = y + b0
    if final_act or len(layers) > 1:
        y = activation(act)(y)
    if len(layers) == 1:
        return y
    return mlp_apply(layers[1:], y, act, final_act, compute_dtype)


def conv2d_init(key, in_ch: int, out_ch: int, ksize: int,
                gain: float = 1.0) -> Dict:
    kw, kb = jax.random.split(key)
    fan_in = in_ch * ksize * ksize
    fan_out = out_ch * ksize * ksize
    w = xavier_uniform(kw, (ksize, ksize, in_ch, out_ch), fan_in, fan_out, gain)
    bound = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(kb, (out_ch,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def conv2d_apply(p: Dict, x: jnp.ndarray, stride: int = 1,
                 padding=None, compute_dtype=None) -> jnp.ndarray:
    """x: [B, H, W, C] (NHWC — the TPU-native conv layout).

    Default padding is torch-style symmetric k//2 on both sides — XLA 'SAME'
    pads asymmetrically under stride>1, which shifts strided feature maps by
    one pixel relative to the reference's Conv2d(padding=k//2)."""
    w = p["w"]
    if padding is None:
        kh, kw = w.shape[0], w.shape[1]
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    orig_dtype = x.dtype
    if compute_dtype is not None:
        # uniform-dtype conv (the transpose rule rejects mixed dtypes with a
        # preferred_element_type); TPU convs accumulate in f32 internally
        x, w = x.astype(compute_dtype), w.astype(compute_dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if compute_dtype is not None:
        out = out.astype(orig_dtype)
    return out + p["b"]


def bilinear_resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, h, w, C] bilinear (torch F.interpolate align_corners=False)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear")
