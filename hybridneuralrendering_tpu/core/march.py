"""Differentiable volume rendering: alpha compositing + function registries.

TPU-native rewrite of /root/reference/models/rendering/diff_ray_marching.py:508-574
and diff_render_func.py:8-68.  The exclusive-cumprod transmittance is expressed
with `jnp.cumprod` (XLA lowers this to an efficient prefix scan); all shapes are
static `[R, S]` — invalid samples are masked by `ray_valid`, never compacted.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Registries (diff_render_func.py:8-68)
# ---------------------------------------------------------------------------

def radiance_render(ray_feature: jnp.ndarray) -> jnp.ndarray:
    return ray_feature[..., 1:]


def white_color(ray_feature: jnp.ndarray) -> jnp.ndarray:
    albedo = jnp.clip(ray_feature[..., 1:4], 0.0, 1.0)
    return jnp.ones_like(albedo)


def alpha_blend(opacity, acc_transmission):
    return opacity * acc_transmission


def alpha2_blend(opacity, acc_transmission):
    return opacity * acc_transmission * acc_transmission


def simple_tone_map(color: jnp.ndarray, gamma: float = 2.2,
                    exposure: float = 1.0) -> jnp.ndarray:
    return jnp.clip(jnp.power(color * exposure + 1e-5, 1.0 / gamma), 0.0, 1.0)


def no_tone_map(color: jnp.ndarray) -> jnp.ndarray:
    return color


def normalize_tone_map(color: jnp.ndarray) -> jnp.ndarray:
    color = color / (jnp.linalg.norm(color, axis=-1, keepdims=True) + 1e-12)
    return color * 0.5 + 0.5


RENDER_FUNCS = {"radiance": radiance_render, "white": white_color}
BLEND_FUNCS = {"alpha": alpha_blend, "alpha2": alpha2_blend}
TONEMAP_FUNCS = {"gamma": simple_tone_map, "off": no_tone_map,
                 "normalize": normalize_tone_map}


def get_render_func(name: str) -> Callable:
    return RENDER_FUNCS[name]


def get_blend_func(name: str) -> Callable:
    return BLEND_FUNCS[name]


def get_tonemap_func(name: str) -> Callable:
    return TONEMAP_FUNCS[name]


# ---------------------------------------------------------------------------
# Ray marching
# ---------------------------------------------------------------------------

def ray_march(ray_dist: jnp.ndarray, ray_valid: jnp.ndarray,
              ray_features: jnp.ndarray, render_func: Callable,
              blend_func: Callable,
              bg_color: Optional[jnp.ndarray] = None
              ) -> Tuple[jnp.ndarray, ...]:
    """Alpha-composite per-sample features along each ray.

    ray_dist: [R, S]; ray_valid: [R, S] bool; ray_features: [R, S, 1+C]
    (channel 0 is raw sigma).  Matches diff_ray_marching.py:508-557: opacity =
    1 - exp(-sigma*dist), exclusive cumprod transmittance with +1e-10
    stabilizer, blended color plus background term.

    Returns (ray_color [R, C], point_color [R, S, C], opacity [R, S],
    acc_transmission [R, S], blend_weight [R, S, 1],
    background_transmission [R, 1], background_blend_weight [R, 1]).
    """
    point_color = render_func(ray_features)
    sigma = ray_features[..., 0] * ray_valid.astype(ray_features.dtype)
    opacity = 1.0 - jnp.exp(-sigma * ray_dist)

    full_trans = jnp.cumprod(1.0 - opacity + 1e-10, axis=-1)      # [R, S]
    background_transmission = full_trans[..., -1:]                 # [R, 1]
    acc_transmission = jnp.concatenate(
        [jnp.ones_like(full_trans[..., :1]), full_trans[..., :-1]], axis=-1)

    blend_weight = blend_func(opacity, acc_transmission)[..., None]
    ray_color = jnp.sum(point_color * blend_weight, axis=-2)

    if bg_color is not None:
        C = ray_color.shape[-1]
        if C == 3:
            bg = jnp.reshape(bg_color, (1, 3)).astype(ray_color.dtype)
        else:
            bg = jnp.tile(jnp.reshape(bg_color, (1, 3)), (1, C // 3))
        ray_color = ray_color + bg * background_transmission

    background_blend_weight = blend_func(1.0, background_transmission)
    return (ray_color, point_color, opacity, acc_transmission, blend_weight,
            background_transmission, background_blend_weight)


def alpha_ray_march(ray_dist, ray_valid, ray_features, blend_func):
    """Opacity-only marching (diff_ray_marching.py:560-574)."""
    sigma = ray_features[..., 0] * ray_valid.astype(ray_features.dtype)
    opacity = 1.0 - jnp.exp(-sigma * ray_dist)
    full_trans = jnp.cumprod(1.0 - opacity + 1e-10, axis=-1)
    background_transmission = full_trans[..., -1:]
    acc_transmission = jnp.concatenate(
        [jnp.ones_like(full_trans[..., :1]), full_trans[..., :-1]], axis=-1)
    blend_weight = blend_func(opacity, acc_transmission)[..., None]
    background_blend_weight = blend_func(1.0, background_transmission)
    return (opacity, acc_transmission, blend_weight, background_transmission,
            background_blend_weight)


def ray_dist_from_depth(sample_depth: jnp.ndarray, ray_valid: jnp.ndarray,
                        vsize_z: float, mode_unit: bool = True) -> jnp.ndarray:
    """Per-sample marching distance from the cummax of sample depths.

    Matches neural_points_volumetric_model.py:331-339: consecutive differences
    of the running-max depth, last slot = vsize_z; degenerate (<1e-8) or — with
    `mode_unit` — oversized (>2*vsize_z) gaps are reset to vsize_z; invalid
    samples get 0.
    """
    run_max = jax.lax.cummax(sample_depth, axis=sample_depth.ndim - 1)
    dist = jnp.concatenate(
        [run_max[..., 1:] - run_max[..., :-1],
         jnp.full(run_max.shape[:-1] + (1,), vsize_z, run_max.dtype)], axis=-1)
    bad = dist < 1e-8
    if mode_unit:
        bad = jnp.logical_or(bad, dist > 2.0 * vsize_z)
    dist = jnp.where(bad, vsize_z, dist)
    return dist * ray_valid.astype(dist.dtype)
