"""Ray sample generation (pure JAX, static shapes).

Re-implements the generator registry of
/root/reference/models/rendering/diff_ray_marching.py:7-33 TPU-first: every
generator returns fixed-size [R, S] tensors; jitter comes from an explicit
`jax.random` key instead of global RNG; the importance resampler `sample_pdf`
(reference :36-82, which round-trips through host numpy) is a fully on-device
`searchsorted`-style inverse-CDF.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def near_far_linear(campos: jnp.ndarray, raydir: jnp.ndarray, num_samples: int,
                    near: float, far: float, jitter: float = 0.0,
                    key: Optional[jax.Array] = None):
    """Uniform-in-depth candidate samples along each ray.

    campos: [3]; raydir: [R, 3] (normalized).  Returns
    (raypos [R, S, 3], segment_length [R, S], tvals [R, S]) — midpoint
    parameterization with multiplicative jitter on segment lengths, matching
    diff_ray_marching.py:349-392.
    """
    R = raydir.shape[0]
    t = jnp.linspace(0.0, 1.0, num_samples + 1)
    edges = near * (1.0 - t) + far * t                      # [S+1]
    seg = (edges[1:] - edges[:-1])[None, :]                 # [1, S]
    if jitter > 0.0 and key is not None:
        u = jax.random.uniform(key, (R, num_samples))
        seg = seg * (1.0 + jitter * (u - 0.5))
    else:
        seg = jnp.broadcast_to(seg, (R, num_samples))
    end_ts = near + jnp.cumsum(seg, axis=-1)                # [R, S]
    end_ts = jnp.concatenate(
        [jnp.full((R, 1), near, end_ts.dtype), end_ts], axis=-1)
    mid_ts = 0.5 * (end_ts[:, :-1] + end_ts[:, 1:])         # [R, S]
    raypos = campos[None, None, :] + raydir[:, None, :] * mid_ts[..., None]
    seg = seg * jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    return raypos, seg, mid_ts


def near_far_disparity_linear(campos: jnp.ndarray, raydir: jnp.ndarray,
                              num_samples: int, near: float, far: float,
                              jitter: float = 0.0,
                              key: Optional[jax.Array] = None):
    """Uniform-in-disparity sampling (diff_ray_marching.py:201-249)."""
    R = raydir.shape[0]
    t = jnp.linspace(0.0, 1.0, num_samples + 1)
    edges = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)  # [S+1]
    if jitter > 0.0 and key is not None:
        u = jax.random.uniform(key, (R, num_samples))
        mids = 0.5 * (edges[:-1] + edges[1:])
        lower = jnp.concatenate([edges[:1], mids])
        upper = jnp.concatenate([mids, edges[-1:]])
        mid_ts = lower[None, :-1] + (upper[None, 1:] - lower[None, :-1]) * u
        mid_ts = jnp.sort(mid_ts, axis=-1)
    else:
        mid_ts = jnp.broadcast_to(0.5 * (edges[:-1] + edges[1:]), (R, num_samples))
    seg = jnp.diff(
        jnp.concatenate([jnp.full((R, 1), near), mid_ts], axis=-1), axis=-1)
    raypos = campos[None, None, :] + raydir[:, None, :] * mid_ts[..., None]
    seg = seg * jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    return raypos, seg, mid_ts


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, num_samples: int,
               deterministic: bool = True,
               key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Inverse-CDF importance sampling, fully on device.

    bins: [R, B] sorted sample positions; weights: [R, B-1].  Returns
    [R, num_samples] new positions.  The reference (diff_ray_marching.py:36-82)
    bounced through host numpy for searchsorted; here it is vmapped
    jnp.searchsorted, so refinement stays inside jit.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [R, B]

    if deterministic or key is None:
        u = jnp.linspace(0.0, 1.0, num_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (num_samples,))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.clip(inds - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(inds, 0, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bin_b = jnp.take_along_axis(bins, jnp.clip(below, 0, bins.shape[-1] - 1), axis=-1)
    bin_a = jnp.take_along_axis(bins, jnp.clip(above, 0, bins.shape[-1] - 1), axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    frac = (u - cdf_b) / denom
    return bin_b + frac * (bin_a - bin_b)


RAY_GENERATORS = {
    "near_far_linear": near_far_linear,
    "near_far_disparity_linear": near_far_disparity_linear,
}


def get_ray_generator(name: str):
    if name not in RAY_GENERATORS:
        raise KeyError(f"Unknown ray generator {name!r}; have {list(RAY_GENERATORS)}")
    return RAY_GENERATORS[name]
