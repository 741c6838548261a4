"""Camera projection math (pure JAX, shape-polymorphic over leading dims).

Re-derives the reference's projection conventions:
  - `w2pers`: world -> normalized perspective coords (x/z, y/z, z) in the
    *current* camera (reference models/neural_points/neural_points.py:607-613).
  - `get_dtu_raydir`: pixel grid + intrinsics -> world ray directions
    (reference data/data_utils.py:57-71, +0.5 pixel center).
  - `w2iproject`: world point -> pixel coords of another posed view
    (reference models/neural_points_volumetric_model.py:248-255).
"""

from __future__ import annotations

import jax.numpy as jnp


def w2pers(xyz_w: jnp.ndarray, camrotc2w: jnp.ndarray, campos: jnp.ndarray) -> jnp.ndarray:
    """World points -> perspective coords (x/z, y/z, z) of the camera.

    xyz_w: [..., 3]; camrotc2w: [3, 3] (camera-to-world rotation); campos: [3].
    Matches neural_points.py:607-613: camera coords are obtained by projecting
    the shifted point onto the c2w rotation columns (i.e. R^T @ (p - c)).
    """
    shifted = xyz_w - campos
    xyz_c = shifted @ camrotc2w  # R_c2w^T applied from the right
    z = xyz_c[..., 2]
    return jnp.stack([xyz_c[..., 0] / z, xyz_c[..., 1] / z, z], axis=-1)


def pers2w(xyz_pers: jnp.ndarray, camrotc2w: jnp.ndarray, campos: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`w2pers`."""
    z = xyz_pers[..., 2]
    xyz_c = jnp.stack([xyz_pers[..., 0] * z, xyz_pers[..., 1] * z, z], axis=-1)
    return xyz_c @ camrotc2w.T + campos


def get_dtu_raydir(pixelcoords: jnp.ndarray, intrinsic: jnp.ndarray,
                   camrotc2w: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Pixel coords [..., 2] (x, y) -> world-space ray directions [..., 3].

    Pixel centers at +0.5 as in data/data_utils.py:57-71.
    """
    x = (pixelcoords[..., 0] + 0.5 - intrinsic[0, 2]) / intrinsic[0, 0]
    y = (pixelcoords[..., 1] + 0.5 - intrinsic[1, 2]) / intrinsic[1, 1]
    dirs = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    if normalize:
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs @ camrotc2w.T
    return dirs


def w2iproject(xyz_w: jnp.ndarray, intrinsic: jnp.ndarray, c2w: jnp.ndarray,
               eps: float = 1e-10):
    """Project world points into another view's pixel plane.

    xyz_w: [..., 3]; intrinsic: [3,3]; c2w: [4,4] camera-to-world of the target
    view.  Returns (pixel_xy [..., 2], depth [..., 1]).  Matches
    neural_points_volumetric_model.py:248-255 (x @ inverse(c2w).T then intrinsics).
    """
    ones = jnp.ones_like(xyz_w[..., :1])
    xyz_h = jnp.concatenate([xyz_w, ones], axis=-1)
    w2c = jnp.linalg.inv(c2w)
    xyz_c = xyz_h @ w2c.T
    xyz_i = xyz_c[..., :3] @ intrinsic.T
    depth = xyz_i[..., 2:3]
    xy = xyz_i[..., 0:2] / (depth + eps)
    return xy, depth


def delta_viewdirs(sample_loc_w: jnp.ndarray, campos: jnp.ndarray,
                   campos_other: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Difference of unit view directions toward a sample from two camera centers.

    Matches neural_points_volumetric_model.py:296-310.
    sample_loc_w: [..., 3]; campos: [3]; campos_other: [3].
    """
    cur = sample_loc_w - campos
    cur = cur / (jnp.linalg.norm(cur, axis=-1, keepdims=True) + eps)
    other = sample_loc_w - campos_other
    other = other / (jnp.linalg.norm(other, axis=-1, keepdims=True) + eps)
    return other - cur


def pers_delta(xyz_pers_pnt: jnp.ndarray, loc_pers: jnp.ndarray) -> jnp.ndarray:
    """Perspective-space delta used by `agg_dist_pers` in {2, 20}.

    (x/z, y/z, z) coords -> (x_p*z_p - x_s*z_s, y_p*z_p - y_s*z_s, z_p - z_s).
    Matches point_aggregators.py:1472-1483.
    xyz_pers_pnt: [..., K, 3] neighbor persp coords; loc_pers: [..., 3] sample.
    """
    xd = xyz_pers_pnt[..., 0] * xyz_pers_pnt[..., 2] - (
        loc_pers[..., None, 0] * loc_pers[..., None, 2])
    yd = xyz_pers_pnt[..., 1] * xyz_pers_pnt[..., 2] - (
        loc_pers[..., None, 1] * loc_pers[..., None, 2])
    zd = xyz_pers_pnt[..., 2] - loc_pers[..., None, 2]
    return jnp.stack([xd, yd, zd], axis=-1)
