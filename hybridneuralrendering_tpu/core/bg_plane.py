"""Background-plane compositing (the reference's `bgmodel=...plane` path).

The reference can place a color plane behind the scene: each ray's
intersection with the plane is projected into the nearby training views, the
plane color is sampled there (masking pixels covered by foreground points),
and the per-ray background color composites under the rendered color with the
background transmission (reference `set_bg`
/root/reference/models/mvs_points_volumetric_model.py:290-328, plane geometry
models/mvs/mvs_utils.py:380-409 `gen_bg_points`/`get_rayplane_cross`,
compositing models/neural_points_volumetric_model.py:103-105).

TPU-native differences: fixed shapes throughout (invalid rays/pixels are
masked, never compacted), the foreground splat is a scatter-max into a dense
[H, W] mask, and everything is jittable so the drivers can precompute per-frame
`bg_ray` maps in one compiled call per view stack.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from hybridneuralrendering_tpu.mvs.warp import bilinear_sample


def ray_plane_cross(campos: jnp.ndarray, raydir: jnp.ndarray,
                    plane_pnt: jnp.ndarray, plane_normal: jnp.ndarray,
                    epsilon: float = 1e-3
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray-plane intersections (get_rayplane_cross, mvs_utils.py:388-409).

    campos [3], raydir [R, 3], plane_pnt [3], plane_normal [3] (need not be
    unit).  Returns (xyz_world [R, 3] with zeros where the ray is parallel or
    facing away, valid [R] bool).  The reference keeps rays with
    dot(normal, dir) >= epsilon only."""
    dot = jnp.sum(plane_normal * raydir, axis=-1)                # [R]
    valid = dot >= epsilon
    w = campos - plane_pnt                                       # [3]
    fac = -jnp.sum(plane_normal * w) / jnp.where(valid, dot, 1.0)
    cross = campos + raydir * fac[..., None]
    return jnp.where(valid[..., None], cross, 0.0), valid


def fg_pixel_mask(points_xyz: jnp.ndarray, live_mask: jnp.ndarray,
                  w2c: jnp.ndarray, intrinsic: jnp.ndarray,
                  H: int, W: int) -> jnp.ndarray:
    """[H, W] float mask of pixels covered by foreground neural points in one
    view (homo_warp_fg_mask + id2mask, mvs_utils.py:318-333/371-375: project
    every point, splat ceil(pixel) to 1)."""
    ones = jnp.ones_like(points_xyz[..., :1])
    cam = jnp.concatenate([points_xyz, ones], axis=-1) @ w2c.T   # [N, 4]
    xy = (cam[..., :3] / jnp.where(cam[..., 2:3] == 0, 1.0,
                                   cam[..., 2:3])) @ intrinsic.T
    px = jnp.ceil(xy[..., 0]).astype(jnp.int32)
    py = jnp.ceil(xy[..., 1]).astype(jnp.int32)
    ok = (live_mask & (cam[..., 2] > 0) & (px >= 0) & (px <= W - 1)
          & (py >= 0) & (py <= H - 1))
    flat = jnp.zeros((H * W,), jnp.float32).at[
        jnp.where(ok, py * W + px, H * W)].max(1.0, mode="drop")
    return flat.reshape(H, W)


def bg_ray_colors(xyz_world: jnp.ndarray, cross_valid: jnp.ndarray,
                  images: jnp.ndarray, w2cs: jnp.ndarray,
                  intrinsic: jnp.ndarray, plane_color: jnp.ndarray,
                  fg_masks: Optional[jnp.ndarray] = None,
                  thresh: float = 0.03) -> jnp.ndarray:
    """Per-ray background color from the plane intersections (set_bg,
    mvs_points_volumetric_model.py:290-328).

    xyz_world [R, 3] plane intersections, images [V, H, W, 3],
    w2cs [V, 4, 4], intrinsic [3, 3], plane_color [3],
    fg_masks [V, H, W] (or None to derive nothing — pass the splat of the
    neural points for parity with the reference).  For each view: project,
    drop out-of-bounds / foreground-covered pixels, bilinear-sample the
    color, zero colors outside plane_color +- thresh, then max over views."""
    V, H, W, _ = images.shape

    def per_view(img, w2c, fg):
        ones = jnp.ones_like(xyz_world[..., :1])
        cam = jnp.concatenate([xyz_world, ones], axis=-1) @ w2c.T
        z = jnp.where(cam[..., 2:3] == 0, 1.0, cam[..., 2:3])
        xy = (cam[..., :3] / z) @ intrinsic.T                    # [R, 3]
        xy = xy[..., :2]
        inb = ((xy[..., 0] >= 0) & (xy[..., 0] <= W - 1)
               & (xy[..., 1] >= 0) & (xy[..., 1] <= H - 1))
        m = inb & cross_valid
        if fg is not None:
            # the reference looks the fg mask up at ceil(xy) (set_bg :311)
            cx = jnp.clip(jnp.ceil(xy[..., 0]).astype(jnp.int32), 0, W - 1)
            cy = jnp.clip(jnp.ceil(xy[..., 1]).astype(jnp.int32), 0, H - 1)
            m = m & (fg[cy, cx] < 1)
        color = bilinear_sample(img, xy) * m[..., None]          # [R, 3]
        return color

    if fg_masks is None:
        colors = jax.vmap(lambda i, w: per_view(i, w, None))(images, w2cs)
    else:
        colors = jax.vmap(per_view)(images, w2cs, fg_masks)      # [V, R, 3]

    # keep only plane-colored samples (set_bg :324-327), max over views
    fit = jnp.all((colors >= plane_color - thresh)
                  & (colors <= plane_color + thresh), axis=-1)   # [V, R]
    colors = colors * fit[..., None]
    return jnp.max(colors, axis=0)                               # [R, 3]


@jax.jit
def compute_bg_ray(campos: jnp.ndarray, raydir: jnp.ndarray,
                   plane_pnt: jnp.ndarray, plane_normal: jnp.ndarray,
                   plane_color: jnp.ndarray, images: jnp.ndarray,
                   w2cs: jnp.ndarray, intrinsic: jnp.ndarray,
                   points_xyz: jnp.ndarray, points_mask: jnp.ndarray
                   ) -> jnp.ndarray:
    """One-call driver helper: gen_bg_points + fg splat + set_bg -> [R, 3]
    bg colors for a ray batch (run/train_ft.py:611-615 create_all_bg)."""
    xyz, valid = ray_plane_cross(campos, raydir, plane_pnt, plane_normal)
    H, W = images.shape[1], images.shape[2]
    fg = jax.vmap(lambda w2c: fg_pixel_mask(points_xyz, points_mask, w2c,
                                            intrinsic, H, W))(w2cs)
    return bg_ray_colors(xyz, valid, images, w2cs, intrinsic, plane_color,
                         fg_masks=fg)
