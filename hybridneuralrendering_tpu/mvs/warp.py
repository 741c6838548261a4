"""Multi-view geometry toolbox: projections, bilinear sampling, plane sweeps.

TPU-native rewrite of /root/reference/models/mvs/mvs_utils.py:299-474 and
models/depth_estimators/module.py:36-71.  torch `grid_sample` becomes an
explicit gather-based bilinear sampler (align_corners=True, zero padding);
masked-select compaction becomes mask outputs (fixed shapes under jit).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bilinear_sample(feat: jnp.ndarray, xy: jnp.ndarray,
                    mask: jnp.ndarray = None) -> jnp.ndarray:
    """Sample feat [H, W, C] at pixel coords xy [..., 2] (x, y), bilinear with
    zero padding outside.  Equivalent to grid_sample(align_corners=True) fed
    unnormalized pixel coordinates."""
    H, W, C = feat.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx, wy = x - x0, y - y0

    def tap(yy, xx):
        ok = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        v = feat[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
        return v * ok[..., None]

    out = (tap(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
           + tap(y0, x1) * (wx * (1 - wy))[..., None]
           + tap(y1, x0) * ((1 - wx) * wy)[..., None]
           + tap(y1, x1) * (wx * wy)[..., None])
    if mask is not None:
        out = out * mask[..., None]
    return out


def project_to_view(ref_cam_xyz: jnp.ndarray, ref_c2w: jnp.ndarray,
                    src_w2c: jnp.ndarray, intrinsic: jnp.ndarray,
                    H: int, W: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project ref-camera-space points into a src view's pixel plane.

    Mirrors homo_warp_nongrid (mvs_utils.py:299-317): xyz1 @ c2w^T @ w2c^T ->
    perspective divide -> intrinsics; mask = inside [0, W-1]x[0, H-1].
    Returns (pixel_xy [..., 2], in-bounds mask [...])."""
    ones = jnp.ones_like(ref_cam_xyz[..., :1])
    xyz1 = jnp.concatenate([ref_cam_xyz, ones], axis=-1)
    src_cam = xyz1 @ ref_c2w.T @ src_w2c.T
    xy = (src_cam[..., :3] / src_cam[..., 2:3]) @ intrinsic.T
    xy = xy[..., :2]
    mask = ((xy[..., 0] >= 0) & (xy[..., 0] <= W - 1)
            & (xy[..., 1] >= 0) & (xy[..., 1] <= H - 1)
            & (src_cam[..., 2] > 0))
    return xy, mask


def plane_sweep_warp(src_feat: jnp.ndarray, proj_mat: jnp.ndarray,
                     depth_values: jnp.ndarray) -> jnp.ndarray:
    """Warp a src feature map over fronto-parallel depth planes of the ref cam.

    src_feat: [H, W, C]; proj_mat: [3, 4] = src_proj @ ref_proj_inv;
    depth_values: [D].  Returns [D, H, W, C]
    (homo_warping, depth_estimators/module.py:36-71)."""
    H, W, C = src_feat.shape
    D = depth_values.shape[0]
    ys, xs = jnp.mgrid[0:H, 0:W]
    grid = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1).astype(
        src_feat.dtype)                                     # [H, W, 3]
    R, T = proj_mat[:, :3], proj_mat[:, 3]
    rot = grid @ R.T                                        # [H, W, 3]
    # src position at depth d: rot*d + T  (equivalently rot + T/d, scaled)
    pos = rot[None] * depth_values[:, None, None, None] + T  # [D, H, W, 3]
    valid = pos[..., 2] > 1e-3
    # safe divide: masked-out taps must not produce inf coordinates, whose
    # cotangents NaN the whole backward pass when this warp is differentiated
    # (feed-forward training mode)
    safe_z = jnp.where(valid[..., None], pos[..., 2:3], 1.0)
    xy = pos[..., :2] / safe_z
    # torch-exact sampling position: module.py:62-66 normalizes as if
    # align_corners=True (x / ((W-1)/2) - 1) but grid_sample defaults to
    # align_corners=False, so the effective tap is x*W/(W-1) - 0.5 per axis —
    # replicate the released checkpoint's behavior bit-for-bit
    scale = jnp.asarray([W / max(W - 1, 1), H / max(H - 1, 1)],
                        src_feat.dtype)
    xy = xy * scale - 0.5
    out = bilinear_sample(src_feat, xy.reshape(-1, 2)).reshape(D, H, W, C)
    return out * valid[..., None]


def depth_regression(prob: jnp.ndarray, depth_values: jnp.ndarray
                     ) -> jnp.ndarray:
    """Soft-argmin expected depth (module.py:73+).  prob: [D, H, W] softmaxed;
    depth_values: [D] -> [H, W]."""
    return jnp.sum(prob * depth_values[:, None, None], axis=0)


def photometric_confidence(prob: jnp.ndarray, depth_index: jnp.ndarray
                           ) -> jnp.ndarray:
    """Sum of the probability over the 4-neighborhood of the argmax depth bin
    (MVSNet confidence, depth_estimators/mvsnet.py:120-135).
    prob: [D, H, W]; depth_index: [H, W] float bin index."""
    D = prob.shape[0]
    # average-pool prob along depth with window 4 (like avg_pool3d(4,1,1)*4)
    pad = jnp.pad(prob, ((1, 2), (0, 0), (0, 0)))
    summed = pad[:-3] + pad[1:-2] + pad[2:-1] + pad[3:]      # [D, H, W]
    # torch truncates the expected bin index (`.long()`, mvsnet.py:133)
    idx = jnp.clip(depth_index.astype(jnp.int32), 0, D - 1)
    return jnp.take_along_axis(summed, idx[None], axis=0)[0]


def occlusion_mask(ref_cam_xyz: jnp.ndarray, rel_c2w: jnp.ndarray,
                   src_w2c: jnp.ndarray, intrinsic: jnp.ndarray,
                   H: int, W: int, tolerate: float = 0.1) -> jnp.ndarray:
    """Z-buffer visibility of ref-camera points in a src view
    (homo_warp_nongrid_occ, mvs_utils.py:333-370).

    Points project into the src image; per (ceil-x, ceil-y) pixel bucket the
    minimum camera depth wins (the reference's scatter_min); a point survives
    if its depth is within `tolerate` of its bucket minimum AND it lands
    in-bounds.  Fixed shapes: returns a [N] bool mask instead of compacting.
    """
    ones = jnp.ones_like(ref_cam_xyz[..., :1])
    if src_w2c is not None:
        src_cam = (jnp.concatenate([ref_cam_xyz, ones], -1)
                   @ rel_c2w.T @ src_w2c.T)[..., :3]
    else:
        src_cam = ref_cam_xyz
    xy = (src_cam / src_cam[..., 2:3]) @ intrinsic.T
    xy = xy[..., :2]
    inb = ((xy[..., 0] >= 0) & (jnp.ceil(xy[..., 0]) <= W - 1)
           & (xy[..., 1] >= 0) & (jnp.ceil(xy[..., 1]) <= H - 1)
           & (src_cam[..., 2] > 0))
    # the reference buckets by index = ceil(x)*HD + ceil(y)
    hx = jnp.ceil(xy[..., 0]).astype(jnp.int32)
    hy = jnp.ceil(xy[..., 1]).astype(jnp.int32)
    idx = jnp.where(inb, hx * H + hy, W * H)
    z = jnp.where(inb, src_cam[..., 2], jnp.inf)
    zmin = jnp.full((W * H + 1,), jnp.inf, z.dtype).at[idx].min(z)
    return inb & (src_cam[..., 2] <= zmin[idx] + tolerate)


def alpha_masking(xyz_w: jnp.ndarray, alphas: jnp.ndarray,
                  intrinsics: jnp.ndarray, c2ws: jnp.ndarray,
                  w2cs: jnp.ndarray, near_far=None,
                  alpha_range: bool = False) -> jnp.ndarray:
    """Visual-hull filter from per-view alpha mattes
    (mvs_utils.alpha_masking, :573-606): a point survives only if every view
    sees alpha > 0.1 at its projection (out-of-range projections count as
    pass when alpha_range, matching opt.alpha_range/inall_img).

    xyz_w: [N, 3]; alphas: [V, H, W]; intrinsics: [V, 3, 3] or [3, 3];
    c2ws/w2cs: [V, 4, 4]; near_far: optional (near, far) z clip.
    Returns [N] bool."""
    V, H, W = alphas.shape
    ones = jnp.ones_like(xyz_w[..., :1])
    xyz1 = jnp.concatenate([xyz_w, ones], axis=-1)
    if intrinsics.ndim == 2:
        intrinsics = jnp.broadcast_to(intrinsics, (V, 3, 3))

    def per_view(alpha, k, w2c):
        cam = xyz1 @ w2c.T
        pix = cam[..., :3] @ k.T
        img_xy = jnp.floor(pix[:, :2] / pix[:, -1:]).astype(jnp.int32)
        m = jnp.ones(xyz_w.shape[0], bool)
        rng_m = None
        if alpha_range:
            rng_m = ((img_xy[:, 0] >= 0) & (img_xy[:, 0] < W)
                     & (img_xy[:, 1] >= 0) & (img_xy[:, 1] < H))
        xc = jnp.clip(img_xy[:, 0], 0, W - 1)
        yc = jnp.clip(img_xy[:, 1], 0, H - 1)
        a = alpha[yc, xc]
        if rng_m is not None:
            a = a + (~rng_m).astype(a.dtype)
        m = a > 0.1
        if near_far is not None:
            m = m & (cam[..., 2] >= near_far[0] - 1.0) \
                  & (cam[..., 2] <= near_far[1])
        return m

    masks = jax.vmap(per_view)(alphas, intrinsics, w2cs)
    return jnp.all(masks, axis=0)
