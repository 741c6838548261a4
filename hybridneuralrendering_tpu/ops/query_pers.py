"""Perspective/frustum-space querier (reference `wcoord_query=0` mode).

TPU-native equivalent of /root/reference/models/neural_points/
query_point_indices.py: the voxel grid lives in the camera's frustum
coordinates (x/z, y/z, z), so it must be rebuilt per camera — the grid build
and query machinery are shared with the world-space path (ops/voxel_grid.py /
ops/query.py) by simply running them over perspective coordinates.

Frustum geometry mirrors the reference's hyperparameters (:50-73): x/z spans
[-cx/fx, (W-cx)/fx], y/z spans [-cy/fy, (H-cy)/fy], z spans [near, far];
`vscale`-scaled `vsize` in those units.  Optional z-jitter of shading
locations reproduces `shpnt_jitter` (:116-126).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hybridneuralrendering_tpu.config import QuerierConfig
from hybridneuralrendering_tpu.core.cameras import pers2w, w2pers
from hybridneuralrendering_tpu.core import rays as ray_gen
from hybridneuralrendering_tpu.ops import query as Q
from hybridneuralrendering_tpu.ops import voxel_grid as VG


def frustum_geometry(intrinsic: np.ndarray, h: int, w: int, near: float,
                     far: float, cfg: QuerierConfig) -> VG.GridGeometry:
    """Per-camera frustum grid frame (query_point_indices.py:50-73)."""
    fx, fy = float(intrinsic[0, 0]), float(intrinsic[1, 1])
    cx, cy = float(intrinsic[0, 2]), float(intrinsic[1, 2])
    mn = np.asarray([-cx / fx, -cy / fy, near], np.float32)
    mx = np.asarray([(w - cx) / fx, (h - cy) / fy, far], np.float32)
    svsize = np.asarray(cfg.query_vsize, np.float32)
    pad = svsize * np.asarray(cfg.kernel_size, np.float32) / 2.0
    mn -= pad
    mx += pad
    dims = np.ceil((mx - mn) / svsize).astype(np.int32)
    dims = np.maximum(dims, 1)
    total = int(dims[0]) * int(dims[1]) * (int(dims[2]) + 2)
    if total > cfg.grid_capacity:
        raise ValueError(
            f"frustum grid {tuple(dims)} exceeds capacity {cfg.grid_capacity}")
    return VG.GridGeometry(origin=jnp.asarray(mn),
                           dims=jnp.asarray(dims),
                           vsize=jnp.asarray(svsize))


def build_frustum_grid(xyz_w: jnp.ndarray, point_mask: jnp.ndarray,
                       camrotc2w: jnp.ndarray, campos: jnp.ndarray,
                       geom: VG.GridGeometry,
                       cfg: QuerierConfig) -> VG.PointGrid:
    """Voxelize the cloud in this camera's perspective coordinates.

    Points behind the camera (z <= 0) are masked out — the frustum only
    contains what the camera can see (reference achieves this implicitly via
    the frustum bounds)."""
    xyz_pers = w2pers(xyz_w, camrotc2w, campos)
    mask = point_mask & (xyz_pers[..., 2] > 1e-6)
    return VG.build_grid(xyz_pers, mask, geom, cfg)


def query_points_pers(grid: VG.PointGrid, xyz_w: jnp.ndarray,
                      camrotc2w: jnp.ndarray, campos: jnp.ndarray,
                      raydir: jnp.ndarray, cfg: QuerierConfig, near: float,
                      far: float, key: Optional[jax.Array] = None,
                      train: bool = False,
                      shpnt_jitter: str = "passfunc") -> Q.QueryResult:
    """Query in frustum space; returned locations are world-space.

    The shared pipeline runs verbatim over perspective coordinates: candidate
    samples are generated along the ray in world space then transformed, the
    K-NN distance metric is perspective-space (matching
    query_point_indices.py:493-606).
    """
    R = raydir.shape[0]
    D = cfg.z_depth_dim
    SR = cfg.SR
    cap = cfg.grid_capacity

    jitter = cfg.sample_jitter if train else 0.0
    raypos_w, _, _ = ray_gen.near_far_linear(campos, raydir, D, near, far,
                                             jitter, key)
    raypos = w2pers(raypos_w, camrotc2w, campos)              # [R, D, 3] pers

    cand_vid = VG.linearize(VG.voxel_coords(raypos, grid.geom), grid.geom, cap)
    if grid.occ_bits is not None:
        word = grid.occ_bits.at[cand_vid >> 5].get(mode="fill", fill_value=0)
        occ_hit = ((word >> (cand_vid & 31)) & 1) > 0
    else:
        occ_hit = grid.occ_dilated.at[cand_vid].get(
            mode="fill", fill_value=0) > 0

    cum = jnp.cumsum(occ_hit.astype(jnp.int32), axis=-1)
    targets = jnp.arange(1, SR + 1, dtype=jnp.int32)
    idx = jax.vmap(lambda c: jnp.searchsorted(c, targets, side="left"))(cum)
    sample_mask = idx < D
    idx_c = jnp.clip(idx, 0, D - 1)
    # placeholder = last candidate (finite in frustum coords); validity is in
    # sample_mask — see ops/query.py
    sample_loc = jnp.take_along_axis(raypos, idx_c[..., None], axis=1)

    # optional z-jitter of shading locations (query_point_indices.py:116-126)
    if train and shpnt_jitter != "passfunc" and key is not None:
        jkey = jax.random.fold_in(key, 1)
        vz = grid.geom.vsize[2]
        if shpnt_jitter == "gaussian":
            dz = jax.random.normal(jkey, sample_loc[..., 2].shape) * vz
        else:  # uniform
            dz = (jax.random.uniform(jkey, sample_loc[..., 2].shape) - 0.5) * vz
        sample_loc = sample_loc.at[..., 2].add(dz)

    res = Q.knn_over_grid(grid, sample_loc, sample_mask, cfg)
    best_d, best_i = res

    pnt_mask = (best_d < 1e29) & sample_mask[..., None]
    sample_pidx = jnp.where(pnt_mask, best_i, -1)
    ray_mask = jnp.any(pnt_mask, axis=(1, 2))
    sample_loc_w = pers2w(sample_loc, camrotc2w, campos)
    return Q.QueryResult(sample_pidx=sample_pidx, sample_loc_w=sample_loc_w,
                         sample_mask=sample_mask, ray_mask=ray_mask,
                         pnt_mask=pnt_mask)
