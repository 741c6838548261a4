"""Synthetic scene generator — benchmark and smoke-test workloads.

Produces a random-but-plausible indoor-like point cloud, camera, and ray batch
at the canonical ScanNet workload shapes (BASELINE.md: 56x56 dilated rays,
SR=24, K=8, N~600k points) without needing the ScanNet export on disk.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hybridneuralrendering_tpu.config import Config
from hybridneuralrendering_tpu.models import neural_points as npts
from hybridneuralrendering_tpu.ops import voxel_grid as VG


def make_synthetic_scene(cfg: Config, num_points: int, seed: int = 0
                         ) -> Tuple[npts.NeuralPoints, VG.PointGrid]:
    """Points on a few random wall/floor-like planes inside the config ranges."""
    rng = np.random.default_rng(seed)
    lo = np.asarray(cfg.querier.ranges[:3])
    hi = np.asarray(cfg.querier.ranges[3:])
    lo = np.maximum(lo, -3.0)
    hi = np.minimum(hi, 3.0)
    n_planes = 6
    pts = []
    for i in range(n_planes):
        m = num_points // n_planes
        axis = i % 3
        level = rng.uniform(lo[axis], hi[axis])
        p = rng.uniform(lo, hi, (m, 3))
        p[:, axis] = level + rng.normal(0, 0.01, m)
        pts.append(p)
    xyz = np.concatenate(pts)[:num_points].astype(np.float32)
    points = npts.init_from_arrays(
        xyz, cfg.points,
        conf=rng.uniform(0.5, 1.0, (len(xyz), 1)),
        color=rng.uniform(0, 1, (len(xyz), 3)),
        dirs=rng.normal(size=(len(xyz), 3)),
        key=jax.random.PRNGKey(seed))
    geom = VG.compute_grid_geometry(xyz, np.ones(len(xyz), bool), cfg.querier)
    grid = VG.build_grid_jit(points.xyz, points.mask, geom, cfg.querier)
    return points, grid


def make_synthetic_batch(cfg: Config, seed: int = 1) -> Dict:
    """One training batch: rays aimed into the cloud + nearest-view stack."""
    rng = np.random.default_rng(seed)
    R = cfg.sampling.rays_per_batch
    V = max(cfg.agg.use_nearest, 1)
    H, W = cfg.image_hw
    campos = np.array([0.0, 0.0, -2.5], np.float32)
    targets = rng.uniform(-1.0, 1.0, (R, 3)).astype(np.float32)
    dirs = targets - campos
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    intr = np.array([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1]],
                    np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = campos
    batch = {
        "campos": jnp.asarray(campos),
        "camrotc2w": jnp.eye(3),
        "raydir": jnp.asarray(dirs),
        "pixel_idx": jnp.asarray(
            rng.integers(0, min(H, W), (R, 2)).astype(np.int32)),
        "bg_color": jnp.asarray([1.0, 1.0, 1.0]),
        "gt_image": jnp.asarray(rng.uniform(0, 1, (R, 3)).astype(np.float32)),
        "frame_weight": jnp.asarray(1.0),
    }
    if cfg.agg.use_nearest > 0:
        batch.update({
            "images_nearest": jnp.asarray(
                rng.uniform(0, 1, (V, H, W, 3)).astype(np.float32)),
            "c2w_nearest": jnp.asarray(np.stack([c2w] * V)),
            "campos_nearest": jnp.asarray(np.stack([campos] * V)),
            "intrinsic_nearest": jnp.asarray(intr),
            "frame_weight_nearest": jnp.ones((V,)),
        })
    return batch
