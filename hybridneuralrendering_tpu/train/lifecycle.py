"""Point lifecycle: probe holes -> grow, prune, ray-miss ranking.

TPU-native port of the topology-mutation path
(/root/reference/run/train_ft.py:450-569 `probe_hole`, :572-581 `bloat_inds`;
/root/reference/models/mvs_points_volumetric_model.py:154-172 ray-miss
ranking).  The reference exits the process after growing and a bash loop
restarts it; here growth writes into free capacity slots (models/neural_points
.grow), the voxel grid rebuilds, and the optimizers reset in-process — the
jitted train step never recompiles because every shape is a static capacity.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from hybridneuralrendering_tpu.config import Config
from hybridneuralrendering_tpu.data import sampling
from hybridneuralrendering_tpu.models import neural_points as npts
from hybridneuralrendering_tpu.ops import voxel_grid as VG
from hybridneuralrendering_tpu.parallel.distributed import host_local_array
from hybridneuralrendering_tpu.train import step as step_mod


class RayMissTracker:
    """Top-miss-loss frame ranking (mvs_points_volumetric_model.py:154-172):
    tracks which training frames have the largest miss-ray color loss so the
    prober visits them first."""

    def __init__(self, top_k: int = 10):
        self.top_k = top_k
        self.loss: Dict[int, float] = {}

    def update(self, frame_idx: int, miss_loss: float):
        self.loss[frame_idx] = max(self.loss.get(frame_idx, 0.0), miss_loss)

    def top_ids(self) -> List[int]:
        ranked = sorted(self.loss.items(), key=lambda kv: -kv[1])
        return [i for i, l in ranked[: self.top_k] if l > 1e-5]

    def reset(self):
        self.loss.clear()


def bloat_mask(mask: np.ndarray, radius: int = 1) -> np.ndarray:
    """Dilate a boolean [H, W] mask by a square (2r+1) kernel
    (bloat_inds, run/train_ft.py:572-581)."""
    out = mask.copy()
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dx == 0 and dy == 0:
                continue
            shifted = np.zeros_like(mask)
            ys = slice(max(dy, 0), mask.shape[0] + min(dy, 0))
            xs = slice(max(dx, 0), mask.shape[1] + min(dx, 0))
            ys_src = slice(max(-dy, 0), mask.shape[0] + min(-dy, 0))
            xs_src = slice(max(-dx, 0), mask.shape[1] + min(-dx, 0))
            shifted[ys, xs] = mask[ys_src, xs_src]
            out |= shifted
    return out


def probe_frame(params, points, grid, dataset, frame_idx: int, cfg: Config
                ) -> Dict[str, np.ndarray]:
    """Render one full frame in fixed-size chunks with prob outputs, scattered
    back into image maps (probe_hole's chunked loop, train_ft.py:507-526)."""
    H, W = dataset.height, dataset.width
    chunk = cfg.sampling.eval_rays
    pix = sampling.full_image_grid(H, W, cfg.sampling.edge_filter)
    chunks, n_valid = sampling.chunk_pixels(pix, chunk)

    keys = ["coarse_raycolor", "ray_mask", "ray_max_sample_loc_w",
            "ray_max_far_dist", "ray_max_shading_opacity", "shading_avg_color",
            "shading_avg_dir", "shading_avg_conf", "shading_avg_embedding"]
    maps: Dict[str, np.ndarray] = {}
    flat_count = 0
    for ci in range(chunks.shape[0]):
        pc = chunks[ci].reshape(chunk, 1, 2)
        batch = dataset.get_batch(frame_idx, pixelcoords=pc)
        batch = {k: v for k, v in batch.items()
                 if k not in ("vid", "nearest_vids")}
        out = step_mod.eval_step(params, points, grid, batch, cfg, prob=True)
        px = chunks[ci, :, 0].astype(int)
        py = chunks[ci, :, 1].astype(int)
        for k in keys:
            v = host_local_array(out[k])
            if v.ndim == 1:
                v = v[:, None]
            if k not in maps:
                maps[k] = np.zeros((H, W, v.shape[-1]), v.dtype)
            take = min(chunk, n_valid - flat_count)
            maps[k][py[:take], px[:take]] = v[:take]
        flat_count += chunk
    maps["gt_image"] = dataset.image(dataset.id_list[frame_idx])
    return maps


def holes_from_maps(maps: Dict[str, np.ndarray], bg_color: np.ndarray,
                    cfg: Config) -> Tuple[np.ndarray, ...]:
    """Miss-mask logic (train_ft.py:528-551): rays that missed but whose GT is
    not background, dilated 3x3; candidate points are neighboring *hit* rays
    with opacity above prob_thresh; their max-opacity sample locations become
    new points with conf scaled by prob_mul."""
    gt = maps["gt_image"]
    ray_mask = maps["ray_mask"][..., 0] > 0
    miss = (~ray_mask) & (
        np.linalg.norm(gt - bg_color[None, None], axis=-1) > 0.002)
    neighboring = bloat_mask(miss, 1)
    if cfg.probe.far_thresh > 0:
        far = (ray_mask
               & (maps["ray_max_far_dist"][..., 0] > cfg.probe.far_thresh)
               & (np.linalg.norm(gt - maps["coarse_raycolor"], axis=-1) < 0.1))
        neighboring |= far
    cand = (ray_mask & neighboring
            & (maps["ray_max_shading_opacity"][..., 0] > cfg.probe.prob_thresh))
    sel = np.nonzero(cand)
    return (maps["ray_max_sample_loc_w"][sel],
            maps["shading_avg_embedding"][sel],
            maps["shading_avg_color"][sel],
            maps["shading_avg_dir"][sel],
            maps["shading_avg_conf"][sel] * cfg.probe.prob_mul)


def probe_and_grow(params, points: npts.NeuralPoints, grid, dataset,
                   cfg: Config, tracker: Optional[RayMissTracker] = None,
                   max_frames: Optional[int] = None,
                   rng: Optional[np.random.Generator] = None,
                   query_size_override=None):
    """Full probe-hole pass over selected frames -> grown points + fresh grid.

    query_size_override: per-tier probe dilation width (the reference
    overrides opt.query_size from prob_kernel_size during probing,
    run/train_ft.py:458-463) — the probe renders against a grid whose
    occupancy dilation uses this width; training continues on the normal
    grid.  Returns (new_points, new_grid, num_added)."""
    rng = rng or np.random.default_rng(0)
    if query_size_override is not None and \
            tuple(query_size_override) != tuple(cfg.querier.query_size):
        import dataclasses
        probe_cfg = cfg.replace(querier=dataclasses.replace(
            cfg.querier, query_size=tuple(query_size_override)))
        geom_p = VG.compute_grid_geometry(
            host_local_array(points.xyz), host_local_array(points.mask),
            probe_cfg.querier)
        probe_grid = VG.build_grid_jit(points.xyz, points.mask, geom_p,
                                       probe_cfg.querier)
        cfg_for_probe, grid_for_probe = probe_cfg, probe_grid
    else:
        cfg_for_probe, grid_for_probe = cfg, grid
    if tracker is not None and cfg.probe.prob_top == 1:
        frame_ids = tracker.top_ids()
    else:
        frame_ids = list(range(len(dataset)))
        rng.shuffle(frame_ids)
    limit = max_frames or max(len(dataset) // cfg.probe.prob_num_step, 1)
    frame_ids = frame_ids[:limit]

    adds = []
    bg = np.asarray(cfg.render.bg_color, np.float32)
    for fi in frame_ids:
        maps = probe_frame(params, points, grid_for_probe, dataset, fi,
                           cfg_for_probe)
        adds.append(holes_from_maps(maps, bg, cfg))
    if not adds or sum(len(a[0]) for a in adds) == 0:
        return points, grid, 0

    xyz = np.concatenate([a[0] for a in adds])
    emb = np.concatenate([a[1] for a in adds])
    col = np.concatenate([a[2] for a in adds])
    dr = np.concatenate([a[3] for a in adds])
    cf = np.concatenate([a[4] for a in adds])

    free = int(points.capacity - int(points.num_live))
    n_add = min(len(xyz), free)
    M = len(xyz)
    import jax.numpy as jnp
    new_mask = jnp.asarray(np.arange(M) < n_add)
    new_points = npts.grow(points, jnp.asarray(xyz), jnp.asarray(emb),
                           jnp.asarray(cf), jnp.asarray(col), jnp.asarray(dr),
                           new_mask)
    geom = VG.compute_grid_geometry(
        host_local_array(new_points.xyz), host_local_array(new_points.mask),
        cfg.querier)
    new_grid = VG.build_grid_jit(new_points.xyz, new_points.mask, geom,
                             cfg.querier)
    if tracker is not None:
        tracker.reset()
    return new_points, new_grid, n_add


def prune_and_rebuild(points: npts.NeuralPoints, cfg: Config):
    """Conf-threshold prune + grid rebuild (neural_points.py:350-373)."""
    new_points = npts.prune(points, cfg.probe.prune_thresh)
    geom = VG.compute_grid_geometry(
        host_local_array(new_points.xyz), host_local_array(new_points.mask),
        cfg.querier)
    return new_points, VG.build_grid_jit(new_points.xyz, new_points.mask, geom,
                                     cfg.querier)
