"""Feed-forward point-cloud bootstrap (reference gen_points_filter_embeddings,
run/train_ft.py:60-197).

Per MVS view-triplet: estimate the reference view's depth (MVSNet plane sweep
or GT sensor depth), filter by photometric confidence + cross-view geometric
consistency, unproject survivors to world space; after the sweep over all
groups, voxel-downsample and attach per-point embeddings/colors/dirs/conf via
`query_embedding` per camera group (run/train_ft.py:163-197).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from hybridneuralrendering_tpu.config import Config
from hybridneuralrendering_tpu.data.paths import build_view_triplets
from hybridneuralrendering_tpu.data.point_init import voxel_downsample_closest
from hybridneuralrendering_tpu.mvs import filter as geo_filter
from hybridneuralrendering_tpu.mvs import mvsnet, point_gen
from hybridneuralrendering_tpu.mvs import warp as warp_mod


def bootstrap_from_groups(
        mvs_params: point_gen.MvsPointsParams,
        images_by_group: List[np.ndarray],       # each [3, H, W, 3]
        intrinsic: np.ndarray,
        w2cs_by_group: List[np.ndarray],         # each [3, 4, 4]
        near: float, far: float, cfg: Config,
        depth_gt_by_group: Optional[List[np.ndarray]] = None,
        conf_thresh: float = 0.8, geo_cnsst_num: int = 0,
        vox_res: int = 900, num_depths: int = 96,
        alphas: Optional[np.ndarray] = None,       # [V, H, W] mattes
        alpha_w2cs: Optional[np.ndarray] = None,   # [V, 4, 4]
        alpha_intrinsic: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Returns (xyz_world [M, 3], attrs dict with embedding/color/dirs/conf).

    MVSNet mode (depth_gt_by_group None): per-group depth maps are filtered by
    cross-GROUP geometric consistency over the groups' reference views
    (filter_by_masks_gpu, run/train_ft.py:107-120) with conf reassigned by
    match count; GT-depth mode trusts the sensor (train_ft.py:122-126).
    When `alphas` is given, the alpha_masking visual hull prunes survivors
    (train_ft.py:152-159)."""
    intr_j = jnp.asarray(intrinsic)
    all_xyz, all_conf, group_of = [], [], []

    if depth_gt_by_group is None:
        # --- cross-group consistency filtering over MVSNet depths ---
        depths, confs = [], []
        k_q = None
        for imgs, w2cs in zip(images_by_group, w2cs_by_group):
            d, c, k_q = point_gen.gen_depth(
                mvs_params, jnp.asarray(imgs), intr_j, jnp.asarray(w2cs),
                near, far, num_depths)
            depths.append(d)
            confs.append(c)
        depths = jnp.stack(depths)                        # [G, h, w]
        confs = jnp.stack(confs)
        exts = jnp.stack([jnp.asarray(w[0]) for w in w2cs_by_group])
        ks = jnp.broadcast_to(k_q, (len(depths), 3, 3))
        masks, _, geo_sums = geo_filter.filter_depths(
            depths, ks, exts, confs, conf_thresh, geo_cnsst_num)
        confs = geo_filter.reassign_conf(confs, geo_sums, geo_cnsst_num)
        for gi in range(len(images_by_group)):
            cam_xyz = mvsnet.depth_to_cam_xyz(depths[gi], k_q)
            m = np.asarray(masks[gi]).reshape(-1) \
                & (np.asarray(depths[gi]).reshape(-1) > 0)
            xyz_cam = np.asarray(cam_xyz)[m]
            c2w = np.linalg.inv(np.asarray(w2cs_by_group[gi])[0])
            ones = np.ones((len(xyz_cam), 1), np.float32)
            xyz_w = (np.concatenate([xyz_cam, ones], -1) @ c2w.T)[:, :3]
            all_xyz.append(xyz_w)
            all_conf.append(np.asarray(confs[gi]).reshape(-1)[m])
            group_of.append(np.full(len(xyz_w), gi))
    else:
        for gi, (imgs, w2cs) in enumerate(zip(images_by_group,
                                              w2cs_by_group)):
            cam_xyz, conf, mask = point_gen.gen_points(
                mvs_params, jnp.asarray(imgs), intr_j, jnp.asarray(w2cs),
                near, far, num_depths=num_depths,
                depth_gt=jnp.asarray(depth_gt_by_group[gi]),
                conf_thresh=conf_thresh)
            m = np.asarray(mask)
            xyz_cam = np.asarray(cam_xyz)[m]
            c2w = np.linalg.inv(np.asarray(w2cs)[0])
            ones = np.ones((len(xyz_cam), 1), np.float32)
            xyz_w = (np.concatenate([xyz_cam, ones], -1) @ c2w.T)[:, :3]
            all_xyz.append(xyz_w)
            all_conf.append(np.asarray(conf)[m])
            group_of.append(np.full(len(xyz_w), gi))

    xyz = np.concatenate(all_xyz).astype(np.float32)
    conf = np.concatenate(all_conf).astype(np.float32)
    group_of = np.concatenate(group_of)

    # clip + downsample (construct_vox_points_closest, train_ft.py:163-168)
    lo, hi = np.asarray(cfg.querier.ranges[:3]), np.asarray(cfg.querier.ranges[3:])
    inb = ((xyz >= lo) & (xyz <= hi)).all(-1)
    xyz, conf, group_of = xyz[inb], conf[inb], group_of[inb]

    if alphas is not None and len(xyz):
        # visual hull from the dataset's alpha mattes (train_ft.py:152-159)
        hull = np.asarray(warp_mod.alpha_masking(
            jnp.asarray(xyz), jnp.asarray(alphas),
            jnp.asarray(alpha_intrinsic
                        if alpha_intrinsic is not None else intrinsic),
            None, jnp.asarray(alpha_w2cs),
            near_far=(near, far)))
        xyz, conf, group_of = xyz[hull], conf[hull], group_of[hull]
    if vox_res > 0 and len(xyz):
        xyz_ds, keep = voxel_downsample_closest(xyz, vox_res)
        conf, group_of = conf[keep], group_of[keep]
        xyz = xyz_ds

    # per-group embedding queries (train_ft.py:174-197)
    F = cfg.points.feature_dim
    emb = np.zeros((len(xyz), F), np.float32)
    col = np.zeros((len(xyz), 3), np.float32)
    drs = np.zeros((len(xyz), 3), np.float32)
    cnf = conf.reshape(-1, 1).copy()
    for gi, (imgs, w2cs) in enumerate(zip(images_by_group, w2cs_by_group)):
        sel = np.nonzero(group_of == gi)[0]
        if len(sel) == 0:
            continue
        w2c0 = np.asarray(w2cs)[0]
        ones = np.ones((len(sel), 1), np.float32)
        cam_xyz = (np.concatenate([xyz[sel], ones], -1) @ w2c0.T)[:, :3]
        c2ws = np.stack([np.linalg.inv(w) for w in np.asarray(w2cs)])
        e, c, d, q = point_gen.query_embedding(
            mvs_params, jnp.asarray(cam_xyz), jnp.asarray(imgs),
            jnp.asarray(c2ws), jnp.asarray(w2cs), intr_j, 0,
            confidence=jnp.asarray(cnf[sel, 0]))
        emb[sel] = np.asarray(e)[:, :F]
        col[sel] = np.asarray(c)
        drs[sel] = np.asarray(d)
    return xyz, {"embedding": emb, "color": col, "dirs": drs, "conf": cnf}


def groups_from_dataset(dataset, num_views: int = 3,
                        max_groups: int = 0):
    """Build view triplets from a dataset's training cameras."""
    poses = []
    for vid in dataset.train_id_list if hasattr(dataset, "train_id_list") \
            else range(len(dataset)):
        c2w = dataset._pose(vid) if hasattr(dataset, "_pose") else \
            dataset.c2w(vid)
        poses.append(c2w[:3, 3])
    return build_view_triplets(np.stack(poses), max_groups)
