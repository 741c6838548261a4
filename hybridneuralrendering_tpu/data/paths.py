"""Camera-path utilities + MVS view-group selection (host-side numpy).

Ports of:
  - `gen_render_path` pose interpolation (/root/reference/utils/util.py:34-63)
    — euler-angle + position interpolation between key cameras with wrap
    handling, producing smooth fly-through paths;
  - MVS view-triplet selection: the reference ball-pivots a mesh over camera
    positions with open3d (`triangluation_bpa`, data/data_utils.py:85-122) and
    uses its triangles as init view groups
    (nerf_synth360_ft_dataset.py:440-456); here the same goal — groups of 3
    mutually-near, well-spread cameras — comes from plain nearest-neighbor
    geometry, dependency-free.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _euler_xyz_from_matrix(m: np.ndarray) -> np.ndarray:
    """Rotation matrix -> intrinsic xyz euler angles (degrees)."""
    sy = -m[2, 0]
    cy = np.sqrt(max(1.0 - sy * sy, 0.0))
    if cy > 1e-6:
        x = np.arctan2(m[2, 1], m[2, 2])
        y = np.arcsin(np.clip(sy, -1, 1))
        z = np.arctan2(m[1, 0], m[0, 0])
    else:
        x = np.arctan2(-m[1, 2], m[1, 1])
        y = np.arcsin(np.clip(sy, -1, 1))
        z = 0.0
    return np.degrees([x, y, z])


def _matrix_from_euler_xyz(deg: np.ndarray) -> np.ndarray:
    x, y, z = np.radians(deg)
    cx, sx = np.cos(x), np.sin(x)
    cy, sy = np.cos(y), np.sin(y)
    cz, sz = np.cos(z), np.sin(z)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def gen_render_path(c2ws: np.ndarray, n_views: int = 30) -> np.ndarray:
    """Interpolate a closed path through key cameras (util.py:34-63).

    c2ws: [N, 4, 4] key poses -> [~n_views, 4, 4] interpolated poses."""
    n = len(c2ws)
    seg = max(n_views // 3, 1)
    weight = np.linspace(1.0, 0.0, seg, endpoint=False).reshape(-1, 1)
    rotvec, positions = [], []
    for i in range(n):
        ang = _euler_xyz_from_matrix(c2ws[i, :3, :3]).reshape(1, 3)
        if i:
            wrap = np.abs(ang - rotvec[0]) > 180
            ang[wrap] += 360.0
        rotvec.append(ang)
        positions.append(c2ws[i, :3, 3].reshape(1, 3))

    angs, poss = [], []
    for i in range(1, n):
        angs.append(weight * rotvec[i - 1] + (1 - weight) * rotvec[i])
        poss.append(weight * positions[i - 1] + (1 - weight) * positions[i])
    angs.append(weight * rotvec[-1] + (1 - weight) * rotvec[0])
    poss.append(weight * positions[-1] + (1 - weight) * positions[0])
    angs = np.concatenate(angs)
    poss = np.concatenate(poss)

    out = []
    for a, p in zip(angs, poss):
        c2w = np.eye(4)
        c2w[:3, :3] = _matrix_from_euler_xyz(a)
        c2w[:3, 3] = p
        out.append(c2w)
    return np.stack(out)


def build_view_triplets(cam_positions: np.ndarray,
                        max_groups: int = 0) -> List[Tuple[int, int, int]]:
    """Groups of 3 nearby cameras for feed-forward MVS initialization.

    For each camera, pair it with its two nearest neighbors (deduplicated as
    unordered triplets) — covering every viewpoint with local-baseline groups,
    the role the reference's ball-pivoting triangles played."""
    n = len(cam_positions)
    if n < 3:
        return []
    d = np.linalg.norm(cam_positions[:, None] - cam_positions[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    seen = set()
    groups: List[Tuple[int, int, int]] = []
    for i in range(n):
        nb = np.argsort(d[i])[:2]
        tri = tuple(sorted((i, int(nb[0]), int(nb[1]))))
        if tri not in seen:
            seen.add(tri)
            groups.append(tri)
        if max_groups and len(groups) >= max_groups:
            break
    return groups
