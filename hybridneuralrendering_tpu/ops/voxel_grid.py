"""Deterministic voxel-grid construction over a neural point cloud.

TPU-native replacement for the reference's atomic CUDA grid builder
(/root/reference/models/neural_points/query_point_indices_worldcoords.py:237-381:
`claim_occ` / `map_coor2occ` / `fill_occ2pnts`).  The reference claims voxels
with `atomicCAS` and reservoir-samples points into per-voxel buckets with
curand — parallel-safe but nondeterministic when buckets overflow.  Here the
same tables are built with a stable sort + segment arithmetic, which is both
deterministic and the idiomatic TPU formulation (sorts and segmented scans map
well onto the VPU; no atomics exist on TPU anyway).

Data layout (all static capacities, live counts are data):
  - ``coor2occ``   dense [grid_capacity] int32: linear voxel id -> compact
    occupied-voxel index (or -1).  One gather resolves a voxel.
  - ``occ_pnts``   [max_o, P] int32: first-P point ids per occupied voxel
    (sorted by point id — the deterministic stand-in for reservoir sampling).
  - ``occ_numpnts``[max_o] int32: points stored per voxel (capped at P).
  - ``occ_dilated``dense [grid_capacity] int8: occupancy dilated by the
    query_size neighborhood (used for ray-sample culling; the reference
    dilates inside `map_coor2occ`, worldcoords.py:299-334).

Grid geometry (origin/dims) is derived from the live point AABB clipped to the
configured ranges, exactly as `get_hyperparameters`
(worldcoords.py:46-77) — computed on host because the dims gate a capacity
check; the tables themselves build on device under jit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hybridneuralrendering_tpu.config import QuerierConfig


class GridGeometry(NamedTuple):
    """Host-computed grid frame. Arrays so it can be donated through jit."""

    origin: jnp.ndarray       # [3] f32 — world coords of voxel (0,0,0) corner
    dims: jnp.ndarray         # [3] i32 — voxels per axis (product <= capacity)
    vsize: jnp.ndarray        # [3] f32 — scaled (query) voxel size


class PointGrid(NamedTuple):
    geom: GridGeometry
    coor2occ: jnp.ndarray     # [grid_capacity] i32, -1 = empty
    occ_dilated: jnp.ndarray  # [grid_capacity] i8, 1 = within query_size of points
    occ_pnts: jnp.ndarray     # [max_o, P] i32, -1 = empty slot
    occ_pnt_xyz: jnp.ndarray  # [max_o, P, 3] f32, BIG sentinel on empty slots
    occ_bucket: jnp.ndarray   # [max_o, BW] f32 — lane-aligned packed bucket:
    #   planar [x(P) | y(P) | z(P) | pid-bitcast(P) | pad] rounded up to a
    #   multiple of 128 floats, so the K-NN fetches one aligned row per voxel
    #   instead of small unaligned xyz/pid rows (the gather-bandwidth fix)
    occ_numpnts: jnp.ndarray  # [max_o] i32
    num_occ: jnp.ndarray      # [] i32 — live occupied-voxel count
    # Supervoxel fast path (cfg.supervoxel): one bucket per kernel_size-
    # dilated voxel holding ALL points of its kernel_size neighborhood, so a
    # shading sample resolves its full candidate set with ONE coor2node
    # lookup + ONE aligned row gather (instead of 9 occupancy windows + 27
    # per-voxel bucket rows).  None when cfg.supervoxel is off.
    coor2node: Optional[jnp.ndarray] = None   # [grid_capacity] i32, -1 = none
    node_bucket: Optional[jnp.ndarray] = None  # [max_nodes, BWs] planar packed
    num_nodes: Optional[jnp.ndarray] = None    # [] i32
    # Bit-packed occ_dilated (bit v&31 of word v>>5): the ray-sample cull
    # issues R*D ~ 1.25M random scalar gathers per step; packing shrinks the
    # table 8x (70 MB i8 -> 8.75 MB i32) so those random reads stay much
    # closer to the chip.
    occ_bits: Optional[jnp.ndarray] = None    # [ceil(grid_capacity/32)] i32


# sentinel coordinate for empty bucket slots: distances computed against it
# overflow any radius limit, so empty slots never win the top-K
XYZ_SENTINEL = 1e9


def bucket_width(P: int) -> int:
    """Packed bucket row width: 4 planes of P floats, lane-aligned to 128."""
    return -(-(4 * P) // 128) * 128


def _build_supervoxel(xyz: jnp.ndarray, point_mask: jnp.ndarray,
                      coords: jnp.ndarray, geom: GridGeometry,
                      cfg: QuerierConfig):
    """Supervoxel node tables (see PointGrid docstring).

    Every point is replicated to the |kernel_size| voxels whose neighborhood
    window contains it (reflected offsets — correct for asymmetric even
    windows); the replicated (dest voxel, point) pairs sort by dest voxel and
    fill per-node buckets exactly like the per-voxel build, so the result is
    deterministic and exact while no node holds > Ps window points.
    """
    N = xyz.shape[0]
    cap = cfg.grid_capacity
    Ps = cfg.Ps
    max_nodes = cfg.max_nodes

    offs = jnp.asarray(-_neighbor_offsets(cfg.kernel_size))   # [Q, 3] reflected
    Qn = offs.shape[0]
    dest = coords[None, :, :] + offs[:, None, :]              # [Q, N, 3]
    dvid = linearize(dest, geom, cap)                          # [Q, N]
    dvid = jnp.where(point_mask[None, :], dvid, cap)
    flat = dvid.reshape(-1)                                    # [Q*N]

    order = jnp.argsort(flat, stable=True)
    sdv = flat[order]
    src_pid = (order % N).astype(jnp.int32)

    valid = sdv < cap
    head = jnp.concatenate(
        [valid[:1], (sdv[1:] != sdv[:-1]) & valid[1:]])
    node_idx = jnp.cumsum(head.astype(jnp.int32)) - 1
    num_nodes = jnp.sum(head.astype(jnp.int32))
    in_cap = valid & (node_idx < max_nodes)

    pos = jnp.arange(Qn * N, dtype=jnp.int32)
    seg_start = jax.lax.cummax(jnp.where(head, pos, -1))
    rank = pos - seg_start
    keep = in_cap & (rank < Ps)
    dest_n = jnp.where(keep, node_idx, max_nodes)
    dest_r = jnp.clip(rank, 0, Ps - 1)

    sxyz = xyz[src_pid].astype(jnp.float32)                    # [Q*N, 3]
    planes = []
    for a in range(3):
        pl_ = jnp.full((max_nodes, Ps), XYZ_SENTINEL, jnp.float32)
        planes.append(pl_.at[dest_n, dest_r].set(sxyz[:, a], mode="drop"))
    node_pid = jnp.full((max_nodes, Ps), -1, jnp.int32)
    node_pid = node_pid.at[dest_n, dest_r].set(src_pid, mode="drop")
    BWs = bucket_width(Ps)
    node_bucket = jnp.concatenate(
        planes + [jax.lax.bitcast_convert_type(node_pid, jnp.float32),
                  jnp.zeros((max_nodes, BWs - 4 * Ps), jnp.float32)], axis=-1)

    coor2node = jnp.full((cap,), -1, jnp.int32)
    coor2node = coor2node.at[jnp.where(head & in_cap, sdv, cap)].set(
        node_idx, mode="drop")
    return coor2node, node_bucket, jnp.minimum(num_nodes, max_nodes)


def compute_grid_geometry(xyz: np.ndarray, point_mask: np.ndarray,
                          cfg: QuerierConfig) -> GridGeometry:
    """AABB ∩ ranges, padded by half the dilation kernel, -> origin/dims.

    Mirrors get_hyperparameters (worldcoords.py:46-77): pad by
    scaled_vsize*kernel_size/2 each side, dims = ceil((max-min)/vsize/vscale).
    Raises if the grid exceeds the configured linear capacity.
    """
    xyz = np.asarray(xyz)
    mask = np.asarray(point_mask).astype(bool)
    if mask.any():
        pts = xyz[mask]
        mn, mx = pts.min(axis=0), pts.max(axis=0)
    else:
        mn = np.asarray(cfg.ranges[:3], np.float32)
        mx = np.asarray(cfg.ranges[3:], np.float32)
    mn = np.maximum(mn, np.asarray(cfg.ranges[:3]))
    mx = np.minimum(mx, np.asarray(cfg.ranges[3:]))
    svsize = np.asarray(cfg.query_vsize, np.float32)
    pad = svsize * np.asarray(cfg.kernel_size, np.float32) / 2.0
    mn = mn.astype(np.float32) - pad
    mx = mx.astype(np.float32) + pad
    vdim = (mx - mn) / np.asarray(cfg.vsize, np.float32)
    dims = np.ceil(vdim / np.asarray(cfg.vscale, np.float32)).astype(np.int32)
    dims = np.maximum(dims, 1)
    # capacity must cover the z-padded coor2occ layout (stride gz+2)
    total = int(dims[0]) * int(dims[1]) * (int(dims[2]) + 2)
    if total > cfg.grid_capacity:
        raise ValueError(
            f"voxel grid {tuple(dims)} = {total} z-padded voxels exceeds "
            f"grid_capacity={cfg.grid_capacity}; enlarge capacity or vsize")
    return GridGeometry(
        origin=jnp.asarray(mn, jnp.float32),
        dims=jnp.asarray(dims, jnp.int32),
        vsize=jnp.asarray(svsize, jnp.float32),
    )


def voxel_coords(xyz: jnp.ndarray, geom: GridGeometry) -> jnp.ndarray:
    """World position -> integer voxel coords [..., 3] (may be out of bounds)."""
    return jnp.floor((xyz - geom.origin) / geom.vsize).astype(jnp.int32)


def linearize(coords: jnp.ndarray, geom: GridGeometry,
              capacity: int) -> jnp.ndarray:
    """Voxel coords -> linear id; out-of-bounds -> `capacity` (scatter-drop /
    gather-fill sentinel)."""
    d = geom.dims
    inb = jnp.all((coords >= 0) & (coords < d), axis=-1)
    lin = (coords[..., 0] * d[1] + coords[..., 1]) * d[2] + coords[..., 2]
    return jnp.where(inb, lin, capacity)


def linearize_padz(coords: jnp.ndarray, geom: GridGeometry,
                   capacity: int) -> jnp.ndarray:
    """Linear id in the z-padded layout used by ``coor2occ``: the innermost
    axis has one pad slot on each side (stride gz+2, offset +1), so a 3-wide
    z-window around any in-bounds voxel is always a valid contiguous slice —
    the whole kernel_size=3 neighborhood resolves with 9 windowed gathers
    instead of 27 scalar gathers.  x/y out-of-bounds -> `capacity` sentinel."""
    d = geom.dims
    inb = ((coords[..., 0] >= 0) & (coords[..., 0] < d[0])
           & (coords[..., 1] >= 0) & (coords[..., 1] < d[1])
           & (coords[..., 2] >= -1) & (coords[..., 2] <= d[2]))
    lin = ((coords[..., 0] * d[1] + coords[..., 1]) * (d[2] + 2)
           + coords[..., 2] + 1)
    return jnp.where(inb, lin, capacity)


def _neighbor_offsets(size3: Tuple[int, int, int]) -> np.ndarray:
    """Integer offsets covering a centered size3 window (reference dilation loop
    worldcoords.py:324-331: [-s/2, (s+1)/2) per axis)."""
    offs = []
    for s, axis in zip(size3, range(3)):
        lo, hi = -(s // 2), (s + 1) // 2
        offs.append(np.arange(lo, hi))
    grid = np.stack(np.meshgrid(*offs, indexing="ij"), axis=-1).reshape(-1, 3)
    return grid.astype(np.int32)


def build_grid(xyz: jnp.ndarray, point_mask: jnp.ndarray, geom: GridGeometry,
               cfg: QuerierConfig) -> PointGrid:
    """Build all query tables from the live point cloud.  Jittable.

    xyz: [N, 3] (padded capacity); point_mask: [N] bool for live points.
    Deterministic: points sort stably by (voxel id, point id); the first P per
    voxel fill the bucket.  Exact when buckets don't overflow — matching the
    reference in its non-overflow regime (SURVEY §7.3).
    """
    N = xyz.shape[0]
    cap = cfg.grid_capacity
    max_o = cfg.max_o
    P = cfg.P

    coords = voxel_coords(xyz, geom)
    vid = linearize(coords, geom, cap)                      # [N]
    vid = jnp.where(point_mask, vid, cap)                   # masked -> sentinel

    order = jnp.argsort(vid, stable=True)                   # stable: ties by pid
    svid = vid[order]
    spid = order.astype(jnp.int32)

    valid = svid < cap
    head = jnp.concatenate(
        [valid[:1], (svid[1:] != svid[:-1]) & valid[1:]])   # first of each voxel
    occ_idx = jnp.cumsum(head.astype(jnp.int32)) - 1        # [N] compact index
    num_occ = jnp.sum(head.astype(jnp.int32))
    in_cap = valid & (occ_idx < max_o)

    # rank within voxel: position minus position of the voxel's head entry
    pos = jnp.arange(N, dtype=jnp.int32)
    seg_start = jax.lax.cummax(jnp.where(head, pos, -1))
    rank = pos - seg_start

    # coor2occ: head entries scatter their compact index at their voxel id,
    # in the z-padded layout (pad slots stay -1; see linearize_padz)
    coor2occ = jnp.full((cap,), -1, jnp.int32)
    d = geom.dims
    svid_pad = (svid // d[2]) * (d[2] + 2) + (svid % d[2]) + 1
    coor2occ = coor2occ.at[jnp.where(head & in_cap, svid_pad, cap)].set(
        occ_idx, mode="drop")

    # occ_pnts / occ_pnt_xyz / occ_numpnts
    occ_pnts = jnp.full((max_o, P), -1, jnp.int32)
    keep = in_cap & (rank < P)
    dest_o = jnp.where(keep, occ_idx, max_o)
    dest_r = jnp.clip(rank, 0, P - 1)
    occ_pnts = occ_pnts.at[dest_o, dest_r].set(spid, mode="drop")
    occ_pnt_xyz = jnp.full((max_o, P, 3), XYZ_SENTINEL, jnp.float32)
    occ_pnt_xyz = occ_pnt_xyz.at[dest_o, dest_r].set(
        xyz[spid].astype(jnp.float32), mode="drop")
    occ_numpnts = jnp.zeros((max_o,), jnp.int32).at[dest_o].add(
        1, mode="drop")

    # occ_vid -> coords of each occupied voxel, for dilation
    occ_vid = jnp.full((max_o,), cap, jnp.int32).at[
        jnp.where(head & in_cap, occ_idx, max_o)
    ].set(svid, mode="drop")
    d = geom.dims
    occ_z = occ_vid % d[2]
    occ_y = (occ_vid // d[2]) % d[1]
    occ_x = occ_vid // (d[1] * d[2])
    occ_coords = jnp.stack([occ_x, occ_y, occ_z], axis=-1)  # [max_o, 3]
    occ_live = occ_vid < cap

    # dilated occupancy: scatter 1 at every query_size-neighborhood voxel
    offsets = jnp.asarray(_neighbor_offsets(cfg.query_size))  # [Q, 3]

    def scatter_offset(occ_d, off):
        nb = occ_coords + off[None, :]
        nb_lin = linearize(nb, geom, cap)
        nb_lin = jnp.where(occ_live, nb_lin, cap)
        return occ_d.at[nb_lin].set(jnp.int8(1), mode="drop"), None

    occ_dilated = jnp.zeros((cap,), jnp.int8)
    occ_dilated, _ = jax.lax.scan(scatter_offset, occ_dilated, offsets)

    # bit-pack for the cull gather (see PointGrid.occ_bits)
    cap32 = -(-cap // 32) * 32
    od = occ_dilated
    if cap32 != cap:
        od = jnp.concatenate([od, jnp.zeros((cap32 - cap,), jnp.int8)])
    occ_bits = jnp.sum(
        od.reshape(-1, 32).astype(jnp.int32)
        << jnp.arange(32, dtype=jnp.int32)[None, :], axis=-1)

    # lane-aligned packed bucket: [x | y | z | pid(bitcast) | pad]
    BW = bucket_width(P)
    pid_f = jax.lax.bitcast_convert_type(occ_pnts, jnp.float32)
    occ_bucket = jnp.concatenate([
        occ_pnt_xyz[..., 0], occ_pnt_xyz[..., 1], occ_pnt_xyz[..., 2], pid_f,
        jnp.zeros((max_o, BW - 4 * P), jnp.float32)], axis=-1)

    coor2node = node_bucket = num_nodes = None
    if cfg.supervoxel:
        coor2node, node_bucket, num_nodes = _build_supervoxel(
            xyz, point_mask, coords, geom, cfg)

    return PointGrid(
        geom=geom, coor2occ=coor2occ, occ_dilated=occ_dilated,
        occ_pnts=occ_pnts, occ_pnt_xyz=occ_pnt_xyz, occ_bucket=occ_bucket,
        occ_numpnts=occ_numpnts, num_occ=jnp.minimum(num_occ, max_o),
        coor2node=coor2node, node_bucket=node_bucket, num_nodes=num_nodes,
        occ_bits=occ_bits)


build_grid_jit = jax.jit(build_grid, static_argnames="cfg")
