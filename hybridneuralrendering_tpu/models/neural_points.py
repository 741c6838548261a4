"""Neural point cloud: the optimizable scene representation.

TPU-native counterpart of /root/reference/models/neural_points/neural_points.py.
The point cloud is a pytree of fixed-capacity arrays (live points marked by
``mask``); prune/grow mutate data, never shapes, so the train step stays
compiled (SURVEY §7.1: capacity-bucketed padding instead of the bash restart
loop).  Attribute gathers for the [R, SR, K] neighbor indices mirror the
reference's `torch.index_select` block (neural_points.py:702-733) — gradients
flow to point attributes exactly through these gathers.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hybridneuralrendering_tpu.config import PointsConfig


class NeuralPoints(NamedTuple):
    """Fixed-capacity point cloud.  All arrays padded to cfg.num_points."""

    xyz: jnp.ndarray          # [N, 3] f32 — positions
    embedding: jnp.ndarray    # [N, F] f32 — learned features
    conf: jnp.ndarray         # [N, 1] f32 — confidence
    color: jnp.ndarray        # [N, 3] f32
    dirs: jnp.ndarray         # [N, 3] f32 — acquisition view directions
    mask: jnp.ndarray         # [N] bool — live point
    num_live: jnp.ndarray     # [] i32
    # per-point world->local rotations for scene editing (None outside edit
    # mode; the reference carries these only for edited parts,
    # neural_points.py:473-487 + run/editiing.py:196-209)
    rw2c: Optional[jnp.ndarray] = None   # [N, 3, 3] f32 or None

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


def init_from_arrays(xyz: np.ndarray, cfg: PointsConfig,
                     embedding: Optional[np.ndarray] = None,
                     conf: Optional[np.ndarray] = None,
                     color: Optional[np.ndarray] = None,
                     dirs: Optional[np.ndarray] = None,
                     key: Optional[jax.Array] = None) -> NeuralPoints:
    """Build a padded NeuralPoints from host arrays (reference set_points,
    neural_points.py:404-464).  Missing attributes are initialized like the
    reference: random features (`feature_init_method='rand'`), conf=1."""
    n = len(xyz)
    cap = cfg.num_points
    if n > cap:
        raise ValueError(f"{n} points exceed capacity {cap}")

    def pad(a, width):
        out = np.zeros((cap, width), np.float32)
        if a is not None:
            out[:n] = np.asarray(a, np.float32).reshape(n, width)
        return out

    if embedding is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        emb = np.zeros((cap, cfg.feature_dim), np.float32)
        emb[:n] = np.asarray(
            jax.random.normal(key, (n, cfg.feature_dim)) * 0.1)
    else:
        emb = pad(embedding, cfg.feature_dim)

    conf_arr = pad(conf if conf is not None else np.ones((n, 1)), 1)
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return NeuralPoints(
        xyz=jnp.asarray(pad(xyz, 3)),
        embedding=jnp.asarray(emb),
        conf=jnp.asarray(conf_arr),
        color=jnp.asarray(pad(color, 3)),
        dirs=jnp.asarray(pad(dirs, 3)),
        mask=jnp.asarray(mask),
        num_live=jnp.asarray(n, jnp.int32),
    )


class SampledPoints(NamedTuple):
    """Per-neighbor gathered attributes, [R, SR, K, ·]."""

    xyz: jnp.ndarray          # [R, SR, K, 3]
    embedding: jnp.ndarray    # [R, SR, K, F]
    conf: jnp.ndarray         # [R, SR, K, 1]
    color: jnp.ndarray        # [R, SR, K, 3]
    dirs: jnp.ndarray         # [R, SR, K, 3]
    rw2c: Optional[jnp.ndarray] = None  # [R, SR, K, 3, 3] in edit mode


@jax.custom_vjp
def _gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [N, F] -> table[idx] with a sort-based backward.

    The VJP of a plain gather is an XLA scatter-add, which serializes on
    duplicate indices — measured at ~150 ms/step for the [R,SR,K] attribute
    gradients (profile_r2b, the single largest step cost).  Instead the
    backward sorts the cotangent rows by point id and reduces with a sorted
    `segment_sum`, which XLA vectorizes: same values, deterministic, and an
    order of magnitude faster."""
    return table[idx]


def _gather_rows_fwd(table, idx):
    return table[idx], (idx, table.shape[0])


def _gather_rows_bwd(res, g):
    """Sorted cotangents reduce by cumulative-sum differencing instead of
    segment_sum: XLA's TPU segment_sum/scatter-add serializes (measured
    107-123 ms at [602k, 42] -> 600k segments) while this formulation —
    cumsum, per-segment boundary difference, ONE 1-channel position scatter
    with unique indices, and a row gather — is bandwidth-bound (~0.5 ms).
    f32 cumsum differencing carries ~3e-5 relative error vs exact
    summation — gradient-noise level."""
    idx, n = res
    m = int(np.prod(idx.shape))
    flat_i = idx.reshape(-1).astype(jnp.int32)
    flat_g = g.reshape(-1, g.shape[-1])
    # stable sort: keeps the backward bit-deterministic (unstable measured
    # bench-neutral, 22169 vs 22136 — no reason to give up reproducibility).
    # ONE sort returns (sorted ids, permutation) together — `argsort` then
    # `flat_i[order]` re-gathers the ids it already sorted (HLO fusion.6,
    # 4.3 ms of scalar descriptors at M=602k).
    si, order = jax.lax.sort(
        (flat_i, jnp.arange(m, dtype=jnp.int32)), num_keys=1,
        is_stable=True)
    sg = flat_g[order]

    # end_pos[p] = last sorted position with id <= p (inclusive cummax form)
    # from a 1-ch scatter-max with unique winners + cummax fill
    pos = jnp.arange(m, dtype=jnp.int32)
    end_pos = jnp.full((n,), -1, jnp.int32).at[si].max(
        pos, mode="drop")                                    # [n]
    end_pos = jax.lax.cummax(end_pos)

    # grad[p] = e[p] - e[p-1] where e[p] = cs[end_pos[p]]: the inclusive
    # cumsum read at each point's segment END — adjacent differencing
    # isolates the segment sums and gives absent points an exact 0.  ONE
    # full-size row gather (e), vs the previous formulation's two.
    # NOTE: two Pallas replacements were bench-tested here and LOST:
    # (1) a single-pass Pallas cumsum (tools/pallas_scan.py, 21144 ->
    # 16532 rays/s — the 1176-step sequential carry grid defeats Mosaic's
    # DMA pipelining); (2) a banded one-hot MXU segment-sum
    # (tools/pallas_gather.py) that replaces this whole tail — 1.8x faster
    # ISOLATED (9.4 vs 16.7 ms chained, rel err 2.8e-6) yet a full-step
    # regression (bench 21982 -> 19927 even gated to the dense attr-stack
    # reduction only): in-step the cumsum/e-gather fuse with the
    # surrounding elementwise VJP work, and the pallas_call boundary forces
    # those passes to materialize.  XLA's log-pass cumsum stays.
    cs = jnp.cumsum(sg, axis=0)                          # [M, F]
    e = jnp.where((end_pos >= 0)[:, None],
                  cs[jnp.maximum(end_pos, 0)], 0.0)      # [n, F]
    grad = e - jnp.concatenate([jnp.zeros_like(e[:1]), e[:-1]], axis=0)
    idx_ct = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return grad, idx_ct


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def gather(points: NeuralPoints, sample_pidx: jnp.ndarray) -> SampledPoints:
    """Gather attributes for neighbor indices [R, SR, K] (clamped at 0 like the
    reference; invalid slots are masked downstream by pnt_mask).

    All attributes ride in ONE stacked [N, 42] table so the hot path is a
    single row gather (fwd) and a single sorted-cumsum reduce (bwd) instead
    of five of each; the concat/split costs one cheap elementwise pass.
    (Measured: splitting xyz into its own gather to spare its cotangent is
    ~3% slower overall — the extra gather outweighs the skipped slice.)

    The stack is zero-padded to a 64-lane multiple: XLA's TPU row gather
    runs 3.3x faster on lane-aligned rows ([602k,64] 12.6 ms vs [602k,47]
    42 ms, tools/ablate_gather.py) and the backward pipe's two full-size
    row gathers inherit the alignment through the cotangent."""
    idx = jnp.clip(sample_pidx, 0)
    stack = jnp.concatenate(
        [points.xyz, points.embedding, points.conf, points.color,
         points.dirs], axis=-1)
    pad = (-stack.shape[-1]) % 64
    if pad:
        stack = jnp.concatenate(
            [stack, jnp.zeros(stack.shape[:-1] + (pad,), stack.dtype)],
            axis=-1)
    out = _gather_rows(stack, idx)
    fdim = points.embedding.shape[-1]
    splits = np.cumsum([3, fdim, 1, 3, 3]).tolist()
    xyz, emb, conf, color, dirs = jnp.split(out, splits, axis=-1)[:5]
    return SampledPoints(
        xyz=xyz, embedding=emb, conf=conf, color=color, dirs=dirs,
        rw2c=None if points.rw2c is None else points.rw2c[idx],
    )


def trainable_filter(cfg: PointsConfig) -> Dict[str, bool]:
    """Which attributes receive gradients (reference per-attribute grad
    switches, neural_points.py:133-170)."""
    return {
        "xyz": cfg.xyz_grad,
        "embedding": cfg.feat_grad,
        "conf": cfg.conf_grad,
        "color": cfg.color_grad,
        "dirs": cfg.dir_grad,
        "mask": False,
        "num_live": False,
    }


def prune(points: NeuralPoints, thresh: float) -> NeuralPoints:
    """Drop points with conf below threshold (reference prune,
    neural_points.py:350-373).  Pure masking — capacity unchanged."""
    keep = points.mask & (points.conf[:, 0] > thresh)
    return points._replace(
        mask=keep, num_live=jnp.sum(keep.astype(jnp.int32)))


def grow(points: NeuralPoints, new_xyz: jnp.ndarray, new_embedding: jnp.ndarray,
         new_conf: jnp.ndarray, new_color: jnp.ndarray, new_dirs: jnp.ndarray,
         new_mask: jnp.ndarray) -> NeuralPoints:
    """Append up to M new points into free capacity slots (reference
    grow_points concat, neural_points.py:376-402).  Fixed shapes: `new_*` are
    padded to a static M with `new_mask`; slots are assigned by compacting free
    indices.  Jittable."""
    cap = points.capacity
    M = new_xyz.shape[0]
    free = ~points.mask                                  # [N]
    # position of each incoming point among free slots
    order = jnp.cumsum(new_mask.astype(jnp.int32)) - 1   # [M]
    free_idx = jnp.cumsum(free.astype(jnp.int32)) - 1    # [N] rank of free slot
    # slot_of_rank[r] = index of r-th free slot
    slot_of_rank = jnp.full((cap,), cap, jnp.int32).at[
        jnp.where(free, free_idx, cap)].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")
    dest = slot_of_rank[jnp.clip(order, 0, cap - 1)]     # [M]
    dest = jnp.where(new_mask, dest, cap)                # drop masked

    def put(arr, new):
        return arr.at[dest].set(new, mode="drop")

    mask = points.mask.at[dest].set(True, mode="drop")
    return NeuralPoints(
        xyz=put(points.xyz, new_xyz),
        embedding=put(points.embedding, new_embedding),
        conf=put(points.conf, new_conf),
        color=put(points.color, new_color),
        dirs=put(points.dirs, new_dirs),
        mask=mask,
        num_live=jnp.sum(mask.astype(jnp.int32)),
    )
