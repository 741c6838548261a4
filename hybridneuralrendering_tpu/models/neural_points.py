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

import dataclasses
import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hybridneuralrendering_tpu.config import PointsConfig

ATTR_ORDER = ("xyz", "embedding", "conf", "color", "dirs")


def attr_widths(feature_dim: int) -> Tuple[int, ...]:
    return (3, feature_dim, 1, 3, 3)


def table_width(feature_dim: int) -> int:
    """Stacked attribute row width, zero-padded to a 64-lane multiple: XLA's
    TPU row gather runs 3.3x faster on lane-aligned rows ([602k,64] 12.6 ms
    vs [602k,47] 42 ms, tools/ablate_gather.py)."""
    used = sum(attr_widths(feature_dim))
    return used + (-used) % 64


@dataclasses.dataclass(frozen=True)
class NeuralPoints:
    """Fixed-capacity point cloud, padded to cfg.num_points.

    All five per-point attributes live STACKED in one lane-aligned
    ``table [N, table_width]`` (xyz | embedding | conf | color | dirs | 0-pad)
    — the layout the hot gather wants.  Round 2 stored them as separate
    [N,3]/[N,F]/[N,1] leaves and paid a per-step concat (+ relayout copies
    of the narrow lane-padded parts) to build this exact stack, ~4-6 ms of
    the 130 ms cached step (r3 HLO trace: concatenate.29 + copy.1186-1190).
    ``xyz``/``embedding``/... remain available as sliced views.  The Adam
    over point attributes runs directly on the table (frozen attributes get
    exactly-zero gradients via stop_gradient in `gather`, so their lanes —
    and the zero pad — never move).
    """

    table: jnp.ndarray        # [N, table_width(F)] f32
    mask: jnp.ndarray         # [N] bool — live point
    num_live: jnp.ndarray     # [] i32
    # per-point world->local rotations for scene editing (None outside edit
    # mode; the reference carries these only for edited parts,
    # neural_points.py:473-487 + run/editiing.py:196-209)
    rw2c: Optional[jnp.ndarray] = None   # [N, 3, 3] f32 or None
    # static metadata (pytree aux): attribute slicing + grad switches
    feature_dim: int = 32
    trainable: Tuple[bool, ...] = (False, True, True, True, True)

    # -- attribute views ---------------------------------------------------

    def _offset(self, name: str) -> Tuple[int, int]:
        widths = attr_widths(self.feature_dim)
        o = 0
        for nm, w in zip(ATTR_ORDER, widths):
            if nm == name:
                return o, o + w
            o += w
        raise KeyError(name)

    def _view(self, name: str) -> jnp.ndarray:
        a, b = self._offset(name)
        return self.table[:, a:b]

    @property
    def xyz(self) -> jnp.ndarray:          # [N, 3]
        return self._view("xyz")

    @property
    def embedding(self) -> jnp.ndarray:    # [N, F]
        return self._view("embedding")

    @property
    def conf(self) -> jnp.ndarray:         # [N, 1]
        return self._view("conf")

    @property
    def color(self) -> jnp.ndarray:        # [N, 3]
        return self._view("color")

    @property
    def dirs(self) -> jnp.ndarray:         # [N, 3]
        return self._view("dirs")

    @property
    def capacity(self) -> int:
        return self.table.shape[0]

    def _replace(self, **kw) -> "NeuralPoints":
        """NamedTuple-compatible update; attribute names write their table
        slice."""
        table = kw.pop("table", self.table)
        for name in ATTR_ORDER:
            if name in kw:
                a, b = self._offset(name)
                v = jnp.asarray(kw.pop(name), table.dtype)
                table = table.at[:, a:b].set(v.reshape(v.shape[0], b - a))
        return dataclasses.replace(self, table=table, **kw)


jax.tree_util.register_dataclass(
    NeuralPoints,
    data_fields=("table", "mask", "num_live", "rw2c"),
    meta_fields=("feature_dim", "trainable"),
)


def build_table(feature_dim: int, xyz, embedding, conf, color, dirs,
                xp=jnp) -> jnp.ndarray:
    """Assemble the stacked lane-aligned table from per-attribute arrays."""
    n = xyz.shape[0]
    parts = [xyz, embedding, conf, color, dirs]
    parts = [xp.asarray(p, xp.float32 if xp is jnp else np.float32)
             .reshape(n, -1) for p in parts]
    tw = table_width(feature_dim)
    used = sum(p.shape[1] for p in parts)
    pad = xp.zeros((n, tw - used),
                   xp.float32 if xp is jnp else np.float32)
    return xp.concatenate(parts + [pad], axis=1)


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
    table = build_table(cfg.feature_dim, pad(xyz, 3), emb, conf_arr,
                        pad(color, 3), pad(dirs, 3), xp=np)
    return NeuralPoints(
        table=jnp.asarray(table),
        mask=jnp.asarray(mask),
        num_live=jnp.asarray(n, jnp.int32),
        feature_dim=cfg.feature_dim,
        trainable=(cfg.xyz_grad, cfg.feat_grad, cfg.conf_grad,
                   cfg.color_grad, cfg.dir_grad),
    )


class SampledPoints(NamedTuple):
    """Per-neighbor gathered attributes, [R, SR, K, ·]."""

    xyz: jnp.ndarray          # [R, SR, K, 3]
    embedding: jnp.ndarray    # [R, SR, K, F]
    conf: jnp.ndarray         # [R, SR, K] (squeezed: a trailing singleton
                              # would lane-pad its cotangent 128x, r3 log)
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
    # low-precision tables (pyramid_dtype=bfloat16): accumulate the cumsum
    # in f32 — a 301k-row bf16 running sum loses most of the gradient —
    # and round only the final per-segment grad back to the table dtype
    out_dtype = sg.dtype
    if out_dtype in (jnp.bfloat16, jnp.float16):
        sg = sg.astype(jnp.float32)

    # end_pos[p] = last sorted position with id <= p (inclusive cummax form).
    # si is sorted, so each id's segment END is the unique j where the next
    # id differs — a unique-index scatter-SET of those positions (XLA
    # vectorizes unique scatters; the previous at[si].max scatter over ALL
    # m rows serialized on duplicates: 5.3 ms in the r3 HLO trace).
    pos = jnp.arange(m, dtype=jnp.int32)
    is_end = jnp.concatenate([si[:-1] != si[1:],
                              jnp.ones((1,), bool)])         # [m]
    # non-end rows scatter out of range (mode="drop") — the kept indices
    # are strictly unique, no collision anywhere
    end_at = jnp.where(is_end, si, n)                        # [m]

    cs = jnp.cumsum(sg, axis=0)                              # [m, F]
    # NOTE: for SPARSE segments (the materialized-pyramid table gradient,
    # m=301k rows -> n=1.23M ids, burst steps only) the n-row e-gather
    # below is the single largest burst-step op (18 ms, r3 HLO fusion.6).
    # A scatter formulation (per-segment sums at END rows via one m-row
    # monotone gather, then a unique-index row scatter into a zero table)
    # was bench-tested and LOST BADLY: uncached 19365 -> 16462 rays/s —
    # multi-channel row scatters are slow on TPU even with unique indices
    # (matches r2 ablate_gather: scatter-set of rows 114 ms vs 12.6 ms
    # gather at the same shape).  The e-gather stays.

    end_pos = jnp.full((n,), -1, jnp.int32).at[end_at].set(
        pos, mode="drop", unique_indices=True)               # [n]
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
    e = jnp.where((end_pos >= 0)[:, None],
                  cs[jnp.maximum(end_pos, 0)], 0.0)      # [n, F]
    grad = e - jnp.concatenate([jnp.zeros_like(e[:1]), e[:-1]], axis=0)
    idx_ct = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return grad.astype(out_dtype), idx_ct


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def _dedup_gather_impl(table, idx, u_cap: int):
    """Unique-row dedup forward for the big attribute gather (VERDICT r4
    #5).  One training step's [R, SR, K] neighbor ids touch only ~68k
    unique points of the 602k gather slots on the canonical ScanNet
    workload (8.8x; 47x on NeRF SR=80 — census in PERF.md): gather the
    unique rows ONCE into a compact [u_cap, F] table, then expand to the
    m slots with cheap int indices over the small table.  Pays only if
    XLA's row-gather cost depends on table size (row-fetch locality), not
    descriptor count — bench.py decides.

    Static shapes: u_cap is a compile-time unique-capacity; if a step's
    actual unique count exceeds it, an in-graph lax.cond falls back to
    the direct gather (both branches compiled, one executed), so the
    result is always exact."""
    flat = idx.reshape(-1).astype(jnp.int32)
    m = flat.shape[0]
    # unique count can never exceed the slot count: clamp the static cap
    # so small workloads (tests, fixtures) don't gather an oversized
    # mostly-zero compact table
    u_cap = min(int(u_cap), m)
    pos = jnp.arange(m, dtype=jnp.int32)
    # one sort yields sorted ids AND the permutation (r3 one-sort lesson)
    si, order = jax.lax.sort((flat, pos), num_keys=1, is_stable=True)
    is_new = jnp.concatenate([jnp.ones((1,), bool), si[1:] != si[:-1]])
    uid_sorted = jnp.cumsum(is_new.astype(jnp.int32)) - 1        # [m]
    n_unique = uid_sorted[-1] + 1

    def dedup(_):
        # cid[u] = point id of segment u (each segment scatters once)
        cid = jnp.zeros((u_cap,), jnp.int32).at[
            jnp.where(is_new, uid_sorted, u_cap)].set(
            si, mode="drop", unique_indices=True)
        compact = table[cid]                                     # [u_cap, F]
        # segment rank per ORIGINAL slot: invert the sort permutation
        uid = jnp.zeros((m,), jnp.int32).at[order].set(
            uid_sorted, unique_indices=True)
        return compact[uid]

    def direct(_):
        return table[flat]

    out = jax.lax.cond(n_unique <= u_cap, dedup, direct, None)
    return out.reshape(idx.shape + (table.shape[-1],))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_rows_dedup(table, idx, u_cap: int):
    """_gather_rows with the dedup forward; the backward is IDENTICAL
    (the sorted-cumsum pipe only needs idx + cotangent)."""
    return _dedup_gather_impl(table, idx, u_cap)


def _gather_rows_dedup_fwd(table, idx, u_cap: int):
    return _dedup_gather_impl(table, idx, u_cap), (idx, table.shape[0])


def _gather_rows_dedup_bwd(u_cap, res, g):
    return _gather_rows_bwd(res, g)


_gather_rows_dedup.defvjp(_gather_rows_dedup_fwd, _gather_rows_dedup_bwd)


def gather(points: NeuralPoints, sample_pidx: jnp.ndarray,
           dedup: int = 0) -> SampledPoints:
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
    out = (_gather_rows_dedup(points.table, idx, int(dedup)) if dedup
           else _gather_rows(points.table, idx))
    splits = np.cumsum(attr_widths(points.feature_dim)).tolist()
    parts = jnp.split(out, splits, axis=-1)[:5]
    # frozen attributes (per-attr grad switches, reference
    # neural_points.py:133-170): stop_gradient on the POST-gather slice
    # zeroes their table-lane cotangents for free — the whole table is one
    # Adam leaf, so untouched lanes simply never move
    parts = [p if t else jax.lax.stop_gradient(p)
             for p, t in zip(parts, points.trainable)]
    xyz, emb, conf, color, dirs = parts
    conf = conf[..., 0]
    return SampledPoints(
        xyz=xyz, embedding=emb, conf=conf, color=color, dirs=dirs,
        rw2c=None if points.rw2c is None else points.rw2c[idx],
    )


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

    new_table = build_table(points.feature_dim, new_xyz, new_embedding,
                            new_conf, new_color, new_dirs)
    mask = points.mask.at[dest].set(True, mode="drop")
    return dataclasses.replace(
        points,
        table=points.table.at[dest].set(new_table, mode="drop"),
        mask=mask,
        num_live=jnp.sum(mask.astype(jnp.int32)),
    )
