"""Pallas TPU kernel: banded one-hot segment-sum for the gather backward.

The attribute-gather VJP reduces M~602k sorted cotangent rows into N~600k
point-gradient rows (models/neural_points._gather_rows_bwd; the reference's
`index_select` backward is a CUDA scatter-add, neural_points.py:702-733).
The XLA pipe does cumsum-differencing: a [M, C] log-pass cumsum, a full-size
row gather of the cumsum at per-point segment ends, and adjacent differencing
— the device trace (CLAUDE.md round-2) prices the gather at ~6.9 ms and the
cumsum passes inside the 29.5 ms loop-fusion bucket, all at ~36 GB/s
effective because TPU row gathers issue one descriptor per 256 B row.

This kernel exploits that after sorting, each point's rows are a CONTIGUOUS
band: for an output block of B point ids, the contributing rows live in
[row_lo[first_id], row_hi[last_id]) — a span of WINDOW_R-aligned windows of
the sorted cotangent matrix.  The grid is the flattened (block, window) pair
list (scalar-prefetched maps `bmap`/`wmap`, grouped-matmul style), so Mosaic
double-buffers the window DMAs across grid steps; each step builds the 0/1
band matrix from two range compares (no index gathers at all) and reduces
with one MXU matmul per window:

    grad[b, :] += band[b, Wr] @ sg_window[Wr, C]

Streaming cost: sg read ~once (~154 MB + window padding), out written once —
no per-row descriptors, the reduction rides the MXU.  Duplicates sum inside
the matmul in a fixed order (deterministic).  Precision: the band is exact
in bf16; sg is split hi/lo into two bf16 passes (error ~4e-5 relative, the
same class as the cumsum pipe's 3e-5 — a v1 single-pass bf16 measured
1.5e-3, too lossy for gradients).

Row ranges come from the same end_pos array the XLA pipe already computes
(scatter-max + cummax over sorted ids), so the kernel REPLACES the cumsum +
e-gather + differencing tail, not the sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 512      # output point ids per block
WINDOW_R = 1024    # sorted rows per aligned window


def _segsum_kernel(bmap_ref, wmap_ref, lo_ref, hi_ref, win_ref, out_ref):
    g = pl.program_id(0)
    B, C = out_ref.shape

    @pl.when(jnp.logical_or(g == 0, bmap_ref[g] != bmap_ref[g - 1]))
    def _zero():
        out_ref[:] = jnp.zeros((B, C), jnp.float32)

    pos = wmap_ref[g] * WINDOW_R + jax.lax.broadcasted_iota(
        jnp.int32, (B, WINDOW_R), 1)                 # [B, Wr] global row pos
    band = ((pos >= lo_ref[:]) & (pos < hi_ref[:])).astype(jnp.bfloat16)
    w = win_ref[:].astype(jnp.float32)
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.dot(band, hi, preferred_element_type=jnp.float32)
    acc += jnp.dot(band, lo, preferred_element_type=jnp.float32)
    out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def banded_segment_sum(sg: jnp.ndarray, end_pos: jnp.ndarray, n_out: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Segment-sum of SORTED rows into per-id gradients.

    sg: [M, C] f32 — cotangent rows sorted by point id (C a lane multiple);
    end_pos: [n_out] i32 — for each id, the LAST sorted row position with
    id' <= id (inclusive cummax form, -1 where no row precedes), i.e. the
    same array the XLA cumsum pipe builds; rows of id p are
    (end_pos[p-1], end_pos[p]].  Returns [n_out, C] f32.
    """
    M, C = sg.shape
    assert C % 64 == 0, C
    nblocks = -(-n_out // BLOCK_N)
    n_pad = nblocks * BLOCK_N
    # per-id row ranges [lo, hi) from the inclusive segment ends; padded ids
    # carry the empty band [M, M) so block edges stay correct
    hi = end_pos.astype(jnp.int32) + 1                         # [n_out]
    lo = jnp.concatenate([jnp.zeros((1,), jnp.int32), hi[:-1]])
    lo_p = jnp.full((n_pad, 1), M, jnp.int32).at[:n_out, 0].set(lo)
    hi_p = jnp.full((n_pad, 1), M, jnp.int32).at[:n_out, 0].set(hi)

    # per-block aligned-window span: rows of block b live in
    # [lo[first_id], hi[last_id]) -> windows [w_start, w_start + nw)
    blo = lo_p[::BLOCK_N, 0]                                   # [nblocks]
    bhi = hi_p[BLOCK_N - 1::BLOCK_N, 0]
    w_start = blo // WINDOW_R
    # empty blocks still get ONE (all-zero-band) visit so their out block is
    # written; spans never shrink below one window
    nw = jnp.maximum((jnp.maximum(bhi, blo + 1) - 1) // WINDOW_R
                     - w_start + 1, 1)                         # [nblocks]

    # flatten (block, window) pairs into a static-size 1-D grid.  G bounds
    # sum(ceil(span/Wr) + 1): spans are disjoint (hi[last of b] ==
    # lo[first of b+1]) so they sum to <= M.
    G = -(-M // WINDOW_R) + nblocks
    offs = jnp.cumsum(nw)                                      # [nblocks]
    gidx = jnp.arange(G, dtype=jnp.int32)
    bmap = jnp.searchsorted(offs, gidx, side="right").astype(jnp.int32)
    # padding steps (g >= offs[-1]) repeat the LAST real block with an
    # empty window so no out block sees a spurious first visit
    pad = bmap >= nblocks
    bmap = jnp.where(pad, nblocks - 1, bmap)
    prev = jnp.where(bmap > 0, offs[jnp.maximum(bmap - 1, 0)], 0)
    wmap = w_start[bmap] + (gidx - prev)
    n_win = -(-M // WINDOW_R) + 1
    wmap = jnp.where(pad, n_win - 1, wmap).astype(jnp.int32)

    # pad sg so every window (incl. the empty padding window) is in range;
    # padded rows sit at pos >= M which every band excludes
    sg_pad = jnp.concatenate(
        [sg, jnp.zeros((n_win * WINDOW_R - M, C), sg.dtype)], axis=0)

    out = pl.pallas_call(
        _segsum_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,                 # bmap, wmap
            grid=(G,),
            in_specs=[
                pl.BlockSpec((BLOCK_N, 1), lambda g, b, w: (b[g], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_N, 1), lambda g, b, w: (b[g], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WINDOW_R, C), lambda g, b, w: (w[g], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLOCK_N, C), lambda g, b, w: (b[g], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(bmap, wmap, lo_p, hi_p, sg_pad)
    return out[:n_out]


def banded_segment_sum_xla(sg: jnp.ndarray, end_pos: jnp.ndarray,
                           n_out: int) -> jnp.ndarray:
    """Reference XLA formulation — the cumsum-differencing pipe of
    models/neural_points._gather_rows_bwd (kept here for A/B tests)."""
    cs = jnp.cumsum(sg, axis=0)
    e = jnp.where((end_pos >= 0)[:, None], cs[jnp.maximum(end_pos, 0)], 0.0)
    return e - jnp.concatenate([jnp.zeros_like(e[:1]), e[:-1]], axis=0)
