"""Pallas TPU kernel: K-smallest selection over candidate distances.

The K-NN's final stage selects the K=8 nearest of ~700 candidates per shading
sample.  The XLA formulation (K sequential argmin+mask passes) re-reads the
[S, C] distance matrix from HBM eight times; this kernel tiles it into VMEM
once and runs the whole selection loop on-chip — one HBM pass.

Falls back to the XLA path off-TPU (tests run it in interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_S = 256
BIG = 1e30


def _select_kernel(K: int, d_ref, i_ref, out_d_ref, out_i_ref):
    cd = d_ref[:]                                   # [BS, C] in VMEM
    ci = i_ref[:]
    BS, C = cd.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (BS, C), 1)
    for k in range(K):
        m = jnp.min(cd, axis=1, keepdims=True)      # [BS, 1]
        # first column achieving the min
        hit = cd <= m
        am = jnp.min(jnp.where(hit, col, C), axis=1, keepdims=True)
        sel = col == am
        out_d_ref[:, k] = m[:, 0]
        out_i_ref[:, k] = jnp.sum(jnp.where(sel, ci, 0), axis=1)
        cd = jnp.where(sel, BIG, cd)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def k_smallest(cand_d: jnp.ndarray, cand_i: jnp.ndarray, k: int,
               interpret: bool = False):
    """cand_d: [S, C] f32; cand_i: [S, C] i32 -> (best_d [S, k], best_i)."""
    S, C = cand_d.shape
    # pad rows to the block multiple and columns to the lane multiple
    S_pad = -(-S // BLOCK_S) * BLOCK_S
    C_pad = -(-C // 128) * 128
    d = jnp.full((S_pad, C_pad), BIG, jnp.float32).at[:S, :C].set(cand_d)
    i = jnp.full((S_pad, C_pad), -1, jnp.int32).at[:S, :C].set(cand_i)

    grid = (S_pad // BLOCK_S,)
    out_d, out_i = pl.pallas_call(
        functools.partial(_select_kernel, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_S, C_pad), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_S, C_pad), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_S, k), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_S, k), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((S_pad, k), jnp.int32),
        ],
        interpret=interpret,
    )(d, i)
    return out_d[:S], out_i[:S]


def k_smallest_xla(cand_d: jnp.ndarray, cand_i: jnp.ndarray, k: int):
    """Reference XLA formulation (K argmin+mask passes)."""
    S, C = cand_d.shape

    def body(carry, _):
        cd, acc_d, acc_i, j = carry
        am = jnp.argmin(cd, axis=-1)
        md = jnp.take_along_axis(cd, am[:, None], axis=-1)[:, 0]
        mi = jnp.take_along_axis(cand_i, am[:, None], axis=-1)[:, 0]
        acc_d = acc_d.at[:, j].set(md)
        acc_i = acc_i.at[:, j].set(mi)
        cd = jnp.where(jax.nn.one_hot(am, C, dtype=bool), BIG, cd)
        return (cd, acc_d, acc_i, j + 1), None

    acc_d0 = jnp.full((S, k), BIG)
    acc_i0 = jnp.full((S, k), -1, jnp.int32)
    (_, best_d, best_i, _), _ = jax.lax.scan(
        body, (cand_d, acc_d0, acc_i0, 0), None, length=k)
    return best_d, best_i


def k_smallest_auto(cand_d: jnp.ndarray, cand_i: jnp.ndarray, k: int):
    """Pallas on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return k_smallest(cand_d, cand_i, k)
    return k_smallest_xla(cand_d, cand_i, k)
