"""Pallas TPU kernel: single-pass row cumsum for the gather backward.

`jnp.cumsum(x, axis=0)` on a [M, F] array lowers to a log-depth associative
scan — ~20 full HBM passes at the canonical [602k, 64] cotangent shape
(~14 ms measured, tools/ablate_bwd).  The sequential TPU grid makes a
single-pass formulation natural: each block computes its inclusive cumsum
with one lower-triangular MXU matmul and adds a running carry kept in VMEM
scratch across grid steps — one HBM read + one write total.

STATUS: bench-validated DEAD END on the canonical workload — wiring this
into the gather backward (models/neural_points.py) dropped bench.py from
21144 to 16532 rays/s: the 1176-step sequential-carry grid defeats Mosaic's
automatic DMA pipelining, and per-step overhead swamps the saved HBM
passes.  Kept (with interpreter-mode tests) as reference infrastructure;
not used in the shipped path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_M = 512


def _cumsum_kernel(x_ref, o_ref, carry_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    x = x_ref[:]                                        # [BM, F]
    bm = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (bm, bm), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (bm, bm), 1)
    tri = (col <= row).astype(x.dtype)                  # lower-tri ones
    cs = jax.lax.dot(tri, x, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    out = cs + carry_ref[0:1, :]
    o_ref[:] = out
    carry_ref[0:1, :] = out[bm - 1: bm, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def cumsum_rows(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Inclusive cumsum of x [M, F] along axis 0 (f32), one HBM pass."""
    M, F = x.shape
    M_pad = -(-M // BLOCK_M) * BLOCK_M
    if M_pad != M:
        x = jnp.concatenate(
            [x, jnp.zeros((M_pad - M, F), x.dtype)], axis=0)

    out = pl.pallas_call(
        _cumsum_kernel,
        grid=(M_pad // BLOCK_M,),
        in_specs=[pl.BlockSpec((BLOCK_M, F), lambda s: (s, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK_M, F), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_pad, F), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, F), jnp.float32)],
        interpret=interpret,
    )(x.astype(jnp.float32))
    return out[:M]


def cumsum_rows_auto(x: jnp.ndarray) -> jnp.ndarray:
    """Pallas on TPU, jnp.cumsum elsewhere."""
    if jax.default_backend() == "tpu":
        return cumsum_rows(x)
    return jnp.cumsum(x, axis=0)
