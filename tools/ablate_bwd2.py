"""Piecewise chained timing of _gather_rows_bwd (the 100 ms step component).

Uses REAL query indices (coherence matters for gather speed) and chains
every measured op through a data dependency.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)

from hybridneuralrendering_tpu.data.synthetic import (make_synthetic_batch,
                                                      make_synthetic_scene)
from hybridneuralrendering_tpu.ops import query as Q
import bench

cfg = bench.bench_config()
points, grid = make_synthetic_scene(cfg, num_points=bench.NUM_POINTS)
jax.block_until_ready(grid.coor2occ)
batch = make_synthetic_batch(cfg)
key0 = jax.random.PRNGKey(0)

qres = jax.jit(lambda g, x, b: Q.query_points(
    g, x, b["campos"], b["raydir"], cfg.querier,
    cfg.render.near_plane, cfg.render.far_plane, key=key0, train=True))(
    grid, points.xyz, batch)
flat_i = jnp.clip(qres.sample_pidx, 0).reshape(-1).astype(jnp.int32)
jax.block_until_ready(flat_i)
M = int(flat_i.shape[0])
N = bench.NUM_POINTS
C = 47
g0 = jax.random.normal(key0, (M, C), jnp.float32)

order = jnp.argsort(flat_i)
si = flat_i[order]
pos = jnp.arange(M, dtype=jnp.int32)
head = jnp.concatenate([jnp.ones(1, bool), si[1:] != si[:-1]])
last = jnp.concatenate([si[1:] != si[:-1], jnp.ones(1, bool)])
seg_start = jax.lax.cummax(jnp.where(head, pos, -1))
pos_of = jnp.full((N,), M, jnp.int32).at[
    jnp.where(last, si, N)].set(pos, mode="drop")
jax.block_until_ready(pos_of)


def timeit(tag, fn, x, iters=10):
    y = fn(x)
    jax.block_until_ready(y[1])
    x = y[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(x)
        x = y[0]
    jax.block_until_ready(y[1])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 2)}), flush=True)


@jax.jit
def t_argsort(x):
    o = jnp.argsort(flat_i + (x[0, 0] * 1e-30).astype(jnp.int32))
    return x + o[-1].astype(jnp.float32) * 1e-30, o[-1]


@jax.jit
def t_apply_perm(x):
    sg = jnp.take(x, order, axis=0)
    return x + sg[-1:] * 1e-30, jnp.sum(sg[-1])


@jax.jit
def t_boundary(x):
    cs = jnp.cumsum(x, axis=0)
    base = jnp.where((seg_start > 0)[:, None],
                     cs[jnp.maximum(seg_start - 1, 0)], 0.0)
    val = cs - base
    return x + val[-1:] * 1e-30, jnp.sum(val[-1])


@jax.jit
def t_posof_scatter(x):
    p = jnp.full((N,), M, jnp.int32).at[
        jnp.where(last, si + (x[0, 0] * 1e-30).astype(jnp.int32), N)
    ].set(pos, mode="drop")
    return x + p[-1].astype(jnp.float32) * 1e-30, p[-1]


@jax.jit
def t_final_gather(x):
    found = pos_of < M
    grad = jnp.where(found[:, None],
                     jnp.take(x, jnp.minimum(pos_of, M - 1), axis=0), 0.0)
    return x[:M] + grad[-1:] * 1e-30, jnp.sum(grad[-1])


@jax.jit
def t_whole_bwd(x):
    from hybridneuralrendering_tpu.models.neural_points import _gather_rows_bwd
    grad, _ = _gather_rows_bwd((qres.sample_pidx.reshape(-1), N), x)
    return x + grad[-1:] * 1e-30, jnp.sum(grad[-1])


timeit("argsort_real", t_argsort, g0)
timeit("apply_perm_real", t_apply_perm, g0)
timeit("cumsum+boundary", t_boundary, g0)
timeit("posof_scatter", t_posof_scatter, g0)
timeit("final_gather_monotone", t_final_gather, g0)
timeit("whole_gather_bwd", t_whole_bwd, g0)
