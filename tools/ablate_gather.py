"""Which gather formulation is fast on this TPU?  All chained.

Candidates for the two 42 ms row gathers in the stacked-gather backward:
  row2d:    table[idx] on a [N, 64] table (current formulation)
  window1d: lax.gather 64-wide windows from the flattened [N*64] table
            (the trick that made coor2occ fast in round 1)
  scatset:  zeros.at[unique_sorted].set(rows) — scatter alternative to the
            monotone final gather
Index orders: ray (forward order), perm (random), mono (sorted).
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
idx_ray = jnp.clip(qres.sample_pidx, 0).reshape(-1).astype(jnp.int32)
jax.block_until_ready(idx_ray)
M = int(idx_ray.shape[0])
N = bench.NUM_POINTS
C = 64

idx_perm = jnp.take(idx_ray, jax.random.permutation(key0, M))
idx_mono = jnp.sort(idx_ray)
table = jax.random.normal(key0, (N, C), jnp.float32)
tflat = table.reshape(-1)
rows_u = jax.random.normal(key0, (N, C), jnp.float32)
uniq = jnp.arange(N, dtype=jnp.int32)   # unique sorted targets (worst=all)


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


def mk_row2d(idx):
    @jax.jit
    def f(t):
        out = t[idx]
        return t + out[:1] * 1e-30, jnp.sum(out[-1])
    return f


def mk_window1d(idx):
    @jax.jit
    def f(tf):
        out = Q._window_gather_1d(tf, idx * C, C, 0.0)       # [M, C]
        return tf + jnp.sum(out[-1]) * 1e-30, jnp.sum(out[-1])
    return f


@jax.jit
def scatset(x):
    z = jnp.zeros((M, C), jnp.float32)
    out = z.at[uniq].set(x)
    return x + out[:1] * 1e-30, jnp.sum(out[-1])


timeit("row2d_ray", mk_row2d(idx_ray), table)
timeit("row2d_perm", mk_row2d(idx_perm), table)
timeit("row2d_mono", mk_row2d(idx_mono), table)
timeit("window1d_ray", mk_window1d(idx_ray), tflat)
timeit("window1d_perm", mk_window1d(idx_perm), tflat)
timeit("window1d_mono", mk_window1d(idx_mono), tflat)
timeit("scatset_unique_rows", scatset, rows_u)
