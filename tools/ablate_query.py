"""Chained decomposition of query_core (26 ms) + post-fix gather numbers."""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)

from hybridneuralrendering_tpu.core import rays as ray_gen
from hybridneuralrendering_tpu.data.synthetic import (make_synthetic_batch,
                                                      make_synthetic_scene)
from hybridneuralrendering_tpu.ops import query as Q
from hybridneuralrendering_tpu.ops.voxel_grid import linearize, voxel_coords
import bench

cfg = bench.bench_config()
qcfg = cfg.querier
points, grid = make_synthetic_scene(cfg, num_points=bench.NUM_POINTS)
jax.block_until_ready(grid.coor2occ)
batch = make_synthetic_batch(cfg)
key0 = jax.random.PRNGKey(0)
near, far = cfg.render.near_plane, cfg.render.far_plane


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


R = batch["raydir"].shape[0]
D = qcfg.z_depth_dim


@jax.jit
def raygen_only(raydir, campos, grid):
    raypos, _, _ = ray_gen.near_far_linear(campos, raydir, D, near, far,
                                           qcfg.sample_jitter, key0)
    return raydir + raypos[0, 0] * 1e-30, jnp.sum(raypos[0, 0])


@jax.jit
def raygen_cull(raydir, campos, grid):
    raypos, _, _ = ray_gen.near_far_linear(campos, raydir, D, near, far,
                                           qcfg.sample_jitter, key0)
    cand_vid = linearize(voxel_coords(raypos, grid.geom), grid.geom,
                         qcfg.grid_capacity)
    occ_hit = grid.occ_dilated.at[cand_vid].get(mode="fill", fill_value=0) > 0
    return raydir + occ_hit[0, 0] * 1e-30, jnp.sum(occ_hit)


@jax.jit
def raygen_cull_compact(raydir, campos, grid):
    raypos, _, _ = ray_gen.near_far_linear(campos, raydir, D, near, far,
                                           qcfg.sample_jitter, key0)
    cand_vid = linearize(voxel_coords(raypos, grid.geom), grid.geom,
                         qcfg.grid_capacity)
    occ_hit = grid.occ_dilated.at[cand_vid].get(mode="fill", fill_value=0) > 0
    cum = jnp.cumsum(occ_hit.astype(jnp.int32), axis=-1)
    targets = jnp.arange(1, qcfg.SR + 1, dtype=jnp.int32)
    idx = jax.vmap(lambda c: jnp.searchsorted(c, targets, side="left"))(cum)
    idx_c = jnp.clip(idx, 0, D - 1)
    sample_loc_w = jnp.take_along_axis(raypos, idx_c[..., None], axis=1)
    return raydir + sample_loc_w[0, 0] * 1e-30, jnp.sum(sample_loc_w[0, 0])


@jax.jit
def knn_only(loc, grid):
    mask = jnp.ones(loc.shape[:2], bool)
    bd, bi = Q._knn_supervoxel(grid, loc, mask, qcfg)
    return loc + bd[0, 0, 0] * 1e-30, jnp.sum(bd[0, 0])


@jax.jit
def full_query(raydir, campos, grid):
    qres = Q.query_points(grid, jnp.zeros((1, 3)), campos, raydir, qcfg,
                          near, far, key=key0, train=True)
    return (raydir + qres.sample_loc_w[0, 0] * 1e-30,
            jnp.sum(qres.sample_loc_w[0, 0]))


timeit("raygen_only",
       lambda x: raygen_only(x, batch["campos"], grid), batch["raydir"])
timeit("raygen_cull",
       lambda x: raygen_cull(x, batch["campos"], grid), batch["raydir"])
timeit("raygen_cull_compact",
       lambda x: raygen_cull_compact(x, batch["campos"], grid),
       batch["raydir"])

qres = jax.jit(lambda g, x, b: Q.query_points(
    g, x, b["campos"], b["raydir"], qcfg, near, far, key=key0, train=True))(
    grid, points.xyz, batch)
loc0 = qres.sample_loc_w
jax.block_until_ready(loc0)
timeit("knn_supervoxel", lambda x: knn_only(x, grid), loc0)

# post-fix gather rows
N, C = bench.NUM_POINTS, 64
M = R * qcfg.SR * qcfg.K
idx = jnp.clip(qres.sample_pidx, 0).reshape(-1)
table64 = jax.random.normal(key0, (N, C), jnp.float32)
table_bf = table64.astype(jnp.bfloat16)


def mk_row(t0, idx):
    @jax.jit
    def f(t):
        out = t[idx]
        return t + out[:1] * 1e-30, jnp.sum(out[-1].astype(jnp.float32))
    return f


timeit("row64_f32", mk_row(table64, idx), table64)
timeit("row64_bf16", mk_row(table_bf, idx), table_bf)


@jax.jit
def whole_bwd64(x):
    from hybridneuralrendering_tpu.models.neural_points import _gather_rows_bwd
    grad, _ = _gather_rows_bwd((qres.sample_pidx.reshape(-1), N), x)
    return x + grad[-1:] * 1e-30, jnp.sum(grad[-1])


g64 = jax.random.normal(key0, (M, C), jnp.float32)
timeit("gather_bwd_64lane", whole_bwd64, g64)
