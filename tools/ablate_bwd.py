"""Chained isolation of backward-pass components.

grad_of_gather: query + attribute gather + grad wrt point attributes — the
delta over the fwd-only query_gather row (ablate_stages.py) is the cost of
the stacked-gather backward (cumsum-differencing custom VJP).
cumsum / sortperm rows: chained primitive timings for the pipe's pieces.
"""
import json
import os
import time

import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)

from functools import partial

from hybridneuralrendering_tpu.data.synthetic import (make_synthetic_batch,
                                                      make_synthetic_scene)
from hybridneuralrendering_tpu.models import renderer
from hybridneuralrendering_tpu.models import neural_points as npts
from hybridneuralrendering_tpu.ops import query as Q
from hybridneuralrendering_tpu.train import state as state_mod
from hybridneuralrendering_tpu.train import step as step_mod
import bench

cfg = bench.bench_config()
points, grid = make_synthetic_scene(cfg, num_points=bench.NUM_POINTS)
jax.block_until_ready(grid.coor2occ)
batch = make_synthetic_batch(cfg)
key0 = jax.random.PRNGKey(0)
R = cfg.sampling.rays_per_batch


def chain_key(key, scalar):
    return jax.random.fold_in(key, (scalar * 1e-30).astype(jnp.int32))


def timeit(tag, fn, state, iters=10):
    state, out = fn(state, key0)
    jax.block_until_ready(out)
    key = chain_key(key0, out)
    for _ in range(3):
        state, out = fn(state, key)
        key = chain_key(key, out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = fn(state, key)
        key = chain_key(key, out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 2)}), flush=True)


def fresh_ts():
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    pts = jax.tree_util.tree_map(lambda x: x.copy(), points)
    return state_mod.create_train_state(params, pts, cfg)


@partial(jax.jit, static_argnames=("c",), donate_argnames=("ts",))
def grad_of_gather(ts, key, grid, batch, c=cfg):
    """d/d(point attrs) of a sum over the gathered neighborhood — fwd query
    plus ONLY the stacked-gather backward."""
    pts_tree = state_mod.point_param_tree(ts.points, c)

    def f(pt):
        pts = state_mod.merge_point_params(ts.points, pt)
        qres = Q.query_points(grid, pts.xyz, batch["campos"],
                              batch["raydir"], c.querier, c.render.near_plane,
                              c.render.far_plane, key=key, train=True)
        sampled = npts.gather(pts, qres.sample_pidx)
        s = (jnp.sum(sampled.embedding) + jnp.sum(sampled.color)
             + jnp.sum(sampled.dirs) + jnp.sum(sampled.conf)
             + jnp.sum(sampled.xyz))
        return s

    val, g = jax.value_and_grad(f)(pts_tree)
    return ts, val + jnp.sum(g["embedding"][0])


ts = fresh_ts()
timeit("grad_of_gather", lambda s, k: grad_of_gather(s, k, grid, batch), ts)


# chained primitive rows (indicative only — see CLAUDE.md caveat)
N, C = R * cfg.querier.SR * cfg.querier.K, 47
x0 = jax.random.normal(key0, (N, C), jnp.float32)
perm0 = jax.random.permutation(key0, N)


@jax.jit
def chained_cumsum(x):
    y = jnp.cumsum(x, axis=0)
    return x + y[-1:] * 1e-30, jnp.sum(y[-1])


@jax.jit
def chained_sortgather(x, perm):
    y = jnp.take(x, perm, axis=0)
    return x + y[-1:] * 1e-30, jnp.sum(y[-1])


@jax.jit
def chained_argsort(x, keys):
    order = jnp.argsort(keys)
    y = jnp.take(x, order, axis=0)
    return x + y[-1:] * 1e-30, jnp.sum(y[-1])


def time_prim(tag, fn, *args, iters=10):
    x = fn(*args)
    jax.block_until_ready(x[1])
    cur = (x[0],) + args[1:]
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(*cur)
        cur = (x[0],) + args[1:]
    jax.block_until_ready(x[1])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 2)}), flush=True)


time_prim("cumsum_602k_47", chained_cumsum, x0)
time_prim("permgather_602k_47", chained_sortgather, x0, perm0)
time_prim("argsort_602k", chained_argsort, x0,
          jax.random.randint(key0, (N,), 0, bench.NUM_POINTS))
