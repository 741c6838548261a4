"""Locate the step's real bottleneck with CHAINED stage ablations.

Every measurement is a jitted full-step variant with one stage removed,
iterated with each step's output feeding the next step's input — the only
timing mode the axon tunnel reports faithfully (CLAUDE.md).  Deltas against
the full step attribute device time to stages.
"""
import dataclasses
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
from hybridneuralrendering_tpu.models import blur as blur_mod
from hybridneuralrendering_tpu.models import renderer
from hybridneuralrendering_tpu.ops import query as Q
from hybridneuralrendering_tpu.train import state as state_mod
from hybridneuralrendering_tpu.train import step as step_mod
import bench

cfg = bench.bench_config()
points, grid = make_synthetic_scene(cfg, num_points=bench.NUM_POINTS)
jax.block_until_ready(grid.coor2occ)
batch = make_synthetic_batch(cfg)
kernels = jnp.asarray(blur_mod.generate_kernel_bank(cfg.blur))
key0 = jax.random.PRNGKey(0)
R = cfg.sampling.rays_per_batch


def chain_key(key, scalar):
    """Fold a runtime scalar into the next key: forces sequential execution
    without changing the key (the int32 cast of ~1e-30*loss is 0)."""
    return jax.random.fold_in(key, (scalar * 1e-30).astype(jnp.int32))


def timeit(tag, fn, state, iters=10):
    state, out = fn(state, key0)
    jax.block_until_ready(out)
    key = chain_key(key0, out)
    t0 = time.perf_counter()
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
    print(json.dumps({"tag": tag, "step_ms": round(dt * 1e3, 2),
                      "rays_per_s": round(R / dt, 1)}), flush=True)


def fresh_ts():
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    pts = jax.tree_util.tree_map(lambda x: x.copy(), points)
    return state_mod.create_train_state(params, pts, cfg)


# ---- variants ----

def full_step(ts, key, c=cfg):
    ts, items = step_mod.train_step(ts, grid, batch, key, kernels, c)
    return ts, items["loss_total"]


@partial(jax.jit, static_argnames=("c", "which"), donate_argnames=("ts",))
def partial_grad_step(ts, key, grid, batch, kernels, c=cfg, which="net"):
    """Gradient wrt only one param group; the other is frozen."""
    pts_tree = state_mod.point_param_tree(ts.points, c)
    argnum = 0 if which == "net" else 1
    (total, items), g = jax.value_and_grad(
        step_mod.loss_fn, argnums=argnum, has_aux=True)(
        ts.params, pts_tree, ts.points, grid, batch, c, key, kernels)
    zn = jax.tree_util.tree_map(jnp.zeros_like, ts.params)
    zp = jax.tree_util.tree_map(jnp.zeros_like, pts_tree)
    g_net, g_pts = (g, zp) if which == "net" else (zn, g)
    ts = step_mod._apply_updates(ts, pts_tree, g_net, g_pts, items, c)
    return ts, total


@partial(jax.jit, static_argnames=("c",), donate_argnames=("ts",))
def fwd_only_step(ts, key, grid, batch, kernels, c=cfg):
    pts_tree = state_mod.point_param_tree(ts.points, c)
    total, items = step_mod.loss_fn(ts.params, pts_tree, ts.points, grid,
                                    batch, c, key, kernels)
    return ts, total


@partial(jax.jit, static_argnames=("c",), donate_argnames=("ts",))
def query_only_step(ts, key, grid, batch, c=cfg):
    """Query + attribute gather, nothing else."""
    from hybridneuralrendering_tpu.models import neural_points as npts
    qres = Q.query_points(grid, ts.points.xyz, batch["campos"],
                          batch["raydir"], c.querier, c.render.near_plane,
                          c.render.far_plane, key=key, train=True)
    sampled = npts.gather(ts.points, qres.sample_pidx)
    return ts, jnp.sum(sampled.embedding[0, 0]) + jnp.sum(
        qres.sample_loc_w[0, 0])


@partial(jax.jit, static_argnames=("c",), donate_argnames=("ts",))
def query_core_step(ts, key, grid, batch, c=cfg):
    """Query alone (no attribute gather)."""
    qres = Q.query_points(grid, ts.points.xyz, batch["campos"],
                          batch["raydir"], c.querier, c.render.near_plane,
                          c.render.far_plane, key=key, train=True)
    return ts, jnp.sum(qres.sample_loc_w[0, 0]) + jnp.sum(
        qres.sample_pidx[0, 0].astype(jnp.float32))


ts = fresh_ts()
timeit("full", full_step, ts)
ts = fresh_ts()
timeit("grad_net_only",
       lambda s, k: partial_grad_step(s, k, grid, batch, kernels,
                                      which="net"), ts)
ts = fresh_ts()
timeit("grad_pts_only",
       lambda s, k: partial_grad_step(s, k, grid, batch, kernels,
                                      which="pts"), ts)
ts = fresh_ts()
timeit("fwd_only", lambda s, k: fwd_only_step(s, k, grid, batch, kernels), ts)
ts = fresh_ts()
timeit("query_gather", lambda s, k: query_only_step(s, k, grid, batch), ts)
ts = fresh_ts()
timeit("query_core", lambda s, k: query_core_step(s, k, grid, batch), ts)

# stage toggles (full step, feature off)
for tag, c2 in (
    ("no_blur", cfg.replace(blur=dataclasses.replace(
        cfg.blur, add_blur_sim=False))),
    ("no_hybrid", cfg.replace(agg=dataclasses.replace(
        cfg.agg, use_nearest=0, drop_ratio=0.0))),
):
    ts = fresh_ts()
    timeit(tag, lambda s, k, cc=c2: full_step(s, k, c=cc), ts)
