"""A/B the fused Pallas shading chain: off vs f32 vs bf16, tile sizes.

Chained uncached train steps (the only trustworthy timing mode on axon —
see CLAUDE.md).  Final adoption decisions go through bench.py.
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

from hybridneuralrendering_tpu.data.synthetic import (make_synthetic_batch,
                                                      make_synthetic_scene)
from hybridneuralrendering_tpu.models import blur as blur_mod
from hybridneuralrendering_tpu.models import renderer
from hybridneuralrendering_tpu.ops import pallas_shading as PS
from hybridneuralrendering_tpu.train import state as state_mod
from hybridneuralrendering_tpu.train import step as step_mod
import bench

base = bench.bench_config()
points, grid = make_synthetic_scene(base, num_points=bench.NUM_POINTS)
jax.block_until_ready(grid.coor2occ)
batch = make_synthetic_batch(base)
kernels = jnp.asarray(blur_mod.generate_kernel_bank(base.blur))
key = jax.random.PRNGKey(0)


def run(tag, cfg, tile=None, iters=10):
    if tile is not None:
        PS.TILE = tile
        # same cfg hash -> jit would reuse the t256 executable; force retrace
        step_mod.train_step.clear_cache()
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    pts = jax.tree_util.tree_map(lambda x: x.copy(), points)
    ts = state_mod.create_train_state(params, pts, cfg)
    t0 = time.perf_counter()
    ts, items = step_mod.train_step(ts, grid, batch, key, kernels, cfg)
    jax.block_until_ready(items["loss_total"])
    t_compile = time.perf_counter() - t0
    for i in range(3):
        ts, items = step_mod.train_step(ts, grid, batch,
                                        jax.random.fold_in(key, i), kernels,
                                        cfg)
    jax.block_until_ready(items["loss_total"])
    t0 = time.perf_counter()
    for i in range(iters):
        ts, items = step_mod.train_step(ts, grid, batch,
                                        jax.random.fold_in(key, 10 + i),
                                        kernels, cfg)
    jax.block_until_ready(items["loss_total"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "tag": tag, "step_ms": round(dt * 1e3, 1),
        "rays_per_s": round(base.sampling.rays_per_batch / dt, 1),
        "compile_s": round(t_compile, 1),
        "loss": round(float(items["loss_total"]), 5)}), flush=True)
    PS.TILE = 256


A = lambda **kw: base.replace(agg=dataclasses.replace(base.agg, **kw))

run("fused_off_f32", A(fused_chain="off"))
run("fused_f32_t256", A())
run("fused_bf16_t256", A(compute_dtype="bfloat16"))
run("fused_f32_t512", A(), tile=512)
run("fused_bf16_t512", A(compute_dtype="bfloat16"), tile=512)
run("off_bf16", A(fused_chain="off", compute_dtype="bfloat16"))
