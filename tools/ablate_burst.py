"""A/B the UNCACHED (CNN-burst) train step: f32 vs bf16 pyramid chain.

The burst step is the biggest un-attacked perf block (VERDICT r3 weak #1:
19.5k vs 25.0k rays/s cached).  The CNN's 3/6/12/24-channel maps lane-pad
to 128 on TPU, so its cost is layout traffic, not FLOPs — pyramid_dtype
'bfloat16' halves those bytes (models/feature_pyramid.apply_stages
chain_dtype).  Chained full steps per the axon timing rule; two interleaved
passes bracket drift.

PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_burst.py
"""
import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
cache_dir = os.path.join(_repo, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)

from hybridneuralrendering_tpu.data.synthetic import (make_synthetic_batch,
                                                      make_synthetic_scene)
from hybridneuralrendering_tpu.models import blur as blur_mod
from hybridneuralrendering_tpu.models import renderer
from hybridneuralrendering_tpu.train import state as state_mod
from hybridneuralrendering_tpu.train import step as step_mod
import bench

key = jax.random.PRNGKey(0)


def run(tag, pdt, iters=12):
    cfg = bench.bench_config()
    cfg = cfg.replace(agg=dataclasses.replace(cfg.agg, pyramid_dtype=pdt))
    points, grid = make_synthetic_scene(cfg, num_points=bench.NUM_POINTS)
    batch = make_synthetic_batch(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    ts = state_mod.create_train_state(params, points, cfg)
    kernels = jnp.asarray(blur_mod.generate_kernel_bank(cfg.blur))
    for i in range(4):
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
        "tag": tag, "uncached_step_ms": round(dt * 1e3, 1),
        "rays_per_s": round(cfg.sampling.rays_per_batch / dt, 1)}),
        flush=True)


if __name__ == "__main__":
    for rep in range(2):
        run(f"pyramid_f32 pass{rep}", "float32")
        run(f"pyramid_bf16 pass{rep}", "bfloat16")
