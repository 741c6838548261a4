"""Ablation benchmark: step time under feature toggles to locate the bottleneck."""
import time, json, dataclasses
import jax, jax.numpy as jnp
import numpy as np

from hybridneuralrendering_tpu import config as C
from hybridneuralrendering_tpu.data.synthetic import make_synthetic_batch, make_synthetic_scene
from hybridneuralrendering_tpu.models import blur as blur_mod
from hybridneuralrendering_tpu.models import renderer
from hybridneuralrendering_tpu.train import state as state_mod
from hybridneuralrendering_tpu.train import step as step_mod
import bench

def run(tag, cfg, iters=8):
    t0 = time.perf_counter()
    points, grid = make_synthetic_scene(cfg, num_points=bench.NUM_POINTS)
    jax.block_until_ready(grid.coor2occ)
    t_grid = time.perf_counter() - t0
    batch = make_synthetic_batch(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    ts = state_mod.create_train_state(params, points, cfg)
    kernels = jnp.asarray(blur_mod.generate_kernel_bank(cfg.blur))
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    ts, items = step_mod.train_step(ts, grid, batch, key, kernels, cfg)
    jax.block_until_ready(items["loss_total"])
    t_compile = time.perf_counter() - t0
    for i in range(2):
        ts, items = step_mod.train_step(ts, grid, batch, jax.random.fold_in(key, i), kernels, cfg)
    jax.block_until_ready(items["loss_total"])
    t0 = time.perf_counter()
    for i in range(iters):
        ts, items = step_mod.train_step(ts, grid, batch, jax.random.fold_in(key, 10+i), kernels, cfg)
    jax.block_until_ready(items["loss_total"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"tag": tag, "step_ms": round(dt*1e3,1),
                      "rays_per_s": round(cfg.sampling.rays_per_batch/dt,1),
                      "grid_build_s": round(t_grid,1),
                      "compile_s": round(t_compile,1)}), flush=True)

base = bench.bench_config()
run("full", base)

no_blur = base.replace(blur=C.BlurConfig(add_blur_sim=False))
run("no_blur", no_blur)

agg_nohyb = dataclasses.replace(base.agg, use_nearest=0, drop_ratio=0.0)
no_hybrid = no_blur.replace(agg=agg_nohyb)
run("no_hybrid_no_blur", no_hybrid)

q_small = dataclasses.replace(base.querier, z_depth_dim=100)
run("short_candidates", base.replace(querier=q_small))
