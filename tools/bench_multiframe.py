"""Throughput scaling with frames per step."""
import time, json
import jax, jax.numpy as jnp
from hybridneuralrendering_tpu.data.synthetic import make_synthetic_batch, make_synthetic_scene
from hybridneuralrendering_tpu.models import blur as blur_mod, renderer
from hybridneuralrendering_tpu.train import state as state_mod, step as step_mod
import bench

cfg = bench.bench_config()
points, grid = make_synthetic_scene(cfg, num_points=bench.NUM_POINTS)
kernels = jnp.asarray(blur_mod.generate_kernel_bank(cfg.blur))
key = jax.random.PRNGKey(0)
R = cfg.sampling.rays_per_batch

for F in (2, 4):
    batches = step_mod.stack_batches(
        [make_synthetic_batch(cfg, seed=s) for s in range(F)])
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    pts = jax.tree_util.tree_map(lambda x: x.copy(), points)
    ts = state_mod.create_train_state(params, pts, cfg)
    ts, items = step_mod.train_step_multi(ts, grid, batches, key, kernels, cfg)
    jax.block_until_ready(items["loss_total"])
    t0 = time.perf_counter()
    for i in range(8):
        ts, items = step_mod.train_step_multi(
            ts, grid, batches, jax.random.fold_in(key, i), kernels, cfg)
    jax.block_until_ready(items["loss_total"])
    dt = (time.perf_counter() - t0) / 8
    print(json.dumps({"frames": F, "step_ms": round(dt*1e3,1),
                      "rays_per_s": round(F*R/dt,1)}), flush=True)
