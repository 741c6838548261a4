"""Second ablation: isolate query vs MLP stack (grid passed as args!)."""
import time, json, dataclasses
import jax, jax.numpy as jnp
import numpy as np
from hybridneuralrendering_tpu import config as C
from hybridneuralrendering_tpu.data.synthetic import make_synthetic_batch, make_synthetic_scene
from hybridneuralrendering_tpu.models import renderer
from hybridneuralrendering_tpu.train import state as state_mod
from hybridneuralrendering_tpu.train import step as step_mod
from hybridneuralrendering_tpu.ops import query as Q
import bench

base = bench.bench_config().replace(blur=C.BlurConfig(add_blur_sim=False))
points, grid = make_synthetic_scene(base, num_points=bench.NUM_POINTS)
batch = make_synthetic_batch(base)
key = jax.random.PRNGKey(0)

def run_step(tag, cfg, iters=8):
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    ts = state_mod.create_train_state(params, points, cfg)
    ts, items = step_mod.train_step(ts, grid, batch, key, None, cfg)
    jax.block_until_ready(items["loss_total"])
    t0 = time.perf_counter()
    for i in range(iters):
        ts, items = step_mod.train_step(ts, grid, batch, jax.random.fold_in(key,i), None, cfg)
    jax.block_until_ready(items["loss_total"])
    print(json.dumps({"tag": tag, "step_ms": round((time.perf_counter()-t0)/iters*1e3,1)}), flush=True)

qf = jax.jit(lambda g, x, cp, rd, k: Q.query_points(g, x, cp, rd,
    base.querier, base.render.near_plane, base.render.far_plane, key=k, train=True))
out = qf(grid, points.xyz, batch["campos"], batch["raydir"], key)
jax.block_until_ready(out.sample_pidx)
t0=time.perf_counter()
for i in range(10):
    out = qf(grid, points.xyz, batch["campos"], batch["raydir"], jax.random.fold_in(key,i))
jax.block_until_ready(out.sample_pidx)
print(json.dumps({"tag":"query_only_fwd", "step_ms": round((time.perf_counter()-t0)/10*1e3,1)}), flush=True)

run_step("new_knn_full_noblur", base)
small = base.replace(agg=dataclasses.replace(base.agg, shading_feature_num=128))
run_step("shading_128", small)
