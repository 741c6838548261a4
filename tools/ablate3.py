"""Post-optimization measurement: query fwd + full step."""
import time, json
import jax, jax.numpy as jnp
import numpy as np
from hybridneuralrendering_tpu import config as C
from hybridneuralrendering_tpu.data.synthetic import make_synthetic_batch, make_synthetic_scene
from hybridneuralrendering_tpu.models import blur as blur_mod
from hybridneuralrendering_tpu.models import renderer
from hybridneuralrendering_tpu.train import state as state_mod
from hybridneuralrendering_tpu.train import step as step_mod
from hybridneuralrendering_tpu.ops import query as Q
import bench

base = bench.bench_config()
points, grid = make_synthetic_scene(base, num_points=bench.NUM_POINTS)
batch = make_synthetic_batch(base)
key = jax.random.PRNGKey(0)

qf = jax.jit(lambda g, x, cp, rd, k: Q.query_points(g, x, cp, rd,
    base.querier, base.render.near_plane, base.render.far_plane, key=k, train=True))
out = qf(grid, points.xyz, batch["campos"], batch["raydir"], key)
jax.block_until_ready(out.sample_pidx)
t0=time.perf_counter()
for i in range(10):
    out = qf(grid, points.xyz, batch["campos"], batch["raydir"], jax.random.fold_in(key,i))
jax.block_until_ready(out.sample_pidx)
print(json.dumps({"tag":"query_only_fwd_v2", "step_ms": round((time.perf_counter()-t0)/10*1e3,1)}), flush=True)

kernels = jnp.asarray(blur_mod.generate_kernel_bank(base.blur))
params = renderer.init_params(jax.random.PRNGKey(0), base)
pts_copy = jax.tree_util.tree_map(lambda x: x.copy(), points)
ts = state_mod.create_train_state(params, pts_copy, base)
ts, items = step_mod.train_step(ts, grid, batch, key, kernels, base)
jax.block_until_ready(items["loss_total"])
t0 = time.perf_counter()
for i in range(10):
    ts, items = step_mod.train_step(ts, grid, batch, jax.random.fold_in(key,i), kernels, base)
jax.block_until_ready(items["loss_total"])
dt = (time.perf_counter()-t0)/10
print(json.dumps({"tag":"full_step_v2", "step_ms": round(dt*1e3,1),
                  "rays_per_s": round(base.sampling.rays_per_batch/dt,1)}), flush=True)
