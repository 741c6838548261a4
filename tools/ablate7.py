"""KNN sub-stage + backward-scatter costs."""
import time, json, dataclasses
import jax, jax.numpy as jnp
import numpy as np
from hybridneuralrendering_tpu.data.synthetic import make_synthetic_batch, make_synthetic_scene
from hybridneuralrendering_tpu.models import blur as blur_mod, renderer
from hybridneuralrendering_tpu.train import state as state_mod, step as step_mod
from hybridneuralrendering_tpu.ops import query as Q
from hybridneuralrendering_tpu.ops.voxel_grid import linearize, linearize_padz, voxel_coords, XYZ_SENTINEL
import bench

base = bench.bench_config()
cfgq = base.querier
points, grid = make_synthetic_scene(base, num_points=bench.NUM_POINTS)
batch = make_synthetic_batch(base)
key = jax.random.PRNGKey(0)

def timed(tag, f, args, iters=10):
    out = f(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(iters): out = f(*args)
    jax.block_until_ready(out)
    print(json.dumps({"tag": tag, "ms": round((time.perf_counter()-t0)/iters*1e3,1)}), flush=True)

R = batch["raydir"].shape[0]; SR = cfgq.SR; S = R*SR
rng = np.random.default_rng(0)
# plausible sample locations: random points near the cloud
loc = jnp.asarray(rng.uniform(-1, 1, (R, SR, 3)).astype(np.float32))
smask = jnp.ones((R, SR), bool)

# (a) occ window gathers only
def occ_only(g, l):
    svox = voxel_coords(l.reshape(S,3), g.geom)
    acc = 0
    for dx in (-1,0,1):
        for dy in (-1,0,1):
            st = linearize_padz(svox + jnp.asarray([dx,dy,-1], jnp.int32), g.geom, cfgq.grid_capacity)
            acc = acc + jnp.sum(Q._window_gather_1d(g.coor2occ, st, 3, -1))
    return acc
timed("a_occ_windows", jax.jit(occ_only), (grid, loc))

# (b) full knn
timed("b_knn_full", jax.jit(lambda g,l,m: Q.knn_over_grid(g,l,m,cfgq)), (grid, loc, smask))

# (c) min-select alone on random candidates
cd = jnp.asarray(rng.uniform(0,1,(S, 702)).astype(np.float32))
ci = jnp.asarray(rng.integers(0, 600000, (S, 702)).astype(np.int32))
def minsel(cand_d, cand_i):
    BIG = jnp.float32(1e30)
    def body(carry, _):
        c, ad, ai, k = carry
        am = jnp.argmin(c, axis=-1)
        md = jnp.take_along_axis(c, am[:,None], axis=-1)[:,0]
        mi = jnp.take_along_axis(cand_i, am[:,None], axis=-1)[:,0]
        ad = ad.at[:,k].set(md); ai = ai.at[:,k].set(mi)
        c = jnp.where(jax.nn.one_hot(am, c.shape[-1], dtype=bool), BIG, c)
        return (c, ad, ai, k+1), None
    (_, ad, ai, _), _ = jax.lax.scan(body, (cand_d, jnp.full((S,8),BIG), jnp.full((S,8),-1,jnp.int32), 0), None, length=8)
    return ad, ai
timed("c_minselect", jax.jit(minsel), (cd, ci))

# (d) train step with point grads off (isolates backward scatter-add)
nograd = base.replace(points=dataclasses.replace(base.points,
    feat_grad=False, conf_grad=False, color_grad=False, dir_grad=False))
kernels = jnp.asarray(blur_mod.generate_kernel_bank(base.blur))
params = renderer.init_params(jax.random.PRNGKey(0), nograd)
pts_copy = jax.tree_util.tree_map(lambda x: x.copy(), points)
ts = state_mod.create_train_state(params, pts_copy, nograd)
ts, items = step_mod.train_step(ts, grid, batch, key, kernels, nograd)
jax.block_until_ready(items["loss_total"])
t0=time.perf_counter()
for i in range(8):
    ts, items = step_mod.train_step(ts, grid, batch, jax.random.fold_in(key,i), kernels, nograd)
jax.block_until_ready(items["loss_total"])
print(json.dumps({"tag":"d_step_no_point_grads", "ms": round((time.perf_counter()-t0)/8*1e3,1)}), flush=True)
