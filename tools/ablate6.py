"""Forward vs backward split of the train step."""
import time, json
import jax, jax.numpy as jnp
from hybridneuralrendering_tpu.data.synthetic import make_synthetic_batch, make_synthetic_scene
from hybridneuralrendering_tpu.models import blur as blur_mod
from hybridneuralrendering_tpu.models import renderer
from hybridneuralrendering_tpu.train import state as state_mod
from hybridneuralrendering_tpu.train import step as step_mod
import bench

base = bench.bench_config()
points, grid = make_synthetic_scene(base, num_points=bench.NUM_POINTS)
batch = make_synthetic_batch(base)
key = jax.random.PRNGKey(0)
kernels = jnp.asarray(blur_mod.generate_kernel_bank(base.blur))
params = renderer.init_params(jax.random.PRNGKey(0), base)

def timed(tag, f, args, iters=8):
    out = f(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(iters): out = f(*args)
    jax.block_until_ready(out)
    print(json.dumps({"tag": tag, "ms": round((time.perf_counter()-t0)/iters*1e3,1)}), flush=True)

pts_tree = state_mod.point_param_tree(points, base)
fwd = jax.jit(lambda p, pt, sp, g, b, k: step_mod.loss_fn(
    p, pt, sp, g, b, base, k, kernels)[0])
timed("fwd_loss_only", fwd, (params, pts_tree, points, grid, batch, key))

gradf = jax.jit(lambda p, pt, sp, g, b, k: jax.value_and_grad(
    step_mod.loss_fn, argnums=(0,1), has_aux=True)(p, pt, sp, g, b, base, k, kernels)[0][0])
timed("fwd_plus_bwd", gradf, (params, pts_tree, points, grid, batch, key))
