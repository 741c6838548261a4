"""Round-2 step decomposition on the live backend: where do the ~300 ms go?"""

import time

import jax
import jax.numpy as jnp

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from hybridneuralrendering_tpu.data.synthetic import (make_synthetic_batch,
                                                      make_synthetic_scene)
from hybridneuralrendering_tpu.models import blur as blur_mod
from hybridneuralrendering_tpu.models import renderer
from hybridneuralrendering_tpu.ops import query as Q
from hybridneuralrendering_tpu.train import state as state_mod
from hybridneuralrendering_tpu.train import step as step_mod


def timeit(name, f, *args, iters=5, **kw):
    out = f(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    cfg = bench.bench_config()
    points, grid = make_synthetic_scene(cfg, num_points=bench.NUM_POINTS)
    batch = make_synthetic_batch(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    ts = state_mod.create_train_state(params, points, cfg)
    kernels = jnp.asarray(blur_mod.generate_kernel_bank(cfg.blur))
    key = jax.random.PRNGKey(0)

    stages = renderer.compute_image_feature_stages(
        params, cfg, batch["images_nearest"])
    staged = (jnp.asarray(batch["images_nearest"]),
              tuple(s.astype(jnp.bfloat16) for s in stages))

    qf = jax.jit(lambda g, x, c, d, k: Q.query_points(
        g, x, c, d, cfg.querier, cfg.render.near_plane, cfg.render.far_plane,
        key=k, train=True))
    timeit("query fwd", qf, grid, points.xyz, batch["campos"],
           batch["raydir"], key)

    rf_c = jax.jit(lambda p, pts, g, b, k: renderer.render(
        p, pts, g, b, cfg, key=k, train=True,
        img_feat_staged=staged)["coarse_raycolor"])
    timeit("render fwd cached", rf_c, params, points, grid, batch, key)

    # value+grad only (no optimizer), cached
    pts_tree = state_mod.point_param_tree(points, cfg)

    vg = jax.jit(lambda p, pt, sp, g, b, k: jax.value_and_grad(
        step_mod.loss_fn, argnums=(0, 1), has_aux=True)(
        p, pt, sp, g, b, cfg, k, kernels, None, staged)[0][0])
    timeit("loss value_and_grad cached", vg, params, pts_tree, points,
           grid, batch, key)

    # grad w.r.t. network params only (point scatter excluded)
    vg_net = jax.jit(lambda p, pt, sp, g, b, k: jax.value_and_grad(
        step_mod.loss_fn, argnums=(0,), has_aux=True)(
        p, pt, sp, g, b, cfg, k, kernels, None, staged)[0][0])
    timeit("v&g net-params only", vg_net, params, pts_tree, points,
           grid, batch, key)

    def full_c(ts_in, g, b, k):
        return step_mod.train_step(ts_in, g, b, k, kernels, cfg, staged)

    for i in range(2):
        ts, items = full_c(ts, grid, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(items["loss_total"])
    t0 = time.perf_counter()
    for i in range(5):
        ts, items = full_c(ts, grid, batch, jax.random.fold_in(key, 10 + i))
    jax.block_until_ready(items["loss_total"])
    print(f"{'full step cached':34s} {(time.perf_counter()-t0)/5*1e3:9.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
