"""Per-stage timing of the training step on the live backend."""

import time

import jax
import jax.numpy as jnp

from hybridneuralrendering_tpu.data.synthetic import (make_synthetic_batch,
                                                      make_synthetic_scene)
from hybridneuralrendering_tpu.models import blur as blur_mod
from hybridneuralrendering_tpu.models import renderer, feature_pyramid
from hybridneuralrendering_tpu.ops import query as Q
from hybridneuralrendering_tpu.train import state as state_mod
from hybridneuralrendering_tpu.train import step as step_mod

import bench


def timeit(name, f, *args, iters=5, **kw):
    out = f(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt*1e3:9.2f} ms")
    return out


def main():
    cfg = bench.bench_config()
    points, grid = make_synthetic_scene(cfg, num_points=bench.NUM_POINTS)
    batch = make_synthetic_batch(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    ts = state_mod.create_train_state(params, points, cfg)
    kernels = jnp.asarray(blur_mod.generate_kernel_bank(cfg.blur))
    key = jax.random.PRNGKey(0)

    qf = jax.jit(lambda g, x, c, d, k: Q.query_points(
        g, x, c, d, cfg.querier, cfg.render.near_plane, cfg.render.far_plane,
        key=k, train=True))
    timeit("query_points", qf, grid, points.xyz, batch["campos"],
           batch["raydir"], key)

    pf = jax.jit(lambda p, im: feature_pyramid.apply(
        p["aggregator"]["pyramid"], im))
    timeit("feature_pyramid(4 views)", pf, params, batch["images_nearest"])

    rf = jax.jit(lambda p, pts, g, b, k: renderer.render(
        p, pts, g, b, cfg, key=k, train=True)["coarse_raycolor"])
    timeit("render fwd (train)", rf, params, points, grid, batch, key)

    ef = jax.jit(lambda p, pts, g, b: renderer.render(
        p, pts, g, b, cfg, train=False)["coarse_raycolor"])
    timeit("render fwd (eval)", ef, params, points, grid, batch)

    def full(ts_in, g, b, k):
        return step_mod.train_step(ts_in, g, b, k, kernels, cfg)

    # train_step donates; time it manually by chaining
    full_j = step_mod.train_step
    ts2, items = full_j(ts, grid, batch, key, kernels, cfg)
    jax.block_until_ready(items["loss_total"])
    t0 = time.perf_counter()
    N = 10
    for i in range(N):
        ts2, items = full_j(ts2, grid, batch, jax.random.fold_in(key, i),
                            kernels, cfg)
    jax.block_until_ready(items["loss_total"])
    print(f"{'train_step (fwd+bwd+adam)':30s} "
          f"{(time.perf_counter()-t0)/N*1e3:9.2f} ms")

    # grid build cost (once per topology change)
    from hybridneuralrendering_tpu.ops import voxel_grid as VG
    bf = jax.jit(lambda x, m: VG.build_grid(x, m, grid.geom, cfg.querier))
    timeit("build_grid", bf, points.xyz, points.mask, iters=3)


if __name__ == "__main__":
    main()
