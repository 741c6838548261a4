"""Backward-pass decomposition (grads kept live so XLA can't DCE them)."""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from hybridneuralrendering_tpu.data.synthetic import (make_synthetic_batch,
                                                      make_synthetic_scene)
from hybridneuralrendering_tpu.models import blur as blur_mod
from hybridneuralrendering_tpu.models import renderer
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
    print(f"{name:36s} {dt*1e3:9.2f} ms", flush=True)
    return out


def gsum(tree):
    return sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(tree)
               if hasattr(l, "dtype") and l.dtype.kind == "f")


def main():
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    cfg = bench.bench_config()
    points, grid = make_synthetic_scene(cfg, num_points=bench.NUM_POINTS)
    batch = make_synthetic_batch(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    kernels = jnp.asarray(blur_mod.generate_kernel_bank(cfg.blur))
    key = jax.random.PRNGKey(0)

    stages = renderer.compute_image_feature_stages(
        params, cfg, batch["images_nearest"])
    staged = (jnp.asarray(batch["images_nearest"]),
              tuple(s.astype(jnp.bfloat16) for s in stages))
    pts_tree = state_mod.point_param_tree(points, cfg)

    def vg(argnums, name):
        f = jax.jit(lambda p, pt, sp, g, b, k: gsum(jax.value_and_grad(
            step_mod.loss_fn, argnums=argnums, has_aux=True)(
            p, pt, sp, g, b, cfg, k, kernels, None, staged)[1]))
        timeit(name, f, params, pts_tree, points, grid, batch, key)

    vg((0, 1), "v&g both (grads live)")
    vg((0,), "v&g net params only")
    vg((1,), "v&g point attrs only")

    # no-hybrid ablation: how much of fwd+bwd is the image branch?
    cfg_nh = cfg.replace(agg=cfg.agg.__class__(
        **{**cfg.agg.__dict__, "use_nearest": 0, "drop_ratio": 0.0}))
    params_nh = renderer.init_params(jax.random.PRNGKey(0), cfg_nh)
    pts_tree_nh = state_mod.point_param_tree(points, cfg_nh)
    f_nh = jax.jit(lambda p, pt, sp, g, b, k: gsum(jax.value_and_grad(
        step_mod.loss_fn, argnums=(0, 1), has_aux=True)(
        p, pt, sp, g, b, cfg_nh, k, kernels, None, None)[1]))
    timeit("v&g both, hybrid OFF", f_nh, params_nh, pts_tree_nh, points,
           grid, batch, key)

    # fwd-only for reference
    ffwd = jax.jit(lambda p, pt, sp, g, b, k: step_mod.loss_fn(
        p, pt, sp, g, b, cfg, k, kernels, None, staged)[0])
    timeit("fwd only (loss)", ffwd, params, pts_tree, points, grid,
           batch, key)


if __name__ == "__main__":
    main()
