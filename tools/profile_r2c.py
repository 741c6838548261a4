"""Decompose the point-attribute gradient cost (the ~90 ms over fwd)."""

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
    print(f"{name:38s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms",
          flush=True)
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
    full_tree = state_mod.point_param_tree(points, cfg)

    def vg_keys(keys, name):
        sub = {k: full_tree[k] for k in keys}
        f = jax.jit(lambda p, pt, sp, g, b, k: gsum(jax.value_and_grad(
            step_mod.loss_fn, argnums=(1,), has_aux=True)(
            p, pt, sp, g, b, cfg, k, kernels, None, staged)[1]))
        timeit(name, f, params, sub, points, grid, batch, key)

    vg_keys(("embedding",), "pts grad: embedding only")
    vg_keys(("conf",), "pts grad: conf only")
    vg_keys(("color", "dirs"), "pts grad: color+dirs only")
    vg_keys(("embedding", "conf", "color", "dirs"), "pts grad: all four")

    # microbench the backward primitive itself
    S = cfg.sampling.rays_per_batch * cfg.querier.SR * cfg.querier.K
    N = bench.NUM_POINTS
    idx = jax.random.randint(key, (S,), 0, N)
    g = jax.random.normal(key, (S, 42))

    def sorted_scatter(idx, g):
        order = jnp.argsort(idx)
        return jax.ops.segment_sum(g[order], idx[order], num_segments=N,
                                   indices_are_sorted=True)

    timeit("argsort+sorted segsum [602k,42]",
           jax.jit(sorted_scatter), idx, g)
    timeit("argsort only [602k]",
           jax.jit(lambda i: jnp.argsort(i)), idx)
    timeit("unsorted segment_sum [602k,42]",
           jax.jit(lambda i, g: jax.ops.segment_sum(g, i, num_segments=N)),
           idx, g)


if __name__ == "__main__":
    main()
