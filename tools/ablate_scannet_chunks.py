"""A/B chain_chunks (with/without remat) on the canonical ScanNet workload.

The NeRF SR=80 workload gained +13% from chain_chunks=16 (smaller live
remat windows pipeline better — round-3 log).  ScanNet ships chunks=1 /
remat off; this measures whether chunked scanning helps its much smaller
per-ray working set too.  Cached (pyramid) step variant — 90% of the
steady-state blend.  Chained full steps per the axon timing rule.
"""
import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)    # for `import bench` from any cwd
cache_dir = os.path.join(_repo, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)

from hybridneuralrendering_tpu.data.synthetic import (make_synthetic_batch,
                                                      make_synthetic_scene)
from hybridneuralrendering_tpu.models import blur as blur_mod
from hybridneuralrendering_tpu.models import renderer
from hybridneuralrendering_tpu.train import state as state_mod
from hybridneuralrendering_tpu.train import step as step_mod
import bench

key = jax.random.PRNGKey(0)


def run(tag, nc, remat, iters=12, fused=False):
    cfg = bench.bench_config()
    cfg = cfg.replace(agg=dataclasses.replace(
        cfg.agg, chain_chunks=nc, remat_chain=remat, fused_leaky_vjp=fused))
    points, grid = make_synthetic_scene(cfg, num_points=bench.NUM_POINTS)
    batch = make_synthetic_batch(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    ts = state_mod.create_train_state(params, points, cfg)
    kernels = jnp.asarray(blur_mod.generate_kernel_bank(cfg.blur))
    stages = renderer.compute_image_feature_stages(
        ts.params, cfg, batch["images_nearest"])
    staged = (jnp.asarray(batch["images_nearest"]),
              tuple(s.astype(jnp.bfloat16) for s in stages))
    t0 = time.perf_counter()
    try:
        ts, items = step_mod.train_step(ts, grid, batch, key, kernels, cfg,
                                        staged)
        jax.block_until_ready(items["loss_total"])
    except Exception as e:
        print(json.dumps({"tag": tag, "error": str(e)[:200]}), flush=True)
        return
    t_compile = time.perf_counter() - t0
    for i in range(3):
        ts, items = step_mod.train_step(ts, grid, batch,
                                        jax.random.fold_in(key, i), kernels,
                                        cfg, staged)
    jax.block_until_ready(items["loss_total"])
    t0 = time.perf_counter()
    for i in range(iters):
        ts, items = step_mod.train_step(ts, grid, batch,
                                        jax.random.fold_in(key, 10 + i),
                                        kernels, cfg, staged)
    jax.block_until_ready(items["loss_total"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "tag": tag, "step_ms": round(dt * 1e3, 1),
        "rays_per_s": round(cfg.sampling.rays_per_batch / dt, 1),
        "compile_s": round(t_compile, 1)}), flush=True)


if __name__ == "__main__":
    # two interleaved passes over the configs (compiles cache after pass 1),
    # so per-config pairs bracket clock drift — the repo's bench noise rule
    # (±3%) and the shuffled-repeat protocol ablate_nerf_chunks used
    if len(sys.argv) > 1 and sys.argv[1] == "fv":
        # round-5: fused_leaky_vjp A/B on the shipped ScanNet config
        # (remat OFF here, so the output-sign backward halves the chain's
        # saved-residual traffic directly — cached-step variant)
        configs = [("nc1_base", 1, False, False),
                   ("nc1_fused", 1, False, True)]
    else:
        configs = [("nc1_noremat (shipped)", 1, False, False),
                   ("nc4_noremat", 4, False, False),
                   ("nc8_noremat", 8, False, False),
                   ("nc8_remat", 8, True, False),
                   ("nc16_remat", 16, True, False)]
    for rep in range(2):
        for tag, nc, remat, fv in configs:
            run(f"{tag} pass{rep}", nc, remat, fused=fv)
