"""A/B chain_chunks (and remat granularity) on the NeRF-synthetic SR=80
workload (bench.bench_config_nerf shapes).  The chunked lax.scan bounds the
remat backward's live [R*SR*K, 256] temporaries; more chunks = smaller peak
HBM but more sequential dispatch.  Chained full steps (axon rule)."""
import dataclasses
import json
import os
import time

import jax

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)

from hybridneuralrendering_tpu.data.synthetic import (make_synthetic_batch,
                                                      make_synthetic_scene)
from hybridneuralrendering_tpu.models import renderer
from hybridneuralrendering_tpu.train import state as state_mod
from hybridneuralrendering_tpu.train import step as step_mod
import bench

key = jax.random.PRNGKey(0)


def run(tag, nc, remat=True, iters=15, dtype="float32", sdt=None,
        fused=False):
    cfg = bench.bench_config_nerf()
    cfg = cfg.replace(agg=dataclasses.replace(
        cfg.agg, chain_chunks=nc, remat_chain=remat, compute_dtype=dtype,
        fused_leaky_vjp=fused,
        **({} if sdt is None else {"shading_dtype": sdt})))
    pts, grid = make_synthetic_scene(cfg, num_points=bench.NUM_POINTS_NERF)
    batch = make_synthetic_batch(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    ts = state_mod.create_train_state(params, pts, cfg)
    t0 = time.perf_counter()
    try:
        ts, items = step_mod.train_step(ts, grid, batch, key, None, cfg)
        jax.block_until_ready(items["loss_total"])
    except Exception as e:
        print(json.dumps({"tag": tag, "error": str(e)[:200]}), flush=True)
        return
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        ts, items = step_mod.train_step(
            ts, grid, batch, jax.random.fold_in(key, i), None, cfg)
    jax.block_until_ready(items["loss_total"])
    dt = (time.perf_counter() - t0) / iters
    R = cfg.sampling.rays_per_batch
    print(json.dumps({"tag": tag, "step_ms": round(dt * 1e3, 1),
                      "rays_per_s": round(R / dt, 1),
                      "compile_s": round(t_compile, 1),
                      "loss": round(float(items["loss_total"]), 5)}),
          flush=True)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1:
        # round-5 mode: chunk-count sweep under the shipped bf16 shading
        # chain (VERDICT r4 #3: chain_chunks was tuned at f32; the dtype
        # flip halved live-chunk bytes so the optimum may have moved).
        # usage: ablate_nerf_chunks.py N [N...]  (interleaved A/B repeats)
        # a token "nrN" runs remat_chain=False with N chunks — at bf16 the
        # residual set is half its f32 size, so the no-remat path (which
        # deletes the backward's forward recompute) may now fit HBM.
        # an "fv" prefix (fvN / fvnrN) additionally enables fused_leaky_vjp
        # (output-sign backward: halves no-remat residuals again).
        cells = []
        for a in sys.argv[1:]:
            fused = a.startswith("fv")
            a = a[2:] if fused else a
            if a.startswith("nr"):
                cells.append((int(a[2:] or 1), False, fused))
            else:
                cells.append((int(a), True, fused))
        for rep in ("a", "b"):
            for nc, rm, fv in cells:
                tag = (f"c{nc}{'' if rm else '_noremat'}"
                       f"{'_fv' if fv else ''}_shbf16_{rep}")
                run(tag, nc, remat=rm, sdt="bfloat16", fused=fv)
    else:
        run("c16_f32", 16)
        run("c16_bf16", 16, dtype="bfloat16")
        run("c16_f32_b", 16)
        run("c16_bf16_b", 16, dtype="bfloat16")
