"""A/B the Pallas banded segment-sum vs the XLA cumsum pipe on the canonical
gather-backward shape ([602k, 64] sorted cotangents -> [600k, 64] grads),
with REAL query indices.  Chained iterations (axon measurement rule).

RESULT (round 3): isolated the kernel WINS 1.8x (9.4 vs 16.7 ms, rel err
2.8e-6) but the full step REGRESSES (bench 21982 -> 19927 rays/s even when
gated to the dense attr-stack reduction) — in-step the XLA tail fuses with
the surrounding VJP elementwise work; the pallas_call boundary forces
materialization.  Recorded dead end; kernel kept here for reference."""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)

from hybridneuralrendering_tpu.data.synthetic import (make_synthetic_batch,
                                                      make_synthetic_scene)
from hybridneuralrendering_tpu.ops import query as Q
import sys, os; sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import pallas_gather as PG
import bench

cfg = bench.bench_config()
points, grid = make_synthetic_scene(cfg, num_points=bench.NUM_POINTS)
jax.block_until_ready(grid.coor2occ)
batch = make_synthetic_batch(cfg)
key0 = jax.random.PRNGKey(0)

qres = jax.jit(lambda g, x, b: Q.query_points(
    g, x, b["campos"], b["raydir"], cfg.querier,
    cfg.render.near_plane, cfg.render.far_plane, key=key0, train=True))(
    grid, points.xyz, batch)
flat_i = jnp.clip(qres.sample_pidx, 0).reshape(-1).astype(jnp.int32)
jax.block_until_ready(flat_i)
M = int(flat_i.shape[0])
N = bench.NUM_POINTS
C = 64
print(json.dumps({"M": M, "N": N, "C": C}), flush=True)

order = jnp.argsort(flat_i)
si = flat_i[order]
pos = jnp.arange(M, dtype=jnp.int32)
end_pos = jax.lax.cummax(
    jnp.full((N,), -1, jnp.int32).at[si].max(pos, mode="drop"))
sg0 = jax.random.normal(key0, (M, C), jnp.float32)
jax.block_until_ready((si, end_pos, sg0))

# correctness first (device)
g_p = PG.banded_segment_sum(sg0, end_pos, N)
g_x = PG.banded_segment_sum_xla(sg0, end_pos, N)
err = float(jnp.max(jnp.abs(g_p - g_x)) / (jnp.max(jnp.abs(g_x)) + 1e-9))
print(json.dumps({"rel_err_vs_xla": err}), flush=True)

def chain(sg, g):
    # feed output back into the next input (axon chained-steps rule)
    return sg.at[:min(M, N)].add(g[:min(M, N)] * 1e-30)

@jax.jit
def step_pallas(sg):
    g = PG.banded_segment_sum(sg, end_pos, N)
    return chain(sg, g), jnp.sum(g[-1])

@jax.jit
def step_xla(sg):
    g = PG.banded_segment_sum_xla(sg, end_pos, N)
    return chain(sg, g), jnp.sum(g[-1])

def timeit(tag, fn, x, iters=20):
    y = fn(x)
    jax.block_until_ready(y[1])
    x = y[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(x)
        x = y[0]
    jax.block_until_ready(y[1])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 2)}), flush=True)

timeit("segsum_xla", step_xla, sg0)
timeit("segsum_pallas", step_pallas, sg0)
timeit("segsum_xla2", step_xla, sg0)
timeit("segsum_pallas2", step_pallas, sg0)
