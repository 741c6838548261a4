"""Query sub-stage timing."""
import time, json
import jax, jax.numpy as jnp
import numpy as np
from hybridneuralrendering_tpu.data.synthetic import make_synthetic_batch, make_synthetic_scene
from hybridneuralrendering_tpu.core import rays as ray_gen
from hybridneuralrendering_tpu.ops import query as Q
from hybridneuralrendering_tpu.ops.voxel_grid import linearize, voxel_coords
import bench

base = bench.bench_config()
cfgq = base.querier
points, grid = make_synthetic_scene(base, num_points=bench.NUM_POINTS)
batch = make_synthetic_batch(base)
key = jax.random.PRNGKey(0)
campos, raydir = batch["campos"], batch["raydir"]

def timed(tag, f, args, iters=10):
    out = f(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(iters): out = f(*args)
    jax.block_until_ready(out)
    print(json.dumps({"tag": tag, "ms": round((time.perf_counter()-t0)/iters*1e3,1)}), flush=True)
    return out

# stage A: ray gen + occupancy cull + first-SR compaction
def stageA(g, cp, rd, k):
    raypos, _, _ = ray_gen.near_far_linear(cp, rd, cfgq.z_depth_dim, base.render.near_plane, base.render.far_plane, cfgq.sample_jitter, k)
    cand_vid = linearize(voxel_coords(raypos, g.geom), g.geom, cfgq.grid_capacity)
    occ_hit = g.occ_dilated.at[cand_vid].get(mode="fill", fill_value=0) > 0
    cum = jnp.cumsum(occ_hit.astype(jnp.int32), axis=-1)
    targets = jnp.arange(1, cfgq.SR+1, dtype=jnp.int32)
    idx = jax.vmap(lambda c: jnp.searchsorted(c, targets, side="left"))(cum)
    mask = idx < cfgq.z_depth_dim
    loc = jnp.take_along_axis(raypos, jnp.clip(idx,0,cfgq.z_depth_dim-1)[...,None], axis=1)
    return loc * mask[...,None]

locw = timed("A_cull_compact", jax.jit(stageA), (grid, campos, raydir, key))

# stage B: full query
qf = jax.jit(lambda g, x, cp, rd, k: Q.query_points(g, x, cp, rd, cfgq,
    base.render.near_plane, base.render.far_plane, key=k, train=True))
out = timed("B_full_query", qf, (grid, points.xyz, campos, raydir, key))

# stage A2: just the occupancy gather
def stageA2(g, cp, rd, k):
    raypos, _, _ = ray_gen.near_far_linear(cp, rd, cfgq.z_depth_dim, base.render.near_plane, base.render.far_plane, cfgq.sample_jitter, k)
    cand_vid = linearize(voxel_coords(raypos, g.geom), g.geom, cfgq.grid_capacity)
    return jnp.sum(g.occ_dilated.at[cand_vid].get(mode="fill", fill_value=0))
timed("A2_occ_gather_only", jax.jit(stageA2), (grid, campos, raydir, key))
