"""VERDICT r4 #5 probe: would unique-row dedup before the big attribute
gathers pay?

Two measurements decide it:

1. **Census** — how many UNIQUE point ids does one training step's
   [R, SR, K] neighbor set actually touch?  (The supervoxel design
   guarantees heavy id repetition across SR and K within a ray and across
   adjacent rays.)  If U << m = R*SR*K there is room in principle.

2. **Gather rate vs table size** — the dedup forward still needs an
   m-descriptor expansion gather (compact [U, 64] -> [m, 64]); it only
   beats the current single gather over the full [N, 64] table if XLA's
   row-gather cost DEPENDS on table size (row-fetch locality) rather than
   on descriptor count alone.  Chained same-shape gathers over tables of
   600k / 150k / 60k / 15k rows with the identical m descriptors answer
   that directly.

If the rate is flat in table size, dedup cannot pay: the expansion gather
costs the same as today's direct gather, and every added stage (unique,
compact, scatter) is pure overhead -> PERF.md gets the "dedup doesn't pay
because X" entry VERDICT asked for.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
if os.environ.get("DEDUP_CPU"):
    # the census is platform-independent; CPU avoids touching a busy chip.
    # (JAX_PLATFORMS env is pinned to axon by sitecustomize — config wins.)
    jax.config.update("jax_platforms", "cpu")

from hybridneuralrendering_tpu.data.synthetic import (make_synthetic_batch,
                                                      make_synthetic_scene)
from hybridneuralrendering_tpu.ops import query as Q
import bench


def census(tag, cfg, num_points, n_batches=4):
    pts, grid = make_synthetic_scene(cfg, num_points=num_points)
    batch = make_synthetic_batch(cfg)
    qcfg, rcfg = cfg.querier, cfg.render

    # grid/xyz must be jit ARGUMENTS — closed-over they become HLO
    # constants and the axon compiler rejects the body (HTTP 413)
    @jax.jit
    def stats(grid, xyz, campos, raydir, key):
        qres = Q.query_points(grid, xyz, campos, raydir, qcfg,
                              rcfg.near_plane, rcfg.far_plane, key=key,
                              train=True)
        ids = jnp.where(qres.pnt_mask, qres.sample_pidx, -1).reshape(-1)
        si = jnp.sort(ids)
        uniq = jnp.sum((si[1:] != si[:-1]) & (si[1:] >= 0)) + \
            jnp.where(si[0] >= 0, 1, 0)
        valid = jnp.sum(ids >= 0)
        return uniq, valid

    key = jax.random.PRNGKey(0)
    for i in range(n_batches):
        u, v = stats(grid, pts.xyz, batch["campos"], batch["raydir"],
                     jax.random.fold_in(key, i))
        m = int(np.prod((
            cfg.sampling.rays_per_batch, qcfg.SR, qcfg.K)))
        print(json.dumps({
            "tag": f"census_{tag}", "batch": i, "m_slots": m,
            "valid": int(v), "unique": int(u),
            "dup_factor": round(float(int(v) / max(int(u), 1)), 2)}),
            flush=True)


def gather_rate(m=602_112, width=64, iters=30):
    """Chained [m]-descriptor row gathers over tables of varying row count.
    Each iteration's indices depend on the previous gather's output so the
    tunnel cannot overlap iterations (CLAUDE.md axon rule)."""
    key = jax.random.PRNGKey(0)
    for n in (600_000, 150_000, 60_000, 15_000):
        table = jax.random.normal(key, (n, width), jnp.float32)
        idx0 = jax.random.randint(jax.random.PRNGKey(1), (m,), 0, n,
                                  jnp.int32)

        @jax.jit
        def step(t, idx, nn=n):
            # table as an ARGUMENT (closed-over it becomes an HLO constant
            # and the axon compiler rejects the body with HTTP 413)
            out = t[idx]
            # data dependence: fold a value-derived (always-zero) term into
            # the next indices without changing them
            bump = (jnp.sum(out, axis=-1) > 1e30).astype(jnp.int32)
            return (idx + bump) % nn

        idx = step(table, idx0)
        idx.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            idx = step(table, idx)
        idx.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "tag": f"gather_n{n}", "m": m, "width": width,
            "ms": round(dt * 1e3, 2),
            "rows_per_s_M": round(m / dt / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "census"):
        census("scannet", bench.bench_config(), bench.NUM_POINTS)
        census("nerf", bench.bench_config_nerf(), bench.NUM_POINTS_NERF)
    if which in ("all", "rate"):
        gather_rate()
