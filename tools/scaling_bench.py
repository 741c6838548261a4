"""Scaling benchmark: rays/s of the sharded train step at 1..N devices.

Two modes (BASELINE.md target: >=80% rays/s scaling efficiency):
  - default: virtual CPU mesh (xla_force_host_platform_device_count) —
    validates that the sharded step runs at 1/2/4/8 devices and surfaces
    collective/shape bugs.  NOTE: virtual devices timeshare the same host
    cores, so "efficiency" here reflects CPU oversubscription, NOT the ICI
    scaling the >=80% target refers to — that needs real multi-chip
    hardware (the output marks these rows cpu_virtual=true);
  - --tpu: the real single-chip perf point (matches bench.py's workload).

Usage:
  python tools/scaling_bench.py [--devices 1 2 4 8] [--rays-mult 1]
  PYTHONPATH=/root/repo:/root/.axon_site python tools/scaling_bench.py --tpu

Prints one JSON line per device count:
  {"devices": n, "rays_per_s": ..., "efficiency_vs_1": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_point(n_devices: int, iters: int = 10, warmup: int = 3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hybridneuralrendering_tpu import config as C
    from hybridneuralrendering_tpu.data.synthetic import (
        make_synthetic_batch, make_synthetic_scene)
    from hybridneuralrendering_tpu.models import blur as blur_mod
    from hybridneuralrendering_tpu.models import renderer
    from hybridneuralrendering_tpu.parallel import mesh as pmesh
    from hybridneuralrendering_tpu.train import state as state_mod
    from hybridneuralrendering_tpu.train import step as step_mod

    cfg = C.tiny_test()
    # scale rays with devices so per-device work is constant (weak scaling
    # measures the collective overhead; rays/s should grow ~linearly)
    side = max(int(np.ceil(np.sqrt(n_devices))), 2)
    ps = cfg.sampling.dilation_patch_size
    cfg = cfg.replace(sampling=C.SamplingConfig(
        random_sample="dilated", random_sample_size=side * ps,
        dilation_patch_num=side, dilation_patch_size=ps, edge_filter=0))
    R = cfg.sampling.rays_per_batch
    assert R % n_devices == 0

    devices = jax.devices()[:n_devices]
    m = pmesh.make_mesh(cfg.parallel, devices)
    points, grid = make_synthetic_scene(cfg, num_points=1500)
    batch = make_synthetic_batch(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    ts = state_mod.create_train_state(params, points, cfg)
    kernels = jnp.asarray(blur_mod.generate_kernel_bank(cfg.blur))

    ts = pmesh.replicate_tree(ts, m)
    grid = pmesh.replicate_tree(grid, m)
    kernels = pmesh.replicate_tree(kernels, m)
    batch = pmesh.shard_batch(batch, m, cfg.parallel)
    key = jax.random.PRNGKey(0)

    for i in range(warmup):
        ts, items = step_mod.train_step(ts, grid, batch,
                                        jax.random.fold_in(key, i),
                                        kernels, cfg)
    jax.block_until_ready(items["loss_total"])
    t0 = time.perf_counter()
    for i in range(iters):
        ts, items = step_mod.train_step(ts, grid, batch,
                                        jax.random.fold_in(key, 100 + i),
                                        kernels, cfg)
    jax.block_until_ready(items["loss_total"])
    dt = (time.perf_counter() - t0) / iters
    return R / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--tpu", action="store_true",
                    help="single real-chip perf point instead of CPU mesh")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if not args.tpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(args.devices)}")
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    if args.tpu:
        args.devices = [1]

    base = None
    for n in args.devices:
        if n > len(jax.devices()):
            continue
        rps = run_point(n, args.iters)
        base = base if base is not None else rps
        per_dev = rps / n
        base_per_dev = base / 1
        print(json.dumps({
            "devices": n,
            "rays_per_s": round(rps, 1),
            "efficiency_vs_1": round(per_dev / base_per_dev, 3),
            "cpu_virtual": not args.tpu,
        }), flush=True)


if __name__ == "__main__":
    main()
