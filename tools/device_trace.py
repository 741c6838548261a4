"""Device-level op breakdown of the train step via jax.profiler.

Host wall-clock micro-loops through the axon tunnel are unreliable
(CLAUDE.md); the profiler's DEVICE track durations are recorded on-chip and
are the trustworthy per-op signal.  Captures a trace of a few chained full
steps and prints the top ops by total device time.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/device_trace.py [--cached]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cached", action="store_true",
                    help="profile the pyramid-cached step variant")
    ap.add_argument("--workload", default="scannet",
                    choices=("scannet", "nerf"),
                    help="nerf = SR=80 R=3600 points-mode shapes "
                         "(bench.bench_config_nerf)")
    ap.add_argument("--logdir", default="/tmp/jax_trace")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=45)
    args = ap.parse_args()

    from hybridneuralrendering_tpu.data.synthetic import (
        make_synthetic_batch, make_synthetic_scene)
    from hybridneuralrendering_tpu.models import blur as blur_mod
    from hybridneuralrendering_tpu.models import renderer
    from hybridneuralrendering_tpu.train import state as state_mod
    from hybridneuralrendering_tpu.train import step as step_mod
    import bench

    if args.workload == "nerf":
        cfg = bench.bench_config_nerf()
        points, grid = make_synthetic_scene(cfg, num_points=bench.NUM_POINTS_NERF)
        kernels = None
    else:
        cfg = bench.bench_config()
        points, grid = make_synthetic_scene(cfg, num_points=bench.NUM_POINTS)
        kernels = jnp.asarray(blur_mod.generate_kernel_bank(cfg.blur))
    batch = make_synthetic_batch(cfg)
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    ts = state_mod.create_train_state(params, points, cfg)
    key = jax.random.PRNGKey(0)

    staged = None
    if args.cached:
        stages = renderer.compute_image_feature_stages(
            ts.params, cfg, batch["images_nearest"])
        staged = (jnp.asarray(batch["images_nearest"]), stages)

    def one(ts, k):
        return step_mod.train_step(ts, grid, batch, k, kernels, cfg, staged)

    # warm compile + a few steps
    for i in range(2):
        ts, items = one(ts, jax.random.fold_in(key, i))
    jax.block_until_ready(items["loss_total"])

    with jax.profiler.trace(args.logdir):
        for i in range(args.steps):
            ts, items = one(ts, jax.random.fold_in(key, 100 + i))
        jax.block_until_ready(items["loss_total"])

    traces = sorted(glob.glob(
        os.path.join(args.logdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not traces:
        print("no trace.json.gz found under", args.logdir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # map pids to process names; keep device-side tracks only
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dur_by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        d = float(e.get("dur", 0.0))
        dur_by_name[e.get("name", "?")] += d
        total += d
    print(f"# device tracks: "
          f"{sorted(set(v for v in pid_name.values() if v))}")
    print(f"# total device-op time: {total/1e3/args.steps:.2f} ms/step "
          f"({args.workload} {'cached' if args.cached else 'uncached'})")
    for name, d in sorted(dur_by_name.items(), key=lambda kv: -kv[1])[
            : args.top]:
        print(f"{d/1e3/args.steps:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
