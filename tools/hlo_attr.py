"""Attribute device-trace op names to source lines via optimized HLO.

The device trace (tools/device_trace.py) reports fusion names like
`fusion.52`; the optimized HLO from the axon remote compiler
(`lower().compile().as_text()`) contains those same computation names with
shapes and op_name/source metadata.  This tool compiles the (cached or
uncached) train step, then for each requested name prints the fusion's root
and the heaviest ops inside it.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/hlo_attr.py \
      --cached fusion.52 split.33 maximum_reduce_fusion ...
With no names: dumps the HLO to /tmp/hlo_cached.txt and exits.
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)


def get_hlo(cached: bool, workload: str = "scannet") -> str:
    from hybridneuralrendering_tpu.data.synthetic import (
        make_synthetic_batch, make_synthetic_scene)
    from hybridneuralrendering_tpu.models import blur as blur_mod
    from hybridneuralrendering_tpu.models import renderer
    from hybridneuralrendering_tpu.train import state as state_mod
    from hybridneuralrendering_tpu.train import step as step_mod
    import bench

    if workload == "nerf":
        # NeRF-synthetic SR=80 shapes (bench.py second workload): no blur
        # bank, no hybrid branch, remat+chunked chain
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
    if cached:
        stages = renderer.compute_image_feature_stages(
            ts.params, cfg, batch["images_nearest"])
        staged = (jnp.asarray(batch["images_nearest"]),
                  tuple(s.astype(jnp.bfloat16) for s in stages))

    # big arrays ride as ARGUMENTS — closing over them captures them as
    # HLO constants (2.4 GB) and the axon remote compiler rejects/crawls.
    # train_step is already jitted (static cfg), so lower it directly.
    return step_mod.train_step.lower(
        ts, grid, batch, key, kernels, cfg, staged).compile().as_text()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--cached", action="store_true")
    ap.add_argument("--workload", default="scannet",
                    choices=("scannet", "nerf"))
    ap.add_argument("--hlo", default=None,
                    help="reuse a previously dumped HLO file")
    ap.add_argument("--refresh", action="store_true",
                    help="re-lower even if a previous dump exists")
    ap.add_argument("--lines", type=int, default=14,
                    help="max body lines to print per computation")
    args = ap.parse_args()

    suffix = "" if args.workload == "scannet" else f"_{args.workload}"
    path = args.hlo or (f"/tmp/hlo_cached{suffix}.txt" if args.cached
                        else f"/tmp/hlo_uncached{suffix}.txt")
    if args.hlo and os.path.exists(args.hlo):
        hlo = open(args.hlo).read()
    elif os.path.exists(path) and args.names and not args.refresh:
        import time as _time
        age_min = (_time.time() - os.path.getmtime(path)) / 60
        print(f"# reusing {path} (dumped {age_min:.0f} min ago; pass "
              f"--refresh after code changes)")
        hlo = open(path).read()
    else:
        hlo = get_hlo(args.cached, args.workload)
        with open(path, "w") as f:
            f.write(hlo)
        print(f"# wrote {path} ({len(hlo)/1e6:.1f} MB)")
    if not args.names:
        return

    # computations are named `%fused_computation.N` etc., but the TRACE name
    # is the fusion INSTRUCTION name (`%fusion.52 = ... fusion(...),
    # calls=%fused_computation.N`).  Find the instruction line, then its
    # called computation body.
    for name in args.names:
        pat = re.compile(rf"^\s*%?{re.escape(name)}\s*=\s*(.*)$", re.M)
        m = pat.search(hlo)
        if not m:
            print(f"== {name}: NOT FOUND")
            continue
        line = m.group(0).strip()
        print(f"== {name}")
        print("  " + line[:400])
        cm = re.search(r"calls=%?([\w.\-]+)", line)
        meta = re.search(r'metadata=\{([^}]*)\}', line)
        if meta:
            print("  meta: " + meta.group(1)[:300])
        if cm:
            comp = cm.group(1)
            body = re.search(
                rf"^%?{re.escape(comp)}\s[^\n]*\{{(.*?)^\}}", hlo,
                re.M | re.S)
            if body:
                lines = [l.strip() for l in body.group(1).splitlines()
                         if "=" in l]
                # heaviest ops: prefer gathers/scatters/dots/reduces/big shapes
                interesting = [l for l in lines if re.search(
                    r"gather|scatter|dot|reduce|convolution|iota|sort|"
                    r"transpose|concatenate", l)]
                show = interesting[:args.lines] or lines[:args.lines]
                for l in show:
                    src = re.search(r'op_name="([^"]*)"', l)
                    head = l.split(" metadata")[0]
                    print("    " + head[:240])
                    if src:
                        sl = re.search(
                            r'source_file="([^"]*)" source_line=(\d+)', l)
                        loc = (f' @ {sl.group(1).split("/")[-1]}:{sl.group(2)}'
                               if sl else "")
                        print(f"       op: {src.group(1)[:160]}{loc}")
        print()


if __name__ == "__main__":
    main()
