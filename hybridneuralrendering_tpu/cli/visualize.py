"""Minimal checkpoint render helper (reference run/visualize.py).

Loads the latest checkpoint of a run and renders a handful of views from the
dataset split — the quick "is this checkpoint sane" tool.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="scannet_full")
    p.add_argument("--data-root", required=True)
    p.add_argument("--scan", default="scene0241_01")
    p.add_argument("--checkpoints-dir", default="./checkpoints")
    p.add_argument("--name", default=None)
    p.add_argument("--frames", type=int, default=3)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import os

    import jax

    from hybridneuralrendering_tpu import config as C
    from hybridneuralrendering_tpu.cli.test import render_full_frame
    from hybridneuralrendering_tpu.data import create_dataset
    from hybridneuralrendering_tpu.models import neural_points as npts
    from hybridneuralrendering_tpu.models import renderer
    from hybridneuralrendering_tpu.ops import voxel_grid as VG
    from hybridneuralrendering_tpu.train import checkpoint as ckpt_mod
    from hybridneuralrendering_tpu.train import state as state_mod
    from hybridneuralrendering_tpu.utils import metrics as M
    from hybridneuralrendering_tpu.utils.visualizer import Visualizer

    cfg = C.PRESETS[args.preset](args.scan) if args.preset.startswith(
        "scannet") else C.PRESETS[args.preset]()
    name = args.name or cfg.name
    vis = Visualizer(args.checkpoints_dir, name + "_vis")
    ds_name = "nerf_synth" if args.preset.startswith("nerf") else "scannet"
    ds = create_dataset(ds_name, args.data_root, args.scan, cfg, "test")

    ckpt_dir = os.path.join(args.checkpoints_dir, name, "ckpt")
    latest = ckpt_mod.latest_checkpoint(ckpt_dir)
    if latest is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    points = npts.init_from_arrays(np.zeros((1, 3), np.float32), cfg.points)
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    ts, _ = ckpt_mod.load_checkpoint(
        latest, state_mod.create_train_state(params, points, cfg))
    geom = VG.compute_grid_geometry(np.asarray(ts.points.xyz),
                                    np.asarray(ts.points.mask), cfg.querier)
    grid = VG.build_grid_jit(ts.points.xyz, ts.points.mask, geom, cfg.querier)

    stride = max(len(ds) // max(args.frames, 1), 1)
    for i, fi in enumerate(range(0, len(ds), stride)):
        if i >= args.frames:
            break
        img = render_full_frame(ts.params, ts.points, grid, ds, fi, cfg)
        gt = ds.image(ds.id_list[fi])
        vis.save_image(img, fi, "render")
        vis.log(f"frame {fi}: PSNR {M.psnr(img, gt):.2f}")


if __name__ == "__main__":
    main()
