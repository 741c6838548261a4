"""Evaluation driver (reference run/test_ft.py).

Loads a checkpoint, renders the full test split in fixed-size pixel chunks,
writes PNGs, and reports PSNR/SSIM/RMSE (+LPIPS when available) — the
protocol of run/test_ft.py:134-266 + run/evaluate.py:34-97.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="scannet_full")
    p.add_argument("--data-root", required=True)
    p.add_argument("--scan", default="scene0241_01")
    p.add_argument("--checkpoints-dir", default="./checkpoints")
    p.add_argument("--name", default=None)
    p.add_argument("--num-frames", type=int, default=0,
                   help="0 = all test frames")
    p.add_argument("--with-lpips", action="store_true")
    p.add_argument("--eval-chunk", type=int, default=0,
                   help="override sampling.eval_chunk_rays (0 = preset)")
    p.add_argument("--blur-mode", default="preset",
                   choices=("preset", "off", "bank", "learnable"),
                   help="must match the training run (the learnable mode "
                        "adds a blur-kernel MLP to the checkpointed params)")
    p.add_argument("--pyramid-dtype", default=None,
                   choices=("float32", "bfloat16"),
                   help="override agg.pyramid_dtype (match the training run)")
    p.add_argument("--shading-dtype", default=None,
                   choices=("float32", "bfloat16"),
                   help="override agg.shading_dtype (match the training run)")
    return p


def render_full_frame(params, points, grid, dataset, frame_idx, cfg):
    from hybridneuralrendering_tpu.data import sampling
    from hybridneuralrendering_tpu.train import step as step_mod
    H, W = dataset.height, dataset.width
    chunk = cfg.sampling.eval_rays
    pix = sampling.full_image_grid(H, W)
    chunks, n_valid = sampling.chunk_pixels(pix, chunk)
    img = np.zeros((H * W, 3), np.float32)
    done = 0
    for ci in range(chunks.shape[0]):
        batch = dataset.get_batch(frame_idx, pixelcoords=chunks[ci][:, None, :])
        batch = step_mod.maybe_add_bg_ray(batch, points, cfg)
        batch = step_mod.device_batch(batch)
        out = step_mod.eval_step(params, points, grid, batch, cfg)
        take = min(chunk, n_valid - done)
        img[done:done + take] = np.asarray(out["coarse_raycolor"])[:take]
        done += take
    return img.reshape(H, W, 3)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import jax

    from hybridneuralrendering_tpu.utils import compile_cache
    compile_cache.enable()

    from hybridneuralrendering_tpu import config as C
    from hybridneuralrendering_tpu.models import neural_points as npts
    from hybridneuralrendering_tpu.models import renderer
    from hybridneuralrendering_tpu.ops import voxel_grid as VG
    from hybridneuralrendering_tpu.train import checkpoint as ckpt_mod
    from hybridneuralrendering_tpu.train import state as state_mod
    from hybridneuralrendering_tpu.utils import metrics as M
    from hybridneuralrendering_tpu.utils.visualizer import Visualizer

    try:
        cfg = C.PRESETS[args.preset](args.scan)
    except TypeError:
        cfg = C.PRESETS[args.preset]()
    import dataclasses
    import json

    name = args.name or cfg.name
    ckpt_dir = os.path.join(args.checkpoints_dir, name, "ckpt")
    # run-config snapshot written by cli/train.py: restore the eval-relevant
    # training-time settings (dtypes, blur mode, point capacity) so a
    # checkpoint evaluates under what it trained with; explicit CLI flags
    # still win (ADVICE r4: pre-snapshot f32 checkpoints must not silently
    # evaluate under bf16 defaults)
    snap = {}
    snap_path = os.path.join(ckpt_dir, "run_config.json")
    if os.path.exists(snap_path):
        with open(snap_path) as f:
            snap = json.load(f)
    blur_mode = args.blur_mode
    if blur_mode == "preset" and snap.get("blur_mode", "preset") != "preset":
        blur_mode = snap["blur_mode"]
    cfg = C.apply_blur_overrides(cfg, blur_mode)
    if args.eval_chunk:
        cfg = cfg.replace(sampling=dataclasses.replace(
            cfg.sampling, eval_chunk_rays=args.eval_chunk))
    pyr_dt = args.pyramid_dtype or snap.get("pyramid_dtype")
    if pyr_dt is not None:
        cfg = cfg.replace(agg=dataclasses.replace(
            cfg.agg, pyramid_dtype=pyr_dt))
    sh_dt = args.shading_dtype or snap.get("shading_dtype")
    if sh_dt is not None:
        cfg = cfg.replace(agg=dataclasses.replace(
            cfg.agg, shading_dtype=sh_dt))
    if snap.get("num_points"):
        cfg = cfg.replace(points=dataclasses.replace(
            cfg.points, num_points=int(snap["num_points"])))
    vis = Visualizer(args.checkpoints_dir, name + "_test")
    vis.log(f"effective dtypes: pyramid={cfg.agg.pyramid_dtype} "
            f"shading={cfg.agg.shading_dtype}  blur_mode={blur_mode}  "
            f"capacity={cfg.points.num_points}"
            + ("  (from run_config.json)" if snap else ""))

    if args.preset.startswith(("nerf", "fixture_nerf")):
        from hybridneuralrendering_tpu.data.nerf_synth import NerfSynthScene
        test_ds = NerfSynthScene(args.data_root, args.scan, cfg, "test")
    else:
        from hybridneuralrendering_tpu.data.scannet import ScannetScene
        test_ds = ScannetScene(args.data_root, args.scan, cfg, "test")

    latest = ckpt_mod.latest_checkpoint(ckpt_dir)
    if latest is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    # template state at capacity shapes
    dummy_xyz = np.zeros((1, 3), np.float32)
    points = npts.init_from_arrays(dummy_xyz, cfg.points)
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    template = state_mod.create_train_state(params, points, cfg)
    ts, best = ckpt_mod.load_checkpoint(latest, template)
    vis.log(f"loaded {latest} (step {int(ts.step)}, best PSNR {best:.2f})")

    geom = VG.compute_grid_geometry(np.asarray(ts.points.xyz),
                                    np.asarray(ts.points.mask), cfg.querier)
    grid = VG.build_grid_jit(ts.points.xyz, ts.points.mask, geom, cfg.querier)

    n = args.num_frames or len(test_ds)
    preds, gts = [], []
    for fi in range(min(n, len(test_ds))):
        t0 = time.time()
        img = render_full_frame(ts.params, ts.points, grid, test_ds, fi, cfg)
        dt = time.time() - t0
        gt = test_ds.image(test_ds.id_list[fi])
        preds.append(img)
        gts.append(gt)
        vis.save_image(img, fi, "coarse_raycolor")
        vis.save_image(gt, fi, "gt_image")
        # per-frame render wall-clock, like run/test_ft.py:229 (first frame
        # includes the eval-chunk jit compile)
        vis.log(f"frame {fi}: PSNR {M.psnr(img, gt):.3f}  "
                f"render {dt:.2f}s ({img.shape[0] * img.shape[1] / dt:.0f} "
                f"rays/s)")

    scores = M.report_metrics(preds, gts, with_lpips=args.with_lpips)
    with open(os.path.join(vis.dir, "scores.txt"), "w") as f:
        for k, v in scores.items():
            f.write(f"{k}: {v}\n")
            vis.log(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
