"""Video rendering driver (reference run/render_vid.py): renders a camera
path from a checkpoint and assembles a video.

Path types by dataset family:
  - NeRF-synthetic: spherical orbit (`pose_spherical`,
    nerf_synth360_ft_dataset.py:77-105);
  - ScanNet: a smooth fly-through interpolated through the training poses
    (`get_dummyrot_item` + the euler-interpolating path generator,
    data/scannet_ft_dataset.py:988-1075, utils/util.py:34-63).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="nerf_synth_points")
    p.add_argument("--data-root", required=True)
    p.add_argument("--scan", default="lego")
    p.add_argument("--checkpoints-dir", default="./checkpoints")
    p.add_argument("--name", default=None)
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--radius", type=float, default=4.0,
                   help="orbit radius (NeRF-synthetic)")
    p.add_argument("--phi", type=float, default=-30.0)
    p.add_argument("--key-stride", type=int, default=10,
                   help="every k-th training pose keys the ScanNet path")
    p.add_argument("--fps", type=int, default=20)
    return p


class PathView:
    """Duck-typed dataset yielding batches for poses along a path."""

    def __init__(self, base, poses):
        self.base, self.poses = base, poses
        self.height, self.width = base.height, base.width
        self.id_list = list(range(len(poses)))

    def get_batch(self, idx, rng=None, pixelcoords=None):
        c2w = self.poses[idx]
        b = self.base.get_batch(0, pixelcoords=pixelcoords)
        camrot, campos = c2w[:3, :3], c2w[:3, 3]
        from hybridneuralrendering_tpu.data.scannet import _np_raydir
        raydir = _np_raydir(pixelcoords, self.base.intrinsic,
                            camrot).reshape(-1, 3)
        b.update({"campos": campos.astype(np.float32),
                  "camrotc2w": camrot.astype(np.float32),
                  "raydir": raydir.astype(np.float32)})
        return b


def render_pose_path(params, points, grid, base_ds, poses, cfg, vis,
                     tag: str = "path", fps: int = 20):
    """Render every pose through the chunked full-frame path and write a
    video (run/render_vid.py:26+ / run/editiing.py:50-110)."""
    from hybridneuralrendering_tpu.cli.test import render_full_frame
    path_ds = PathView(base_ds, poses)
    for i in range(len(poses)):
        img = render_full_frame(params, points, grid, path_ds, i, cfg)
        vis.save_image(img, i, tag)
        vis.log(f"rendered {tag} frame {i + 1}/{len(poses)}")
    return vis.gen_video(fps=fps)


def scene_path_poses(ds, args):
    """Camera path for the dataset family."""
    if hasattr(ds, "render_path"):                     # NeRF-synthetic orbit
        return ds.render_path(args.frames, args.phi, args.radius)
    # ScanNet: interpolate through every k-th training pose
    from hybridneuralrendering_tpu.data.paths import gen_render_path
    keys = [ds._pose(vid) for vid in ds.train_id_list[::args.key_stride]]
    if len(keys) < 2:
        keys = [ds._pose(vid) for vid in ds.train_id_list]
    return list(gen_render_path(np.stack(keys), args.frames))


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import jax

    from hybridneuralrendering_tpu import config as C
    from hybridneuralrendering_tpu.models import neural_points as npts
    from hybridneuralrendering_tpu.models import renderer
    from hybridneuralrendering_tpu.ops import voxel_grid as VG
    from hybridneuralrendering_tpu.train import checkpoint as ckpt_mod
    from hybridneuralrendering_tpu.train import state as state_mod
    from hybridneuralrendering_tpu.utils.visualizer import Visualizer

    # ScanNet-layout datasets for every non-NeRF preset (same dispatch rule
    # as cli/train)
    is_scannet = not args.preset.startswith("nerf")
    cfg = C.PRESETS[args.preset](args.scan) if "scannet" in args.preset \
        else C.PRESETS[args.preset]()
    name = args.name or cfg.name
    vis = Visualizer(args.checkpoints_dir, name + "_vid")
    ckpt_dir = os.path.join(args.checkpoints_dir, name, "ckpt")

    if is_scannet:
        from hybridneuralrendering_tpu.data.scannet import ScannetScene
        ds = ScannetScene(args.data_root, args.scan, cfg, "train")
    else:
        from hybridneuralrendering_tpu.data.nerf_synth import NerfSynthScene
        ds = NerfSynthScene(args.data_root, args.scan, cfg, "test")

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

    poses = scene_path_poses(ds, args)
    out = render_pose_path(ts.params, ts.points, grid, ds, poses, cfg, vis,
                           fps=args.fps)
    vis.log(f"video written: {out}")


if __name__ == "__main__":
    main()
