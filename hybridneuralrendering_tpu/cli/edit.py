"""Scene editing driver (reference run/editiing.py [sic]).

Loads neural-point checkpoints of one or more scenes/parts, selects sub-point
sets by index file, applies a rigid SE(3) transform per part, merges the
clouds, and re-renders along a camera path.  Per-part rotations are composed
into the points' view-direction attributes (the reference carries them in a
per-point Rw2c consumed by the aggregator, run/editiing.py:196-209 +
point_aggregators.py:894-908).
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="scannet_full")
    p.add_argument("--checkpoints-dir", default="./checkpoints")
    p.add_argument("--parts", nargs="+", required=True,
                   help="run names of part checkpoints")
    p.add_argument("--index-files", nargs="+", default=None,
                   help="optional per-part point-index .txt selections")
    p.add_argument("--transforms", nargs="+", default=None,
                   help="per-part SE(3) .txt files (4x4 row-major)")
    p.add_argument("--out-name", default="edited")
    p.add_argument("--render-frames", type=int, default=24,
                   help="frames of the merged-scene render (0 = skip)")
    p.add_argument("--radius", type=float, default=3.0,
                   help="orbit radius around the merged cloud's centroid")
    p.add_argument("--phi", type=float, default=-25.0)
    p.add_argument("--image-hw", type=int, nargs=2, default=None,
                   help="render resolution (default: preset image_hw)")
    p.add_argument("--fps", type=int, default=10)
    return p


class OrbitBase:
    """Minimal dataset stand-in for rendering the merged in-memory scene:
    supplies intrinsics + background; poses come from the orbit path."""

    def __init__(self, cfg, hw=None):
        self.height, self.width = hw or cfg.image_hw
        f = 0.8 * self.width
        self.intrinsic = np.array(
            [[f, 0, self.width / 2], [0, f, self.height / 2], [0, 0, 1]],
            np.float32)
        self.bg = np.asarray(cfg.render.bg_color, np.float32)

    def get_batch(self, idx, rng=None, pixelcoords=None):
        return {"bg_color": self.bg}


def load_part(ckpt_dir: str, cfg, index_file=None, transform=None):
    import jax

    from hybridneuralrendering_tpu.models import neural_points as npts
    from hybridneuralrendering_tpu.models import renderer
    from hybridneuralrendering_tpu.train import checkpoint as ckpt_mod
    from hybridneuralrendering_tpu.train import state as state_mod

    latest = ckpt_mod.latest_checkpoint(ckpt_dir)
    if latest is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    points = npts.init_from_arrays(np.zeros((1, 3), np.float32), cfg.points)
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    ts, _ = ckpt_mod.load_checkpoint(
        latest, state_mod.create_train_state(params, points, cfg))

    mask = np.asarray(ts.points.mask)
    sel = np.nonzero(mask)[0]
    if index_file:
        idx = np.loadtxt(index_file, dtype=np.int64).reshape(-1)
        sel = sel[np.isin(sel, idx)]
    attrs = {
        "xyz": np.asarray(ts.points.xyz)[sel],
        "embedding": np.asarray(ts.points.embedding)[sel],
        "conf": np.asarray(ts.points.conf)[sel],
        "color": np.asarray(ts.points.color)[sel],
        "dirs": np.asarray(ts.points.dirs)[sel],
    }
    n = len(sel)
    if transform is not None:
        T = np.loadtxt(transform).reshape(4, 4).astype(np.float32)
        R, t = T[:3, :3], T[:3, 3]
        attrs["xyz"] = attrs["xyz"] @ R.T + t
        # per-point Rw2c = R^T: the aggregator rotates view dirs and deltas
        # back into the part's trained frame (run/editiing.py:196-209)
        attrs["rw2c"] = np.tile(R.T[None], (n, 1, 1)).astype(np.float32)
    else:
        attrs["rw2c"] = np.tile(np.eye(3, dtype=np.float32)[None], (n, 1, 1))
    return ts.params, attrs


def merge_parts(parts: List[dict], cfg):
    import dataclasses

    import jax.numpy as jnp

    from hybridneuralrendering_tpu.models import neural_points as npts
    cat = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    pcfg = cfg.points
    if len(cat["xyz"]) > pcfg.num_points:
        # merged scenes may exceed a single scene's capacity
        pcfg = dataclasses.replace(
            pcfg, num_points=-(-len(cat["xyz"]) // 1024) * 1024)
    points = npts.init_from_arrays(
        cat["xyz"], pcfg, embedding=cat["embedding"], conf=cat["conf"],
        color=cat["color"], dirs=cat["dirs"])
    rw2c = np.tile(np.eye(3, dtype=np.float32)[None],
                   (points.capacity, 1, 1))
    rw2c[: len(cat["rw2c"])] = cat["rw2c"]
    return points._replace(rw2c=jnp.asarray(rw2c))


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from hybridneuralrendering_tpu import config as C
    from hybridneuralrendering_tpu.ops import voxel_grid as VG
    from hybridneuralrendering_tpu.utils.visualizer import Visualizer

    cfg = C.PRESETS[args.preset]() if not args.preset.startswith("scannet") \
        else C.PRESETS[args.preset]("edited")
    vis = Visualizer(args.checkpoints_dir, args.out_name)

    parts, params = [], None
    for i, part in enumerate(args.parts):
        ckpt_dir = os.path.join(args.checkpoints_dir, part, "ckpt")
        idx = args.index_files[i] if args.index_files else None
        trf = args.transforms[i] if args.transforms else None
        p_params, attrs = load_part(ckpt_dir, cfg, idx, trf)
        params = params or p_params  # first part's networks render the merge
        parts.append(attrs)
        vis.log(f"part {part}: {len(attrs['xyz'])} points"
                + (f" (transformed by {trf})" if trf else ""))

    points = merge_parts(parts, cfg)
    geom = VG.compute_grid_geometry(np.asarray(points.xyz),
                                    np.asarray(points.mask), cfg.querier)
    grid = VG.build_grid_jit(points.xyz, points.mask, geom, cfg.querier)
    vis.save_neural_points(np.asarray(points.xyz)[np.asarray(points.mask)],
                           0, np.asarray(points.color)[np.asarray(points.mask)])
    vis.log(f"merged scene: {int(points.num_live)} points")

    if args.render_frames > 0:
        # final render of the merged scene along an orbit around its centroid
        # (run/editiing.py:50-110's chunked novel-view loop); the image-based
        # branch is off — drop-regularized training makes the point branch
        # self-sufficient, and parts carry no paired source views
        from hybridneuralrendering_tpu.cli.render_vid import render_pose_path
        from hybridneuralrendering_tpu.data.nerf_synth import pose_spherical
        live = np.asarray(points.mask)
        centroid = np.asarray(points.xyz)[live].mean(axis=0)
        poses = []
        for th in np.linspace(-180, 180, args.render_frames + 1)[:-1]:
            c2w = pose_spherical(float(th), args.phi, args.radius)
            flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
            c2w = (c2w @ flip).astype(np.float32)     # OpenCV convention
            c2w[:3, 3] += centroid
            poses.append(c2w)
        base = OrbitBase(cfg, tuple(args.image_hw) if args.image_hw else None)
        out = render_pose_path(params, points, grid, base, poses, cfg, vis,
                               tag="edited", fps=args.fps)
        vis.log(f"edited-scene video written: {out}")
    return params, points, grid


if __name__ == "__main__":
    main()
