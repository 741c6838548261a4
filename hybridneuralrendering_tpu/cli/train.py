"""Training driver (reference run/train_ft.py:621-1085).

Usage:
  python -m hybridneuralrendering_tpu.cli.train --preset scannet_full \
      --data-root /path/to/scannet/scans --scan scene0241_01 \
      --checkpoints-dir ./checkpoints [--max-steps N]

Replaces the reference's bash restart loop + two-phase argparse with a typed
preset + a handful of flags.  The loop: bootstrap points (depth unprojection /
ply / checkpoint), build grid, then train with periodic eval, probe-and-grow
(in-process, no restart), and checkpointing.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="scannet_full",
                   help="config preset name (see config.PRESETS)")
    p.add_argument("--data-root", required=True)
    p.add_argument("--scan", default="scene0241_01")
    p.add_argument("--checkpoints-dir", default="./checkpoints")
    p.add_argument("--name", default=None, help="run name (default: preset)")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--load-points", type=int, default=2,
                   help="0: feed-forward MVS, 1: ply mesh, 2: sensor depth")
    p.add_argument("--vox-res", type=int, default=900,
                   help="voxel-downsample resolution for init points")
    p.add_argument("--mvs-ckpt", default=None,
                   help="pretrained MVSNet torch checkpoint "
                        "(checkpoints/MVSNet/model_000014.ckpt) for mode 0")
    p.add_argument("--max-groups", type=int, default=0,
                   help="cap on MVS view triplets in mode 0 (0 = all)")
    p.add_argument("--mvs-conf-thresh", type=float, default=0.8)
    p.add_argument("--mvs-num-depths", type=int, default=96)
    p.add_argument("--test-freq", type=int, default=10_000)
    p.add_argument("--save-freq", type=int, default=10_000)
    p.add_argument("--print-freq", type=int, default=40)
    p.add_argument("--prob-freq", type=int, default=None)
    p.add_argument("--prob-frames", type=int, default=0,
                   help="frames probed per grow event (0 = preset's "
                        "len(dataset)/prob_num_step rule)")
    p.add_argument("--prune-iter", type=int, default=None,
                   help="override ProbeConfig.prune_iter (steps between "
                        "conf-threshold prunes; -1 disables)")
    p.add_argument("--prune-thresh", type=float, default=None)
    p.add_argument("--lr-decay-iters", type=int, default=None,
                   help="override OptimConfig.lr_decay_iters (scale the "
                        "reference's 200k-step decay profile onto shorter "
                        "budget runs)")
    p.add_argument("--test-num", type=int, default=10)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train-mode", choices=("per-scene", "ff"),
                   default="per-scene",
                   help="'ff': feed-forward training — the MVS nets "
                        "regenerate the point cloud per batch and train "
                        "under the third Adam group at mvs_lr (reference "
                        "manual_depth_view=-1 mode, "
                        "mvs_points_volumetric_model.py:49-152)")
    p.add_argument("--native-prefetch", type=int, default=0,
                   help="worker threads for the C++ batch-assembly pipeline "
                        "(0 = python sampling)")
    p.add_argument("--frames-per-step", type=int, default=1,
                   help=">1 vmaps several frames' ray batches into one "
                        "optimizer step (larger effective batch)")
    p.add_argument("--num-points", type=int, default=None,
                   help="override PointsConfig.num_points (point-table "
                        "capacity; raise it for prune-disabled lifecycle "
                        "runs where growth is cumulative)")
    p.add_argument("--bootstrap-cap", type=int, default=0,
                   help="cap the bootstrap cloud at this size instead of "
                        "num_points (0 = num_points) — keeps the base cloud "
                        "identical across runs that differ only in capacity "
                        "headroom")
    p.add_argument("--drop-box", type=float, nargs=6, default=None,
                   metavar=("X0", "Y0", "Z0", "X1", "Y1", "Z1"),
                   help="delete bootstrap points inside this world AABB — "
                        "creates a deliberate hole so the probe/grow "
                        "lifecycle has something to repair (lifecycle "
                        "evidence runs, VERDICT r3 #2)")
    p.add_argument("--blur-mode", default="preset",
                   choices=("preset", "off", "bank", "learnable"),
                   help="override the preset's blur simulation (the A/B/C "
                        "axis the reference dev_scripts vary)")
    p.add_argument("--frame-weight", type=int, default=-1,
                   choices=(-1, 0, 1),
                   help="override quality-aware frame weights "
                        "(-1 preset, 0 off, 1 on)")
    p.add_argument("--pyramid-dtype", default=None,
                   choices=("float32", "bfloat16"),
                   help="override agg.pyramid_dtype (bf16 end-to-end "
                        "image-pyramid chain)")
    p.add_argument("--shading-dtype", default=None,
                   choices=("float32", "bfloat16"),
                   help="override agg.shading_dtype (bf16 end-to-end "
                        "per-neighbor shading chain)")
    return p


def bootstrap_points(args, dataset, cfg, key=None):
    """Initial point cloud (run/train_ft.py:679-778).

    Returns (xyz [M, 3], attrs dict or None).  Mode 0 is the feed-forward MVS
    bootstrap (gen_points_filter_embeddings, run/train_ft.py:60-197): MVSNet
    depth per view triplet (pretrained weights via --mvs-ckpt), cross-group
    geometric filtering, optional alpha-matte visual hull, voxel downsample,
    and per-point embedding/color/dir/conf from query_embedding."""
    from hybridneuralrendering_tpu.data.point_init import (
        voxel_downsample_closest)
    attrs = None
    if args.load_points == 1:
        xyz = dataset.load_init_points()
    elif args.load_points == 2:
        xyz = dataset.load_init_depth_points()
    else:
        import jax

        from hybridneuralrendering_tpu.mvs import point_gen
        from hybridneuralrendering_tpu.train import bootstrap as bs
        key = key if key is not None else jax.random.PRNGKey(args.seed)
        mvs_params = point_gen.init(key, cfg.points.feature_dim)
        if args.mvs_ckpt:
            from hybridneuralrendering_tpu.io import torch_import as TI
            sd = TI.load_torch_state_dict(args.mvs_ckpt)
            mvs_params = mvs_params._replace(mvsnet=TI.import_mvsnet(sd))
        groups = bs.groups_from_dataset(dataset, max_groups=args.max_groups)
        is_scannet = hasattr(dataset, "train_id_list")

        def img_of(i):
            if is_scannet:
                return dataset.image(dataset.train_id_list[i])
            return dataset.train_image(int(i))

        def c2w_of(i):
            if is_scannet:
                return dataset._pose(dataset.train_id_list[i])
            return dataset.c2w(int(i), dataset.train_meta)

        images_by_group, w2cs_by_group = [], []
        for g in groups:
            images_by_group.append(np.stack([img_of(i) for i in g]))
            w2cs_by_group.append(np.stack(
                [np.linalg.inv(c2w_of(i)) for i in g]).astype(np.float32))
        alphas = alpha_w2cs = None
        if hasattr(dataset, "train_alpha"):
            vids = sorted({int(i) for g in groups for i in g})
            alphas = np.stack([dataset.train_alpha(i) for i in vids])
            alpha_w2cs = np.stack(
                [np.linalg.inv(c2w_of(i)) for i in vids]).astype(np.float32)
        xyz, attrs = bs.bootstrap_from_groups(
            mvs_params, images_by_group, dataset.intrinsic, w2cs_by_group,
            cfg.render.near_plane, cfg.render.far_plane, cfg,
            conf_thresh=args.mvs_conf_thresh, vox_res=args.vox_res,
            num_depths=args.mvs_num_depths,
            alphas=alphas, alpha_w2cs=alpha_w2cs)
        return xyz, attrs
    if args.vox_res > 0:
        xyz, _ = voxel_downsample_closest(xyz, args.vox_res)
    cap = args.bootstrap_cap or cfg.points.num_points
    if len(xyz) > cap:
        keep = np.random.default_rng(args.seed).choice(
            len(xyz), cap, replace=False)
        xyz = xyz[keep]
    return xyz, attrs


def evaluate(params, points, grid, test_ds, cfg, vis, step, num_frames):
    from hybridneuralrendering_tpu.data import sampling
    from hybridneuralrendering_tpu.train import step as step_mod
    from hybridneuralrendering_tpu.utils import metrics as M

    H, W = test_ds.height, test_ds.width
    chunk = cfg.sampling.eval_rays
    psnrs = []
    stride = max(len(test_ds) // max(num_frames, 1), 1)
    for fi in list(range(0, len(test_ds), stride))[:num_frames]:
        pix = sampling.full_image_grid(H, W)
        chunks, n_valid = sampling.chunk_pixels(pix, chunk)
        img = np.zeros((H * W, 3), np.float32)
        done = 0
        for ci in range(chunks.shape[0]):
            batch = test_ds.get_batch(fi, pixelcoords=chunks[ci][:, None, :])
            batch = step_mod.maybe_add_bg_ray(batch, points, cfg)
            batch = step_mod.device_batch(batch)
            out = step_mod.eval_step(params, points, grid, batch, cfg)
            take = min(chunk, n_valid - done)
            img[done:done + take] = np.asarray(
                out["coarse_raycolor"])[:take]
            done += take
        img = img.reshape(H, W, 3)
        gt = test_ds.image(test_ds.id_list[fi])
        psnrs.append(M.psnr(img, gt))
        vis.save_image(img, step, f"test{fi:03d}-coarse_raycolor")
    mean_psnr = float(np.mean(psnrs))
    vis.log(f"eval step {step}: PSNR {mean_psnr:.3f} over {len(psnrs)} frames")
    vis.add_scalar(step, "eval_psnr", mean_psnr)
    return mean_psnr


def train_ff(args, cfg, train_ds, vis, ckpt_dir):
    """Feed-forward training loop: every step regenerates the point cloud
    from a random view triplet through the MVS nets and renders a ray batch
    of the triplet's reference view (reference feed-forward mode,
    mvs_points_volumetric_model.py:49-152; exposed per VERDICT r2 #8)."""
    import jax
    import jax.numpy as jnp

    from hybridneuralrendering_tpu.mvs import point_gen
    from hybridneuralrendering_tpu.ops import voxel_grid as VG
    from hybridneuralrendering_tpu.models import renderer
    from hybridneuralrendering_tpu.train import bootstrap as bs
    from hybridneuralrendering_tpu.train import step_ff

    key = jax.random.PRNGKey(args.seed)
    rng = np.random.default_rng(args.seed)
    learned = args.mvs_ckpt is None     # no pretrained MVSNet -> ProbNet mode
    mvs_params = point_gen.init(key, cfg.points.feature_dim,
                                use_mvsnet=not learned, use_probnet=learned)
    if args.mvs_ckpt:
        from hybridneuralrendering_tpu.io import torch_import as TI
        sd = TI.load_torch_state_dict(args.mvs_ckpt)
        mvs_params = mvs_params._replace(mvsnet=TI.import_mvsnet(sd))
    params = renderer.init_params(jax.random.fold_in(key, 1), cfg)
    ffs = step_ff.create_ff_state(params, mvs_params, cfg)

    # grid geometry pinned to the configured world ranges (the per-batch
    # cloud moves; the dense tables must not change shape under jit)
    r = np.asarray(cfg.querier.ranges, np.float32)
    corners = np.stack([r[:3], r[3:]])
    geom = VG.compute_grid_geometry(corners, np.ones(2, bool), cfg.querier)

    groups = bs.groups_from_dataset(train_ds, max_groups=args.max_groups)
    is_scannet = hasattr(train_ds, "train_id_list")

    def img_of(i):
        return (train_ds.image(train_ds.train_id_list[i]) if is_scannet
                else train_ds.train_image(int(i)))

    def c2w_of(i):
        return (train_ds._pose(train_ds.train_id_list[i]) if is_scannet
                else train_ds.c2w(int(i), train_ds.train_meta))

    group_cache = {}

    def group_arrays(gi):
        if gi not in group_cache:
            g = groups[gi]
            group_cache[gi] = {
                "images": jnp.asarray(np.stack([img_of(i) for i in g])),
                "w2cs": jnp.asarray(np.stack(
                    [np.linalg.inv(c2w_of(i)) for i in g]).astype(np.float32)),
                "intrinsic": jnp.asarray(train_ds.intrinsic),
            }
        return group_cache[gi]

    max_steps = args.max_steps or cfg.optim.maximum_step
    vis.log(f"feed-forward training: {max_steps} steps over "
            f"{len(groups)} view groups ({'ProbNet' if learned else 'MVSNet'}"
            f" depth)")
    t0 = time.time()
    step = int(ffs.step)
    ray_keys = ("campos", "camrotc2w", "raydir", "gt_image", "bg_color")
    while step < max_steps:
        gi = int(rng.integers(len(groups)))
        b = train_ds.get_batch(int(groups[gi][0]), rng)
        ray_batch = {k: b[k] for k in ray_keys if k in b}
        import jax as _jax
        ffs, items = step_ff.train_step_ff(
            ffs, group_arrays(gi), ray_batch, geom,
            _jax.random.fold_in(key, step), cfg,
            num_depths=args.mvs_num_depths, learned=learned,
            conf_thresh=0.0 if learned else args.mvs_conf_thresh)
        step = int(ffs.step)
        if step % args.print_freq == 0:
            vis.accumulate_losses({k: float(v) for k, v in items.items()
                                   if k.startswith("loss")})
            sps = step / max(time.time() - t0, 1e-9)
            vis.print_losses(step, extra=f"steps/s={sps:.2f} "
                             f"pts={int(items['num_points'])}")
        if (args.save_freq > 0 and step % args.save_freq == 0) \
                or step >= max_steps:
            step_ff.save_ff_checkpoint(ckpt_dir, ffs)
    vis.log(f"done: {max_steps} feed-forward steps")


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from hybridneuralrendering_tpu.utils import compile_cache
    compile_cache.enable()

    from hybridneuralrendering_tpu import config as C
    from hybridneuralrendering_tpu.models import blur as blur_mod
    from hybridneuralrendering_tpu.models import neural_points as npts
    from hybridneuralrendering_tpu.models import renderer
    from hybridneuralrendering_tpu.ops import voxel_grid as VG
    from hybridneuralrendering_tpu.train import checkpoint as ckpt_mod
    from hybridneuralrendering_tpu.train import lifecycle
    from hybridneuralrendering_tpu.train import state as state_mod
    from hybridneuralrendering_tpu.train import step as step_mod
    from hybridneuralrendering_tpu.utils.visualizer import Visualizer

    try:
        cfg = C.PRESETS[args.preset](args.scan)
    except TypeError:
        cfg = C.PRESETS[args.preset]()
    cfg = C.apply_blur_overrides(cfg, args.blur_mode, args.frame_weight)
    if args.prune_iter is not None or args.prune_thresh is not None:
        import dataclasses
        pr = cfg.probe
        if args.prune_iter is not None:
            pr = dataclasses.replace(pr, prune_iter=args.prune_iter)
        if args.prune_thresh is not None:
            pr = dataclasses.replace(pr, prune_thresh=args.prune_thresh)
        cfg = cfg.replace(probe=pr)
    if args.lr_decay_iters is not None:
        import dataclasses
        cfg = cfg.replace(optim=dataclasses.replace(
            cfg.optim, lr_decay_iters=args.lr_decay_iters))
    if args.pyramid_dtype is not None:
        import dataclasses
        cfg = cfg.replace(agg=dataclasses.replace(
            cfg.agg, pyramid_dtype=args.pyramid_dtype))
    if args.shading_dtype is not None:
        import dataclasses
        cfg = cfg.replace(agg=dataclasses.replace(
            cfg.agg, shading_dtype=args.shading_dtype))
    if args.num_points is not None:
        import dataclasses
        cfg = cfg.replace(points=dataclasses.replace(
            cfg.points, num_points=args.num_points))
    name = args.name or cfg.name
    vis = Visualizer(args.checkpoints_dir, name)
    ckpt_dir = os.path.join(args.checkpoints_dir, name, "ckpt")
    # run-config snapshot: cli/test.py restores eval-relevant fields from it
    # so a checkpoint trained under explicit dtype/blur overrides evaluates
    # under the same settings without the user re-passing every flag
    import json
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(ckpt_dir, "run_config.json"), "w") as f:
        json.dump({
            "preset": args.preset,
            "pyramid_dtype": cfg.agg.pyramid_dtype,
            "shading_dtype": cfg.agg.shading_dtype,
            "blur_mode": args.blur_mode,
            "num_points": cfg.points.num_points,
            "seed": args.seed,
        }, f, indent=1)

    if args.preset.startswith(("nerf", "fixture_nerf")):
        from hybridneuralrendering_tpu.data.nerf_synth import NerfSynthScene
        train_ds = NerfSynthScene(args.data_root, args.scan, cfg, "train")
        test_ds = NerfSynthScene(args.data_root, args.scan, cfg, "test")
    else:
        from hybridneuralrendering_tpu.data.scannet import ScannetScene
        train_ds = ScannetScene(args.data_root, args.scan, cfg, "train")
        test_ds = ScannetScene(args.data_root, args.scan, cfg, "test")

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)

    if args.train_mode == "ff":
        return train_ff(args, cfg, train_ds, vis, ckpt_dir)

    vis.log(f"bootstrapping points (mode {args.load_points})...")
    xyz, attrs = bootstrap_points(args, train_ds, cfg, key)
    vis.log(f"init cloud: {len(xyz)} points")
    if args.drop_box is not None:
        lo, hi = np.asarray(args.drop_box[:3]), np.asarray(args.drop_box[3:])
        inside = np.all((xyz >= lo) & (xyz <= hi), axis=1)
        xyz = xyz[~inside]
        if attrs is not None:
            attrs = {k: v[~inside] for k, v in attrs.items()}
        vis.log(f"drop-box removed {int(inside.sum())} points "
                f"(hole for lifecycle runs; {len(xyz)} remain)")
    if attrs is not None and len(xyz) > cfg.points.num_points:
        keep = rng.choice(len(xyz), cfg.points.num_points, replace=False)
        xyz = xyz[keep]
        attrs = {k: v[keep] for k, v in attrs.items()}
    points = npts.init_from_arrays(
        xyz, cfg.points, key=key,
        **({} if attrs is None else dict(
            embedding=attrs["embedding"], conf=attrs["conf"],
            color=attrs["color"], dirs=attrs["dirs"])))
    geom = VG.compute_grid_geometry(xyz, np.ones(len(xyz), bool), cfg.querier)
    grid = VG.build_grid_jit(points.xyz, points.mask, geom, cfg.querier)
    if grid.num_nodes is not None and \
            int(grid.num_nodes) >= cfg.querier.max_nodes:
        raise ValueError(
            f"supervoxel node table full ({int(grid.num_nodes)} >= "
            f"max_nodes={cfg.querier.max_nodes}): raise QuerierConfig."
            f"max_nodes or disable supervoxel")

    params = renderer.init_params(key, cfg)
    ts = state_mod.create_train_state(params, points, cfg)
    best_psnr = 0.0
    if args.resume:
        latest = ckpt_mod.latest_checkpoint(ckpt_dir)
        if latest:
            ts, best_psnr = ckpt_mod.load_checkpoint(latest, ts)
            geom = VG.compute_grid_geometry(
                np.asarray(ts.points.xyz), np.asarray(ts.points.mask),
                cfg.querier)
            grid = VG.build_grid_jit(ts.points.xyz, ts.points.mask, geom,
                                 cfg.querier)
            vis.log(f"resumed from {latest} at step {int(ts.step)}")

    kernels = jnp.asarray(blur_mod.generate_kernel_bank(cfg.blur))
    tracker = lifecycle.RayMissTracker()
    max_steps = args.max_steps or cfg.optim.maximum_step
    prob_freq = args.prob_freq or cfg.probe.prob_freq
    # the tracker's per-step miss-loss fetch is a device sync; it only pays
    # for itself when probing selects frames by miss-loss rank (prob_top=1)
    # AND the probe doesn't already visit every training frame
    use_tracker = (prob_freq > 0 and cfg.probe.prob_top == 1
                   and (args.prob_frames or 0) < len(train_ds))

    # image-pyramid cache: cached steps reuse per-view CNN stage maps; the
    # CNN trains (and the cache refreshes) in bursts — OptimConfig schedule
    pyr_cache = None
    if cfg.optim.pyramid_cache and cfg.agg.use_nearest > 0:
        from hybridneuralrendering_tpu.train.pyramid_cache import PyramidCache
        pyr_cache = PyramidCache(cfg)
        vis.log(f"pyramid cache on: burst {cfg.optim.pyramid_burst_steps}/"
                f"{cfg.optim.pyramid_cycle_steps} steps")

    def in_burst(s: int) -> bool:
        if pyr_cache is None:
            return True
        return (s % cfg.optim.pyramid_cycle_steps) < cfg.optim.pyramid_burst_steps

    # device-resident view bank: each training view's RGB uploads ONCE and
    # the per-step nearest-view stack assembles on device — without this the
    # trainer re-uploads ~4 full images every step (the dominant cost when
    # the chip sits behind the axon tunnel)
    view_bank = {}

    def device_views(b):
        nvids = b.get("nearest_vids")
        if nvids is None or "images_nearest" not in b:
            return
        stack = []
        for i, v in enumerate(nvids):
            v = int(v)
            if v not in view_bank:
                view_bank[v] = jnp.asarray(b["images_nearest"][i])
            stack.append(view_bank[v])
        b["images_nearest"] = jnp.stack(stack)

    def staged_features(b):
        """Cached (images, stages) for one frame's nearest-view stack."""
        nvids = b.get("nearest_vids")
        if pyr_cache is None or nvids is None:
            return None
        stages = pyr_cache.get_stack(ts.params, b["images_nearest"], nvids)
        return (jnp.asarray(b["images_nearest"]), stages)

    vis.log(f"training {name}: {max_steps} steps, "
            f"{cfg.sampling.rays_per_batch} rays/step, "
            f"{int(ts.points.num_live)} live points")
    t_start = time.time()
    step = int(ts.step)
    # optional native batch-assembly prefetch (C++ thread pool overlaps the
    # host-side sampling/gather/raydir work with the device step)
    native_pipe = None
    if args.native_prefetch > 0 and cfg.sampling.random_sample == "dilated":
        from hybridneuralrendering_tpu.data import native_sampler as NS
        if NS.load() is not None:
            native_pipe = NS.PrefetchPipeline(args.native_prefetch)
            vis.log(f"native prefetch on ({args.native_prefetch} workers)")

    def next_batch(step_seed):
        fi = int(rng.integers(len(train_ds)))
        if native_pipe is None:
            b = train_ds.get_batch(fi, rng)
            return fi, b
        # native path: pixel sampling + gt gather + ray dirs off the GIL;
        # the python loader still supplies poses and the nearest-view stack
        vid_f = train_ds.id_list[fi]
        c2w = train_ds._pose(vid_f)
        img = train_ds.image(vid_f)
        s = cfg.sampling
        native_pipe.submit(img, s.edge_filter, s.dilation_patch_num,
                           s.dilation_patch_size, s.dilation_min,
                           s.dilation_max, train_ds.intrinsic, c2w[:3, :3],
                           step_seed)
        _, xy, rgb, dirs = native_pipe.pop()
        b = train_ds.get_batch(fi, rng, pixelcoords=xy.reshape(
            s.random_sample_size, s.random_sample_size, 2))
        b["raydir"], b["gt_image"] = dirs, rgb
        return fi, b

    def log_box_live(s):
        """Hole-closure instrumentation: live points inside the drop box
        (the carved region) after each lifecycle event — the geometric
        closure signal VERDICT r4 #1 asks for."""
        if args.drop_box is None:
            return
        from hybridneuralrendering_tpu.parallel.distributed import \
            host_local_array
        xyz_h = host_local_array(ts.points.xyz)
        mask_h = host_local_array(ts.points.mask)
        lo = np.asarray(args.drop_box[:3])
        hi = np.asarray(args.drop_box[3:])
        n_in = int((mask_h & np.all((xyz_h >= lo) & (xyz_h <= hi),
                                    axis=1)).sum())
        vis.add_scalar(s, "box_live", n_in)
        vis.log(f"  drop-box live points: {n_in}")

    was_burst = True
    while step < max_steps:
        burst = in_burst(step)
        if pyr_cache is not None and burst and not was_burst:
            pyr_cache.invalidate()      # CNN params about to change
        was_burst = burst
        use_cache = pyr_cache is not None and not burst
        if args.frames_per_step > 1:
            frames, staged_list = [], []
            fi = 0
            for _ in range(args.frames_per_step):
                fi, b = next_batch(step)
                device_views(b)
                if use_cache:
                    staged_list.append(staged_features(b))
                frames.append(step_mod.device_batch(b))
            batches = step_mod.stack_batches(frames)
            staged = None
            if use_cache and all(s is not None for s in staged_list):
                staged = (
                    jnp.stack([s[0] for s in staged_list]),
                    tuple(jnp.stack([s[1][j] for s in staged_list])
                          for j in range(3)))
            ts, items = step_mod.train_step_multi(
                ts, grid, batches, jax.random.fold_in(key, step), kernels,
                cfg, staged)
        else:
            fi, batch = next_batch(step)
            device_views(batch)
            staged = staged_features(batch) if use_cache else None
            batch = step_mod.maybe_add_bg_ray(batch, ts.points, cfg)
            batch = step_mod.device_batch(batch)
            ts, items = step_mod.train_step(
                ts, grid, batch, jax.random.fold_in(key, step), kernels, cfg,
                staged)
        # host-side step counter: int(ts.step) would force a device sync
        # every iteration (tunnel roundtrip), serializing the async dispatch
        step += 1

        if use_tracker and "loss_ray_miss_coarse_raycolor" in items:
            # the miss-loss fetch syncs the device each step; only pay it
            # when probing actually consumes the tracker ranking
            tracker.update(fi, float(items["loss_ray_miss_coarse_raycolor"]))

        if step % args.print_freq == 0:
            vis.accumulate_losses(
                {k: float(v) for k, v in items.items() if k.startswith("loss")})
            sps = step / max(time.time() - t_start, 1e-9)
            vis.print_losses(step, extra=f"steps/s={sps:.2f}")

        if args.test_freq > 0 and step % args.test_freq == 0:
            mean_psnr = evaluate(ts.params, ts.points, grid, test_ds, cfg,
                                 vis, step, args.test_num)
            if mean_psnr > best_psnr:
                best_psnr = mean_psnr
                ckpt_mod.save_checkpoint(ckpt_dir, ts, best_psnr)

        if args.save_freq > 0 and step % args.save_freq == 0:
            ckpt_mod.save_checkpoint(ckpt_dir, ts, best_psnr)

        if (cfg.probe.prune_iter > 0 and step % cfg.probe.prune_iter == 0
                and step <= cfg.probe.prune_max_iter and step < max_steps):
            # conf-threshold prune (run/train_ft.py:868-872; no optimizer
            # reset — the reference prunes in-place mid-run)
            before = int(ts.points.num_live)
            pts, grid = lifecycle.prune_and_rebuild(ts.points, cfg)
            ts = ts._replace(points=pts)
            vis.log(f"pruned {before - int(pts.num_live)} points at "
                    f"step {step} (live: {int(pts.num_live)})")
            vis.add_scalar(step, "pruned_points", before - int(pts.num_live))
            vis.add_scalar(step, "num_points", int(pts.num_live))
            log_box_live(step)

        if prob_freq > 0 and step % prob_freq == 0 and step < max_steps:
            # per-tier probe schedule (run/train_ft.py:878-903): tier from
            # the step count; probing stops once past the last tier
            tier = int(np.sum(np.asarray(cfg.probe.prob_tiers) < step))
            n_tiers = len(cfg.probe.prob_kernel_size) // 3
            top = tracker.top_ids()
            gate = (not use_tracker or len(top) > 0
                    or cfg.probe.prob_top != 1 or cfg.probe.far_thresh > 0)
            if tier < n_tiers and gate:
                qs = tuple(cfg.probe.prob_kernel_size[tier * 3: tier * 3 + 3])
                vis.log(f"probe-and-grow at step {step} "
                        f"(tier {tier}, query_size {qs})...")
                new_points, new_grid, n_added = lifecycle.probe_and_grow(
                    ts.params, ts.points, grid, train_ds, cfg,
                    tracker if use_tracker else None,
                    max_frames=args.prob_frames or None,
                    rng=rng, query_size_override=qs)
                if n_added > 0:
                    ts = ts._replace(points=new_points)
                    ts = state_mod.reset_optimizers(ts, cfg)
                    grid = new_grid
                    vis.log(f"grew {n_added} points "
                            f"(live: {int(ts.points.num_live)})")
                    vis.add_scalar(step, "grown_points", n_added)
                    vis.add_scalar(step, "num_points",
                                   int(ts.points.num_live))
                    log_box_live(step)

    ckpt_mod.save_checkpoint(ckpt_dir, ts, best_psnr)
    vis.log(f"done: {max_steps} steps, best PSNR {best_psnr:.3f}")


if __name__ == "__main__":
    main()
