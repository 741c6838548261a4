"""End-to-end integration: fake ScanNet export on disk -> dataset -> training.

Builds a miniature scene in the reference's exported layout
(color/pose/depth/intrinsic), then runs the real dataset loader, point
bootstrap from sensor depth, and a few optimization steps — the full L5->L0
stack on CPU.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridneuralrendering_tpu import config as C


@pytest.fixture(scope="module")
def fake_scannet(tmp_path_factory):
    root = tmp_path_factory.mktemp("scans")
    scan = "scene_test"
    base = root / scan / "exported"
    for sub in ("color", "pose", "depth", "intrinsic"):
        os.makedirs(base / sub, exist_ok=True)

    H, W = 48, 64
    intr = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    np.savetxt(base / "intrinsic/intrinsic_color.txt",
               np.block([[intr, np.zeros((3, 1))], [np.zeros((1, 3)), 1]]))
    np.savetxt(base / "intrinsic/intrinsic_depth.txt",
               np.block([[intr, np.zeros((3, 1))], [np.zeros((1, 3)), 1]]))

    from PIL import Image
    import imageio.v2 as imageio
    rng = np.random.default_rng(0)
    n_frames = 12
    for i in range(n_frames):
        # camera slides along x, looking down +z at a textured wall at z=2
        c2w = np.eye(4)
        c2w[0, 3] = 0.05 * i
        np.savetxt(base / f"pose/{i}.txt", c2w)
        img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
        Image.fromarray(img).save(base / f"color/{i}.jpg")
        depth_mm = np.full((H, W), 2000, np.uint16)  # 2 m
        imageio.imwrite(base / f"depth/{i}.png", depth_mm)
    return str(root), scan


def small_cfg():
    return C.Config(
        name="itest",
        querier=C.QuerierConfig(
            vsize=(0.05, 0.05, 0.05), vscale=(2, 2, 2), SR=6, K=4, P=8,
            max_o=20000, z_depth_dim=48, grid_capacity=600_000,
            ranges=(-4.0, -4.0, -4.0, 4.0, 4.0, 4.0),
            Ps=32, max_nodes=120_000),
        points=C.PointsConfig(num_points=5000, feature_dim=8),
        agg=C.AggregatorConfig(point_features_dim=8, shading_feature_num=128,
                               use_nearest=2, num_feat_freqs=2,
                               dist_xyz_freq=2, drop_ratio=0.5),
        render=C.RenderConfig(near_plane=0.5, far_plane=4.0),
        sampling=C.SamplingConfig(random_sample="dilated",
                                  random_sample_size=8, dilation_patch_num=2,
                                  dilation_patch_size=4, edge_filter=2,
                                  dilation_max=3),
        blur=C.BlurConfig(add_blur_sim=True, blur_kernel_size=5,
                          move_dists=(1,), num_move_dirs=4),
        loss=C.LossConfig(use_frame_weight=True),
        image_hw=(48, 64),
    )


class TestScannetPipeline:
    def test_dataset_loads(self, fake_scannet):
        from hybridneuralrendering_tpu.data.scannet import ScannetScene
        root, scan = fake_scannet
        cfg = small_cfg()
        ds = ScannetScene(root, scan, cfg, "train")
        assert len(ds.train_id_list) == 3   # every 5th of 12 frames
        assert len(ds) == 3
        batch = ds.get_batch(0, np.random.default_rng(0))
        R = cfg.sampling.rays_per_batch
        assert batch["raydir"].shape == (R, 3)
        assert batch["gt_image"].shape == (R, 3)
        assert batch["images_nearest"].shape[0] == 2
        assert "frame_weight" in batch

    def test_depth_bootstrap_and_train(self, fake_scannet):
        from hybridneuralrendering_tpu.data.scannet import ScannetScene
        from hybridneuralrendering_tpu.models import blur as blur_mod
        from hybridneuralrendering_tpu.models import neural_points as npts
        from hybridneuralrendering_tpu.models import renderer
        from hybridneuralrendering_tpu.ops import voxel_grid as VG
        from hybridneuralrendering_tpu.train import state as state_mod
        from hybridneuralrendering_tpu.train import step as step_mod

        root, scan = fake_scannet
        cfg = small_cfg()
        ds = ScannetScene(root, scan, cfg, "train")
        xyz = ds.load_init_depth_points(vox_res=64, frame_stride=4)
        assert len(xyz) > 50
        # wall at z = 2 m
        np.testing.assert_allclose(xyz[:, 2].mean(), 2.0, atol=0.1)

        if len(xyz) > cfg.points.num_points:
            xyz = xyz[:: len(xyz) // cfg.points.num_points + 1]
        points = npts.init_from_arrays(xyz, cfg.points,
                                       key=jax.random.PRNGKey(0))
        geom = VG.compute_grid_geometry(xyz, np.ones(len(xyz), bool),
                                        cfg.querier)
        grid = VG.build_grid(points.xyz, points.mask, geom, cfg.querier)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        ts = state_mod.create_train_state(params, points, cfg)
        kernels = jnp.asarray(blur_mod.generate_kernel_bank(cfg.blur))
        rng = np.random.default_rng(0)
        losses = []
        for i in range(3):
            batch = ds.get_batch(int(rng.integers(len(ds))), rng)
            batch.pop("vid")
            ts, items = step_mod.train_step(
                ts, grid, batch, jax.random.PRNGKey(i), kernels, cfg)
            losses.append(float(items["loss_total"]))
        assert all(np.isfinite(losses)), losses

    def test_checkpoint_roundtrip(self, fake_scannet, tmp_path):
        from hybridneuralrendering_tpu.models import neural_points as npts
        from hybridneuralrendering_tpu.models import renderer
        from hybridneuralrendering_tpu.train import checkpoint as ckpt_mod
        from hybridneuralrendering_tpu.train import state as state_mod

        cfg = small_cfg()
        xyz = np.random.default_rng(0).uniform(-1, 1, (100, 3)).astype(
            np.float32)
        points = npts.init_from_arrays(xyz, cfg.points)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        ts = state_mod.create_train_state(params, points, cfg)
        ts = ts._replace(step=jnp.asarray(123, jnp.int32))
        path = ckpt_mod.save_checkpoint(str(tmp_path), ts, best_psnr=31.5)
        assert ckpt_mod.latest_checkpoint(str(tmp_path)) == path

        tmpl = state_mod.create_train_state(
            renderer.init_params(jax.random.PRNGKey(1), cfg),
            npts.init_from_arrays(np.zeros((1, 3), np.float32), cfg.points),
            cfg)
        back, best = ckpt_mod.load_checkpoint(path, tmpl)
        assert int(back.step) == 123
        assert best == 31.5
        np.testing.assert_allclose(np.asarray(back.points.xyz),
                                   np.asarray(ts.points.xyz))
        for a, b in zip(jax.tree_util.tree_leaves(back.params),
                        jax.tree_util.tree_leaves(ts.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.fixture(scope="module")
def fake_blender(tmp_path_factory):
    """Miniature NeRF-synthetic scene in the Blender transforms layout."""
    import json
    from PIL import Image
    root = tmp_path_factory.mktemp("nerf")
    scan = "minilego"
    base = root / scan
    os.makedirs(base / "train", exist_ok=True)
    os.makedirs(base / "test", exist_ok=True)
    rng = np.random.default_rng(0)
    H = W = 40

    def pose(theta):
        from hybridneuralrendering_tpu.data.nerf_synth import pose_spherical
        return pose_spherical(theta, -30.0, 3.0)

    for split, n in (("train", 6), ("test", 2)):
        frames = []
        for i in range(n):
            img = np.zeros((H, W, 4), np.uint8)
            img[10:30, 10:30] = [*rng.integers(50, 255, 3), 255]
            name = f"{split}/r_{i}"
            Image.fromarray(img).save(base / f"{name}.png")
            # pose_spherical is already Blender-convention (-z forward); the
            # loader applies BLENDER2OPENCV on read
            frames.append({"file_path": name,
                           "transform_matrix": pose(360.0 * i / n).tolist()})
        meta = {"camera_angle_x": 0.69, "frames": frames}
        with open(base / f"transforms_{split}.json", "w") as f:
            json.dump(meta, f)
    return str(root), scan


def nerf_cfg():
    cfg = small_cfg()
    return cfg.replace(image_hw=(40, 40),
                       render=C.RenderConfig(near_plane=1.0, far_plane=5.0,
                                             bg_color=(1.0, 1.0, 1.0)))


class TestNerfSynthPipeline:
    def test_dataset_and_render(self, fake_blender):
        from hybridneuralrendering_tpu.data.nerf_synth import NerfSynthScene
        root, scan = fake_blender
        cfg = nerf_cfg()
        train_ds = NerfSynthScene(root, scan, cfg, "train")
        test_ds = NerfSynthScene(root, scan, cfg, "test")
        assert len(train_ds) == 6 and len(test_ds) == 2
        b = train_ds.get_batch(0, np.random.default_rng(0))
        R = cfg.sampling.rays_per_batch
        assert b["raydir"].shape == (R, 3)
        assert b["images_nearest"].shape[0] == cfg.agg.use_nearest
        # rays look roughly toward the origin (object-centric rig)
        campos = np.asarray(b["campos"])
        to_origin = -campos / np.linalg.norm(campos)
        mean_dir = np.asarray(b["raydir"]).mean(0)
        mean_dir /= np.linalg.norm(mean_dir)
        assert float(mean_dir @ to_origin) > 0.8

    def test_render_path_poses(self, fake_blender):
        from hybridneuralrendering_tpu.data.nerf_synth import NerfSynthScene
        root, scan = fake_blender
        ds = NerfSynthScene(root, scan, nerf_cfg(), "test")
        poses = ds.render_path(n=8, radius=3.0)
        assert len(poses) == 8
        for p in poses:
            np.testing.assert_allclose(np.linalg.norm(p[:3, 3]), 3.0,
                                       rtol=1e-5)
            # +z column looks toward the origin (OpenCV convention)
            fwd = p[:3, 2]
            assert float(fwd @ (-p[:3, 3] / 3.0)) > 0.5


class TestFeedForwardBootstrap:
    def test_mode0_with_imported_weights(self, fake_blender, tmp_path):
        """Feed-forward MVS bootstrap end-to-end (run/train_ft.py:60-197):
        pretrained-format MVSNet checkpoint -> import -> depth -> cross-group
        filter -> alpha visual hull -> voxel downsample -> embeddings."""
        torch = pytest.importorskip("torch")
        import sys
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        try:
            from models.depth_estimators.mvsnet import MVSNet as TorchMVSNet
        except Exception:
            pytest.skip("reference MVSNet unavailable")
        net = TorchMVSNet(refine=False).eval()
        ckpt = tmp_path / "model_000014.ckpt"
        torch.save({"model": {"module." + k: v
                              for k, v in net.state_dict().items()}}, ckpt)

        from argparse import Namespace

        from hybridneuralrendering_tpu.cli.train import bootstrap_points
        from hybridneuralrendering_tpu.data.nerf_synth import NerfSynthScene
        root, scan = fake_blender
        cfg = nerf_cfg()
        ds = NerfSynthScene(root, scan, cfg, "train")
        args = Namespace(load_points=0, vox_res=100, seed=0,
                         mvs_ckpt=str(ckpt), max_groups=2,
                         mvs_conf_thresh=0.0, mvs_num_depths=16)
        xyz, attrs = bootstrap_points(args, ds, cfg,
                                      key=jax.random.PRNGKey(0))
        assert len(xyz) > 0
        assert np.isfinite(xyz).all()
        F = cfg.points.feature_dim
        assert attrs["embedding"].shape == (len(xyz), F)
        assert attrs["color"].shape == (len(xyz), 3)
        assert attrs["dirs"].shape == (len(xyz), 3)
        assert attrs["conf"].shape == (len(xyz), 1)
        assert np.isfinite(attrs["embedding"]).all()
        # visual hull: surviving points project inside the object's alpha
        # matte for every view it was checked against -> points cluster near
        # the origin (the fake object is centered)
        assert np.linalg.norm(xyz, axis=-1).mean() < 3.0


class TestFrameWeightsTool:
    def test_cli_writes_npy_with_raft(self, fake_scannet, tmp_path):
        """cli/frame_weights end-to-end: fixture scene + imported RAFT
        weights -> <scene>_frame_weight_step5.npy the loader consumes."""
        torch = pytest.importorskip("torch")
        import sys
        for p in ("/root/reference", "/root/reference/raft/core"):
            if p not in sys.path:
                sys.path.insert(0, p)
        try:
            from argparse import Namespace as NS

            from raft import RAFT as TorchRAFT
        except Exception:
            pytest.skip("vendored RAFT unavailable")
        net = TorchRAFT(NS(small=False, dropout=0.0, alternate_corr=False,
                           mixed_precision=False)).eval()
        ckpt = tmp_path / "raft-things.pth"
        torch.save({"module." + k: v for k, v in net.state_dict().items()},
                   ckpt)

        from hybridneuralrendering_tpu.cli import frame_weights as FWC
        root, scan = fake_scannet
        out = tmp_path / "out"
        FWC.main(["--data-root", root, "--scan", scan,
                  "--out", str(out), "--raft-ckpt", str(ckpt),
                  "--iters", "2", "--window", "2", "--window-step", "1"])
        w = np.load(out / "frame_weights_step5" /
                    f"{scan}_frame_weight_step5.npy")
        assert w.ndim == 1 and len(w) == 3      # 3 training frames
        assert np.isfinite(w).all() and (w > 0).all()

        # the loader consumes the produced file (copied under its data root)
        import shutil

        from hybridneuralrendering_tpu.data.scannet import ScannetScene
        cfg = small_cfg()
        shutil.copytree(out / "frame_weights_step5",
                        os.path.join(root, "frame_weights_step5"),
                        dirs_exist_ok=True)
        ds = ScannetScene(root, scan, cfg, "train")
        assert len(ds.train_weight_list) == 3
        np.testing.assert_allclose(np.asarray(ds.train_weight_list), w,
                                   rtol=1e-6)


class TestLifecycle:
    def test_probe_and_grow_runs(self, fake_scannet):
        from hybridneuralrendering_tpu.data.scannet import ScannetScene
        from hybridneuralrendering_tpu.models import neural_points as npts
        from hybridneuralrendering_tpu.models import renderer
        from hybridneuralrendering_tpu.ops import voxel_grid as VG
        from hybridneuralrendering_tpu.train import lifecycle

        root, scan = fake_scannet
        cfg = small_cfg()
        ds = ScannetScene(root, scan, cfg, "train")
        # deliberately sparse cloud -> holes guaranteed
        rng = np.random.default_rng(0)
        xyz = np.stack([rng.uniform(-0.5, 0.5, 200),
                        rng.uniform(-0.4, 0.4, 200),
                        np.full(200, 2.0)], -1).astype(np.float32)
        points = npts.init_from_arrays(xyz, cfg.points,
                                       key=jax.random.PRNGKey(0))
        geom = VG.compute_grid_geometry(xyz, np.ones(len(xyz), bool),
                                        cfg.querier)
        grid = VG.build_grid(points.xyz, points.mask, geom, cfg.querier)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        n0 = int(points.num_live)
        new_points, new_grid, n_added = lifecycle.probe_and_grow(
            params, points, grid, ds, cfg, tracker=None, max_frames=1)
        assert n_added >= 0
        assert int(new_points.num_live) == n0 + n_added
        # grid rebuilt over the grown cloud
        assert int(new_grid.num_occ) >= int(grid.num_occ) or n_added == 0


class TestLifecycleTiersAndPrune:
    def test_tier_override_and_grow_prune_cycle(self, fake_scannet):
        """Per-tier probe query_size override (run/train_ft.py:458-463) and a
        grow -> prune cycle that keeps training running."""
        import dataclasses

        from hybridneuralrendering_tpu.data.scannet import ScannetScene
        from hybridneuralrendering_tpu.data.synthetic import (
            make_synthetic_batch)
        from hybridneuralrendering_tpu.models import blur as blur_mod
        from hybridneuralrendering_tpu.models import neural_points as npts
        from hybridneuralrendering_tpu.models import renderer
        from hybridneuralrendering_tpu.ops import voxel_grid as VG
        from hybridneuralrendering_tpu.train import lifecycle
        from hybridneuralrendering_tpu.train import state as state_mod
        from hybridneuralrendering_tpu.train import step as step_mod

        root, scan = fake_scannet
        cfg = small_cfg()
        cfg = cfg.replace(probe=dataclasses.replace(
            cfg.probe, prune_thresh=0.5, prune_iter=4, prob_top=0))
        ds = ScannetScene(root, scan, cfg, "train")
        rng = np.random.default_rng(0)
        xyz = np.stack([rng.uniform(-0.5, 0.5, 300),
                        rng.uniform(-0.4, 0.4, 300),
                        np.full(300, 2.0)], -1).astype(np.float32)
        conf0 = np.where(np.arange(300) < 50, 0.1, 1.0).reshape(-1, 1)
        points = npts.init_from_arrays(xyz, cfg.points, conf=conf0,
                                       key=jax.random.PRNGKey(0))
        geom = VG.compute_grid_geometry(xyz, np.ones(len(xyz), bool),
                                        cfg.querier)
        grid = VG.build_grid(points.xyz, points.mask, geom, cfg.querier)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)

        # probe with a tier-1 query_size override (1,1,1)
        new_points, new_grid, n_added = lifecycle.probe_and_grow(
            params, points, grid, ds, cfg, tracker=None, max_frames=1,
            query_size_override=(1, 1, 1))
        assert n_added >= 0

        # prune the low-conf points; training step still runs on the result
        pruned, grid2 = lifecycle.prune_and_rebuild(new_points, cfg)
        assert int(pruned.num_live) <= int(new_points.num_live) - 50
        ts = state_mod.create_train_state(params, pruned, cfg)
        kernels = jnp.asarray(blur_mod.generate_kernel_bank(cfg.blur))
        batch = make_synthetic_batch(cfg)
        ts, items = step_mod.train_step(ts, grid2, batch,
                                        jax.random.PRNGKey(0), kernels, cfg)
        assert np.isfinite(float(items["loss_total"]))


class TestLearnableBlurTraining:
    def test_step_with_learnable_kernel(self):
        import dataclasses
        from hybridneuralrendering_tpu.data.synthetic import (
            make_synthetic_batch, make_synthetic_scene)
        from hybridneuralrendering_tpu.models import renderer
        from hybridneuralrendering_tpu.train import state as state_mod
        from hybridneuralrendering_tpu.train import step as step_mod
        cfg = small_cfg()
        cfg = cfg.replace(agg=dataclasses.replace(
            cfg.agg, learnable_blur_kernel=True,
            learnable_blur_patch_size=cfg.sampling.dilation_patch_size,
            learnable_blur_kernel_size=3))
        points, grid = make_synthetic_scene(cfg, 1200)
        batch = make_synthetic_batch(cfg)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        ts = state_mod.create_train_state(params, points, cfg)
        b0 = jax.tree_util.tree_leaves(
            ts.params["aggregator"]["blur_kernel"])[0]
        b0 = np.array(b0)
        for i in range(2):
            ts, items = step_mod.train_step(
                ts, grid, batch, jax.random.PRNGKey(i), None, cfg)
        assert np.isfinite(float(items["loss_total"]))
        b1 = np.asarray(jax.tree_util.tree_leaves(
            ts.params["aggregator"]["blur_kernel"])[0])
        assert np.abs(b1 - b0).sum() > 0  # blur head learns
