"""Driver-level tests: scene editing with final render, camera-path videos."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridneuralrendering_tpu import config as C


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    """A saved checkpoint of a trained-ish tiny synthetic scene."""
    from hybridneuralrendering_tpu.data.synthetic import make_synthetic_scene
    from hybridneuralrendering_tpu.models import renderer
    from hybridneuralrendering_tpu.train import checkpoint as ckpt_mod
    from hybridneuralrendering_tpu.train import state as state_mod

    cfg = C.tiny_test()
    points, grid = make_synthetic_scene(cfg, num_points=1200)
    params = renderer.init_params(jax.random.PRNGKey(0), cfg)
    ts = state_mod.create_train_state(params, points, cfg)
    root = tmp_path_factory.mktemp("ckpts")
    ckpt_dir = os.path.join(root, "partA", "ckpt")
    ckpt_mod.save_checkpoint(ckpt_dir, ts, 0.0)
    return str(root), cfg


class TestEditDriver:
    def test_edit_merges_and_renders(self, tiny_checkpoint, tmp_path):
        from hybridneuralrendering_tpu.cli import edit as edit_cli
        root, cfg = tiny_checkpoint
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.5, 0.0, 0.0]
        trf = tmp_path / "shift.txt"
        np.savetxt(trf, T)
        ident = tmp_path / "id.txt"
        np.savetxt(ident, np.eye(4))

        params, points, grid = edit_cli.main([
            "--preset", "tiny", "--checkpoints-dir", root,
            "--parts", "partA", "partA",
            "--transforms", str(ident), str(trf),
            "--out-name", "edited_test",
            "--render-frames", "2", "--image-hw", "24", "32",
            "--radius", "2.5"])
        # merged cloud has both parts
        assert int(points.num_live) == 2 * 1200
        assert points.rw2c is not None
        # rendered frames + video on disk
        out_dir = os.path.join(root, "edited_test")
        pngs = [f for f in os.listdir(os.path.join(out_dir, "images"))
                if f.endswith(".png")]
        assert len(pngs) >= 2
        vids = [f for f in os.listdir(out_dir)
                if f.endswith(".mp4") or f.endswith(".gif")]
        assert len(vids) >= 1


class TestScanNetFlythrough:
    def test_interpolated_path_and_render(self, tiny_checkpoint):
        """gen_render_path keys -> PathView -> chunked render (the ScanNet
        fly-through machinery, scannet_ft_dataset.py:988-1075)."""
        from hybridneuralrendering_tpu.cli.render_vid import (
            PathView, render_pose_path, scene_path_poses)
        from hybridneuralrendering_tpu.data.paths import gen_render_path
        from hybridneuralrendering_tpu.data.synthetic import (
            make_synthetic_scene)
        from hybridneuralrendering_tpu.models import renderer
        from hybridneuralrendering_tpu.utils.visualizer import Visualizer

        root, cfg = tiny_checkpoint
        points, grid = make_synthetic_scene(cfg, num_points=1200)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)

        # key poses looking at the cloud from -z, sliding in x
        keys = []
        for i in range(3):
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, 3] = [0.1 * i, 0.0, -2.5]
            keys.append(c2w)

        class StubDS:
            height, width = cfg.image_hw
            intrinsic = np.array(
                [[0.9 * 64, 0, 32], [0, 0.9 * 64, 24], [0, 0, 1]],
                np.float32)
            train_id_list = [0, 1, 2]

            def _pose(self, vid):
                return keys[vid]

            def get_batch(self, idx, rng=None, pixelcoords=None):
                return {"bg_color": np.asarray(cfg.render.bg_color,
                                               np.float32)}

        class Args:
            frames = 6
            key_stride = 1
            phi = -30.0
            radius = 3.0

        poses = scene_path_poses(StubDS(), Args())
        assert len(poses) >= 4
        # interpolation passes through/near the key positions
        pos = np.stack([p[:3, 3] for p in poses])
        assert np.linalg.norm(pos - keys[0][:3, 3], axis=-1).min() < 0.12

        vis = Visualizer(root, "flythrough_test")
        out = render_pose_path(params, points, grid, StubDS(), poses[:2],
                               cfg, vis, tag="fly", fps=4)
        imgs = os.listdir(os.path.join(root, "flythrough_test", "images"))
        assert sum(f.endswith(".png") for f in imgs) >= 2
        assert out is None or os.path.exists(out)


class TestFeedForwardDriver:
    def test_train_mode_ff_runs_and_checkpoints(self, tmp_path):
        """`--train-mode ff` drives train/step_ff end-to-end from the CLI
        (reference feed-forward mode, mvs_points_volumetric_model.py:49-152;
        VERDICT r2 #8)."""
        from PIL import Image

        from hybridneuralrendering_tpu.cli import train as train_cli

        root = tmp_path / "scans"
        scan = "scene_ff"
        base = root / scan / "exported"
        for sub in ("color", "pose", "intrinsic"):
            os.makedirs(base / sub, exist_ok=True)
        H, W = 48, 64
        intr = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
        intr4 = np.block([[intr, np.zeros((3, 1))], [np.zeros((1, 3)), 1]])
        np.savetxt(base / "intrinsic/intrinsic_color.txt", intr4)
        np.savetxt(base / "intrinsic/intrinsic_depth.txt", intr4)
        rng = np.random.default_rng(0)
        for i in range(12):
            c2w = np.eye(4)
            c2w[0, 3] = 0.05 * i
            np.savetxt(base / f"pose/{i}.txt", c2w)
            Image.fromarray(rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
                            ).save(base / f"color/{i}.jpg")

        ckdir = tmp_path / "ckpts"
        train_cli.main([
            "--preset", "tiny", "--data-root", str(root), "--scan", scan,
            "--checkpoints-dir", str(ckdir), "--train-mode", "ff",
            "--max-steps", "2", "--mvs-num-depths", "8", "--save-freq", "2",
            "--name", "fftest"])
        ff_ckpts = [f for f in os.listdir(ckdir / "fftest" / "ckpt")
                    if f.startswith("ff_")]
        assert ff_ckpts, "feed-forward checkpoint not written"


class TestVisualizerScalars:
    def test_scalar_export_jsonl(self, tmp_path):
        """print_losses streams machine-readable scalars (scalars.jsonl) —
        the reference's optional tensorboardX export
        (utils/visualizer.py:51-55,177-183) without the dependency."""
        import json

        from hybridneuralrendering_tpu.utils.visualizer import Visualizer

        vis = Visualizer(str(tmp_path), "scalartest")
        for v in (0.04, 0.01):
            vis.accumulate_losses({"loss_coarse_raycolor": v, "loss_x": 2 * v})
        vis.print_losses(40)
        vis.add_scalar(41, "lr", 5e-4)
        rows = [json.loads(ln) for ln in
                open(os.path.join(vis.dir, "scalars.jsonl"))]
        by_tag = {(r["step"], r["tag"]): r["value"] for r in rows}
        assert abs(by_tag[(40, "loss_coarse_raycolor")] - 0.025) < 1e-9
        assert abs(by_tag[(40, "loss_x")] - 0.05) < 1e-9
        assert (40, "PSNR[loss_coarse_raycolor]") in by_tag
        assert by_tag[(41, "lr")] == 5e-4


class TestVisualizeDriver:
    def test_visualize_cli_renders_checkpoint(self, tmp_path, monkeypatch):
        """cli/visualize.py through its actual CLI path (VERDICT r4 #9):
        register a test preset, save a checkpoint, run main(), check PNGs +
        PSNR log lines."""
        import glob

        from hybridneuralrendering_tpu.cli import visualize as vis_cli
        from hybridneuralrendering_tpu.data.synthetic import (
            make_synthetic_scene)
        from hybridneuralrendering_tpu.models import renderer
        from hybridneuralrendering_tpu.train import checkpoint as ckpt_mod
        from hybridneuralrendering_tpu.train import state as state_mod

        # fake on-disk ScanNet export (shares the layout test_integration's
        # fake_scannet fixture uses; local here to keep modules independent)
        import imageio.v2 as imageio
        from PIL import Image
        root = tmp_path / "scans"
        scan = "scene_vis"
        base = root / scan / "exported"
        for sub in ("color", "pose", "depth", "intrinsic"):
            os.makedirs(base / sub, exist_ok=True)
        H, W = 48, 64
        intr = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
        for nm in ("intrinsic_color.txt", "intrinsic_depth.txt"):
            np.savetxt(base / "intrinsic" / nm,
                       np.block([[intr, np.zeros((3, 1))],
                                 [np.zeros((1, 3)), 1]]))
        rng = np.random.default_rng(0)
        for i in range(12):
            c2w = np.eye(4)
            c2w[0, 3] = 0.05 * i
            np.savetxt(base / f"pose/{i}.txt", c2w)
            img = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
            Image.fromarray(img).save(base / f"color/{i}.jpg")
            imageio.imwrite(base / f"depth/{i}.png",
                            np.full((H, W), 2000, np.uint16))

        cfg = C.Config(
            name="vistest",
            querier=C.QuerierConfig(
                vsize=(0.05, 0.05, 0.05), vscale=(2, 2, 2), SR=6, K=4, P=8,
                max_o=20000, z_depth_dim=48, grid_capacity=600_000,
                ranges=(-4.0, -4.0, -4.0, 4.0, 4.0, 4.0),
                Ps=32, max_nodes=120_000),
            points=C.PointsConfig(num_points=2000, feature_dim=8),
            agg=C.AggregatorConfig(point_features_dim=8,
                                   shading_feature_num=128, use_nearest=2,
                                   num_feat_freqs=2, dist_xyz_freq=2),
            render=C.RenderConfig(near_plane=0.5, far_plane=4.0),
            sampling=C.SamplingConfig(random_sample="dilated",
                                      random_sample_size=8,
                                      dilation_patch_num=2,
                                      dilation_patch_size=4, edge_filter=0,
                                      eval_chunk_rays=256),
            image_hw=(48, 64),
        )
        monkeypatch.setitem(C.PRESETS, "vistest", lambda: cfg)

        points, _ = make_synthetic_scene(cfg, num_points=1500)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        ts = state_mod.create_train_state(params, points, cfg)
        ckpts = tmp_path / "ckpts"
        ckpt_mod.save_checkpoint(str(ckpts / "visrun" / "ckpt"), ts, 0.0)

        vis_cli.main(["--preset", "vistest", "--data-root", str(root),
                      "--scan", scan, "--checkpoints-dir", str(ckpts),
                      "--name", "visrun", "--frames", "2"])

        out = ckpts / "visrun_vis"
        pngs = glob.glob(str(out / "images" / "*render*.png"))
        assert len(pngs) == 2, pngs
        log = open(out / "log.txt").read()
        assert "PSNR" in log
