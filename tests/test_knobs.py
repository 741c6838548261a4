"""Dataset ablation knobs: weight_exp, select_high_quality, dynamic_nearest
(reference scannet_ft_dataset.py:756-812; VERDICT r2 item #7)."""

import dataclasses
import os

import numpy as np
import pytest

from hybridneuralrendering_tpu import config as C


@pytest.fixture(scope="module")
def knob_scene(tmp_path_factory):
    """Miniature ScanNet export with 40 frames (8 train) and a fake
    frame-weight file so quality-based knobs have signal."""
    root = tmp_path_factory.mktemp("knob_scans")
    scan = "scene_knob"
    base = root / scan / "exported"
    for sub in ("color", "pose", "depth", "intrinsic"):
        os.makedirs(base / sub, exist_ok=True)
    H, W = 48, 64
    intr = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    intr4 = np.block([[intr, np.zeros((3, 1))], [np.zeros((1, 3)), 1]])
    np.savetxt(base / "intrinsic/intrinsic_color.txt", intr4)
    np.savetxt(base / "intrinsic/intrinsic_depth.txt", intr4)
    from PIL import Image
    rng = np.random.default_rng(0)
    n = 40
    for i in range(n):
        c2w = np.eye(4)
        c2w[0, 3] = 0.02 * i
        np.savetxt(base / f"pose/{i}.txt", c2w)
        Image.fromarray(rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
                        ).save(base / f"color/{i}.jpg")
    # train ids = 0,5,...,35 (8 frames); weights descend so "high quality"
    # prefers LOW frame ids
    weights = np.linspace(1.0, 0.2, 8).astype(np.float32)
    os.makedirs(root / "frame_weights_step5", exist_ok=True)
    np.save(root / "frame_weights_step5" / f"{scan}_frame_weight_step5.npy",
            weights)
    return str(root), scan


def knob_cfg(**agg_kw):
    cfg = C.tiny_test()
    return cfg.replace(
        agg=dataclasses.replace(cfg.agg, use_nearest=2, **agg_kw),
        loss=C.LossConfig(use_frame_weight=True),
        image_hw=(48, 64))


class TestWeightExp:
    def test_exponent_applied(self, knob_scene):
        from hybridneuralrendering_tpu.data.scannet import ScannetScene
        root, scan = knob_scene
        cfg1 = knob_cfg()
        cfg2 = cfg1.replace(loss=dataclasses.replace(
            cfg1.loss, weight_exp=2.0))
        rng = np.random.default_rng(0)
        b1 = ScannetScene(root, scan, cfg1, "train").get_batch(3, rng)
        b2 = ScannetScene(root, scan, cfg2, "train").get_batch(3, rng)
        w1, w2 = float(b1["frame_weight"]), float(b2["frame_weight"])
        assert 0 < w1 < 1
        np.testing.assert_allclose(w2, w1 ** 2, rtol=1e-6)


class TestSelectHighQuality:
    def test_rerank_prefers_high_weight(self, knob_scene):
        from hybridneuralrendering_tpu.data.scannet import ScannetScene
        root, scan = knob_scene
        # frame 35 (last train frame): plain nearest picks {30, 25};
        # high-quality re-rank over 3 candidates {30, 25, 20} keeps the two
        # LOWEST ids (weights descend with id)
        ds_plain = ScannetScene(root, scan, knob_cfg(), "train")
        ds_hq = ScannetScene(root, scan,
                             knob_cfg(select_high_quality=True), "train")
        rng = np.random.default_rng(0)
        idx = ds_plain.train_id_list.index(35)
        b_plain = ds_plain.get_batch(idx, rng)
        b_hq = ds_hq.get_batch(idx, rng)
        assert set(b_plain["nearest_vids"].tolist()) == {30, 25}
        assert set(b_hq["nearest_vids"].tolist()) == {25, 20}


class TestDynamicNearest:
    def test_static_pool_with_view_mask(self, knob_scene):
        from hybridneuralrendering_tpu.data.scannet import ScannetScene
        root, scan = knob_scene
        cfg = knob_cfg(dynamic_nearest=True, dynamic_nearest_pool=8)
        ds = ScannetScene(root, scan, cfg, "train")
        rng = np.random.default_rng(1)
        counts = set()
        for _ in range(20):
            b = ds.get_batch(2, rng)
            assert b["images_nearest"].shape[0] == 8   # static stack
            vm = b["view_mask"]
            assert vm.shape == (8,)
            n = int(vm.sum())
            assert 2 <= n < 8                          # randint(2, 8)
            # mask is a prefix (nearest views first)
            np.testing.assert_array_equal(vm, (np.arange(8) < n))
            counts.add(n)
        assert len(counts) > 1                         # actually random

    def test_eval_uses_fixed_four(self, knob_scene):
        from hybridneuralrendering_tpu.data.scannet import ScannetScene
        root, scan = knob_scene
        cfg = knob_cfg(dynamic_nearest=True, dynamic_nearest_pool=8)
        ds = ScannetScene(root, scan, cfg, "test")
        b = ds.get_batch(0, np.random.default_rng(0))
        assert int(b["view_mask"].sum()) == 2          # min(use_nearest, pool)

    def test_masked_views_do_not_affect_fusion(self):
        """With view_mask = [1,1,0,...], the render must equal a 2-view
        render — the masked tail contributes nothing."""
        import jax
        import jax.numpy as jnp

        from hybridneuralrendering_tpu.data.synthetic import (
            make_synthetic_batch, make_synthetic_scene)
        from hybridneuralrendering_tpu.models import renderer

        cfg = C.tiny_test()
        points, grid = make_synthetic_scene(cfg, num_points=512)
        batch = make_synthetic_batch(cfg)   # builds V=2 nearest stack
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        out2 = renderer.render(params, points, grid, batch, cfg, train=False)

        # pad the stack with garbage views + a mask hiding them
        V, (H, W) = 4, cfg.image_hw
        rngv = np.random.default_rng(3)
        pad_img = rngv.uniform(0, 1, (2, H, W, 3)).astype(np.float32)
        b4 = dict(batch)
        b4["images_nearest"] = jnp.concatenate(
            [batch["images_nearest"], jnp.asarray(pad_img)])
        b4["c2w_nearest"] = jnp.concatenate(
            [batch["c2w_nearest"], batch["c2w_nearest"]])
        b4["campos_nearest"] = jnp.concatenate(
            [batch["campos_nearest"], batch["campos_nearest"]])
        b4["frame_weight_nearest"] = jnp.concatenate(
            [batch["frame_weight_nearest"], batch["frame_weight_nearest"]])
        b4["view_mask"] = jnp.asarray([1.0, 1.0, 0.0, 0.0])
        out4 = renderer.render(params, points, grid, b4, cfg, train=False)
        np.testing.assert_allclose(np.asarray(out4["coarse_raycolor"]),
                                   np.asarray(out2["coarse_raycolor"]),
                                   atol=1e-5)


class TestBlurOverrides:
    def test_matrix_axes(self):
        """apply_blur_overrides drives exactly the three flags the reference
        dev_scripts vary (add_blur_sim / learnable_blur_kernel /
        use_frame_weight)."""
        from hybridneuralrendering_tpu import config as C

        base = C.scannet_full()
        off = C.apply_blur_overrides(base, "off", 0)
        assert not off.blur.add_blur_sim
        assert not off.agg.learnable_blur_kernel
        assert not off.loss.use_frame_weight

        bank = C.apply_blur_overrides(off, "bank", 1)
        assert bank.blur.add_blur_sim and not bank.agg.learnable_blur_kernel
        assert bank.loss.use_frame_weight

        lrn = C.apply_blur_overrides(base, "learnable", -1)
        assert lrn.agg.learnable_blur_kernel and lrn.blur.add_blur_sim
        assert lrn.loss.use_frame_weight == base.loss.use_frame_weight

        same = C.apply_blur_overrides(base, "preset", -1)
        assert same == base

    def test_learnable_mode_adds_blur_mlp_params(self):
        import jax

        from hybridneuralrendering_tpu import config as C
        from hybridneuralrendering_tpu.models import renderer

        cfg = C.apply_blur_overrides(C.tiny_test(), "learnable")
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)
        assert "blur_kernel" in params["aggregator"]
        plain = renderer.init_params(
            jax.random.PRNGKey(0), C.apply_blur_overrides(cfg, "bank"))
        assert "blur_kernel" not in plain["aggregator"]


class TestBenchGuard:
    """bench.py tunnel-artifact guard (VERDICT r4 weak #6): cached slower
    than uncached is physically impossible; the guard must retry."""

    def test_no_retry_when_sane(self):
        import bench
        calls = []
        t_u, t_c, retried = bench.guard_cached_times(
            0.2, 0.1,
            lambda: calls.append("c") or 0.1,
            lambda: calls.append("u") or 0.2)
        assert (t_u, t_c, retried) == (0.2, 0.1, [])
        assert calls == []

    def test_retries_cached_first(self):
        import bench
        # cached anomalously slow; the retry fixes it
        t_u, t_c, retried = bench.guard_cached_times(
            0.2, 0.3, lambda: 0.12, lambda: 0.2)
        assert retried == ["cached"]
        assert (t_u, t_c) == (0.2, 0.12)

    def test_retries_uncached_when_cached_stays_slow(self):
        import bench
        # cached retry still slow -> uncached also re-timed; faster of the
        # two timings kept for each phase
        t_u, t_c, retried = bench.guard_cached_times(
            0.2, 0.3, lambda: 0.29, lambda: 0.35)
        assert retried == ["cached", "uncached"]
        assert t_c == 0.29
        assert t_u == 0.2   # original was faster than the retry
