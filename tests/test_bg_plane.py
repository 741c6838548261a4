"""Background-plane compositing (reference set_bg path,
mvs_points_volumetric_model.py:290-328 + mvs_utils.py:380-409 +
neural_points_volumetric_model.py:103-105)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridneuralrendering_tpu import config as C
from hybridneuralrendering_tpu.core import bg_plane


class TestRayPlaneCross:
    def test_matches_analytic_intersection(self):
        rng = np.random.default_rng(0)
        campos = np.array([0.0, 0.0, 0.0], np.float32)
        plane_pnt = np.array([0.0, 0.0, 3.0], np.float32)
        plane_normal = np.array([0.0, 0.0, 1.5], np.float32)  # non-unit ok
        dirs = rng.normal(size=(64, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

        xyz, valid = bg_plane.ray_plane_cross(
            jnp.asarray(campos), jnp.asarray(dirs),
            jnp.asarray(plane_pnt), jnp.asarray(plane_normal))
        xyz, valid = np.asarray(xyz), np.asarray(valid)

        dots = dirs @ plane_normal
        np.testing.assert_array_equal(valid, dots >= 1e-3)
        # valid intersections lie on the plane and along the ray
        on_plane = (xyz[valid] - plane_pnt) @ plane_normal
        np.testing.assert_allclose(on_plane, 0.0, atol=1e-4)
        t = np.sum((xyz[valid] - campos) * dirs[valid], axis=-1)
        np.testing.assert_allclose(
            xyz[valid], campos + t[:, None] * dirs[valid], atol=1e-4)
        # invalid rows are exactly zero (reference zero-fills,
        # mvs_utils.py:406-408)
        np.testing.assert_array_equal(xyz[~valid], 0.0)

    def test_parallel_rays_invalid(self):
        xyz, valid = bg_plane.ray_plane_cross(
            jnp.zeros(3), jnp.asarray([[1.0, 0.0, 0.0]]),
            jnp.asarray([0.0, 0.0, 3.0]), jnp.asarray([0.0, 0.0, 1.0]))
        assert not bool(valid[0])


class TestFgMask:
    def test_projected_points_splat(self):
        H, W = 16, 20
        intr = jnp.asarray([[10.0, 0, W / 2], [0, 10.0, H / 2], [0, 0, 1]])
        w2c = jnp.eye(4)
        # one point straight ahead -> center pixel; one behind -> ignored
        pts = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, -2.0]])
        mask = jnp.asarray([True, True])
        fg = np.asarray(bg_plane.fg_pixel_mask(pts, mask, w2c, intr, H, W))
        assert fg[H // 2, W // 2] == 1.0
        assert fg.sum() == 1.0

    def test_dead_points_ignored(self):
        H, W = 16, 20
        intr = jnp.asarray([[10.0, 0, W / 2], [0, 10.0, H / 2], [0, 0, 1]])
        pts = jnp.asarray([[0.0, 0.0, 2.0]])
        fg = np.asarray(bg_plane.fg_pixel_mask(
            pts, jnp.asarray([False]), jnp.eye(4), intr, H, W))
        assert fg.sum() == 0.0


class TestBgRayColors:
    def _setup(self):
        H, W = 24, 32
        V = 2
        plane_color = np.array([0.2, 0.8, 0.4], np.float32)
        images = np.broadcast_to(plane_color, (V, H, W, 3)).copy()
        intr = np.array([[12.0, 0, W / 2], [0, 12.0, H / 2], [0, 0, 1]],
                        np.float32)
        w2cs = np.stack([np.eye(4, dtype=np.float32)] * V)
        w2cs[1][:3, 3] = [0.05, 0.0, 0.0]
        return H, W, V, plane_color, images, intr, w2cs

    def test_plane_colored_pixels_survive(self):
        H, W, V, plane_color, images, intr, w2cs = self._setup()
        xyz = jnp.asarray([[0.0, 0.0, 3.0], [0.1, 0.1, 3.0]])
        valid = jnp.asarray([True, True])
        bg = np.asarray(bg_plane.bg_ray_colors(
            xyz, valid, jnp.asarray(images), jnp.asarray(w2cs),
            jnp.asarray(intr), jnp.asarray(plane_color)))
        np.testing.assert_allclose(
            bg, np.tile(plane_color, (2, 1)), atol=1e-5)

    def test_non_plane_colors_zeroed(self):
        H, W, V, plane_color, images, intr, w2cs = self._setup()
        images[:] = [0.9, 0.1, 0.1]   # nothing matches the plane color
        xyz = jnp.asarray([[0.0, 0.0, 3.0]])
        bg = np.asarray(bg_plane.bg_ray_colors(
            xyz, jnp.asarray([True]), jnp.asarray(images),
            jnp.asarray(w2cs), jnp.asarray(intr), jnp.asarray(plane_color)))
        np.testing.assert_array_equal(bg, 0.0)

    def test_fg_covered_pixels_masked(self):
        H, W, V, plane_color, images, intr, w2cs = self._setup()
        fg = np.ones((V, H, W), np.float32)   # everything foreground
        xyz = jnp.asarray([[0.0, 0.0, 3.0]])
        bg = np.asarray(bg_plane.bg_ray_colors(
            xyz, jnp.asarray([True]), jnp.asarray(images),
            jnp.asarray(w2cs), jnp.asarray(intr), jnp.asarray(plane_color),
            fg_masks=jnp.asarray(fg)))
        np.testing.assert_array_equal(bg, 0.0)


class TestRendererCompositing:
    def test_miss_rays_take_bg_ray_color(self):
        """Rays that hit no points must come out exactly bg_ray (background
        transmission 1), replacing the constant bg color."""
        from hybridneuralrendering_tpu.data.synthetic import (
            make_synthetic_batch, make_synthetic_scene)
        from hybridneuralrendering_tpu.models import renderer

        cfg = C.tiny_test()
        points, grid = make_synthetic_scene(cfg, num_points=512)
        batch = make_synthetic_batch(cfg)
        params = renderer.init_params(jax.random.PRNGKey(0), cfg)

        R = batch["raydir"].shape[0]
        bg_ray = np.tile(np.array([[0.1, 0.5, 0.9]], np.float32), (R, 1))
        b2 = dict(batch)
        b2["bg_ray"] = jnp.asarray(bg_ray)
        out = renderer.render(params, points, grid, b2, cfg, train=False)
        miss = ~np.asarray(out["ray_mask"]).astype(bool)
        assert miss.any()
        np.testing.assert_allclose(
            np.asarray(out["coarse_raycolor"])[miss], bg_ray[miss], atol=1e-5)

    def test_maybe_add_bg_ray_end_to_end(self):
        """Driver-side helper: plane metadata in the batch becomes a bg_ray
        and the plane keys are stripped before jit."""
        from hybridneuralrendering_tpu.data.synthetic import (
            make_synthetic_batch, make_synthetic_scene)
        from hybridneuralrendering_tpu.train import step as step_mod

        cfg = C.tiny_test()
        cfg = cfg.replace(render=C.RenderConfig(bgmodel="img_plane"))
        points, grid = make_synthetic_scene(cfg, num_points=512)
        batch = make_synthetic_batch(cfg)
        V, (H, W) = 2, cfg.image_hw
        batch.update({
            "plane_pnt": np.array([0.0, 0.0, 3.5], np.float32),
            "plane_normal": np.array([0.0, 0.0, 1.0], np.float32),
            "plane_color": np.array([0.3, 0.3, 0.3], np.float32),
            "images_nearest": np.full((V, H, W, 3), 0.3, np.float32),
            "c2w_nearest": np.stack([np.eye(4, dtype=np.float32)] * V),
            "intrinsic_nearest": np.array(
                [[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32),
        })
        out = step_mod.maybe_add_bg_ray(batch, points, cfg)
        assert "bg_ray" in out and "plane_pnt" not in out
        assert out["bg_ray"].shape == (batch["raydir"].shape[0], 3)
        assert np.isfinite(np.asarray(out["bg_ray"])).all()
