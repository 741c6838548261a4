"""Unit tests for core math: cameras, ray generation, marching, encodings, SH."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridneuralrendering_tpu.core import cameras, encoding, march, rays, sh


def rot_z(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


class TestCameras:
    def test_w2pers_roundtrip(self):
        rng = np.random.default_rng(0)
        camrot = rot_z(0.3)  # keeps camera z axis = world z
        campos = np.array([0.5, -1.0, -2.0], np.float32)
        # all points at camera-frame depth z in [1, 3] to keep x/z stable
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        pts[:, 2] = campos[2] + 1.0 + 2.0 * rng.random(100)
        pers = cameras.w2pers(jnp.asarray(pts), jnp.asarray(camrot),
                              jnp.asarray(campos))
        back = cameras.pers2w(pers, jnp.asarray(camrot), jnp.asarray(campos))
        np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-4, atol=1e-4)

    def test_w2pers_matches_definition(self):
        """pers = (x/z, y/z, z) of R^T (p - c)."""
        camrot = rot_z(0.7)
        campos = np.array([1.0, 2.0, 3.0], np.float32)
        p = np.array([[2.0, 1.0, 7.0]], np.float32)
        xyz_c = (p - campos) @ camrot  # = R^T rows applied (ref summation form)
        expect = np.array([xyz_c[0, 0] / xyz_c[0, 2],
                           xyz_c[0, 1] / xyz_c[0, 2], xyz_c[0, 2]])
        got = cameras.w2pers(jnp.asarray(p), jnp.asarray(camrot),
                             jnp.asarray(campos))
        np.testing.assert_allclose(np.asarray(got)[0], expect, rtol=1e-5)

    def test_raydir_center_pixel(self):
        intr = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
        camrot = np.eye(3, dtype=np.float32)
        # pixel at principal point (minus the half-pixel offset) looks along +z
        pix = jnp.asarray([[31.5, 23.5]])
        d = cameras.get_dtu_raydir(pix, jnp.asarray(intr), jnp.asarray(camrot))
        np.testing.assert_allclose(np.asarray(d)[0], [0, 0, 1], atol=1e-6)

    def test_w2iproject_identity_cam(self):
        intr = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
        c2w = np.eye(4, dtype=np.float32)
        pts = jnp.asarray([[0.0, 0.0, 2.0], [0.1, -0.1, 1.0]])
        xy, depth = cameras.w2iproject(pts, jnp.asarray(intr), jnp.asarray(c2w))
        np.testing.assert_allclose(np.asarray(depth)[:, 0], [2.0, 1.0], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(xy)[0], [32, 24], atol=1e-4)
        np.testing.assert_allclose(np.asarray(xy)[1], [42, 14], atol=1e-3)

    def test_delta_viewdirs_zero_for_same_campos(self):
        loc = jnp.asarray(np.random.default_rng(1).normal(size=(5, 3)))
        c = jnp.asarray([1.0, 0.0, 0.0])
        d = cameras.delta_viewdirs(loc, c, c)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


class TestRays:
    def test_near_far_linear_no_jitter(self):
        campos = jnp.zeros(3)
        raydir = jnp.asarray([[0.0, 0.0, 1.0]])
        raypos, seg, ts = rays.near_far_linear(campos, raydir, 10, 1.0, 2.0)
        assert raypos.shape == (1, 10, 3)
        # midpoints of 10 equal segments of [1,2]
        expect = 1.0 + (np.arange(10) + 0.5) * 0.1
        np.testing.assert_allclose(np.asarray(ts)[0], expect, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(seg)[0], 0.1, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(raypos)[0, :, 2], expect, rtol=1e-5)

    def test_near_far_linear_jitter_bounds(self):
        campos = jnp.zeros(3)
        raydir = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
        key = jax.random.PRNGKey(0)
        raypos, seg, ts = rays.near_far_linear(
            campos, raydir, 50, 1.0, 3.0, jitter=0.3, key=key)
        ts = np.asarray(ts)
        assert (np.diff(ts, axis=-1) > 0).all()
        assert ts.min() > 1.0 and ts.max() < 3.0 + 0.3 * (2.0 / 50)

    def test_sample_pdf_concentrates(self):
        bins = jnp.linspace(0.0, 1.0, 11)[None, :].repeat(2, 0)
        w = jnp.zeros((2, 10)).at[:, 5].set(100.0)
        out = np.asarray(rays.sample_pdf(bins, w, 16, deterministic=True))
        # nearly all samples should land inside bin 5 = [0.5, 0.6]
        frac = ((out >= 0.5) & (out <= 0.6)).mean()
        assert frac > 0.8


class TestMarch:
    def test_opaque_sample_dominates(self):
        R, S = 2, 5
        dist = jnp.ones((R, S))
        valid = jnp.ones((R, S), bool)
        feats = jnp.zeros((R, S, 4))
        feats = feats.at[:, 2, 0].set(100.0)   # huge sigma at sample 2
        feats = feats.at[:, 2, 1:].set(jnp.asarray([0.2, 0.4, 0.6]))
        color, *_ , bg_trans, _ = march.ray_march(
            dist, valid, feats, march.radiance_render, march.alpha_blend)
        np.testing.assert_allclose(np.asarray(color[0]), [0.2, 0.4, 0.6],
                                   atol=1e-3)
        assert np.asarray(bg_trans).max() < 1e-3

    def test_empty_ray_returns_bg(self):
        R, S = 1, 4
        dist = jnp.ones((R, S))
        valid = jnp.zeros((R, S), bool)
        feats = jnp.ones((R, S, 4))
        bg = jnp.asarray([1.0, 0.5, 0.25])
        color, *_ , bg_trans, _ = march.ray_march(
            dist, valid, feats, march.radiance_render, march.alpha_blend,
            bg_color=bg)
        np.testing.assert_allclose(np.asarray(color[0]), [1.0, 0.5, 0.25],
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(bg_trans), 1.0, rtol=1e-4)

    def test_transmittance_is_exclusive_cumprod(self):
        dist = jnp.ones((1, 3))
        valid = jnp.ones((1, 3), bool)
        sigma = jnp.log(2.0)  # opacity 0.5 each
        feats = jnp.concatenate(
            [jnp.full((1, 3, 1), sigma), jnp.ones((1, 3, 3))], axis=-1)
        _, _, opacity, acc, w, bg_t, _ = march.ray_march(
            dist, valid, feats, march.radiance_render, march.alpha_blend)
        np.testing.assert_allclose(np.asarray(opacity)[0], 0.5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(acc)[0], [1.0, 0.5, 0.25],
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(bg_t)[0, 0], 0.125, rtol=1e-4)

    def test_ray_dist_from_depth(self):
        # non-monotone depths: cummax flattens, gaps reset to vsize_z
        depth = jnp.asarray([[1.0, 1.15, 1.1, 1.5, 9.0]])
        valid = jnp.ones((1, 5), bool)
        d = np.asarray(march.ray_dist_from_depth(depth, valid, 0.1, True))
        # cummax [1.0,1.15,1.15,1.5,9.0]; diffs [0.15, 0->0.1, 0.35->0.1(>2v),
        # 7.5->0.1], appended last slot = vsize
        np.testing.assert_allclose(d[0], [0.15, 0.1, 0.1, 0.1, 0.1], rtol=1e-4)


class TestEncoding:
    def test_shapes(self):
        x = jnp.ones((4, 3))
        assert encoding.positional_encoding(x, 5).shape == (4, 30)
        assert encoding.positional_encoding(x, 4, ori=True).shape == (4, 27)

    def test_matches_reference_layout(self):
        """Replicate networks.py:175-190 in numpy and compare."""
        rng = np.random.default_rng(3)
        x = rng.normal(size=(7, 3)).astype(np.float32)
        freqs = 3
        bands = 2.0 ** np.arange(freqs)
        pts = (x[..., None] * bands).reshape(7, 3 * freqs)
        ref_no_ori = np.stack([np.sin(pts), np.cos(pts)], axis=-1).reshape(7, -1)
        ref_ori = np.concatenate([x, np.sin(pts), np.cos(pts)], axis=-1)
        got = np.asarray(encoding.positional_encoding(jnp.asarray(x), freqs))
        np.testing.assert_allclose(got, ref_no_ori, rtol=1e-5, atol=1e-6)
        got_ori = np.asarray(
            encoding.positional_encoding(jnp.asarray(x), freqs, ori=True))
        np.testing.assert_allclose(got_ori, ref_ori, rtol=1e-5, atol=1e-6)


class TestSH:
    @pytest.mark.parametrize("deg", [1, 2, 3, 4, 5])
    def test_shapes(self, deg):
        dirs = jnp.asarray(np.random.default_rng(0).normal(size=(10, 3)))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh.sh_basis(dirs, deg)
        assert out.shape == (10, deg ** 2)

    def test_l0_constant(self):
        dirs = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        out = np.asarray(sh.sh_basis(dirs, 1))
        np.testing.assert_allclose(out, 0.5 * np.sqrt(1 / np.pi), rtol=1e-6)

    def test_orthonormality(self):
        """Monte-Carlo check: int Y_i Y_j dOmega ~ delta_ij for deg<=3."""
        rng = np.random.default_rng(42)
        v = rng.normal(size=(200000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        Y = np.asarray(sh.sh_basis(jnp.asarray(v, jnp.float32), 3,
                                   flip_dir=False))
        gram = (Y.T @ Y) / len(v) * 4 * np.pi
        np.testing.assert_allclose(gram, np.eye(9), atol=0.05)
