"""Data-layer tests: samplers, frame weights, nearest views, point init."""

import numpy as np

from hybridneuralrendering_tpu.config import SamplingConfig
from hybridneuralrendering_tpu.data import (frame_weights, nearest_views,
                                            point_init, sampling)


class TestSampling:
    def cfgs(self):
        return [
            SamplingConfig(random_sample="patch", random_sample_size=8,
                           edge_filter=2),
            SamplingConfig(random_sample="random", random_sample_size=8,
                           edge_filter=2),
            SamplingConfig(random_sample="random2", random_sample_size=8,
                           edge_filter=2),
            SamplingConfig(random_sample="dilated", random_sample_size=8,
                           dilation_patch_num=2, dilation_patch_size=4,
                           dilation_min=1, dilation_max=3, edge_filter=2),
        ]

    def test_all_samplers_in_bounds(self):
        rng = np.random.default_rng(0)
        for cfg in self.cfgs():
            pix = sampling.sample_pixels(cfg, 48, 64, rng)
            assert pix.shape == (8, 8, 2)
            assert pix[..., 0].min() >= cfg.edge_filter
            assert pix[..., 0].max() < 64 - cfg.edge_filter
            assert pix[..., 1].min() >= cfg.edge_filter
            assert pix[..., 1].max() < 48 - cfg.edge_filter

    def test_dilated_patch_structure(self):
        cfg = SamplingConfig(random_sample="dilated", random_sample_size=8,
                             dilation_patch_num=2, dilation_patch_size=4,
                             dilation_min=2, dilation_max=2, edge_filter=0)
        pix = sampling.sample_pixels(cfg, 64, 64, np.random.default_rng(1))
        # each 4x4 patch must be a regular grid with spacing == dilation (2)
        patch = pix[:4, :4]
        dx = np.diff(patch[0, :, 0])
        dy = np.diff(patch[:, 0, 1])
        np.testing.assert_array_equal(dx, 2)
        np.testing.assert_array_equal(dy, 2)

    def test_chunk_pixels_roundtrip(self):
        pix = sampling.full_image_grid(10, 12)
        chunks, n = sampling.chunk_pixels(pix, 32)
        assert n == 120
        assert chunks.shape == (4, 32, 2)
        flat = chunks.reshape(-1, 2)[:n]
        np.testing.assert_array_equal(flat, pix.reshape(-1, 2))


class TestFrameWeights:
    def test_sharp_frame_scores_higher(self):
        rng = np.random.default_rng(0)
        sharp = rng.random((64, 64))
        blurry = frame_weights._mean_blur(sharp, 7)
        frames = [sharp, blurry, sharp, blurry, sharp, sharp]
        w = frame_weights.compute_frame_weights(frames, window_size=4, step=2,
                                                border=5)
        assert len(w) == 6
        assert np.isfinite(w).all()
        # blurry frames get lower weight than their sharp neighbors
        assert w[1] < w[0] and w[3] < w[2]

    def test_sliding_window_constant_scores(self):
        w = frame_weights.sliding_window_weights(np.ones(12), 5, 3)
        np.testing.assert_allclose(w, 1.0, rtol=1e-9)

    def test_chain_scores_scale_propagation(self):
        # frame1 twice as sharp as frame0 per the pair measurements
        sc = [1.0, 4.0]
        sr = [2.0, 2.0]
        out = frame_weights.chain_scores(sc, sr)
        # scale after pair 0: ref/cur_next = 2/4 -> frame1 absolute = 4*0.5 = 2
        np.testing.assert_allclose(out, [1.0, 2.0])


class TestNearestViews:
    def test_frame_id_selection_excludes_self(self):
        ids = list(range(0, 50, 5))
        near = nearest_views.nearest_by_frame_id(ids, 20, 4, exclude_self=True)
        assert 20 not in near
        assert set(near) == {15, 25, 10, 30}

    def test_frame_id_selection_keeps_self_in_test(self):
        ids = list(range(0, 50, 5))
        near = nearest_views.nearest_by_frame_id(ids, 20, 4,
                                                 exclude_self=False)
        assert 20 in near

    def test_quality_rerank(self):
        ids = [0, 5, 10, 15, 20, 25]
        w = np.array([0.1, 1.0, 0.2, 0.9, 0.8, 0.3])
        near = nearest_views.nearest_by_frame_id(
            ids, 12, 2, frame_weights=w, select_high_quality=True,
            exclude_self=False)
        # candidates = 3 nearest by id-dist (10, 15, 5); top-2 by weight:
        # 5 (w=1.0) and 15 (w=0.9)
        assert set(near) == {5, 15}

    def test_dir_then_pos(self):
        n = 20
        rng = np.random.default_rng(0)
        poses = rng.normal(size=(n, 3))
        dirs = np.tile([[0.0, 0.0, 1.0]], (n, 1))
        dirs[10:] = [0, 0, -1]  # opposite half
        ids = np.arange(n)
        near = nearest_views.nearest_by_dir_then_pos(
            poses[0], np.array([0.0, 0.0, 1.0]), 0, poses, dirs, ids, 3)
        # all selected must come from the aligned half
        assert all(i < 10 for i in near)


class TestPointInit:
    def test_unproject_depth_roundtrip(self):
        intr = np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]], np.float32)
        depth = np.full((24, 32), 2.0, np.float32)
        c2w = np.eye(4, dtype=np.float32)
        pts = point_init.unproject_depth(depth, intr, c2w)
        assert len(pts) == 24 * 32
        np.testing.assert_allclose(pts[:, 2], 2.0, rtol=1e-5)
        # reproject the first pixel (0, 0)
        np.testing.assert_allclose(
            pts[0], [(0 - 16) / 50 * 2, (0 - 12) / 50 * 2, 2.0], rtol=1e-5)

    def test_voxel_downsample_closest_picks_members(self):
        rng = np.random.default_rng(0)
        xyz = rng.uniform(0, 1, (500, 3)).astype(np.float32)
        down, idx = point_init.voxel_downsample_closest(xyz, 4)
        assert len(down) <= 4 ** 3
        np.testing.assert_array_equal(down, xyz[idx])

    def test_ply_roundtrip_ascii(self, tmp_path):
        xyz = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
        p = tmp_path / "cloud.ply"
        with open(p, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(xyz)}\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write("end_header\n")
            for r in xyz:
                f.write(f"{r[0]} {r[1]} {r[2]}\n")
        back = point_init.load_ply_points(str(p))
        np.testing.assert_allclose(back, xyz, rtol=1e-5)

    def test_ply_roundtrip_binary(self, tmp_path):
        xyz = np.random.default_rng(1).normal(size=(7, 3)).astype(np.float32)
        p = tmp_path / "cloud.ply"
        with open(p, "wb") as f:
            hdr = ("ply\nformat binary_little_endian 1.0\n"
                   f"element vertex {len(xyz)}\n"
                   "property float x\nproperty float y\nproperty float z\n"
                   "end_header\n")
            f.write(hdr.encode())
            f.write(xyz.astype("<f4").tobytes())
        back = point_init.load_ply_points(str(p))
        np.testing.assert_allclose(back, xyz, rtol=1e-6)


class TestBlurKernelRotation:
    def test_rotation_90_exact(self):
        from hybridneuralrendering_tpu.models.blur import _rotate_bilinear
        img = np.zeros((5, 5))
        img[1, 2] = 1.0  # above center
        out = _rotate_bilinear(img, 90)
        # 90 deg ccw about center: (row 1, col 2) -> (row 2, col 1)
        assert out[2, 1] > 0.99


class TestNativeSampler:
    def test_native_matches_semantics(self):
        from hybridneuralrendering_tpu.data import native_sampler as NS
        if NS.load() is None:
            import pytest
            pytest.skip("native lib not built")
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
        intr = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]], np.float32)
        rot = np.eye(3, dtype=np.float32)
        out = NS.assemble_batch(img, 2, 2, 4, 1, 3, intr, rot, seed=7)
        assert out is not None
        xy, rgb, dirs = out
        assert xy.shape == (8, 8, 2)
        # in-bounds with margin
        assert xy[..., 0].min() >= 2 and xy[..., 0].max() < 62
        assert xy[..., 1].min() >= 2 and xy[..., 1].max() < 46
        # gt gather matches numpy indexing
        flat = xy.reshape(-1, 2).astype(int)
        np.testing.assert_allclose(rgb, img[flat[:, 1], flat[:, 0]],
                                   rtol=1e-6)
        # ray dirs are unit and match the numpy builder
        from hybridneuralrendering_tpu.data.scannet import _np_raydir
        expect = _np_raydir(xy.reshape(-1, 2), intr, rot)
        np.testing.assert_allclose(dirs, expect, rtol=1e-4, atol=1e-5)

    def test_native_deterministic_by_seed(self):
        from hybridneuralrendering_tpu.data import native_sampler as NS
        if NS.load() is None:
            import pytest
            pytest.skip("native lib not built")
        img = np.zeros((32, 32, 3), np.float32)
        intr = np.eye(3, dtype=np.float32)
        rot = np.eye(3, dtype=np.float32)
        a = NS.assemble_batch(img, 0, 2, 4, 1, 2, intr, rot, seed=3)
        b = NS.assemble_batch(img, 0, 2, 4, 1, 2, intr, rot, seed=3)
        c = NS.assemble_batch(img, 0, 2, 4, 1, 2, intr, rot, seed=4)
        np.testing.assert_array_equal(a[0], b[0])
        assert not np.array_equal(a[0], c[0])

    def test_prefetch_pipeline(self):
        from hybridneuralrendering_tpu.data import native_sampler as NS
        if NS.load() is None:
            import pytest
            pytest.skip("native lib not built")
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (32, 40, 3)).astype(np.float32)
        intr = np.array([[30.0, 0, 20], [0, 30.0, 16], [0, 0, 1]], np.float32)
        rot = np.eye(3, dtype=np.float32)
        pipe = NS.PrefetchPipeline(num_workers=2)
        tickets = [pipe.submit(img, 0, 2, 4, 1, 2, intr, rot, seed=i)
                   for i in range(4)]
        got = set()
        for _ in range(4):
            t, xy, rgb, dirs = pipe.pop()
            got.add(t)
            assert xy.shape == (64, 2)
            flat = xy.astype(int)
            np.testing.assert_allclose(rgb, img[flat[:, 1], flat[:, 0]],
                                       rtol=1e-6)
        assert got == set(tickets)
        pipe.close()


class TestPaths:
    def test_render_path_interpolates(self):
        from hybridneuralrendering_tpu.data import paths
        c2ws = np.stack([np.eye(4)] * 3)
        c2ws[1, :3, 3] = [1, 0, 0]
        c2ws[2, :3, 3] = [1, 1, 0]
        out = paths.gen_render_path(c2ws, n_views=30)
        assert out.shape[1:] == (4, 4)
        # positions stay within the hull of keys (plus closure back to start)
        assert out[:, :3, 3].min() >= -1e-6
        assert out[:, :3, 3].max() <= 1.0 + 1e-6
        # rotations remain orthonormal
        for m in out[::5]:
            np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3),
                                       atol=1e-6)

    def test_euler_roundtrip(self):
        from hybridneuralrendering_tpu.data import paths
        rng = np.random.default_rng(0)
        for _ in range(10):
            deg = rng.uniform(-80, 80, 3)
            m = paths._matrix_from_euler_xyz(deg)
            back = paths._euler_xyz_from_matrix(m)
            np.testing.assert_allclose(back, deg, atol=1e-6)

    def test_view_triplets(self):
        from hybridneuralrendering_tpu.data import paths
        rng = np.random.default_rng(1)
        pos = rng.normal(size=(20, 3))
        tris = paths.build_view_triplets(pos)
        assert len(tris) >= 10
        covered = set(i for t in tris for i in t)
        assert covered == set(range(20))
        for t in tris:
            assert len(set(t)) == 3
