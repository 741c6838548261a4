"""Tests for the deterministic voxel-grid querier against brute-force oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from hybridneuralrendering_tpu.config import QuerierConfig
from hybridneuralrendering_tpu.ops import query as Q
from hybridneuralrendering_tpu.ops import voxel_grid as VG


def small_cfg(**kw):
    base = dict(
        vsize=(0.05, 0.05, 0.05), vscale=(2, 2, 2), kernel_size=(3, 3, 3),
        query_size=(3, 3, 3), z_depth_dim=64, SR=8, K=4, P=16, max_o=8192,
        ranges=(-2.0, -2.0, -2.0, 2.0, 2.0, 2.0), grid_capacity=300_000,
        radius_limit_scale=0.0, sample_jitter=0.0,
        supervoxel=False, Ps=64, max_nodes=120_000)
    base.update(kw)
    return QuerierConfig(**base)


def make_cloud(n=500, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    return xyz


class TestVoxelGrid:
    def test_geometry_matches_reference_rule(self):
        cfg = small_cfg()
        xyz = make_cloud()
        mask = np.ones(len(xyz), bool)
        geom = VG.compute_grid_geometry(xyz, mask, cfg)
        svs = np.asarray(cfg.query_vsize)
        expect_min = xyz.min(0) - svs * np.asarray(cfg.kernel_size) / 2
        np.testing.assert_allclose(np.asarray(geom.origin), expect_min,
                                   rtol=1e-5)
        dims = np.asarray(geom.dims)
        ext = xyz.max(0) + svs * np.asarray(cfg.kernel_size) / 2 - expect_min
        expect_dims = np.ceil(ext / np.asarray(cfg.vsize) /
                              np.asarray(cfg.vscale)).astype(np.int32)
        np.testing.assert_array_equal(dims, expect_dims)

    def test_capacity_check(self):
        cfg = small_cfg(grid_capacity=10)
        xyz = make_cloud()
        try:
            VG.compute_grid_geometry(xyz, np.ones(len(xyz), bool), cfg)
            assert False, "expected ValueError"
        except ValueError:
            pass

    def test_occ_bits_matches_occ_dilated(self):
        """Bit-packed cull table agrees with the dense i8 table bit-for-bit."""
        cfg = small_cfg()
        xyz = make_cloud(500)
        mask = np.ones(len(xyz), bool)
        geom = VG.compute_grid_geometry(xyz, mask, cfg)
        grid = VG.build_grid(jnp.asarray(xyz), jnp.asarray(mask), geom, cfg)
        dense = np.asarray(grid.occ_dilated).astype(np.int64)
        bits = np.asarray(grid.occ_bits)
        vids = np.arange(len(dense))
        unpacked = (bits[vids >> 5] >> (vids & 31)) & 1
        np.testing.assert_array_equal(unpacked, dense)

    def test_tables_consistent(self):
        cfg = small_cfg()
        xyz = make_cloud(800)
        mask = np.ones(len(xyz), bool)
        geom = VG.compute_grid_geometry(xyz, mask, cfg)
        grid = VG.build_grid(jnp.asarray(xyz), jnp.asarray(mask), geom, cfg)

        coor2occ = np.asarray(grid.coor2occ)
        occ_pnts = np.asarray(grid.occ_pnts)
        occ_num = np.asarray(grid.occ_numpnts)
        num_occ = int(grid.num_occ)

        # every point's voxel must be registered and contain the point
        # (no bucket can overflow at these sizes)
        vox = np.floor((xyz - np.asarray(geom.origin)) /
                       np.asarray(geom.vsize)).astype(np.int64)
        d = np.asarray(geom.dims)
        # coor2occ lives in the z-padded layout (stride gz+2, offset +1)
        lin_pad = (vox[:, 0] * d[1] + vox[:, 1]) * (d[2] + 2) + vox[:, 2] + 1
        for pid in range(0, len(xyz), 37):
            o = coor2occ[lin_pad[pid]]
            assert o >= 0
            assert pid in occ_pnts[o][:occ_num[o]]

        # occupied-voxel count equals number of distinct voxels
        assert num_occ == len(np.unique(lin_pad))
        # counts match
        uniq, cnt = np.unique(lin_pad, return_counts=True)
        for u, c in zip(uniq[::7], cnt[::7]):
            assert occ_num[coor2occ[u]] == min(c, cfg.P)

    def test_bucket_overflow_keeps_first_P(self):
        cfg = small_cfg(P=4)
        # 10 points in the same voxel
        xyz = np.tile(np.asarray([[0.501, 0.502, 0.503]], np.float32), (10, 1))
        xyz += np.random.default_rng(0).uniform(0, 0.01, (10, 3)).astype(np.float32)
        mask = np.ones(10, bool)
        geom = VG.compute_grid_geometry(xyz, mask, cfg)
        grid = VG.build_grid(jnp.asarray(xyz), jnp.asarray(mask), geom, cfg)
        occ_num = np.asarray(grid.occ_numpnts)
        occ_pnts = np.asarray(grid.occ_pnts)
        live = occ_num > 0
        assert occ_num[live].max() == 4
        # deterministic: the stored ids are the lowest point ids of the voxel
        row = occ_pnts[np.argmax(live)]
        assert sorted(row[:4].tolist()) == row[:4].tolist()

    def test_masked_points_excluded(self):
        cfg = small_cfg()
        xyz = make_cloud(100)
        mask = np.zeros(100, bool)
        mask[:50] = True
        geom = VG.compute_grid_geometry(xyz, mask, cfg)
        grid = VG.build_grid(jnp.asarray(xyz), jnp.asarray(mask), geom, cfg)
        stored = np.asarray(grid.occ_pnts)
        stored = stored[stored >= 0]
        assert stored.max() < 50

    def test_dilation_superset_of_occupancy(self):
        cfg = small_cfg()
        xyz = make_cloud(300)
        mask = np.ones(300, bool)
        geom = VG.compute_grid_geometry(xyz, mask, cfg)
        grid = VG.build_grid(jnp.asarray(xyz), jnp.asarray(mask), geom, cfg)
        # every point's own voxel (unpadded layout) must be dilated-occupied,
        # and dilation strictly grows occupancy
        d = np.asarray(geom.dims)
        vox = np.floor((xyz - np.asarray(geom.origin)) /
                       np.asarray(geom.vsize)).astype(np.int64)
        lin = (vox[:, 0] * d[1] + vox[:, 1]) * d[2] + vox[:, 2]
        dil = np.asarray(grid.occ_dilated) > 0
        assert dil[lin].all()
        n_occ = int(grid.num_occ)
        assert dil.sum() > n_occ


class TestQuery:
    def _setup(self, cfg, n=600, seed=1):
        xyz = make_cloud(n, seed)
        mask = np.ones(n, bool)
        geom = VG.compute_grid_geometry(xyz, mask, cfg)
        grid = VG.build_grid(jnp.asarray(xyz), jnp.asarray(mask), geom, cfg)
        return xyz, grid

    def test_knn_matches_bruteforce(self):
        cfg = small_cfg()
        xyz, grid = self._setup(cfg)
        campos = jnp.asarray([0.0, 0.0, -3.0])
        # rays toward the cloud
        rng = np.random.default_rng(2)
        targets = xyz[rng.integers(0, len(xyz), 16)]
        dirs = targets - np.asarray(campos)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        res = Q.query_points(grid, jnp.asarray(xyz), campos,
                             jnp.asarray(dirs, jnp.float32), cfg,
                             near=1.0, far=6.0)
        pidx = np.asarray(res.sample_pidx)
        loc = np.asarray(res.sample_loc_w)
        smask = np.asarray(res.sample_mask)
        pmask = np.asarray(res.pnt_mask)

        assert np.asarray(res.ray_mask).any()

        # oracle: for each valid shading point, the K nearest points within the
        # kernel_size voxel neighborhood
        d = np.asarray(grid.geom.dims)
        origin = np.asarray(grid.geom.origin)
        vs = np.asarray(grid.geom.vsize)
        vox_p = np.floor((xyz - origin) / vs).astype(np.int64)
        checked = 0
        for r in range(pidx.shape[0]):
            for s in range(pidx.shape[1]):
                if not smask[r, s]:
                    continue
                cv = np.floor((loc[r, s] - origin) / vs).astype(np.int64)
                nb = np.abs(vox_p - cv)
                inside = (nb <= 1).all(axis=-1)   # kernel 3 -> +-1
                cand = np.where(inside)[0]
                if len(cand) == 0:
                    assert not pmask[r, s].any()
                    continue
                dist = np.linalg.norm(xyz[cand] - loc[r, s], axis=-1)
                k = min(cfg.K, len(cand))
                best = cand[np.argsort(dist, kind="stable")[:k]]
                got = pidx[r, s][pmask[r, s]]
                assert len(got) == k
                # compare as distance sets (ties may reorder ids)
                np.testing.assert_allclose(
                    np.sort(np.linalg.norm(xyz[got] - loc[r, s], axis=-1)),
                    np.sort(dist[np.argsort(dist)[:k]]), rtol=1e-5)
                checked += 1
        assert checked > 20

    def test_supervoxel_matches_per_voxel_path(self):
        """Supervoxel fast path == legacy per-voxel path (non-overflow)."""
        cfg_sv = small_cfg(supervoxel=True)
        cfg_pv = small_cfg(supervoxel=False)
        xyz, grid = self._setup(cfg_sv)
        campos = jnp.asarray([0.0, 0.0, -3.0])
        rng = np.random.default_rng(5)
        targets = xyz[rng.integers(0, len(xyz), 24)]
        dirs = targets - np.asarray(campos)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs = jnp.asarray(dirs, jnp.float32)
        r_sv = Q.query_points(grid, jnp.asarray(xyz), campos, dirs, cfg_sv,
                              near=1.0, far=6.0)
        r_pv = Q.query_points(grid, jnp.asarray(xyz), campos, dirs, cfg_pv,
                              near=1.0, far=6.0)
        np.testing.assert_array_equal(np.asarray(r_sv.sample_mask),
                                      np.asarray(r_pv.sample_mask))
        np.testing.assert_array_equal(np.asarray(r_sv.pnt_mask),
                                      np.asarray(r_pv.pnt_mask))
        np.testing.assert_array_equal(np.asarray(r_sv.ray_mask),
                                      np.asarray(r_pv.ray_mask))
        # same neighbor sets (ties may reorder between paths)
        a = np.sort(np.asarray(r_sv.sample_pidx), axis=-1)
        b = np.sort(np.asarray(r_pv.sample_pidx), axis=-1)
        np.testing.assert_array_equal(a, b)

    def test_supervoxel_knn_matches_bruteforce(self):
        cfg = small_cfg(supervoxel=True)
        xyz, grid = self._setup(cfg)
        assert grid.node_bucket is not None
        campos = jnp.asarray([0.0, 0.0, -3.0])
        rng = np.random.default_rng(2)
        targets = xyz[rng.integers(0, len(xyz), 16)]
        dirs = targets - np.asarray(campos)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        res = Q.query_points(grid, jnp.asarray(xyz), campos,
                             jnp.asarray(dirs, jnp.float32), cfg,
                             near=1.0, far=6.0)
        pidx = np.asarray(res.sample_pidx)
        loc = np.asarray(res.sample_loc_w)
        smask = np.asarray(res.sample_mask)
        pmask = np.asarray(res.pnt_mask)
        origin = np.asarray(grid.geom.origin)
        vs = np.asarray(grid.geom.vsize)
        vox_p = np.floor((xyz - origin) / vs).astype(np.int64)
        checked = 0
        for r in range(pidx.shape[0]):
            for s in range(pidx.shape[1]):
                if not smask[r, s]:
                    continue
                cv = np.floor((loc[r, s] - origin) / vs).astype(np.int64)
                inside = (np.abs(vox_p - cv) <= 1).all(axis=-1)
                cand = np.where(inside)[0]
                if len(cand) == 0:
                    assert not pmask[r, s].any()
                    continue
                dist = np.linalg.norm(xyz[cand] - loc[r, s], axis=-1)
                k = min(cfg.K, len(cand))
                got = pidx[r, s][pmask[r, s]]
                assert len(got) == k
                np.testing.assert_allclose(
                    np.sort(np.linalg.norm(xyz[got] - loc[r, s], axis=-1)),
                    np.sort(dist)[:k], rtol=1e-5)
                checked += 1
        assert checked > 20

    def test_supervoxel_node_tables_consistent(self):
        """Each point's own voxel has a node whose bucket contains the point,
        and the node bucket holds exactly the window's points (small scene)."""
        cfg = small_cfg(supervoxel=True)
        xyz = make_cloud(300, 3)
        mask = np.ones(len(xyz), bool)
        geom = VG.compute_grid_geometry(xyz, mask, cfg)
        grid = VG.build_grid(jnp.asarray(xyz), jnp.asarray(mask), geom, cfg)
        coor2node = np.asarray(grid.coor2node)
        bucket = np.asarray(grid.node_bucket)
        Ps = cfg.Ps
        pid_tab = bucket[:, 3 * Ps:4 * Ps].view(np.int32)
        d = np.asarray(geom.dims)
        vox = np.floor((xyz - np.asarray(geom.origin)) /
                       np.asarray(geom.vsize)).astype(np.int64)
        lin = (vox[:, 0] * d[1] + vox[:, 1]) * d[2] + vox[:, 2]
        for pid in range(0, len(xyz), 29):
            node = coor2node[lin[pid]]
            assert node >= 0
            row = pid_tab[node]
            assert pid in row[row >= 0]
            # bucket contents == brute-force window membership
            expect = set(np.where(
                (np.abs(vox - vox[pid]) <= 1).all(axis=-1))[0].tolist())
            got = set(int(p) for p in row[row >= 0])
            assert expect == got

    def test_miss_rays_masked(self):
        cfg = small_cfg()
        xyz, grid = self._setup(cfg)
        campos = jnp.asarray([0.0, 0.0, -3.0])
        # rays pointing away from the cloud
        dirs = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
        res = Q.query_points(grid, jnp.asarray(xyz), campos, dirs, cfg,
                             near=0.5, far=2.0)
        assert not np.asarray(res.ray_mask).any()
        assert not np.asarray(res.pnt_mask).any()

    def test_first_SR_selection(self):
        """Shading points are the first SR occupancy hits along the ray."""
        cfg = small_cfg(SR=4)
        # a dense line of points along z
        z = np.linspace(0.0, 1.5, 200)
        xyz = np.stack([np.zeros_like(z), np.zeros_like(z), z],
                       axis=-1).astype(np.float32)
        mask = np.ones(len(xyz), bool)
        geom = VG.compute_grid_geometry(xyz, mask, cfg)
        grid = VG.build_grid(jnp.asarray(xyz), jnp.asarray(mask), geom, cfg)
        campos = jnp.asarray([0.0, 0.0, -1.0])
        dirs = jnp.asarray([[0.0, 0.0, 1.0]])
        res = Q.query_points(grid, jnp.asarray(xyz), campos, dirs, cfg,
                             near=0.5, far=3.0)
        loc = np.asarray(res.sample_loc_w)[0]
        smask = np.asarray(res.sample_mask)[0]
        assert smask.all()
        # strictly increasing depth, starting near the first point
        assert (np.diff(loc[:, 2]) > 0).all()
        assert loc[0, 2] < 0.1

    def test_deterministic(self):
        cfg = small_cfg()
        xyz, grid = self._setup(cfg)
        campos = jnp.asarray([0.0, 0.0, -3.0])
        dirs = jnp.asarray([[0.05, 0.02, 1.0]] * 3)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        r1 = Q.query_points(grid, jnp.asarray(xyz), campos, dirs, cfg, 1.0, 6.0)
        r2 = Q.query_points(grid, jnp.asarray(xyz), campos, dirs, cfg, 1.0, 6.0)
        np.testing.assert_array_equal(np.asarray(r1.sample_pidx),
                                      np.asarray(r2.sample_pidx))
        # identical rays get identical results
        np.testing.assert_array_equal(np.asarray(r1.sample_pidx[0]),
                                      np.asarray(r1.sample_pidx[1]))

    def test_jit_compiles(self):
        cfg = small_cfg()
        xyz, grid = self._setup(cfg, n=300)
        f = jax.jit(lambda g, x, c, d: Q.query_points(
            g, x, c, d, cfg, 1.0, 6.0))
        campos = jnp.asarray([0.0, 0.0, -3.0])
        dirs = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
        out = f(grid, jnp.asarray(xyz), campos, dirs)
        assert out.sample_pidx.shape == (4, cfg.SR, cfg.K)
