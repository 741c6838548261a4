"""Perspective-space querier tests."""

import jax.numpy as jnp
import numpy as np

from hybridneuralrendering_tpu.config import QuerierConfig
from hybridneuralrendering_tpu.core.cameras import w2pers
from hybridneuralrendering_tpu.ops import query_pers as QP


def cfg_pers():
    return QuerierConfig(
        vsize=(0.01, 0.01, 0.05), vscale=(2, 2, 2), kernel_size=(3, 3, 3),
        query_size=(3, 3, 3), z_depth_dim=64, SR=8, K=4, P=16, max_o=8192,
        ranges=(-9.0,) * 3 + (9.0,) * 3, grid_capacity=2_000_000,
        radius_limit_scale=0.0, sample_jitter=0.0,
        Ps=32, max_nodes=60_000)


def setup(n=600, seed=0):
    cfg = cfg_pers()
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    xyz[:, 2] += 2.0  # in front of the camera at origin
    intr = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
    camrot = np.eye(3, dtype=np.float32)
    campos = np.zeros(3, np.float32)
    geom = QP.frustum_geometry(intr, 48, 64, 0.5, 4.0, cfg)
    grid = QP.build_frustum_grid(jnp.asarray(xyz), jnp.ones(n, bool),
                                 jnp.asarray(camrot), jnp.asarray(campos),
                                 geom, cfg)
    return cfg, xyz, grid, camrot, campos


class TestFrustumQuery:
    def test_hits_and_knn_oracle(self):
        cfg, xyz, grid, camrot, campos = setup()
        rng = np.random.default_rng(1)
        targets = xyz[rng.integers(0, len(xyz), 12)]
        dirs = targets - campos
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        res = QP.query_points_pers(grid, jnp.asarray(xyz), jnp.asarray(camrot),
                                   jnp.asarray(campos),
                                   jnp.asarray(dirs, jnp.float32), cfg,
                                   0.5, 4.0)
        assert bool(np.asarray(res.ray_mask).any())
        # K-NN correctness in PERSPECTIVE space for a few samples
        pers_pts = np.asarray(w2pers(jnp.asarray(xyz), jnp.asarray(camrot),
                                     jnp.asarray(campos)))
        locw = np.asarray(res.sample_loc_w)
        pidx = np.asarray(res.sample_pidx)
        pmask = np.asarray(res.pnt_mask)
        smask = np.asarray(res.sample_mask)
        vs = np.asarray(grid.geom.vsize)
        origin = np.asarray(grid.geom.origin)
        vox_p = np.floor((pers_pts - origin) / vs).astype(np.int64)
        checked = 0
        for r in range(pidx.shape[0]):
            for s in range(pidx.shape[1]):
                if not smask[r, s] or not pmask[r, s].any():
                    continue
                loc_pers = np.asarray(w2pers(
                    jnp.asarray(locw[r, s][None]), jnp.asarray(camrot),
                    jnp.asarray(campos)))[0]
                cv = np.floor((loc_pers - origin) / vs).astype(np.int64)
                inside = (np.abs(vox_p - cv) <= 1).all(axis=-1)
                cand = np.where(inside)[0]
                dist = np.linalg.norm(pers_pts[cand] - loc_pers, axis=-1)
                k = min(cfg.K, len(cand))
                got = pidx[r, s][pmask[r, s]]
                assert len(got) == k
                np.testing.assert_allclose(
                    np.sort(np.linalg.norm(pers_pts[got] - loc_pers, axis=-1)),
                    np.sort(dist)[:k], rtol=1e-4)
                checked += 1
        assert checked > 10

    def test_points_behind_camera_excluded(self):
        cfg, xyz, grid, camrot, campos = setup()
        xyz2 = xyz.copy()
        xyz2[:, 2] -= 4.0  # all behind
        geom = grid.geom
        g2 = QP.build_frustum_grid(jnp.asarray(xyz2), jnp.ones(len(xyz2), bool),
                                   jnp.asarray(camrot), jnp.asarray(campos),
                                   geom, cfg)
        assert int(g2.num_occ) == 0
