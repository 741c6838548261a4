"""RAFT optical-flow tests (untrained weights: structural + zero-flow oracle)."""

import jax
import jax.numpy as jnp
import numpy as np

from hybridneuralrendering_tpu.flow import raft


class TestCorr:
    def test_corr_pyramid_shapes(self):
        rng = np.random.default_rng(0)
        f1 = jnp.asarray(rng.normal(size=(8, 8, 16)).astype(np.float32))
        f2 = jnp.asarray(rng.normal(size=(8, 8, 16)).astype(np.float32))
        pyr = raft.corr_pyramid(f1, f2, 3)
        assert pyr[0].shape == (64, 8, 8)
        assert pyr[1].shape == (64, 4, 4)
        assert pyr[2].shape == (64, 2, 2)

    def test_corr_identity_peak(self):
        """Correlation of a map with itself peaks at the own position."""
        rng = np.random.default_rng(1)
        f = jnp.asarray(rng.normal(size=(6, 6, 32)).astype(np.float32))
        pyr = raft.corr_pyramid(f, f, 1)
        c = np.asarray(pyr[0]).reshape(36, 36)
        assert (c.argmax(axis=1) == np.arange(36)).mean() > 0.9

    def test_corr_lookup_shapes(self):
        rng = np.random.default_rng(2)
        f1 = jnp.asarray(rng.normal(size=(8, 8, 16)).astype(np.float32))
        pyr = raft.corr_pyramid(f1, f1, 4)
        ys, xs = jnp.mgrid[0:8, 0:8].astype(jnp.float32)
        coords = jnp.stack([xs, ys], -1)
        out = raft.corr_lookup(pyr, coords, 4)
        assert out.shape == (8, 8, 4 * 81)


class TestUpsample:
    def test_convex_upsample_constant_flow(self):
        """Uniform softmax weights over a constant flow keep it constant."""
        flow = jnp.ones((1, 4, 4, 2)) * 0.5
        mask = jnp.zeros((1, 4, 4, 576))  # softmax -> uniform over 9 taps
        up = raft.upsample_flow_convex(flow, mask)
        assert up.shape == (1, 32, 32, 2)
        inner = np.asarray(up)[0, 8:-8, 8:-8]
        np.testing.assert_allclose(inner, 4.0, rtol=1e-5)  # 8 * 0.5


class TestEndToEnd:
    def test_identical_images_give_small_flow(self):
        params = raft.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 255, (32, 40, 3)).astype(np.float32))
        flow = raft.estimate_flow(params, img, img, iters=2)
        assert flow.shape == (32, 40, 2)
        assert np.isfinite(np.asarray(flow)).all()

    def test_flow_fn_adapter_pads(self):
        params = raft.init(jax.random.PRNGKey(0))
        fn = raft.make_flow_fn(params, iters=1)
        g = np.random.default_rng(1).uniform(0, 255, (30, 37))
        out = fn(g, g)
        assert out.shape == (30, 37, 2)
