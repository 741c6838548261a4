"""Pallas single-pass row cumsum: interpreter-mode parity with jnp.cumsum."""

import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
import pallas_scan as PC


class TestCumsumRows:
    def test_interpret_matches_jnp(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(PC.BLOCK_M * 2 + 37, 64)).astype(np.float32)
        got = PC.cumsum_rows(jnp.asarray(x), interpret=True)
        ref = jnp.cumsum(jnp.asarray(x), axis=0)
        # f32 prefix sums over ~1e3 rows differ by accumulation order at the
        # ~eps * sum|x| level
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=2e-4)

    def test_single_partial_block(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(13, 8)).astype(np.float32)
        got = PC.cumsum_rows(jnp.asarray(x), interpret=True)
        ref = jnp.cumsum(jnp.asarray(x), axis=0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
