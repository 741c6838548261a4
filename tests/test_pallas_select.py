"""Pallas K-smallest kernel: interpreter-mode parity with the XLA path."""

import jax.numpy as jnp
import numpy as np

from hybridneuralrendering_tpu.ops import pallas_select as PS


class TestKSmallest:
    def _case(self, S, C, k, seed=0):
        rng = np.random.default_rng(seed)
        d = rng.uniform(0, 1, (S, C)).astype(np.float32)
        # sprinkle BIG (invalid) entries
        mask = rng.random((S, C)) < 0.3
        d[mask] = PS.BIG
        i = rng.integers(0, 10_000, (S, C)).astype(np.int32)
        return jnp.asarray(d), jnp.asarray(i)

    def test_interpret_matches_xla(self):
        d, i = self._case(70, 53, 4)
        pd, pi = PS.k_smallest(d, i, 4, interpret=True)
        xd, xi = PS.k_smallest_xla(d, i, 4)
        np.testing.assert_allclose(np.asarray(pd), np.asarray(xd), rtol=1e-6)
        # ids may differ on exact ties; distances must match, and ids must
        # realize those distances
        dd = np.asarray(d)
        for r in range(70):
            for c in range(4):
                if np.asarray(pd)[r, c] < PS.BIG:
                    col = np.where(dd[r] == np.asarray(pd)[r, c])[0]
                    assert np.asarray(pi)[r, c] in np.asarray(i)[r][col]

    def test_sorted_ascending(self):
        d, i = self._case(40, 96, 6, seed=1)
        pd, _ = PS.k_smallest(d, i, 6, interpret=True)
        pd = np.asarray(pd)
        assert (np.diff(pd, axis=1) >= -1e-7).all()

    def test_all_invalid_row(self):
        d = jnp.full((8, 32), PS.BIG)
        i = jnp.zeros((8, 32), jnp.int32)
        pd, pi = PS.k_smallest(d, i, 3, interpret=True)
        assert (np.asarray(pd) >= PS.BIG).all()
