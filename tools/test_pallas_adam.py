"""Fused Pallas Adam kernel vs optax.adam (interpreter mode on CPU).

The kernel (tools/pallas_adam.py, retired: bench −6.5% on the canonical
workload because the pallas_call boundary forces the gradient/update to
materialize where XLA fused the adam loops into the VJP tail — round-3 log)
reproduces optax.adam's update exactly: moments, bias correction, schedule.
"""

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import pallas_adam

from hybridneuralrendering_tpu.config import tiny_test
from hybridneuralrendering_tpu.train import state as state_mod


class TestPallasAdam:
    def test_kernel_matches_optax_adam(self):
        """The fused kernel reproduces optax.adam's update — moments, bias
        correction, schedule — over several accumulating steps."""
        import optax

        N, F = 192, 64
        cfg = tiny_test().optim
        sched = state_mod.lr_schedule(cfg.plr, cfg)
        opt = optax.adam(sched, b1=cfg.beta1, b2=cfg.beta2)

        key = jax.random.PRNGKey(3)
        p_ref = {"table": jax.random.normal(key, (N, F))}
        st_ref = opt.init(p_ref)
        p_fu = {"table": p_ref["table"]}
        adam_st, sched_st = opt.init(p_fu)
        mu, nu = adam_st.mu["table"], adam_st.nu["table"]

        for i in range(4):
            g = jax.random.normal(jax.random.PRNGKey(10 + i), (N, F))
            up, st_ref = opt.update({"table": g}, st_ref, p_ref)
            p_ref = jax.tree_util.tree_map(lambda p, u: p + u, p_ref, up)

            scalars = pallas_adam.adam_scalars(
                adam_st.count, sched_st.count, sched, cfg.beta1, cfg.beta2)
            pt, mu, nu = pallas_adam.adam_table_update(
                p_fu["table"], g, mu, nu, scalars, interpret=True)
            p_fu = {"table": pt}
            adam_st = adam_st._replace(count=adam_st.count + 1)
            sched_st = sched_st._replace(count=sched_st.count + 1)

            np.testing.assert_allclose(np.asarray(p_fu["table"]),
                                       np.asarray(p_ref["table"]),
                                       rtol=2e-6, atol=2e-7)
        np.testing.assert_allclose(np.asarray(mu),
                                   np.asarray(st_ref[0].mu["table"]),
                                   rtol=2e-6, atol=2e-7)
        np.testing.assert_allclose(np.asarray(nu),
                                   np.asarray(st_ref[0].nu["table"]),
                                   rtol=2e-6, atol=2e-7)
