"""Banded one-hot segment-sum kernel: interpreter-mode parity with the XLA
cumsum pipe and with a numpy oracle (tools/pallas_gather.py)."""

import jax

# interpret-mode tests run on CPU (like tests/conftest.py): on the TPU
# backend XLA's algebraic simplifier folds the kernel's bf16 hi/lo split
# back into a single lossy bf16 pass — the real Mosaic path is unaffected
# (measured rel err 2.8e-6 on-device, tools/ablate_segsum.py)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import pallas_gather as PG


def make_case(rng, M, N, C, skew=False):
    """Sorted ids + cotangent rows; `skew` concentrates rows on few ids
    (duplicate-heavy) and leaves long empty id runs (wide windows)."""
    if skew:
        ids = rng.choice(np.arange(0, N, 97), size=M)
    else:
        ids = rng.integers(0, N, M)
    si = np.sort(ids).astype(np.int32)
    sg = rng.normal(size=(M, C)).astype(np.float32)
    # inclusive cummax segment ends, like _gather_rows_bwd builds
    end_pos = np.full(N, -1, np.int64)
    for j, p in enumerate(si):
        end_pos[p] = j
    end_pos = np.maximum.accumulate(end_pos)
    return si, sg, end_pos.astype(np.int32)


def oracle(si, sg, N):
    out = np.zeros((N, sg.shape[1]), np.float64)
    np.add.at(out, si, sg.astype(np.float64))
    return out.astype(np.float32)


class TestBandedSegmentSum:
    def test_matches_oracle_uniform(self):
        rng = np.random.default_rng(0)
        M, N, C = 3000, 2000, 64
        si, sg, end_pos = make_case(rng, M, N, C)
        ref = oracle(si, sg, N)
        got = np.asarray(PG.banded_segment_sum(
            jnp.asarray(sg), jnp.asarray(end_pos), N, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_matches_oracle_skewed(self):
        rng = np.random.default_rng(1)
        M, N, C = 4096, 1537, 64     # non-multiple N exercises the pad block
        si, sg, end_pos = make_case(rng, M, N, C, skew=True)
        ref = oracle(si, sg, N)
        got = np.asarray(PG.banded_segment_sum(
            jnp.asarray(sg), jnp.asarray(end_pos), N, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_matches_xla_pipe(self):
        rng = np.random.default_rng(2)
        M, N, C = 2048, 1024, 128
        si, sg, end_pos = make_case(rng, M, N, C)
        ref = np.asarray(PG.banded_segment_sum_xla(
            jnp.asarray(sg), jnp.asarray(end_pos), N))
        got = np.asarray(PG.banded_segment_sum(
            jnp.asarray(sg), jnp.asarray(end_pos), N, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_empty_ids_zero(self):
        rng = np.random.default_rng(3)
        M, N, C = 512, 4096, 64      # most ids empty
        si, sg, end_pos = make_case(rng, M, N, C)
        got = np.asarray(PG.banded_segment_sum(
            jnp.asarray(sg), jnp.asarray(end_pos), N, interpret=True))
        empty = np.setdiff1d(np.arange(N), si)
        np.testing.assert_array_equal(got[empty], 0.0)
