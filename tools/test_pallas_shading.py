"""Fused Pallas shading-chain kernel vs the XLA aggregator chain.

The kernel (tools/pallas_shading.py, retired: bench-neutral on the canonical
workload, round-2 log) is a drop-in numerical replacement for
block1[+block2]+block3+alpha-head, forward AND backward — verified here in
interpreter mode on CPU.
"""

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import pytest

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import pallas_shading as PS

from hybridneuralrendering_tpu.models import mlp


def ref_chain(blockA, blockB, head, x1, extra):
    h = mlp.mlp_apply(blockA, x1, "leaky_relu", final_act=True)
    h = mlp.mlp_apply(blockB, jnp.concatenate([h, extra], axis=1),
                      "leaky_relu", final_act=True)
    return h, mlp.mlp_apply(head, h, "leaky_relu")


def make_params(key, dims_a, dims_b, dims_h):
    ka, kb, kh = jax.random.split(key, 3)
    return (mlp.mlp_init(ka, dims_a, "leaky_relu", final_act=True),
            mlp.mlp_init(kb, dims_b, "leaky_relu", final_act=True),
            mlp.mlp_init(kh, dims_h, "leaky_relu"))


@pytest.mark.parametrize("dims", [
    # canonical ScanNet chain: block1 [284,256,256], block3 [263,...], head 1L
    ([284, 256, 256], [256 + 7, 256, 256], [256, 1], 7),
    # deeper head + odd widths exercise the lane padding
    ([45, 128, 128], [128 + 7, 128, 128], [128, 64, 1], 7),
    # no extra channels (point_color_mode/dir_mode '0')
    ([60, 128], [128, 128], [128, 1], 0),
])
def test_kernel_matches_xla_chain(dims):
    dims_a, dims_b, dims_h, ce = dims
    key = jax.random.PRNGKey(0)
    blockA, blockB, head = make_params(key, dims_a, dims_b, dims_h)
    N = 300
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    x1 = jax.random.normal(ks[0], (N, dims_a[0]))
    extra = jax.random.normal(ks[1], (N, ce))
    df = jax.random.normal(ks[2], (N, dims_b[-1]))
    da = jax.random.normal(ks[3], (N, 1))

    f_r, a_r = ref_chain(blockA, blockB, head, x1, extra)
    f_k, a_k = PS.fused_feat_alpha(blockA, blockB, head, x1, extra,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_r),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_r),
                               rtol=2e-5, atol=1e-5)

    def loss(fn, bA, bB, hd, x1, ex):
        f, a = fn(bA, bB, hd, x1, ex)
        return jnp.sum(f * df) + jnp.sum(a * da)

    g_r = jax.grad(lambda *a: loss(ref_chain, *a),
                   argnums=(0, 1, 2, 3, 4))(blockA, blockB, head, x1, extra)
    g_k = jax.grad(
        lambda *a: loss(
            lambda *b: PS.fused_feat_alpha(*b, interpret=True), *a),
        argnums=(0, 1, 2, 3, 4))(blockA, blockB, head, x1, extra)
    for r, k in zip(jax.tree_util.tree_leaves(g_r),
                    jax.tree_util.tree_leaves(g_k)):
        if np.asarray(r).size == 0:
            continue
        scale = np.maximum(np.max(np.abs(np.asarray(r))), 1e-6)
        np.testing.assert_allclose(np.asarray(k) / scale,
                                   np.asarray(r) / scale,
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("freqs", [(3, 5), (2, 0), (0, 2)])
def test_pe_variant_matches_encoded_chain(freqs):
    """On-chip PE expansion + W-row permutation == XLA encode-then-chain."""
    from hybridneuralrendering_tpu.core.encoding import positional_encoding
    fe, fd = freqs
    Df, Dd, Ce = 32, 6, 7
    c1 = Df + 2 * fe * Df + (Dd if fd == 0 else 2 * fd * Dd)
    dims_a, dims_b, dims_h = [c1, 128, 128], [128 + Ce, 128], [128, 1]
    blockA, blockB, head = make_params(jax.random.PRNGKey(5),
                                       dims_a, dims_b, dims_h)
    ks = jax.random.split(jax.random.PRNGKey(6), 5)
    N = 200
    emb = jax.random.normal(ks[0], (N, Df))
    dists = jax.random.normal(ks[1], (N, Dd))
    extra = jax.random.normal(ks[2], (N, Ce))
    df = jax.random.normal(ks[3], (N, dims_b[-1]))
    da = jax.random.normal(ks[4], (N, 1))

    def encode(emb, dists):
        x = emb
        if fe > 0:
            x = jnp.concatenate([x, positional_encoding(x, fe)], axis=-1)
        de = positional_encoding(dists, fd) if fd > 0 else dists
        return jnp.concatenate([x, de], axis=-1)

    def loss_ref(bA, bB, hd, emb, dists, ex):
        f, a = ref_chain(bA, bB, hd, encode(emb, dists), ex)
        return jnp.sum(f * df) + jnp.sum(a * da)

    def loss_pe(bA, bB, hd, emb, dists, ex):
        f, a = PS.fused_feat_alpha_pe(bA, bB, hd, emb, dists, ex, fe, fd,
                                      interpret=True)
        return jnp.sum(f * df) + jnp.sum(a * da)

    args = (blockA, blockB, head, emb, dists, extra)
    v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(*args)
    v_k, g_k = jax.value_and_grad(loss_pe, argnums=(0, 1, 2, 3, 4, 5))(*args)
    np.testing.assert_allclose(float(v_k), float(v_r), rtol=1e-5)
    for r, k in zip(jax.tree_util.tree_leaves(g_r),
                    jax.tree_util.tree_leaves(g_k)):
        scale = np.maximum(np.max(np.abs(np.asarray(r))), 1e-6)
        np.testing.assert_allclose(np.asarray(k) / scale,
                                   np.asarray(r) / scale,
                                   rtol=1e-4, atol=1e-5)


def test_row_padding_exact():
    """N not a multiple of the tile: pad rows must not perturb results."""
    dims_a, dims_b, dims_h = [32, 128], [128 + 3, 128], [128, 1]
    blockA, blockB, head = make_params(jax.random.PRNGKey(2),
                                       dims_a, dims_b, dims_h)
    x1 = jax.random.normal(jax.random.PRNGKey(3), (37, 32))
    extra = jax.random.normal(jax.random.PRNGKey(4), (37, 3))
    f_r, a_r = ref_chain(blockA, blockB, head, x1, extra)
    f_k, a_k = PS.fused_feat_alpha(blockA, blockB, head, x1, extra,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_r),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_r),
                               rtol=2e-5, atol=1e-5)
