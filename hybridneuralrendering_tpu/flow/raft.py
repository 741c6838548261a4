"""RAFT optical flow in JAX — offline tool for quality-aware frame weights.

TPU rewrite of the vendored RAFT (/root/reference/raft/core/{raft,extractor,
corr,update}.py): BasicEncoder (residual blocks, instance/batch norm), the
all-pairs correlation pyramid, the SepConvGRU recurrent update, and convex-
combination 8x upsampling.  The iterative refinement is a `lax.scan`; the
correlation volume is one [H*W, H*W] MXU matmul per level — the TPU-native
answer to the reference's optional alt_cuda_corr CUDA extension
(SURVEY §2.9 item 4).

Only used offline by data/frame_weights.py (the reference runs RAFT once per
scene to precompute <scene>_frame_weight_step5.npy).
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple

import jax
import jax.numpy as jnp

CORR_LEVELS = 4
CORR_RADIUS = 4
HDIM = 128
CDIM = 128


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

def _kaiming(key, shape, fan_out):
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape) * std


def conv_init(key, cin, cout, k, kh=None):
    kh = kh or k
    w = _kaiming(key, (k, kh, cin, cout), cout * k * kh)
    return {"w": w, "b": jnp.zeros(cout)}


def conv(p, x, stride=1):
    kh, kw = p["w"].shape[0], p["w"].shape[1]
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride),
        ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def instance_norm(x, eps=1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def bn_init(ch):
    return {"scale": jnp.ones(ch), "bias": jnp.zeros(ch),
            "mean": jnp.zeros(ch), "var": jnp.ones(ch)}


def _norm(x, kind, bn=None, eps=1e-5):
    """instance: stateless InstanceNorm2d(affine=False) as in the reference's
    fnet (extractor.py:28-32); batch: BatchNorm2d with running stats +
    affine, as in the cnet — required to honor imported torch weights."""
    if kind == "instance":
        return instance_norm(x, eps)
    if kind == "batch":
        inv = jax.lax.rsqrt(bn["var"] + eps)
        return (x - bn["mean"]) * inv * bn["scale"] + bn["bias"]
    return x


# ---------------------------------------------------------------------------
# BasicEncoder (extractor.py:118-190)
# ---------------------------------------------------------------------------

def _res_block_init(key, cin, cout, norm):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"c1": conv_init(k1, cin, cout, 3), "c2": conv_init(k2, cout, cout, 3)}
    if cin != cout:
        p["down"] = conv_init(k3, cin, cout, 1)
    if norm == "batch":
        p["bn1"] = bn_init(cout)
        p["bn2"] = bn_init(cout)
        if cin != cout:
            p["bn3"] = bn_init(cout)
    return p


def _res_block(p, x, norm, stride=1):
    y = jax.nn.relu(_norm(conv(p["c1"], x, stride), norm, p.get("bn1")))
    y = jax.nn.relu(_norm(conv(p["c2"], y), norm, p.get("bn2")))
    if "down" in p:
        x = _norm(conv(p["down"], x, stride), norm, p.get("bn3"))
    return jax.nn.relu(x + y)


def encoder_init(key, output_dim=256, norm="instance"):
    ks = jax.random.split(key, 8)
    p = {
        "conv1": conv_init(ks[0], 3, 64, 7),
        "l1a": _res_block_init(ks[1], 64, 64, norm),
        "l1b": _res_block_init(ks[2], 64, 64, norm),
        "l2a": _res_block_init(ks[3], 64, 96, norm),
        "l2b": _res_block_init(ks[4], 96, 96, norm),
        "l3a": _res_block_init(ks[5], 96, 128, norm),
        "l3b": _res_block_init(ks[6], 128, 128, norm),
        "conv2": conv_init(ks[7], 128, output_dim, 1),
    }
    if norm == "batch":
        p["bn0"] = bn_init(64)
    return p


def encoder_apply(p, x, norm="instance"):
    """x: [B, H, W, 3] -> [B, H/8, W/8, output_dim]."""
    y = jax.nn.relu(_norm(conv(p["conv1"], x, 2), norm, p.get("bn0")))
    y = _res_block(p["l1b"], _res_block(p["l1a"], y, norm, 1), norm)
    y = _res_block(p["l2b"], _res_block(p["l2a"], y, norm, 2), norm)
    y = _res_block(p["l3b"], _res_block(p["l3a"], y, norm, 2), norm)
    return conv(p["conv2"], y)


# ---------------------------------------------------------------------------
# correlation pyramid (corr.py:12-60)
# ---------------------------------------------------------------------------

def corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                 num_levels: int = CORR_LEVELS) -> List[jnp.ndarray]:
    """All-pairs correlation, pooled over fmap2 resolution.

    fmap1/2: [H, W, C].  Level i: [H*W, H/2^i, W/2^i]."""
    H, W, C = fmap1.shape
    f1 = fmap1.reshape(H * W, C)
    f2 = fmap2.reshape(H * W, C)
    corr = (f1 @ f2.T) / math.sqrt(C)                      # [HW, HW]
    corr = corr.reshape(H * W, H, W)
    pyr = [corr]
    for _ in range(num_levels - 1):
        h = max(corr.shape[1] // 2, 1)
        w = max(corr.shape[2] // 2, 1)
        if corr.shape[1] >= 2:
            corr = corr[:, : h * 2].reshape(H * W, h, 2, corr.shape[2]).mean(2)
        if corr.shape[2] >= 2:
            corr = corr[:, :, : w * 2].reshape(H * W, h, w, 2).mean(3)
        pyr.append(corr)
    return pyr


def _bilinear_hw(vol: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """vol: [N, h, w]; xy: [N, K, 2] per-slice sample coords (zero pad)."""
    N, h, w = vol.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx, wy = x - x0, y - y0
    n_ix = jnp.arange(N)[:, None]

    def tap(yy, xx):
        ok = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        return vol[n_ix, jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)] * ok

    return (tap(y0, x0) * (1 - wx) * (1 - wy) + tap(y0, x0 + 1) * wx * (1 - wy)
            + tap(y0 + 1, x0) * (1 - wx) * wy + tap(y0 + 1, x0 + 1) * wx * wy)


def corr_lookup(pyr: List[jnp.ndarray], coords: jnp.ndarray,
                radius: int = CORR_RADIUS) -> jnp.ndarray:
    """Sample a (2r+1)^2 window around coords at every level.

    coords: [H, W, 2] target positions at level-0 resolution.
    Returns [H, W, levels*(2r+1)^2]."""
    H, W, _ = coords.shape
    r = radius
    d = jnp.arange(-r, r + 1, dtype=coords.dtype)
    dyx = jnp.stack(jnp.meshgrid(d, d, indexing="ij"), axis=-1)  # [2r+1,2r+1,2]
    # torch corr.py stacks meshgrid(dy, dx) and adds it to (x, y) directly,
    # so window channel (i, j) offsets x by d_i and y by d_j — keep that
    # exact channel order or imported motion-encoder weights mis-map
    delta = dyx.reshape(-1, 2)
    out = []
    for i, vol in enumerate(pyr):
        c = coords.reshape(H * W, 1, 2) / (2 ** i) + delta[None]
        out.append(_bilinear_hw(vol, c))                   # [HW, (2r+1)^2]
    return jnp.concatenate(out, axis=-1).reshape(H, W, -1)


# ---------------------------------------------------------------------------
# update block (update.py:6-136)
# ---------------------------------------------------------------------------

def update_init(key):
    ks = jax.random.split(key, 16)
    cor_planes = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2
    return {
        "mc1": conv_init(ks[0], cor_planes, 256, 1),
        "mc2": conv_init(ks[1], 256, 192, 3),
        "mf1": conv_init(ks[2], 2, 128, 7),
        "mf2": conv_init(ks[3], 128, 64, 3),
        "mout": conv_init(ks[4], 256, 126, 3),
        # SepConvGRU: (1,5) then (5,1) convs
        "gz1": conv_init(ks[5], HDIM + 256, HDIM, 1, 5),
        "gr1": conv_init(ks[6], HDIM + 256, HDIM, 1, 5),
        "gq1": conv_init(ks[7], HDIM + 256, HDIM, 1, 5),
        "gz2": conv_init(ks[8], HDIM + 256, HDIM, 5, 1),
        "gr2": conv_init(ks[9], HDIM + 256, HDIM, 5, 1),
        "gq2": conv_init(ks[10], HDIM + 256, HDIM, 5, 1),
        "fh1": conv_init(ks[11], HDIM, 256, 3),
        "fh2": conv_init(ks[12], 256, 2, 3),
        "mk1": conv_init(ks[13], 128, 256, 3),
        "mk2": conv_init(ks[14], 256, 64 * 9, 1),
    }


def _gru_half(p, h, x, zk, rk, qk):
    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(conv(p[zk], hx))
    r = jax.nn.sigmoid(conv(p[rk], hx))
    q = jnp.tanh(conv(p[qk], jnp.concatenate([r * h, x], axis=-1)))
    return (1 - z) * h + z * q


def update_apply(p, net, inp, corr, flow):
    cor = jax.nn.relu(conv(p["mc1"], corr))
    cor = jax.nn.relu(conv(p["mc2"], cor))
    flo = jax.nn.relu(conv(p["mf1"], flow))
    flo = jax.nn.relu(conv(p["mf2"], flo))
    motion = jax.nn.relu(conv(p["mout"], jnp.concatenate([cor, flo], -1)))
    motion = jnp.concatenate([motion, flow], axis=-1)       # 128
    x = jnp.concatenate([inp, motion], axis=-1)             # 256
    net = _gru_half(p, net, x, "gz1", "gr1", "gq1")
    net = _gru_half(p, net, x, "gz2", "gr2", "gq2")
    delta = conv(p["fh2"], jax.nn.relu(conv(p["fh1"], net)))
    mask = 0.25 * conv(p["mk2"], jax.nn.relu(conv(p["mk1"], net)))
    return net, mask, delta


def upsample_flow_convex(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex-combination 8x upsampling (raft.py:73-86).

    flow: [1, h, w, 2]; mask: [1, h, w, 576] -> [1, 8h, 8w, 2]."""
    _, h, w, _ = flow.shape
    m = mask.reshape(h, w, 9, 8, 8)
    m = jax.nn.softmax(m, axis=2)
    # 3x3 neighborhoods of 8*flow
    f = 8.0 * flow[0]
    pads = jnp.pad(f, ((1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack([pads[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
                       for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                      axis=2)                               # [h, w, 9, 2]
    up = jnp.einsum("hwkab,hwkc->hwabc", m, neigh)          # [h, w, 8, 8, 2]
    up = up.transpose(0, 2, 1, 3, 4).reshape(1, 8 * h, 8 * w, 2)
    return up


class RaftParams(NamedTuple):
    fnet: Dict
    cnet: Dict
    update: Dict


def init(key) -> RaftParams:
    k1, k2, k3 = jax.random.split(key, 3)
    return RaftParams(fnet=encoder_init(k1, 256, "instance"),
                      cnet=encoder_init(k2, HDIM + CDIM, "batch"),
                      update=update_init(k3))


def estimate_flow(params: RaftParams, image1: jnp.ndarray,
                  image2: jnp.ndarray, iters: int = 12) -> jnp.ndarray:
    """image1/2: [H, W, 3] in [0, 255] (H, W divisible by 8).
    Returns flow [H, W, 2] (raft.py:88-150)."""
    H, W, _ = image1.shape
    x1 = (2 * (image1 / 255.0) - 1.0)[None]
    x2 = (2 * (image2 / 255.0) - 1.0)[None]
    f1 = encoder_apply(params.fnet, x1, "instance")[0]      # [h, w, 256]
    f2 = encoder_apply(params.fnet, x2, "instance")[0]
    pyr = corr_pyramid(f1, f2)

    c = encoder_apply(params.cnet, x1, "batch")
    net, inp = jnp.split(c, [HDIM], axis=-1)
    net, inp = jnp.tanh(net), jax.nn.relu(inp)

    h, w = H // 8, W // 8
    ys, xs = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    coords0 = jnp.stack([xs, ys], axis=-1)                  # [h, w, 2]

    def body(carry, _):
        net_c, coords1 = carry
        coords1 = jax.lax.stop_gradient(coords1)
        corr = corr_lookup(pyr, coords1)
        flow = (coords1 - coords0)[None]
        net_c, mask, delta = update_apply(params.update, net_c, inp,
                                          corr[None], flow)
        coords1 = coords1 + delta[0]
        return (net_c, coords1), mask

    (net, coords1), masks = jax.lax.scan(body, (net, coords0), None,
                                         length=iters)
    flow_up = upsample_flow_convex((coords1 - coords0)[None], masks[-1])
    return flow_up[0]


def make_flow_fn(params: RaftParams, iters: int = 12):
    """Adapter for data/frame_weights.compute_frame_weights: gray [H, W]
    frames in [0, 255] -> flow [H, W, 2].  Pads to multiples of 8."""
    import numpy as np

    fn = jax.jit(lambda a, b: estimate_flow(params, a, b, iters))

    def flow_fn(img1_gray, img2_gray):
        H, W = img1_gray.shape
        H8, W8 = -(-H // 8) * 8, -(-W // 8) * 8

        def prep(g):
            rgb = np.repeat(np.asarray(g, np.float32)[..., None], 3, -1)
            return jnp.asarray(np.pad(rgb, ((0, H8 - H), (0, W8 - W), (0, 0)),
                                      mode="edge"))

        out = np.asarray(fn(prep(img1_gray), prep(img2_gray)))
        return out[:H, :W]

    return flow_fn
