"""Pallas TPU kernel: fused per-neighbor shading MLP chain (fwd + bwd).

The aggregator's hottest dense compute is the per-neighbor MLP chain
(block1[+block2] -> concat(color, dir-delta, dir-dot) -> block3 -> alpha
head) over N = R*SR*K ~ 600k rows (reference
models/aggregators/point_aggregators.py:1130-1180 runs the same chain as
torch nn.Sequential stacks).  Under plain XLA autodiff every intermediate
activation ([N, 256] f32 ~ 0.6 GB each) is written to HBM as a residual in
the forward and re-read in the backward, and every cotangent in the chain
round-trips HBM again — the pts-VJP executable's dominant traffic
(CLAUDE.md round-2 cost analysis).

This kernel keeps the whole chain VMEM-resident per row-tile:

  forward:  one pass, writes only (feat [N,256], alpha_raw [N,1]).
  backward: recomputes the chain per tile (FLOPs are cheap, HBM is not),
            produces dx tiles, and accumulates every dW/db in VMEM scratch
            across the sequential grid — weight grads never touch HBM until
            the final block writeback.

Layer widths are zero-padded to lane multiples (128); zero pad rows/cols are
exact no-ops through leaky_relu and matmul, and the outer pad/slice ops give
autodiff the unpadded gradients for free.  Off-TPU callers use
``interpret=True`` (tests) or the pure-XLA aggregator path.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLOPE = 0.01        # torch nn.LeakyReLU default, mlp.LEAKY_SLOPE
TILE = 256          # rows per grid step
LANE = 128


def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


def _lrelu(x):
    return jnp.where(x >= 0, x, SLOPE * x)


def _dlrelu(pre):
    return jnp.where(pre >= 0, 1.0, SLOPE).astype(pre.dtype)


def _mm(a, b, dt):
    """a @ b with optional low-precision MXU compute, f32 accumulation."""
    if dt is not None:
        a, b = a.astype(dt), b.astype(dt)
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_bt(a, b, dt):
    """a @ b.T"""
    if dt is not None:
        a, b = a.astype(dt), b.astype(dt)
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_at(a, b, dt):
    """a.T @ b"""
    if dt is not None:
        a, b = a.astype(dt), b.astype(dt)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# in-kernel positional encoding
#
# The pallas_call boundary forces XLA to materialize the kernel operands, so
# feeding the encoded [N, 284] block1 input would cost 3x the HBM traffic of
# the raw [N, 38] (embedding, dists) pair.  The kernel therefore expands the
# PE on-chip.  It builds sin/cos in contiguous frequency-major BLOCKS (cheap
# lane concats) rather than the reference's d-major interleaved layout
# (networks.py:175-190) — the difference is a static permutation of input
# channels, which the wrapper folds into block1's first weight matrix.
# ---------------------------------------------------------------------------

def _expand_pe(xraw, pe, c1p):
    """[T, Craw] -> [T, c1p]: [emb | sin_e(f-major) | cos_e | (dist raw |)
    sin_d | cos_d | zero pad]."""
    Df, Fe, Dd, Fd = pe
    emb = xraw[:, :Df]
    dst = xraw[:, Df:Df + Dd]
    parts = [emb]
    for j in range(Fe):
        parts.append(jnp.sin(emb * (2.0 ** j)))
    for j in range(Fe):
        parts.append(jnp.cos(emb * (2.0 ** j)))
    if Fd == 0:
        parts.append(dst)
    for j in range(Fd):
        parts.append(jnp.sin(dst * (2.0 ** j)))
    for j in range(Fd):
        parts.append(jnp.cos(dst * (2.0 ** j)))
    width = sum(p.shape[1] for p in parts)
    if width < c1p:
        parts.append(jnp.zeros((xraw.shape[0], c1p - width), xraw.dtype))
    return jnp.concatenate(parts, axis=1)


def _pe_backward(dx1, xraw, pe, craw_p):
    """Cotangent of _expand_pe: [T, c1p] -> [T, craw_p]."""
    Df, Fe, Dd, Fd = pe
    emb = xraw[:, :Df]
    dst = xraw[:, Df:Df + Dd]
    d_emb = dx1[:, :Df]
    off = Df
    for j in range(Fe):
        s = dx1[:, off + j * Df: off + (j + 1) * Df]
        d_emb = d_emb + (2.0 ** j) * jnp.cos(emb * (2.0 ** j)) * s
    off += Fe * Df
    for j in range(Fe):
        c = dx1[:, off + j * Df: off + (j + 1) * Df]
        d_emb = d_emb - (2.0 ** j) * jnp.sin(emb * (2.0 ** j)) * c
    off += Fe * Df
    if Fd == 0:
        d_dst = dx1[:, off: off + Dd]
        off += Dd
    else:
        d_dst = jnp.zeros_like(dst)
        for j in range(Fd):
            s = dx1[:, off + j * Dd: off + (j + 1) * Dd]
            d_dst = d_dst + (2.0 ** j) * jnp.cos(dst * (2.0 ** j)) * s
        off += Fd * Dd
        for j in range(Fd):
            c = dx1[:, off + j * Dd: off + (j + 1) * Dd]
            d_dst = d_dst - (2.0 ** j) * jnp.sin(dst * (2.0 ** j)) * c
    width = Df + Dd
    pad = ((0, 0), (0, craw_p - width))
    return jnp.pad(jnp.concatenate([d_emb, d_dst], axis=1), pad)


def pe_permutation(Df, Fe, Dd, Fd):
    """ref-layout channel index for each kernel-layout channel (numpy)."""
    import numpy as np
    perm = list(range(Df))                                  # emb raw
    for sc in (0, 1):                                       # sin block, cos block
        for j in range(Fe):
            for d in range(Df):
                perm.append(Df + (d * Fe + j) * 2 + sc)
    off = Df + 2 * Fe * Df
    if Fd == 0:
        perm += [off + d for d in range(Dd)]
    else:
        for sc in (0, 1):
            for j in range(Fd):
                for d in range(Dd):
                    perm.append(off + (d * Fd + j) * 2 + sc)
    return np.asarray(perm)


# ---------------------------------------------------------------------------
# kernels (generic over layer counts; meta = (n_a, n_b, n_h, dt_name,
# interpret, pe))
# ---------------------------------------------------------------------------

def _forward_sweep(x1, extra, wa, wb, wh, dt, keep_pre=False):
    """Run the chain on one tile.  Returns (feat, alpha, pres) where pres
    lists every pre-activation (only populated when keep_pre)."""
    assert wb and wh, "fused chain requires block3 and an alpha head"
    pres: List = []
    h = x1
    for (W, b) in wa:
        pre = _mm(h, W, dt) + b
        if keep_pre:
            pres.append(pre)
        h = _lrelu(pre)
    hb = jnp.concatenate([h, extra], axis=1)
    for (W, b) in wb:
        pre = _mm(hb, W, dt) + b
        if keep_pre:
            pres.append(pre)
        hb = _lrelu(pre)
    feat = hb
    g = hb
    n_h = len(wh)
    for i, (W, b) in enumerate(wh):
        pre = _mm(g, W, dt) + b
        if keep_pre:
            pres.append(pre)
        g = _lrelu(pre) if i < n_h - 1 else pre
    return feat, g, pres


def _unpack_layers(it, n):
    return [(next(it)[:], next(it)[:]) for _ in range(n)]


def _fwd_kernel(n_a, n_b, n_h, dt, pe, c1p, *refs):
    it = iter(refs)
    x1 = next(it)[:]
    extra = next(it)[:]
    wa = _unpack_layers(it, n_a)
    wb = _unpack_layers(it, n_b)
    wh = _unpack_layers(it, n_h)
    feat_ref = next(it)
    alpha_ref = next(it)
    if pe is not None:
        x1 = _expand_pe(x1, pe, c1p)
    feat, alpha, _ = _forward_sweep(x1, extra, wa, wb, wh, dt)
    feat_ref[:] = feat
    alpha_ref[:] = alpha


def _bwd_kernel(n_a, n_b, n_h, dt, pe, c1p, *refs):
    it = iter(refs)
    xraw = next(it)[:]
    extra = next(it)[:]
    dfeat = next(it)[:]
    dalpha = next(it)[:]
    x1 = xraw if pe is None else _expand_pe(xraw, pe, c1p)
    wa = _unpack_layers(it, n_a)
    wb = _unpack_layers(it, n_b)
    wh = _unpack_layers(it, n_h)
    dx1_ref = next(it)
    dextra_ref = next(it)
    dw_refs = [(next(it), next(it)) for _ in range(n_a + n_b + n_h)]

    first = pl.program_id(0) == 0

    # recompute forward, keeping pre-activations (layer inputs are derived
    # from them in the reverse sweep — half the VMEM of storing both)
    _, _, pres = _forward_sweep(x1, extra, wa, wb, wh, dt, keep_pre=True)

    def layer_input(idx):
        """Input of chain layer `idx` (flat indexing over A++B++H)."""
        if idx == 0:
            return x1
        prev = _lrelu(pres[idx - 1])
        if idx == n_a and n_b > 0:   # B stack starts with the concat
            return jnp.concatenate([prev, extra], axis=1)
        return prev

    layers = wa + wb + wh
    n_total = n_a + n_b + n_h

    def accum(i, dW, db):
        wr, br = dw_refs[i]

        @pl.when(first)
        def _():
            wr[:] = jnp.zeros_like(wr)
            br[:] = jnp.zeros_like(br)

        wr[:] += dW
        br[:] += db

    # reverse sweep: head -> B -> A
    g = dalpha
    for i in range(n_total - 1, -1, -1):
        W, _ = layers[i]
        activated = i < n_a + n_b or i < n_total - 1
        if activated:
            g = g * _dlrelu(pres[i])
        a_in = layer_input(i)
        accum(i, _mm_at(a_in, g, dt), jnp.sum(g, axis=0, keepdims=True))
        g = _mm_bt(g, W, dt)
        if i == n_a + n_b:        # head bottom: add the feat cotangent
            g = g + dfeat
        elif i == n_a and n_b > 0:  # B bottom: split concat(A_out, extra)
            dextra_ref[:] = g[:, g.shape[1] - extra.shape[1]:]
            g = g[:, :g.shape[1] - extra.shape[1]]
    if pe is not None:
        g = _pe_backward(g, xraw, pe, dx1_ref.shape[1])
    dx1_ref[:] = g


# ---------------------------------------------------------------------------
# padded custom-VJP wrapper
# ---------------------------------------------------------------------------

def _wspecs(dims_p: Sequence[Tuple[int, int]]):
    specs = []
    for (i_p, o_p) in dims_p:
        specs.append(pl.BlockSpec((i_p, o_p), lambda s: (0, 0),
                                  memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec((1, o_p), lambda s: (0, 0),
                                  memory_space=pltpu.VMEM))
    return specs


def _row_spec(cols):
    return pl.BlockSpec((TILE, cols), lambda s: (s, 0),
                        memory_space=pltpu.VMEM)


def _flat_ws(Ws):
    return [t for pair in Ws for t in pair]


def _fwd_call(meta, Ws, x1p, extrap):
    n_a, n_b, n_h, dt_name, interpret, pe = meta
    dt = jnp.bfloat16 if dt_name == "bfloat16" else None
    Np, C1 = x1p.shape
    Ce = extrap.shape[1]
    dims_p = [(w.shape[0], w.shape[1]) for (w, _) in Ws]
    c1p = dims_p[0][0]
    Fw = dims_p[n_a + n_b - 1][1]
    Ha = dims_p[-1][1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_a, n_b, n_h, dt, pe, c1p),
        grid=(Np // TILE,),
        in_specs=[_row_spec(C1), _row_spec(Ce)] + _wspecs(dims_p),
        out_specs=[_row_spec(Fw), _row_spec(Ha)],
        out_shape=[jax.ShapeDtypeStruct((Np, Fw), jnp.float32),
                   jax.ShapeDtypeStruct((Np, Ha), jnp.float32)],
        interpret=interpret,
    )(x1p, extrap, *_flat_ws(Ws))


def _bwd_call(meta, Ws, x1p, extrap, dfeat, dalpha):
    n_a, n_b, n_h, dt_name, interpret, pe = meta
    dt = jnp.bfloat16 if dt_name == "bfloat16" else None
    Np, C1 = x1p.shape
    Ce = extrap.shape[1]
    dims_p = [(w.shape[0], w.shape[1]) for (w, _) in Ws]
    c1p = dims_p[0][0]
    Fw, Ha = dfeat.shape[1], dalpha.shape[1]

    dw_specs, dw_shapes = [], []
    for (i_p, o_p) in dims_p:
        dw_specs += [pl.BlockSpec((i_p, o_p), lambda s: (0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, o_p), lambda s: (0, 0),
                                  memory_space=pltpu.VMEM)]
        dw_shapes += [jax.ShapeDtypeStruct((i_p, o_p), jnp.float32),
                      jax.ShapeDtypeStruct((1, o_p), jnp.float32)]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_a, n_b, n_h, dt, pe, c1p),
        grid=(Np // TILE,),
        in_specs=([_row_spec(C1), _row_spec(Ce), _row_spec(Fw),
                   _row_spec(Ha)] + _wspecs(dims_p)),
        out_specs=[_row_spec(C1), _row_spec(Ce)] + dw_specs,
        out_shape=([jax.ShapeDtypeStruct((Np, C1), jnp.float32),
                    jax.ShapeDtypeStruct((Np, Ce), jnp.float32)]
                   + dw_shapes),
        interpret=interpret,
    )(x1p, extrap, dfeat, dalpha, *_flat_ws(Ws))
    dx1p, dextrap = outs[0], outs[1]
    dWs = tuple((outs[2 + 2 * i], outs[3 + 2 * i])
                for i in range(len(dims_p)))
    return dWs, dx1p, dextrap


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _chain_padded(meta, Ws, x1p, extrap):
    return _fwd_call(meta, Ws, x1p, extrap)


def _chain_padded_fwd(meta, Ws, x1p, extrap):
    out = _fwd_call(meta, Ws, x1p, extrap)
    return out, (Ws, x1p, extrap)


def _chain_padded_bwd(meta, res, cots):
    Ws, x1p, extrap = res
    dfeat, dalpha = cots
    return _bwd_call(meta, Ws, x1p, extrap, dfeat, dalpha)


_chain_padded.defvjp(_chain_padded_fwd, _chain_padded_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def _pad2(x, rows, cols):
    return jnp.zeros((rows, cols), x.dtype).at[:x.shape[0], :x.shape[1]].set(x)


def fused_feat_alpha(blockA: List[Dict], blockB: List[Dict],
                     head: List[Dict], x1: jnp.ndarray, extra: jnp.ndarray,
                     *, compute_dtype: str = "float32",
                     interpret: bool = False):
    """Fused chain: feat = blockB(concat(blockA(x1), extra)); alpha = head(feat).

    blockA/blockB: lists of {"w","b"} Linear params, every layer activated
    (leaky_relu 0.01) — block1 [+ block2] and block3 of the aggregator.
    head: alpha MLP, activation on all but the last layer.
    x1: [N, C1]; extra: [N, Ce] (block3's concat tail; Ce may be 0).

    Returns (feat [N, F], alpha_raw [N, 1]).  Differentiable via a fused
    recompute backward; weight gradients accumulate on-chip.
    """
    assert blockB and head, "fused chain requires block3 and an alpha head"
    N, C1 = x1.shape
    Ce = extra.shape[1] if extra.ndim == 2 else 0
    if extra.ndim != 2:
        extra = extra.reshape(N, Ce)
    Np = _rup(max(N, TILE), TILE)
    C1p = _rup(C1, LANE)
    Cep = _rup(max(Ce, 1), LANE)

    x1p = _pad2(x1, Np, C1p)
    extrap = _pad2(extra, Np, Cep)

    wa, a_out = _pad_stack(blockA, C1p, Cep)
    F_real = blockB[0]["w"].shape[0] - Ce
    wb, b_out = _pad_stack(blockB, a_out + Cep, Cep, force_in=F_real)
    wh, _ = _pad_stack(head, b_out, Cep)

    meta = (len(wa), len(wb), len(wh), compute_dtype, interpret, None)
    feat_p, alpha_p = _chain_padded(meta, tuple(wa + wb + wh), x1p, extrap)

    return (feat_p[:N, :blockB[-1]["w"].shape[1]],
            alpha_p[:N, :head[-1]["w"].shape[1]])


def _pad_stack(layers, in_p, Cep, force_in=None, perm=None):
    """Zero-pad a Linear stack to lane-aligned dims.

    force_in: B[0] — rows [0:F) are the A-output block, rows [F:) the extra
    tail, re-placed at the padded A-width boundary.  perm: A[0] — permute
    input-channel rows into the kernel's PE layout first.  The final layer's
    output pads to 8 lanes (not 128) when it is narrower — the alpha head's
    [N, 1] output would otherwise cost 16x the HBM traffic.
    """
    out = []
    cur = in_p
    for i, lp in enumerate(layers):
        o_real = lp["w"].shape[1]
        last = i == len(layers) - 1
        o_p = _rup(o_real, 8 if (last and o_real <= 8) else LANE)
        src = lp["w"]
        if perm is not None and i == 0:
            src = src[jnp.asarray(perm)]
        if force_in is not None and i == 0:
            F = force_in
            W = jnp.zeros((cur, o_p), src.dtype)
            W = W.at[:F, :o_real].set(src[:F])
            W = W.at[cur - Cep: cur - Cep + (src.shape[0] - F),
                     :o_real].set(src[F:])
        else:
            W = _pad2(src, cur, o_p)
        b = _pad2(lp["b"][None, :], 1, o_p)
        out.append((W, b))
        cur = o_p
    return out, cur


def fused_feat_alpha_pe(blockA, blockB, head, emb: jnp.ndarray,
                        dists: jnp.ndarray, extra: jnp.ndarray,
                        num_feat_freqs: int, dist_freqs: int,
                        *, compute_dtype: str = "float32",
                        interpret: bool = False):
    """Like fused_feat_alpha, but takes the RAW per-neighbor embedding
    [N, Df] and dists [N, Dd] and expands the positional encodings on-chip
    (3x less operand traffic across the pallas_call boundary).  blockA[0]
    must expect the reference input layout [emb | PE(emb) | PE(dists)]
    (aggregator.apply); its rows are permuted into the kernel layout here.
    """
    assert blockB and head, "fused chain requires block3 and an alpha head"
    N, Df = emb.shape
    Dd = dists.shape[1]
    Ce = extra.shape[1]
    pe = (Df, num_feat_freqs, Dd, dist_freqs)
    c1_real = (Df + 2 * num_feat_freqs * Df
               + (Dd if dist_freqs == 0 else 2 * dist_freqs * Dd))
    assert blockA[0]["w"].shape[0] == c1_real, (
        blockA[0]["w"].shape, c1_real)

    Np = _rup(max(N, TILE), TILE)
    Crawp = _rup(Df + Dd, LANE)
    Cep = _rup(max(Ce, 1), LANE)
    xrawp = _pad2(jnp.concatenate([emb, dists], axis=1), Np, Crawp)
    extrap = _pad2(extra, Np, Cep)

    C1p = _rup(c1_real, LANE)
    perm = pe_permutation(Df, num_feat_freqs, Dd, dist_freqs)
    wa, a_out = _pad_stack(blockA, C1p, Cep, perm=perm)
    F_real = blockB[0]["w"].shape[0] - Ce
    wb, b_out = _pad_stack(blockB, a_out + Cep, Cep, force_in=F_real)
    wh, _ = _pad_stack(head, b_out, Cep)

    meta = (len(wa), len(wb), len(wh), compute_dtype, interpret, pe)
    feat_p, alpha_p = _chain_padded(meta, tuple(wa + wb + wh), xrawp, extrap)

    return (feat_p[:N, :blockB[-1]["w"].shape[1]],
            alpha_p[:N, :head[-1]["w"].shape[1]])
