"""Measure the lane-padding tax on Adam-shaped elementwise updates.

Hypothesis (round-2 trace tail): XLA TPU tiles 2-D+ f32 arrays at T(8,128),
so narrow-minor leaves ([N,3] xyz/color/dirs, [N,1] conf) physically occupy
128 lanes — an Adam update (read g,p,m,v; write p,m,v) on them moves up to
42x/128x the logical bytes.  A/B: the point-cloud Adam leaf set in its
current shapes vs transposed ([3,N]) vs flat 1-D, chained (axon rule).

Informs the NeuralPoints storage-layout decision (round-3 lever: adam ~8 ms
of the 135 ms cached step).

RESULT: unusable through the axon tunnel — all variants report 0.06-0.34 ms
for a >=600 MB/step update (>> HBM bandwidth), i.e. sub-ms chained loops
still get elided/overlapped despite donation (CLAUDE.md measurement rule,
now confirmed to extend to chained DONATED loops at sub-ms scales).  The
layout decision was made by a bench.py A/B (flat layout: dead end, -8%;
knob since retired to tools/pallas_adam.py per VERDICT r3 #8).
"""
import json
import os
import time

import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)

N = 600_000
F = 32


def leaves(kind):
    k = jax.random.PRNGKey(0)
    if kind == "current":       # today's NeuralPoints param shapes
        shapes = [(N, 3), (N, F), (N, 1), (N, 3), (N, 3)]
    elif kind == "transposed":  # narrow dim to sublanes
        shapes = [(3, N), (F, N), (N,), (3, N), (3, N)]
    elif kind == "flat":        # one fused 1-D buffer
        shapes = [(N * (3 + F + 1 + 3 + 3),)]
    elif kind == "stack128":    # one [N, 128] table (42 used lanes)
        shapes = [(N, 128)]
    ks = jax.random.split(k, len(shapes) * 3)
    mk = lambda kk, s: jax.random.normal(kk, s, jnp.float32)
    p = [mk(ks[3 * i + 0], s) for i, s in enumerate(shapes)]
    m = [mk(ks[3 * i + 1], s) for i, s in enumerate(shapes)]
    v = [jnp.abs(mk(ks[3 * i + 2], s)) for i, s in enumerate(shapes)]
    return p, m, v


def adam_step(p, m, v):
    out_p, out_m, out_v = [], [], []
    for pi, mi, vi in zip(p, m, v):
        g = pi * 1e-3 + 0.01            # synthetic grad from p (chains)
        mi = 0.9 * mi + 0.1 * g
        vi = 0.999 * vi + 0.001 * g * g
        pi = pi - 1e-3 * mi / (jnp.sqrt(vi) + 1e-8)
        out_p.append(pi)
        out_m.append(mi)
        out_v.append(vi)
    return out_p, out_m, out_v


def run(kind, iters=30):
    p, m, v = leaves(kind)
    step = jax.jit(adam_step, donate_argnums=(0, 1, 2))
    p, m, v = step(p, m, v)
    jax.block_until_ready(v[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        p, m, v = step(p, m, v)
    jax.block_until_ready(v[-1])
    dt = (time.perf_counter() - t0) / iters
    logical_mb = sum(x.size for x in p) * 4 / 1e6
    print(json.dumps({"kind": kind, "ms": round(dt * 1e3, 3),
                      "logical_leaf_mb": round(logical_mb, 1)}), flush=True)


for kind in ("current", "transposed", "flat", "stack128", "current"):
    run(kind)
