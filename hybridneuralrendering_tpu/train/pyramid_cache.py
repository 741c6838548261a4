"""Device-resident cache of per-view image-pyramid stage maps.

The hybrid branch needs the aux-CNN feature pyramid of each nearest training
view (reference point_aggregators.py:1059-1068, recomputed every step there).
Views repeat heavily across steps — per-frame nearest-view sets are fixed —
so the trainer caches the *pre-upsample* stage maps per view id
(feature_pyramid.apply_stages: 16x smaller than the full-res 45-ch concat; a
full ScanNet train split fits in ~0.5 GB of bf16 HBM) and assembles the
[V, ...] stack per batch with one jitted single-view CNN call per cache miss.

Schedule semantics live in the trainer (OptimConfig.pyramid_cycle_steps /
pyramid_burst_steps): cached steps do not propagate gradients into the CNN,
so the trainer periodically runs uncached "burst" steps and invalidates this
cache when the burst ends (CNN params changed).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hybridneuralrendering_tpu.config import Config
from hybridneuralrendering_tpu.models import renderer


@partial(jax.jit, static_argnames=("cfg",))
def _single_view_stages(params: Dict, cfg: Config, image: jnp.ndarray):
    """[H, W, 3] -> (s1, s2, s3) without the leading view axis."""
    s1, s2, s3 = renderer.compute_image_feature_stages(
        params, cfg, image[None])
    return s1[0], s2[0], s3[0]


class PyramidCache:
    def __init__(self, cfg: Config, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.dtype = dtype
        self._store: Dict[int, Tuple[jnp.ndarray, ...]] = {}
        self.hits = 0
        self.misses = 0

    def invalidate(self) -> None:
        self._store.clear()

    def get_stack(self, params: Dict, images_nearest, vids):
        """images_nearest: [V, H, W, 3] (numpy or jnp); vids: per-view ids.

        Returns (s1 [V,...], s2, s3) in the cache dtype, computing and
        caching any missing view."""
        images_nearest = jnp.asarray(images_nearest)
        per_view = []
        for i, v in enumerate(vids):
            v = int(v)
            entry = self._store.get(v)
            if entry is None:
                self.misses += 1
                s = _single_view_stages(params, self.cfg, images_nearest[i])
                entry = tuple(x.astype(self.dtype) for x in s)
                self._store[v] = entry
            else:
                self.hits += 1
            per_view.append(entry)
        return tuple(jnp.stack([e[j] for e in per_view])
                     for j in range(3))

    def __len__(self):
        return len(self._store)
