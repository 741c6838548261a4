"""Positional encoding (reference models/helpers/networks.py:175-190)."""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(positions: jnp.ndarray, freqs: int,
                        ori: bool = False) -> jnp.ndarray:
    """sin/cos positional encoding with 2**k frequency bands.

    positions: [..., D] -> [..., 2*freqs*D] (or [..., D + 2*freqs*D] with
    `ori=True`, which prepends the raw input as the reference does for view
    directions).  Band layout matches networks.py:175-190 exactly: the scaled
    values are ordered (d0*f0, d0*f1, ..., d1*f0, ...); without `ori` sin/cos
    interleave per element, with `ori` the layout is [raw, all-sin, all-cos].
    """
    freq_bands = (2.0 ** jnp.arange(freqs)).astype(positions.dtype)   # [F]
    scaled = (positions[..., None] * freq_bands).reshape(
        positions.shape[:-1] + (positions.shape[-1] * freqs,))        # [..., D*F]
    if ori:
        return jnp.concatenate(
            [positions, jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    enc = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    return enc.reshape(scaled.shape[:-1] + (scaled.shape[-1] * 2,))
