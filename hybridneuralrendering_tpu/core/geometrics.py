"""Anisotropic local-frame transform for the Gaussian distance kernel.

Port of /root/reference/models/helpers/geometrics.py:15-70: roll-pitch-yaw ->
rotation, scale by inverse radii, applied to neighbor deltas (used by the
`gau_intrp` aggregation kernel)."""

from __future__ import annotations

import jax.numpy as jnp


def roll_pitch_yaw_to_rotation(rpy: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] roll-pitch-yaw radians -> [..., 3, 3] rotation matrices."""
    cx, cy, cz = jnp.cos(rpy[..., 0]), jnp.cos(rpy[..., 1]), jnp.cos(rpy[..., 2])
    sx, sy, sz = jnp.sin(rpy[..., 0]), jnp.sin(rpy[..., 1]), jnp.sin(rpy[..., 2])
    rot = jnp.stack([
        cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx,
        sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx,
        -sy, cy * sx, cy * cx], axis=-1)
    return rot.reshape(rpy.shape[:-1] + (3, 3))


def compute_world2local_dist(dists: jnp.ndarray, radii: jnp.ndarray,
                             rotations: jnp.ndarray) -> jnp.ndarray:
    """Transform deltas into each element's scaled local frame.

    dists: [..., 3]; radii: [..., 3]; rotations: [..., 3] rpy.
    Returns [..., 3] (the reference keeps a trailing singleton; we squeeze)."""
    rot = roll_pitch_yaw_to_rotation(rotations)
    scale = 1.0 / (radii + 1e-8)
    tx = scale[..., :, None] * rot                    # diag(scale) @ rot
    return jnp.einsum("...ij,...j->...i", tx, dists)
