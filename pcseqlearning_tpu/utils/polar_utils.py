"""Cartesian <-> spherical coordinate transforms (reference
/root/reference/pcdet/utils/polar_utils.py)."""

from __future__ import annotations

import numpy as np


def cartesian_to_spherical(xyz):
    """[N, 3] -> (r, theta [inclination from +z], phi [azimuth])."""
    xp = np
    try:
        import jax.numpy as jnp

        if isinstance(xyz, jnp.ndarray):
            xp = jnp
    except ImportError:
        pass
    r = xp.linalg.norm(xyz, axis=-1)
    theta = xp.arccos(xp.clip(xyz[..., 2] / xp.maximum(r, 1e-9), -1.0, 1.0))
    phi = xp.arctan2(xyz[..., 1], xyz[..., 0])
    return xp.stack([r, theta, phi], axis=-1)


def spherical_to_cartesian(rtp):
    xp = np
    try:
        import jax.numpy as jnp

        if isinstance(rtp, jnp.ndarray):
            xp = jnp
    except ImportError:
        pass
    r, theta, phi = rtp[..., 0], rtp[..., 1], rtp[..., 2]
    st = xp.sin(theta)
    return xp.stack([r * st * xp.cos(phi), r * st * xp.sin(phi), r * xp.cos(theta)], axis=-1)
