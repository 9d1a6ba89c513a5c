"""RepSurf umbrella surface representation — faithful constructor.

Reference: /root/reference/pcdet/utils/repsurface_utils.py:413-467
(UmbrellaSurfaceConstructor) and repsurf_utils.py:99-121
(group_by_umbrella). The umbrella of a point is the fan of triangles
(center, n_i, n_{i+1}) over its k nearest neighbors sorted by azimuth;
each triangle contributes a 10-channel descriptor
[centroid(3), polar(3), normal(3), pos(1)] where pos = <normal, centroid>
(the plane constant, cal_const). The constructor maps descriptors through
a learnable 2-layer MLP and SUM-aggregates over the fan — the learnable
half is what the round-2 raw-mean variant (vfe.umbrella_surface_features)
lacked.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import MaskedBatchNorm


def umbrella_triangles(xyz, batch_idx, valid, k=9):
    """Per-point umbrella triangle geometry.

    Returns (normal [N,K,3] (+z oriented), centroid [N,K,3],
    polar [N,K,3], pos [N,K,1], pair_ok [N,K]).
    Reference group_by_umbrella + cal_normal/cal_center/cal_const."""
    from ..ops import sampling
    from ..utils.polar_utils import cartesian_to_spherical

    n = xyz.shape[0]
    # batch/validity masking rides knn's batch args (inf distance), NOT a
    # coordinate offset: an offset keeps cross-batch distances FINITE
    # (~1e8), which would beat invalid refs' inf and leak foreign points
    # into the fan whenever an element has < k+1 valid points
    idx, nd2 = sampling.knn_bruteforce(
        xyz, xyz, k + 1, ref_valid=valid,
        ref_batch=batch_idx, query_batch=batch_idx,
    )
    idx, nd2 = idx[:, 1:], nd2[:, 1:]  # drop self
    nbr_ok = jnp.isfinite(nd2) & valid[:, None]
    rel = jnp.where(
        nbr_ok[..., None], xyz[jnp.clip(idx, 0, n - 1)] - xyz[:, None, :], 0.0
    )  # [N, k, 3]
    az = jnp.arctan2(rel[..., 1], rel[..., 0])
    az = jnp.where(nbr_ok, az, 1e9)  # invalid neighbors sort last
    order = jnp.argsort(az, axis=1)
    rel = jnp.take_along_axis(rel, order[..., None], axis=1)
    ok = jnp.take_along_axis(nbr_ok, order, axis=1)
    v0 = rel
    v1 = jnp.roll(rel, -1, axis=1)
    pair_ok = ok & jnp.roll(ok, -1, axis=1)
    nrm = jnp.cross(v0, v1)
    unit = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
    # consistent +z orientation (reference random_inv=False branch)
    unit = unit * jnp.where(unit[..., 2:3] < 0, -1.0, 1.0)
    centroid = (v0 + v1) / 3.0  # triangle (0, v0, v1) centroid
    polar = cartesian_to_spherical(centroid)
    pos = jnp.sum(unit * centroid, axis=-1, keepdims=True)  # cal_const
    w = pair_ok[..., None]
    z = jnp.zeros((), xyz.dtype)
    return (jnp.where(w, unit, z), jnp.where(w, centroid, z),
            jnp.where(w, polar, z), jnp.where(w, pos, z), pair_ok)


class UmbrellaSurfaceConstructor(nn.Module):
    """Learnable umbrella descriptor (reference 413-467): per-triangle
    10-ch features -> Conv1d(C,C)+BN+ReLU+Conv1d(C,C) -> masked SUM over
    the fan. ``channels`` defaults to 10 like the reference in_channel."""

    channels: int = 10
    k: int = 9

    @nn.compact
    def __call__(self, xyz, batch_idx, valid, train: bool = False):
        normal, centroid, polar, pos, pair_ok = umbrella_triangles(
            xyz, batch_idx, valid, k=self.k
        )
        feat = jnp.concatenate([centroid, polar, normal, pos], axis=-1)  # [N,K,10]
        n, k, c = feat.shape
        h = feat.reshape(n * k, c)
        h = nn.Dense(self.channels, name="mlp0")(h)
        h = MaskedBatchNorm(name="bn0")(h, pair_ok.reshape(-1), train)
        h = nn.relu(h)
        h = nn.Dense(self.channels, name="mlp1")(h)
        h = h.reshape(n, k, self.channels)
        out = jnp.sum(jnp.where(pair_ok[..., None], h, 0.0), axis=1)
        return jnp.where(valid[:, None], out, 0.0)
