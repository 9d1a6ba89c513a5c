"""Point-graph backbone family: PointConvNet / VolumeConvNet /
PointGroupNet / PointPlaneNet / PointNet2RepSurf.

The reference implements these as five config-driven encoder/decoder stacks
over (sampler, graph, block) triples that differ only in the per-edge
aggregation (/root/reference/pcdet/models/backbones_3d/pointconvnet.py,
volumeconvnet.py, pointgroupnet.py, pointplanenet.py,
pointnet2repsurf_backbone.py + blocks/ and model_utils/graphconv_utils.py).
The TPU build factors that shared skeleton into ONE network — grid-pyramid
encoder + 3-NN FP decoder over hash-grid neighborhoods, batched [N, K]
tables throughout — with the variant selecting the edge message:

  PointConvNet     weight-net continuous conv: MLP(rel_xyz) modulates
                   neighbor features before summation (pointconv).
  VolumeConvNet    pointconv with extent-normalized offsets: rel_xyz is
                   whitened by the neighborhood's covariance eigenvalues
                   (the volume-aware edge weights of VolumeGraph,
                   model_utils/graph_utils.py:314-357).
  PointGroupNet    PointNet++ grouping: MLP([rel, feat]) + max, plus a
                   fusion MLP with the center feature.
  PointPlaneNet    plane-aware messages: the neighborhood plane normal
                   (smallest covariance eigenvector) and point-to-plane
                   distances join the edge features.
  PointNet2RepSurf PointNet++ grouping with umbrella repsurf descriptors
                   (vfe.umbrella_surface_features) appended to the inputs.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import geometry, hash_graph, sampling, segment_ops
from .layers import MaskedBatchNorm

VARIANTS = ("PointConvNet", "VolumeConvNet", "PointGroupNet", "PointPlaneNet", "PointNet2RepSurf")


def _neighborhood_cov_eig(rel, nbr_mask):
    """Eigen-structure of each local neighborhood's offset covariance.

    rel [N, K, 3] neighbor offsets; nbr_mask [N, K]. Returns
    (eigvals [N, 3] ascending, eigvecs [N, 3, 3] columns)."""
    w = nbr_mask.astype(rel.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(rel * w, axis=1) / cnt
    c = jnp.where(nbr_mask[..., None], rel - mean[:, None, :], 0.0)
    cov = jnp.einsum("nki,nkj->nij", c, c) / cnt[..., None]
    return geometry.eigh3x3(cov)


def volume_whiten(rel, nbr_mask):
    """VolumeConvNet's distinguishing transform (reference
    volumeconvnet.py via model_utils/graph_utils.py VolumeGraph edge
    weights): rotate offsets into the neighborhood's principal frame and
    normalize each axis by its extent. Invariant (up to axis sign) to
    anisotropic axis-aligned scaling of the neighborhood — the property
    pinned by tests/test_point_backbones.py."""
    eigvals, eigvecs = _neighborhood_cov_eig(rel, nbr_mask)
    scale = 1.0 / jnp.sqrt(jnp.maximum(eigvals, 1e-6))
    return jnp.einsum("nkj,nji->nki", rel, eigvecs) * scale[:, None, :]


def plane_features(rel, nbr_mask):
    """PointPlaneNet's distinguishing features (reference
    pointplanenet.py): the neighborhood plane normal (smallest covariance
    eigenvector) and per-neighbor point-to-plane distances.

    Returns (normal [N, 3], dist [N, K, 1])."""
    _, eigvecs = _neighborhood_cov_eig(rel, nbr_mask)
    normal = eigvecs[..., 0]
    dist = jnp.einsum("nkj,nj->nk", rel, normal)[..., None]
    return normal, dist


class GraphEdgeConv(nn.Module):
    """One neighborhood aggregation with the variant's edge message."""

    out_channels: int
    variant: str

    @nn.compact
    def __call__(self, feats, xyz, nbr_idx, nbr_mask, valid, train=False):
        n, k = nbr_idx.shape
        idx = jnp.clip(nbr_idx, 0, n - 1)
        rel = jnp.where(nbr_mask[..., None], xyz[idx] - xyz[:, None, :], 0.0)
        xj = jnp.where(nbr_mask[..., None], feats[idx], 0.0)
        flat_v = nbr_mask.reshape(-1)

        extra = []
        if self.variant == "VolumeConvNet":
            extra.append(volume_whiten(rel, nbr_mask))
        elif self.variant == "PointPlaneNet":
            normal, dist = plane_features(rel, nbr_mask)
            extra.append(jnp.broadcast_to(normal[:, None, :], rel.shape))
            extra.append(dist)

        if self.variant in ("PointConvNet", "VolumeConvNet"):
            # continuous conv: a weight net over offsets modulates features
            wnet_in = jnp.concatenate([rel] + extra, axis=-1)
            wgt = nn.Dense(16, use_bias=False, name="wnet0")(wnet_in)
            wgt = nn.relu(wgt)
            wgt = nn.Dense(self.out_channels, use_bias=False, name="wnet1")(wgt)
            proj = nn.Dense(self.out_channels, use_bias=False, name="proj")(xj)
            msg = proj * jax.nn.sigmoid(wgt)
            agg = jnp.sum(jnp.where(nbr_mask[..., None], msg, 0.0), axis=1)
            agg = agg / jnp.maximum(jnp.sum(nbr_mask, axis=1), 1)[:, None]
        else:
            x = jnp.concatenate([rel, xj] + extra, axis=-1)
            h = x.reshape(n * k, -1)
            h = nn.Dense(self.out_channels, use_bias=False, name="mlp0")(h)
            h = MaskedBatchNorm(name="bn0")(h, flat_v, train)
            h = nn.relu(h)
            h = h.reshape(n, k, -1)
            h = jnp.where(nbr_mask[..., None], h, -jnp.inf)
            agg = jnp.max(h, axis=1)
            agg = jnp.where(jnp.any(nbr_mask, axis=1)[:, None], agg, 0.0)
            if self.variant in ("PointGroupNet",):
                # fusion with the center feature
                agg = nn.Dense(self.out_channels, use_bias=False, name="fuse")(
                    jnp.concatenate([agg, nn.Dense(self.out_channels, use_bias=False, name="center")(feats)], axis=-1)
                )
        agg = MaskedBatchNorm(name="out_bn")(agg, valid, train)
        return nn.relu(agg)


class GraphConvNet(nn.Module):
    """Shared grid-pyramid encoder + FP decoder (see module docstring)."""

    variant: str = "PointConvNet"
    channels: Sequence[int] = (64, 128, 256)
    base_cell: float = 0.1
    nsample: int = 16
    out_channels: int = 64

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        from .backbones_kpconv import _grid_reps

        pts = batch_dict["point_bxyz"]
        n = pts.shape[0]
        valid = batch_dict.get("point_valid", jnp.ones(n, bool))
        feats = batch_dict.get("point_feat", jnp.zeros((n, 1)))
        bidx = jnp.round(pts[:, 0]).astype(jnp.float32)
        boff = (1e4 * bidx)[:, None] * jnp.asarray([1.0, 0, 0])

        x = feats
        if self.variant == "PointNet2RepSurf":
            from .repsurf import UmbrellaSurfaceConstructor

            surf = UmbrellaSurfaceConstructor(name="umbrella")(
                pts[:, 1:4], jnp.round(pts[:, 0]).astype(jnp.int32), valid, train
            )
            x = jnp.concatenate([x, surf], axis=-1)

        xyz = pts[:, 1:4]
        lvalid = valid
        levels = []
        for li, ch in enumerate(self.channels):
            cell = self.base_cell * (2 ** li)
            radius = 2.5 * cell
            rep_xyz, rep_valid, inverse = _grid_reps(
                jnp.concatenate([bidx[:, None], xyz], axis=1), lvalid, cell
            )
            pooled = segment_ops.segment_mean(
                jnp.where(lvalid[:, None], x, 0.0), jnp.where(lvalid, inverse, n), n + 1
            )[:n][inverse]
            xyz, lvalid, x = rep_xyz, rep_valid, pooled

            ref_f = jnp.concatenate([bidx[:, None], xyz], axis=1)
            grid = hash_graph.build_hash_grid(ref_f, radius, lvalid)
            nbr, _, nmask = hash_graph.radius_neighbors(
                grid, ref_f, radius, self.nsample, query_valid=lvalid,
                cell_cap=self.nsample + 16,
            )
            x = GraphEdgeConv(ch, self.variant, name=f"conv{li}")(x, xyz, nbr, nmask, lvalid, train)
            levels.append((xyz, lvalid, x))

        up_xyz, up_valid, up_x = levels[-1]
        for li in range(len(self.channels) - 2, -1, -1):
            f_xyz, f_valid, f_x = levels[li]
            idx, d2 = sampling.knn_bruteforce(up_xyz + boff, f_xyz + boff, 3, ref_valid=up_valid)
            w = 1.0 / jnp.maximum(d2, 1e-8)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            interp = jnp.sum(up_x[jnp.clip(idx, 0, n - 1)] * w[..., None], axis=1)
            up_x = jnp.concatenate([f_x, interp], axis=-1)
            up_x = nn.Dense(self.channels[li], use_bias=False, name=f"up{li}")(up_x)
            up_x = MaskedBatchNorm(name=f"up{li}_bn")(up_x, f_valid, train)
            up_x = nn.relu(up_x)
            up_xyz, up_valid = f_xyz, f_valid

        idx, d2 = sampling.knn_bruteforce(up_xyz + boff, pts[:, 1:4] + boff, 3, ref_valid=up_valid)
        w = 1.0 / jnp.maximum(d2, 1e-8)
        w = w / jnp.sum(w, axis=1, keepdims=True)
        point_x = jnp.sum(up_x[jnp.clip(idx, 0, n - 1)] * w[..., None], axis=1)
        point_x = nn.Dense(self.out_channels, use_bias=False, name="head")(point_x)
        point_x = MaskedBatchNorm(name="head_bn")(point_x, valid, train)
        point_x = nn.relu(point_x)

        batch_dict["point_features"] = jnp.where(valid[:, None], point_x, 0.0)
        batch_dict["point_coords"] = jnp.concatenate([pts[:, 0:1], pts[:, 1:4]], axis=1)
        return batch_dict
