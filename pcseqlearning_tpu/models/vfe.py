"""Voxel feature encoders.

TPU-native rewrites of the reference VFE zoo
(/root/reference/pcdet/models/backbones_3d/vfe/): MeanVFE, DynamicMeanVFE
(torch_scatter dynamic voxelization, dynamic_mean_vfe.py:14-100), PillarVFE
and DynPillarVFE (pillar_vfe.py). All operate on padded point tables and
produce fixed-capacity voxel tables ready for the sparse backbone.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import grid_utils, segment_ops
from .layers import MaskedBatchNorm


class DynamicMeanVFE(nn.Module):
    """Mean of point features per voxel, no fixed points-per-voxel cap.

    Config parity: VOXEL_SIZE, POINT_CLOUD_RANGE from the dataset cfg;
    NUM_POINT_FEATURES passthrough (reference dynamic_mean_vfe.py)."""

    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    voxel_cap: int

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        points = batch_dict["point_bxyz"]  # [N, 4]
        feats = batch_dict["point_feat"]  # [N, C]
        valid = batch_dict.get("point_valid", jnp.ones(points.shape[0], bool))
        pc_min = jnp.asarray(self.point_cloud_range[:3], points.dtype)
        pc_max = jnp.asarray(self.point_cloud_range[3:], points.dtype)
        inside = jnp.all((points[:, 1:4] >= pc_min) & (points[:, 1:4] < pc_max), axis=-1)
        valid = valid & inside
        pts = jnp.where(valid[:, None], points, 1e8)
        full = jnp.concatenate([points[:, 1:4], feats], axis=-1)
        coords, vfeat, vvalid, inverse = grid_utils.dynamic_voxelize(
            pts, full, self.voxel_size, pc_min, self.voxel_cap
        )
        batch_dict["voxel_features"] = jnp.where(vvalid[:, None], vfeat, 0.0)
        batch_dict["voxel_coords"] = jnp.where(vvalid[:, None], coords, -1)
        batch_dict["voxel_valid"] = vvalid
        batch_dict["point_voxel_inverse"] = inverse
        return batch_dict

    def get_output_feature_dim(self, input_dim):
        return input_dim + 3


class MeanVFE(nn.Module):
    """Mean over a pre-voxelized [V, P, C] tensor (reference mean_vfe.py)."""

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        vox = batch_dict["voxels"]  # [V, P, C]
        num = batch_dict["voxel_num_points"]  # [V]
        s = jnp.sum(vox, axis=1)
        batch_dict["voxel_features"] = s / jnp.maximum(num[:, None], 1.0)
        return batch_dict


class DynPillarVFE(nn.Module):
    """Dynamic pillar VFE: per-point PFN MLP (linear+BN+ReLU) followed by
    per-pillar max, with cluster-center and pillar-center offsets appended
    (reference pillar_vfe.py / dynamic_pillar_vfe.py).

    Output: pillar table on a 2D grid (z collapsed)."""

    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    pillar_cap: int
    num_filters: Sequence[int] = (64,)
    use_absolute_xyz: bool = True

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        points = batch_dict["point_bxyz"]
        feats = batch_dict["point_feat"]
        n = points.shape[0]
        valid = batch_dict.get("point_valid", jnp.ones(n, bool))
        pc_min = jnp.asarray(self.point_cloud_range[:3], points.dtype)
        pc_max = jnp.asarray(self.point_cloud_range[3:], points.dtype)
        vs = jnp.asarray(self.voxel_size, points.dtype)
        inside = jnp.all((points[:, 1:4] >= pc_min) & (points[:, 1:4] < pc_max), axis=-1)
        valid = valid & inside

        b = jnp.round(points[:, 0]).astype(jnp.int32)
        cxy = jnp.floor((points[:, 1:3] - pc_min[:2]) / vs[:2]).astype(jnp.int32)
        coords = jnp.concatenate([b[:, None], cxy], axis=1)
        coords = jnp.where(valid[:, None], coords, jnp.int32(2 ** 24))
        inverse, _, _ = grid_utils.unique_rows(coords)
        cap = self.pillar_cap
        inv_safe = jnp.where(valid, inverse, cap)

        # cluster center offset
        mean_xyz = segment_ops.segment_mean(points[:, 1:4], inv_safe, cap + 1)[:cap]
        f_cluster = points[:, 1:4] - mean_xyz[jnp.clip(inverse, 0, cap - 1)]
        # pillar center offset
        pillar_center = (cxy.astype(points.dtype) + 0.5) * vs[:2] + pc_min[:2]
        f_center = points[:, 1:3] - pillar_center

        parts = [points[:, 1:4] if self.use_absolute_xyz else points[:, 3:4], feats, f_cluster, f_center]
        x = jnp.concatenate(parts, axis=-1)
        for nf in self.num_filters:
            x = nn.Dense(nf, use_bias=False)(x)
            x = MaskedBatchNorm()(x, valid, train)
            x = nn.relu(x)
        x = jnp.where(valid[:, None], x, -jnp.inf)
        pooled = segment_ops.segment_max_or(x, inv_safe, cap + 1, 0.0)[:cap]

        cnt = segment_ops.segment_count(inv_safe, cap + 1)[:cap]
        pvalid = cnt > 0.5
        pcoords = segment_ops.segment_min_or(coords, inv_safe, cap + 1, 0)[:cap]
        # spconv-style (b, z=0, y, x)
        vc = jnp.stack(
            [pcoords[:, 0], jnp.zeros_like(pcoords[:, 0]), pcoords[:, 2], pcoords[:, 1]], axis=1
        )
        batch_dict["pillar_features"] = jnp.where(pvalid[:, None], pooled, 0.0)
        batch_dict["voxel_features"] = batch_dict["pillar_features"]
        batch_dict["voxel_coords"] = jnp.where(pvalid[:, None], vc, -1)
        batch_dict["voxel_valid"] = pvalid
        return batch_dict


VFES = {
    "MeanVFE": MeanVFE,
    "DynamicMeanVFE": DynamicMeanVFE,
    "DynPillarVFE": DynPillarVFE,
    "DynamicPillarVFE": DynPillarVFE,
}


class DynamicVFE(nn.Module):
    """Per-point MLP + voxel mean&max fusion (reference dynamic_vfe.py):
    point features concat [xyz offsets to voxel mean] -> MLP -> per-voxel
    max, iterated twice with re-broadcast."""

    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    voxel_cap: int
    num_filters: Sequence[int] = (64, 128)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        points = batch_dict["point_bxyz"]
        feats = batch_dict["point_feat"]
        n = points.shape[0]
        valid = batch_dict.get("point_valid", jnp.ones(n, bool))
        pc_min = jnp.asarray(self.point_cloud_range[:3], points.dtype)
        pc_max = jnp.asarray(self.point_cloud_range[3:], points.dtype)
        inside = jnp.all((points[:, 1:4] >= pc_min) & (points[:, 1:4] < pc_max), axis=-1)
        valid = valid & inside
        pts = jnp.where(valid[:, None], points, 1e8)
        coords, _, vvalid, inverse = grid_utils.dynamic_voxelize(
            pts, feats, self.voxel_size, pc_min, self.voxel_cap
        )
        cap = self.voxel_cap
        inv_safe = jnp.where(valid, inverse, cap)
        mean_xyz = segment_ops.segment_mean(points[:, 1:4], inv_safe, cap + 1)[:cap]
        x = jnp.concatenate(
            [points[:, 1:4], feats, points[:, 1:4] - mean_xyz[jnp.clip(inverse, 0, cap - 1)]],
            axis=-1,
        )
        for i, nf in enumerate(self.num_filters):
            x = nn.Dense(nf, use_bias=False)(x)
            x = MaskedBatchNorm()(x, valid, train)
            x = nn.relu(x)
            vmax = segment_ops.segment_max_or(
                jnp.where(valid[:, None], x, -jnp.inf), inv_safe, cap + 1, 0.0
            )[:cap]
            if i + 1 < len(self.num_filters):
                x = jnp.concatenate([x, vmax[jnp.clip(inverse, 0, cap - 1)]], axis=-1)
        batch_dict["voxel_features"] = jnp.where(vvalid[:, None], vmax, 0.0)
        batch_dict["voxel_coords"] = jnp.where(vvalid[:, None], coords, -1)
        batch_dict["voxel_valid"] = vvalid
        batch_dict["point_voxel_inverse"] = inverse
        return batch_dict


class PlaneFittingVFE(nn.Module):
    """RANSAC/IRLS plane-fit voxel features (reference vfe/plane_fitting.py +
    hybrid_vfe.py): per-voxel plane normal, eigenvalues, fit error appended
    to the mean features — built on ops/primitives.primitive_fitting."""

    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    voxel_cap: int

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        from ..ops.primitives import primitive_fitting

        points = batch_dict["point_bxyz"]
        feats = batch_dict["point_feat"]
        n = points.shape[0]
        valid = batch_dict.get("point_valid", jnp.ones(n, bool))
        pc_min = jnp.asarray(self.point_cloud_range[:3], points.dtype)
        pts = jnp.where(valid[:, None], points, 1e8)
        coords, vfeat, vvalid, inverse = grid_utils.dynamic_voxelize(
            pts, jnp.concatenate([points[:, 1:4], feats], -1), self.voxel_size, pc_min, self.voxel_cap
        )
        fit = primitive_fitting(pts, valid, self.voxel_size, self.voxel_cap)
        geo_feat = jnp.concatenate(
            [fit["normals"], fit["eigvals"],
             fit["weight_sum"][:, None]], axis=-1,
        )
        batch_dict["voxel_features"] = jnp.where(
            vvalid[:, None], jnp.concatenate([vfeat, geo_feat], axis=-1), 0.0
        )
        batch_dict["voxel_coords"] = jnp.where(vvalid[:, None], coords, -1)
        batch_dict["voxel_valid"] = vvalid
        batch_dict["voxel_normals"] = fit["normals"]
        batch_dict["voxel_eigvals"] = fit["eigvals"]
        return batch_dict


def umbrella_surface_features(xyz, batch_idx, valid, k=9):
    """Per-point umbrella repsurf features [N, 10] (reference
    repsurface_utils.UmbrellaSurfaceConstructor, vfe/repsurf_dynamic_vfe.py):
    the k nearest neighbors, sorted by azimuth around the point, form an
    umbrella of triangles with the center; per-triangle normals (oriented
    +z), centroids and areas aggregate by mean. Output channels:
    normal (3) + centroid offset (3) + centroid polar (3) + area (1)."""
    from ..ops import sampling
    from ..utils.polar_utils import cartesian_to_spherical

    n = xyz.shape[0]
    # batch separation by a large per-batch coordinate offset
    off = batch_idx.astype(xyz.dtype)[:, None] * jnp.asarray([1e4, 0, 0], xyz.dtype)
    idx, _ = sampling.knn_bruteforce(xyz + off, xyz + off, k + 1, ref_valid=valid)
    idx = idx[:, 1:]  # drop self
    nbr_ok = (idx >= 0) & valid[:, None]
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
    area = 0.5 * jnp.linalg.norm(nrm, axis=-1)
    unit = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
    # consistent orientation: +z hemisphere (reference orients by polar axis)
    unit = unit * jnp.where(unit[..., 2:3] < 0, -1.0, 1.0)
    centroid = (v0 + v1) / 3.0
    w = pair_ok.astype(xyz.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1e-6)
    mean_n = jnp.sum(unit * w, axis=1) / cnt
    mean_c = jnp.sum(centroid * w, axis=1) / cnt
    mean_a = jnp.sum(area[..., None] * w[..., 0:1], axis=1) / cnt
    polar = cartesian_to_spherical(mean_c)
    feats = jnp.concatenate([mean_n, mean_c, polar, mean_a], axis=-1)
    return jnp.where(valid[:, None], feats, 0.0)


class RepsurfDynamicVFE(nn.Module):
    """Dynamic voxel VFE with umbrella repsurf surface features (reference
    vfe/repsurf_dynamic_vfe.py:13-139): point features (xyz, feat, offset
    to voxel mean) run a point-voxel MLP ladder (per-layer voxel-mean
    re-broadcast), and per-point umbrella surface descriptors (10 ch)
    aggregate into the voxel features."""

    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    voxel_cap: int
    mlp_channels: Sequence[int] = (32, 64)
    knn: int = 9

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        points = batch_dict["point_bxyz"]
        feats = batch_dict["point_feat"]
        n = points.shape[0]
        valid = batch_dict.get("point_valid", jnp.ones(n, bool))
        pc_min = jnp.asarray(self.point_cloud_range[:3], points.dtype)
        pc_max = jnp.asarray(self.point_cloud_range[3:], points.dtype)
        inside = jnp.all((points[:, 1:4] >= pc_min) & (points[:, 1:4] < pc_max), axis=-1)
        valid = valid & inside
        pts = jnp.where(valid[:, None], points, 1e8)
        coords, _, vvalid, inverse = grid_utils.dynamic_voxelize(
            pts, feats, self.voxel_size, pc_min, self.voxel_cap
        )
        cap = self.voxel_cap
        inv_safe = jnp.where(valid, inverse, cap)
        mean_xyz = segment_ops.segment_mean(points[:, 1:4], inv_safe, cap + 1)[:cap]
        x = jnp.concatenate(
            [points[:, 1:4], feats,
             points[:, 1:4] - mean_xyz[jnp.clip(inverse, 0, cap - 1)]], axis=-1,
        )
        vmean = None
        for i, nf in enumerate(self.mlp_channels):
            x = nn.Dense(nf, use_bias=False)(x)
            x = MaskedBatchNorm()(x, valid, train)
            x = nn.relu(x)
            vmean = segment_ops.segment_mean(
                jnp.where(valid[:, None], x, 0.0), inv_safe, cap + 1
            )[:cap]
            if i + 1 < len(self.mlp_channels):
                x = jnp.concatenate([x, vmean[jnp.clip(inverse, 0, cap - 1)]], axis=-1)

        surf = umbrella_surface_features(
            points[:, 1:4], jnp.round(points[:, 0]).astype(jnp.int32), valid, k=self.knn
        )
        vsurf = segment_ops.segment_mean(
            jnp.where(valid[:, None], surf, 0.0), inv_safe, cap + 1
        )[:cap]
        vfeat = jnp.concatenate([vmean, vsurf], axis=-1)
        batch_dict["voxel_features"] = jnp.where(vvalid[:, None], vfeat, 0.0)
        batch_dict["voxel_coords"] = jnp.where(vvalid[:, None], coords, -1)
        batch_dict["voxel_valid"] = vvalid
        batch_dict["point_voxel_inverse"] = inverse
        batch_dict["point_repsurf"] = surf
        return batch_dict


VFES["DynamicVFE"] = DynamicVFE
VFES["PlaneFitting"] = PlaneFittingVFE
VFES["HybridVFE"] = PlaneFittingVFE
VFES["RepsurfDynamicVFE"] = RepsurfDynamicVFE


class ImageVFE(nn.Module):
    """Camera-to-voxel feature encoder — the CaDDN front end (reference
    vfe/image_vfe.py + image_vfe_modules/{ffn,f2v}): a small conv encoder
    predicts per-pixel features and a depth-bin distribution; voxel centers
    project into the image via a pinhole model (batch_dict['calib_K'] /
    'calib_T' or identity defaults) and gather depth-weighted bilinear
    features."""

    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    voxel_cap: int
    depth_bins: int = 16
    max_depth: float = 60.0
    channels: int = 32

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        img = batch_dict["images"]  # [B, H, W, 3]
        B, H, W, _ = img.shape
        x = img
        for i, c in enumerate((self.channels, self.channels)):
            x = nn.Conv(c, (3, 3), strides=(2, 2), padding=1, use_bias=False, name=f"enc{i}")(x)
            from .layers import BatchNorm2d

            x = BatchNorm2d(name=f"enc_bn{i}")(x, train)
            x = nn.relu(x)
        feat = nn.Conv(self.channels, (1, 1), name="feat")(x)  # [B, h, w, C]
        depth_logits = nn.Conv(self.depth_bins, (1, 1), name="depth")(x)
        depth_prob = jax.nn.softmax(depth_logits, axis=-1)
        h, w = feat.shape[1], feat.shape[2]

        # dense voxel grid centers
        pc_min = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
        pc_max = jnp.asarray(self.point_cloud_range[3:], jnp.float32)
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        nx = int(round(float((pc_max[0] - pc_min[0]) / vs[0])))
        ny = int(round(float((pc_max[1] - pc_min[1]) / vs[1])))
        nz = int(round(float((pc_max[2] - pc_min[2]) / vs[2])))
        ix = jnp.arange(nx); iy = jnp.arange(ny); iz = jnp.arange(nz)
        gz, gy, gx = jnp.meshgrid(iz, iy, ix, indexing="ij")
        centers = jnp.stack([
            (gx.reshape(-1) + 0.5) * vs[0] + pc_min[0],
            (gy.reshape(-1) + 0.5) * vs[1] + pc_min[1],
            (gz.reshape(-1) + 0.5) * vs[2] + pc_min[2],
        ], axis=-1)  # [V, 3]

        K = batch_dict.get("calib_K", jnp.broadcast_to(jnp.eye(3), (B, 3, 3)))
        T = batch_dict.get("calib_T", jnp.broadcast_to(jnp.eye(4), (B, 4, 4)))

        def per_sample(feat_b, prob_b, K_b, T_b):
            cam = centers @ T_b[:3, :3].T + T_b[:3, 3]
            depth = jnp.maximum(cam[:, 2], 1e-3)
            uvw = cam @ K_b.T
            u = uvw[:, 0] / depth * (w / W)
            v = uvw[:, 1] / depth * (h / H)
            inside = (u >= 0) & (u < w - 1) & (v >= 0) & (v < h - 1) & (cam[:, 2] > 0)
            u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
            v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
            wu = jnp.clip(u - u0, 0, 1)[:, None]
            wv = jnp.clip(v - v0, 0, 1)[:, None]
            f = (feat_b[v0, u0] * (1 - wu) * (1 - wv) + feat_b[v0, u0 + 1] * wu * (1 - wv)
                 + feat_b[v0 + 1, u0] * (1 - wu) * wv + feat_b[v0 + 1, u0 + 1] * wu * wv)
            dbin = jnp.clip(
                (depth / self.max_depth * self.depth_bins).astype(jnp.int32), 0, self.depth_bins - 1
            )
            pw = (prob_b[v0, u0])[jnp.arange(dbin.shape[0]), dbin]
            return jnp.where(inside[:, None], f * pw[:, None], 0.0)

        vox = jax.vmap(per_sample)(feat, depth_prob, K, T)  # [B, V, C]
        # flatten to the framework's sparse voxel table layout
        coords = jnp.stack([gz.reshape(-1), gy.reshape(-1), gx.reshape(-1)], axis=-1)
        bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), coords.shape[0])
        coords_b = jnp.concatenate(
            [bidx[:, None], jnp.tile(coords, (B, 1))], axis=1
        )
        feats_flat = vox.reshape(B * coords.shape[0], -1)
        cap = self.voxel_cap
        batch_dict["voxel_features"] = feats_flat[:cap]
        batch_dict["voxel_coords"] = coords_b[:cap]
        batch_dict["voxel_valid"] = jnp.ones(min(cap, feats_flat.shape[0]), bool)
        if feats_flat.shape[0] < cap:
            pad = cap - feats_flat.shape[0]
            batch_dict["voxel_features"] = jnp.concatenate(
                [batch_dict["voxel_features"], jnp.zeros((pad, feats_flat.shape[1]))])
            batch_dict["voxel_coords"] = jnp.concatenate(
                [batch_dict["voxel_coords"], jnp.full((pad, 4), -1, jnp.int32)])
            batch_dict["voxel_valid"] = jnp.concatenate(
                [batch_dict["voxel_valid"], jnp.zeros(pad, bool)])
        return batch_dict


VFES["ImageVFE"] = ImageVFE


class TemporalVFE(nn.Module):
    """Temporal correspondence VFE (reference vfe/temporal_vfe.py:14-59):
    links each sweep's points to their nearest neighbor in the NEXT sweep
    (radius-1 NN with the sqrt(1+r^2) temporal-window trick) and exposes
    the chained sequence edges; point features pass through."""

    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    voxel_cap: int
    radius: float = 0.5

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        from ..ops import hash_graph

        pts = batch_dict["point_bxyz"]
        n = pts.shape[0]
        valid = batch_dict.get("point_valid", jnp.ones(n, bool))
        sweep = jnp.round(pts[:, 0]).astype(jnp.int32)
        # cross-sweep NN: shift the query's sweep coordinate by +1 so each
        # point probes the NEXT sweep's cells (module contract of
        # hash_graph: frame is an exact-match key)
        ref_f = pts
        q_f = pts.at[:, 0].add(1.0)
        grid = hash_graph.build_hash_grid(ref_f, self.radius, valid)
        idx, _, ok = hash_graph.radius_neighbors(
            grid, q_f, self.radius, 1, query_valid=valid,
        )
        batch_dict["sequence_edge_src"] = jnp.arange(n, dtype=jnp.int32)
        batch_dict["sequence_edge_dst"] = idx[:, 0]
        batch_dict["sequence_edge_valid"] = ok[:, 0]
        batch_dict["point_xyz"] = pts.at[:, 0].set(0.0)
        return batch_dict


VFES["TemporalVFE"] = TemporalVFE
