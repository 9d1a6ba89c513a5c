"""Point feature extraction: VoxelSetAbstraction (the PV-RCNN keypoint
branch).

Rewrite of /root/reference/pcdet/models/backbones_3d/pfe/
voxel_set_abstraction.py: FPS keypoints from raw points, multi-scale ball
query + PointNet SA over sparse voxel feature tables, bilinear BEV features,
and raw-point SA — concatenated into per-keypoint features.

TPU design: ball query = the hash-grid radius kernel over voxel-center
tables; the SA MLP+max runs as one [K_keypoints, S_neighbors, C] batched
tensor on the MXU.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import hash_graph, sampling
from .layers import MaskedBatchNorm


def voxel_centers(coords_bzyx, valid, voxel_size, pc_range_min, stride):
    """[V, 3] xyz centers of (strided) voxel coords."""
    vs = jnp.asarray(voxel_size) * stride
    origin = jnp.asarray(pc_range_min)
    zyx = coords_bzyx[:, 1:4].astype(jnp.float32)
    xyz = jnp.stack([zyx[:, 2], zyx[:, 1], zyx[:, 0]], axis=-1)
    return (xyz + 0.5) * vs[None, :] + origin[None, :]


class SAGroup(nn.Module):
    """One ball-query + shared-MLP + max SA group (pointnet2_stack
    QueryAndGroup + MLP equivalent)."""

    radius: float
    nsample: int
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, key_xyz, key_batch, src_xyz, src_batch, src_feats, src_valid, train=False):
        nk = key_xyz.shape[0]
        src_f = jnp.concatenate([src_batch[:, None].astype(jnp.float32), src_xyz], axis=1)
        key_f = jnp.concatenate([key_batch[:, None].astype(jnp.float32), key_xyz], axis=1)
        grid = hash_graph.build_hash_grid(src_f, self.radius, src_valid)
        idx, d2, mask = hash_graph.radius_neighbors(
            grid, key_f, self.radius, self.nsample, cell_cap=self.nsample + 16
        )
        ns = src_xyz.shape[0]
        gathered_xyz = src_xyz[jnp.clip(idx, 0, ns - 1)]  # [K, S, 3]
        rel = jnp.where(mask[..., None], gathered_xyz - key_xyz[:, None, :], 0.0)
        gathered_f = jnp.where(mask[..., None], src_feats[jnp.clip(idx, 0, ns - 1)], 0.0)
        x = jnp.concatenate([rel, gathered_f], axis=-1)  # [K, S, 3+C]
        flat_valid = mask.reshape(-1)
        h = x.reshape(nk * self.nsample, -1)
        for c in self.mlp:
            h = nn.Dense(c, use_bias=False)(h)
            h = MaskedBatchNorm()(h, flat_valid, train)
            h = nn.relu(h)
        h = h.reshape(nk, self.nsample, -1)
        h = jnp.where(mask[..., None], h, -jnp.inf)
        out = jnp.max(h, axis=1)
        has = jnp.any(mask, axis=1)
        return jnp.where(has[:, None], out, 0.0)


def vector_pool_bin(rel_xyz, feats, mask, num_voxels, max_dist):
    """Local-voxel average pooling of a neighborhood (the voxel_avg_pool
    path of the reference VectorPoolAggregationModule,
    ops/pointnet2/pointnet2_stack/src/vector_pool_gpu.cu +
    pointnet2_modules.py:247-340): each query's cube neighborhood of
    half-edge ``max_dist`` is split into nx*ny*nz local voxels; support
    features and relative positions average per voxel.

    Args:
        rel_xyz: [M, K, 3] support-minus-query offsets (masked rows ignored).
        feats: [M, K, C]; mask [M, K].
        num_voxels: (nx, ny, nz) static.
    Returns:
        pooled [M, V, 3+C] per-voxel (mean rel_xyz, mean feats); occ [M, V].
    """
    m, k, c = feats.shape
    nx, ny, nz = num_voxels
    V = nx * ny * nz
    d = jnp.asarray(max_dist, rel_xyz.dtype)
    inside = jnp.all(jnp.abs(rel_xyz) < d, axis=-1) & mask
    cell_size = 2.0 * d / jnp.asarray([nx, ny, nz], rel_xyz.dtype)
    cell = jnp.floor((rel_xyz + d) / cell_size).astype(jnp.int32)
    cell = jnp.clip(cell, 0, jnp.asarray([nx - 1, ny - 1, nz - 1]))
    vid = (cell[..., 0] * ny + cell[..., 1]) * nz + cell[..., 2]  # [M, K]
    key = jnp.where(inside, jnp.arange(m, dtype=jnp.int32)[:, None] * V + vid, m * V)
    flat = jnp.concatenate([rel_xyz, feats], axis=-1).reshape(m * k, -1)
    w = inside.astype(rel_xyz.dtype).reshape(-1)
    sums = jax.ops.segment_sum(flat * w[:, None], key.reshape(-1), num_segments=m * V + 1)[: m * V]
    cnts = jax.ops.segment_sum(w, key.reshape(-1), num_segments=m * V + 1)[: m * V]
    pooled = (sums / jnp.maximum(cnts, 1.0)[:, None]).reshape(m, V, 3 + c)
    occ = cnts.reshape(m, V) > 0.5
    return jnp.where(occ[..., None], pooled, 0.0), occ


class VectorPoolAggregation(nn.Module):
    """Vector-pool local aggregation (reference VectorPoolAggregationModule,
    voxel_avg_pool type): neighborhood query -> local-voxel avg pooling ->
    per-voxel (grouped) linear -> flatten -> post MLP. The grouped conv is a
    batched einsum over the voxel axis — pure MXU."""

    num_local_voxel: Sequence[int] = (3, 3, 3)
    max_neighbor_distance: float = 1.2
    neighbor_nsample: int = 32
    num_reduced_channels: int = 30
    num_channels_of_local_aggregation: int = 32
    post_mlps: Sequence[int] = (128,)

    @nn.compact
    def __call__(self, key_xyz, key_batch, src_xyz, src_batch, src_feats, src_valid, train=False):
        nk = key_xyz.shape[0]
        ns = src_xyz.shape[0]
        d = self.max_neighbor_distance
        src_f = jnp.concatenate([src_batch[:, None].astype(jnp.float32), src_xyz], axis=1)
        key_f = jnp.concatenate([key_batch[:, None].astype(jnp.float32), key_xyz], axis=1)
        # cube neighborhood via ball of radius d*sqrt(3), cube-filtered in
        # vector_pool_bin (reference neighbor_type=0: cube)
        r = d * 1.7320508
        grid = hash_graph.build_hash_grid(src_f, r, src_valid)
        idx, _, mask = hash_graph.radius_neighbors(
            grid, key_f, r, self.neighbor_nsample, cell_cap=self.neighbor_nsample + 16
        )
        g_xyz = src_xyz[jnp.clip(idx, 0, ns - 1)]
        rel = jnp.where(mask[..., None], g_xyz - key_xyz[:, None, :], 1e8)
        feats = nn.Dense(self.num_reduced_channels, use_bias=False, name="reduce")(src_feats)
        g_f = jnp.where(mask[..., None], feats[jnp.clip(idx, 0, ns - 1)], 0.0)

        pooled, occ = vector_pool_bin(rel, g_f, mask, tuple(self.num_local_voxel), d)
        V = pooled.shape[1]
        cin = pooled.shape[-1]
        # grouped per-voxel linear (reference Conv1d(groups=total_voxels))
        wg = self.param(
            "group_kernel", nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (V, cin, self.num_channels_of_local_aggregation),
        )
        h = jnp.einsum("mvc,vcd->mvd", pooled, wg, precision=jax.lax.Precision.HIGHEST)
        h = h.reshape(nk, -1)
        any_occ = jnp.any(occ, axis=1)
        h = MaskedBatchNorm(name="group_bn")(h, any_occ, train)
        h = nn.relu(h)
        for i, c in enumerate(self.post_mlps):
            h = nn.Dense(c, use_bias=False, name=f"post{i}")(h)
            h = MaskedBatchNorm(name=f"post_bn{i}")(h, any_occ, train)
            h = nn.relu(h)
        return jnp.where(any_occ[:, None], h, 0.0)


class VoxelSetAbstraction(nn.Module):
    """Keypoint FPS + multi-scale SA over voxel tables + BEV bilinear
    (reference pfe/voxel_set_abstraction.py:45+)."""

    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    num_keypoints: int = 2048
    features_source: Sequence[str] = ("bev", "x_conv3", "x_conv4", "raw_points")
    sa_radii: dict = None
    out_channels: int = 128
    # 'sa' = ball-query PointNet SA (PV-RCNN); 'vector_pool' = local-voxel
    # vector pooling (PV-RCNN++, reference VectorPoolAggregationModule)
    aggregation: str = "sa"

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        points = batch_dict["point_bxyz"]
        p_valid = batch_dict.get("point_valid", jnp.ones(points.shape[0], bool))
        batch_size = int(batch_dict["batch_size"])

        # keypoints: FPS per batch element over raw points
        keypoints = []
        key_batch = []
        for b in range(batch_size):
            m = (jnp.round(points[:, 0]).astype(jnp.int32) == b) & p_valid
            idx = sampling.farthest_point_sample(points[:, 1:4], self.num_keypoints, valid=m)
            keypoints.append(points[idx, 1:4])
            key_batch.append(jnp.full(self.num_keypoints, b, jnp.int32))
        key_xyz = jnp.concatenate(keypoints)  # [B*K, 3]
        key_b = jnp.concatenate(key_batch)

        feats = []
        radii = self.sa_radii or {"raw_points": (0.4, 16), "x_conv3": (1.2, 16), "x_conv4": (2.4, 16)}

        def group(name, r, ns, mlp, *args):
            if self.aggregation == "vector_pool":
                return VectorPoolAggregation(
                    max_neighbor_distance=r, neighbor_nsample=ns,
                    post_mlps=tuple(mlp), name=f"vp_{name}",
                )(*args)
            return SAGroup(r, ns, tuple(mlp), name=f"sa_{name}")(*args)

        if "raw_points" in self.features_source:
            raw_f = batch_dict.get("point_feat", jnp.zeros((points.shape[0], 1)))
            r, ns = radii["raw_points"]
            feats.append(
                group("raw", r, ns, (16, 16),
                      key_xyz, key_b, points[:, 1:4], jnp.round(points[:, 0]).astype(jnp.int32),
                      raw_f, p_valid, train)
            )

        ms = batch_dict.get("multi_scale_3d_features", {})
        strides = {"x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8}
        for src in self.features_source:
            if src not in ms:
                continue
            st = ms[src]
            centers = voxel_centers(
                st.coords, st.valid, self.voxel_size, self.point_cloud_range[:3], strides[src]
            )
            r, ns = radii.get(src, (1.6, 16))
            feats.append(
                group(src, r, ns, (32, 32),
                      key_xyz, key_b, centers, st.coords[:, 0], st.features, st.valid, train)
            )

        if "bev" in self.features_source and "spatial_features" in batch_dict:
            bev = batch_dict["spatial_features"]  # [B, H, W, C]
            pcr = jnp.asarray(self.point_cloud_range)
            stride = batch_dict.get("spatial_features_stride", 8)
            vs = jnp.asarray(self.voxel_size)
            fx = (key_xyz[:, 0] - pcr[0]) / (vs[0] * stride) - 0.5
            fy = (key_xyz[:, 1] - pcr[1]) / (vs[1] * stride) - 0.5
            H, W = bev.shape[1], bev.shape[2]
            x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 2)
            y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 2)
            wx = jnp.clip(fx - x0, 0, 1)[:, None]
            wy = jnp.clip(fy - y0, 0, 1)[:, None]
            b = key_b
            f00 = bev[b, y0, x0]
            f01 = bev[b, y0, x0 + 1]
            f10 = bev[b, y0 + 1, x0]
            f11 = bev[b, y0 + 1, x0 + 1]
            feats.append(
                f00 * (1 - wx) * (1 - wy) + f01 * wx * (1 - wy) + f10 * (1 - wx) * wy + f11 * wx * wy
            )

        kp_features = jnp.concatenate(feats, axis=-1)
        kp_features = nn.Dense(self.out_channels, use_bias=False)(kp_features)
        kp_features = MaskedBatchNorm()(kp_features, jnp.ones(kp_features.shape[0], bool), train)
        kp_features = nn.relu(kp_features)

        batch_dict["point_features"] = kp_features
        batch_dict["point_coords"] = jnp.concatenate(
            [key_b[:, None].astype(jnp.float32), key_xyz], axis=1
        )
        return batch_dict
