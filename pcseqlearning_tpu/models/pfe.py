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


class VoxelSetAbstraction(nn.Module):
    """Keypoint FPS + multi-scale SA over voxel tables + BEV bilinear
    (reference pfe/voxel_set_abstraction.py:45+)."""

    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    num_keypoints: int = 2048
    features_source: Sequence[str] = ("bev", "x_conv3", "x_conv4", "raw_points")
    sa_radii: dict = None
    out_channels: int = 128

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

        if "raw_points" in self.features_source:
            raw_f = batch_dict.get("point_feat", jnp.zeros((points.shape[0], 1)))
            r, ns = radii["raw_points"]
            feats.append(
                SAGroup(r, ns, (16, 16), name="sa_raw")(
                    key_xyz, key_b, points[:, 1:4], jnp.round(points[:, 0]).astype(jnp.int32),
                    raw_f, p_valid, train,
                )
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
                SAGroup(r, ns, (32, 32), name=f"sa_{src}")(
                    key_xyz, key_b, centers, st.coords[:, 0], st.features, st.valid, train,
                )
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
