"""BEV projection + 2D convolutional backbone.

Rewrites of HeightCompression (/root/reference/pcdet/models/backbones_2d/
map_to_bev/height_compression.py), PointPillarScatter, and BaseBEVBackbone
(base_bev_backbone.py:6-130): multi-scale conv blocks with transposed-conv
upsampling, concatenated to a single BEV feature map.

Dense convs here ride XLA's conv lowering directly onto the MXU — no custom
kernels needed (SURVEY.md §7 step 6).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import sparse_conv as sc
from .layers import BatchNorm2d


class HeightCompression(nn.Module):
    """Stack z-slices into channels: sparse (B, D, H, W, C) -> dense BEV
    (B, H, W, C*D)."""

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        st = batch_dict["encoded_spconv_tensor"]
        dense = sc.to_dense(st)  # [B, D, H, W, C]
        b, d, h, w, c = dense.shape
        bev = jnp.transpose(dense, (0, 2, 3, 1, 4)).reshape(b, h, w, d * c)
        batch_dict["spatial_features"] = bev
        batch_dict["spatial_features_stride"] = batch_dict.get("encoded_spconv_tensor_stride", 8)
        return batch_dict


class PointPillarScatter(nn.Module):
    """Scatter pillar features onto the BEV grid (reference
    map_to_bev/pointpillar_scatter.py)."""

    grid_size: Sequence[int]  # (W, H, D=1)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        feats = batch_dict.get("pillar_features", batch_dict.get("voxel_features"))  # [P, C]
        coords = batch_dict["voxel_coords"]  # [P, 4] (b, z, y, x)
        valid = batch_dict["voxel_valid"]
        b = int(batch_dict["batch_size"])
        W, H = self.grid_size[0], self.grid_size[1]
        c = feats.shape[-1]
        # gather formulation (see ops/sparse_conv.to_dense): scatter P int32
        # row ids, then gather rows per BEV cell — a [P, C] float scatter
        # serializes on TPU; pillar coords are unique (dynamic voxelization
        # dedupes), so set-then-gather is exact
        L = b * H * W
        lin = (coords[:, 0] * H + coords[:, 2]) * W + coords[:, 3]
        batch_dict["spatial_features"] = sc.grid_densify(
            L, feats, valid, lin).reshape(b, H, W, c)
        batch_dict["spatial_features_stride"] = 1
        return batch_dict


class BaseBEVBackbone(nn.Module):
    """Multi-scale conv encoder + deconv fusion (reference
    base_bev_backbone.py:6-130). NHWC layout; channels-last suits TPU."""

    layer_nums: Sequence[int] = (5, 5)
    layer_strides: Sequence[int] = (1, 2)
    num_filters: Sequence[int] = (128, 256)
    upsample_strides: Sequence[int] = (1, 2)
    num_upsample_filters: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        x = batch_dict["spatial_features"]
        ups = []
        for i, n_layers in enumerate(self.layer_nums):
            x = nn.Conv(
                self.num_filters[i], (3, 3), strides=(self.layer_strides[i],) * 2,
                padding=1, use_bias=False, name=f"block{i}_down",
            )(x)
            x = BatchNorm2d(name=f"block{i}_down_bn")(x, train)
            x = nn.relu(x)
            for j in range(n_layers):
                x = nn.Conv(self.num_filters[i], (3, 3), padding=1, use_bias=False, name=f"block{i}_conv{j}")(x)
                x = BatchNorm2d(name=f"block{i}_bn{j}")(x, train)
                x = nn.relu(x)
            u = self.upsample_strides[i]
            if u > 1:
                y = nn.ConvTranspose(
                    self.num_upsample_filters[i], (u, u), strides=(u, u), use_bias=False,
                    name=f"deblock{i}",
                )(x)
            else:
                y = nn.Conv(self.num_upsample_filters[i], (1, 1), use_bias=False, name=f"deblock{i}")(x)
            y = BatchNorm2d(name=f"deblock{i}_bn")(y, train)
            y = nn.relu(y)
            ups.append(y)
        out = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        batch_dict["spatial_features_2d"] = out
        return batch_dict


MAP_TO_BEV = {
    "HeightCompression": HeightCompression,
    "PointPillarScatter": PointPillarScatter,
}
BACKBONES_2D = {"BaseBEVBackbone": BaseBEVBackbone}
