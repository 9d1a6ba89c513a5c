"""Sparse voxel backbones.

TPU-native rewrites of the reference spconv backbones
(/root/reference/pcdet/models/backbones_3d/spconv_backbone.py:47-271):
VoxelBackBone8x (4-stage stride-8) and VoxelResBackBone8x (residual variant),
built from ops/sparse_conv gather-GEMM-scatter kernels.

The input grid is (D, H, W) = ceil(range/voxel) with z first (spconv layout);
voxel capacities per stage shrink geometrically (the active set shrinks by
~4-8x per downsample in practice; caps are configurable headroom).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import sparse_conv as sc
from .layers import SparseBasicBlock, SparseConvBlock, SubMConvBlock


class VoxelBackBone8x(nn.Module):
    """conv_input -> conv1 (subm) -> conv2..4 (stride-2 spconv + 2 subm each)
    -> conv_out (stride (2,1,1)); returns 8x-downsampled sparse tensor plus
    multi-scale features (reference spconv_backbone.py:47-154)."""

    input_channels: int
    grid_size: Sequence[int]  # (W, H, D) like the reference cfg order
    channels: Sequence[int] = (16, 16, 32, 64, 64)
    out_channels: int = 128
    voxel_cap: int = 0  # input capacity; 0 = infer from input table

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        feats = batch_dict["voxel_features"]
        coords = batch_dict["voxel_coords"]
        valid = batch_dict["voxel_valid"]
        batch_size = int(batch_dict["batch_size"])
        W, H, D = self.grid_size
        # reference pads D by +1 (spconv_backbone.py:90: [41, 1600, 1408])
        st = sc.SparseTensor(feats, coords, valid, (D + 1, H, W), batch_size)
        cap = feats.shape[0]

        c = self.channels
        # one rulebook per stage: subm convs don't change coords, so every
        # conv in a stage shares the (dominant-cost) coordinate lookup
        rb1 = sc.build_subm_rulebook(st, 3)
        x = SubMConvBlock(c[0], name="conv_input")(st, train, rb1)
        x_conv1 = SubMConvBlock(c[1], name="conv1")(x, train, rb1)
        x = SparseConvBlock(c[2], out_cap=cap, name="conv2_down")(x_conv1, train)
        rb2 = sc.build_subm_rulebook(x, 3)
        x = SubMConvBlock(c[2], name="conv2_a")(x, train, rb2)
        x_conv2 = SubMConvBlock(c[2], name="conv2_b")(x, train, rb2)
        x = SparseConvBlock(c[3], out_cap=max(cap // 2, 1), name="conv3_down")(x_conv2, train)
        rb3 = sc.build_subm_rulebook(x, 3)
        x = SubMConvBlock(c[3], name="conv3_a")(x, train, rb3)
        x_conv3 = SubMConvBlock(c[3], name="conv3_b")(x, train, rb3)
        x = SparseConvBlock(c[4], out_cap=max(cap // 4, 1), name="conv4_down")(x_conv3, train)
        rb4 = sc.build_subm_rulebook(x, 3)
        x = SubMConvBlock(c[4], name="conv4_a")(x, train, rb4)
        x_conv4 = SubMConvBlock(c[4], name="conv4_b")(x, train, rb4)
        # last conv: stride (2,1,1) kernel (3,1,1) compressing z
        out = SparseConvBlock(
            self.out_channels, kernel_size=(3, 1, 1), stride=(2, 1, 1), padding=0,
            out_cap=max(cap // 4, 1), name="conv_out",
        )(x_conv4, train)

        batch_dict["encoded_spconv_tensor"] = out
        batch_dict["encoded_spconv_tensor_stride"] = 8
        batch_dict["multi_scale_3d_features"] = {
            "x_conv1": x_conv1,
            "x_conv2": x_conv2,
            "x_conv3": x_conv3,
            "x_conv4": x_conv4,
        }
        return batch_dict


class VoxelResBackBone8x(nn.Module):
    """Residual variant (reference spconv_backbone.py:157-271)."""

    input_channels: int
    grid_size: Sequence[int]
    channels: Sequence[int] = (16, 16, 32, 64, 128)
    out_channels: int = 128

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        feats = batch_dict["voxel_features"]
        coords = batch_dict["voxel_coords"]
        valid = batch_dict["voxel_valid"]
        batch_size = int(batch_dict["batch_size"])
        W, H, D = self.grid_size
        st = sc.SparseTensor(feats, coords, valid, (D + 1, H, W), batch_size)
        cap = feats.shape[0]

        c = self.channels
        # one rulebook per stage (coords are stable across subm/res blocks)
        rb1 = sc.build_subm_rulebook(st, 3)
        x = SubMConvBlock(c[0], name="conv_input")(st, train, rb1)
        x = SparseBasicBlock(c[1], name="res1_a")(x, train, rb1)
        x_conv1 = SparseBasicBlock(c[1], name="res1_b")(x, train, rb1)
        x = SparseConvBlock(c[2], out_cap=cap, name="conv2_down")(x_conv1, train)
        rb2 = sc.build_subm_rulebook(x, 3)
        x = SparseBasicBlock(c[2], name="res2_a")(x, train, rb2)
        x_conv2 = SparseBasicBlock(c[2], name="res2_b")(x, train, rb2)
        x = SparseConvBlock(c[3], out_cap=max(cap // 2, 1), name="conv3_down")(x_conv2, train)
        rb3 = sc.build_subm_rulebook(x, 3)
        x = SparseBasicBlock(c[3], name="res3_a")(x, train, rb3)
        x_conv3 = SparseBasicBlock(c[3], name="res3_b")(x, train, rb3)
        x = SparseConvBlock(c[4], out_cap=max(cap // 4, 1), name="conv4_down")(x_conv3, train)
        rb4 = sc.build_subm_rulebook(x, 3)
        x = SparseBasicBlock(c[4], name="res4_a")(x, train, rb4)
        x_conv4 = SparseBasicBlock(c[4], name="res4_b")(x, train, rb4)
        out = SparseConvBlock(
            self.out_channels, kernel_size=(3, 1, 1), stride=(2, 1, 1), padding=0,
            out_cap=max(cap // 4, 1), name="conv_out",
        )(x_conv4, train)

        batch_dict["encoded_spconv_tensor"] = out
        batch_dict["encoded_spconv_tensor_stride"] = 8
        batch_dict["multi_scale_3d_features"] = {
            "x_conv1": x_conv1,
            "x_conv2": x_conv2,
            "x_conv3": x_conv3,
            "x_conv4": x_conv4,
        }
        return batch_dict


BACKBONES_3D = {
    "VoxelBackBone8x": VoxelBackBone8x,
    "VoxelResBackBone8x": VoxelResBackBone8x,
}
