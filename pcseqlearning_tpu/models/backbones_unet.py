"""Sparse UNet backbone (encoder-decoder) for point/voxel segmentation.

Rewrite of /root/reference/pcdet/models/backbones_3d/spconv_unet.py (UNetV2):
the VoxelBackBone8x encoder plus a decoder of inverse sparse convs with
skip connections, producing per-voxel features at input resolution.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import sparse_conv as sc
from .layers import MaskedBatchNorm, SparseConvBlock, SubMConvBlock


class InverseConvBlock(nn.Module):
    """SparseInverseConv3d + BN + ReLU onto known finer coords."""

    out_channels: int
    kernel_size: object = 3
    stride: object = 2
    padding: object = 1

    @nn.compact
    def __call__(self, st: sc.SparseTensor, target: sc.SparseTensor, train: bool = False):
        ks = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) else (self.kernel_size,) * 3
        k = int(np.prod(ks))
        cin = st.features.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k, cin, self.out_channels),
        )
        out = sc.sparse_inverse_conv3d(
            st, target, w, kernel_size=self.kernel_size, stride=self.stride, padding=self.padding
        )
        f = MaskedBatchNorm()(out.features, out.valid, train)
        f = nn.relu(f)
        f = jnp.where(out.valid[:, None], f, 0.0)
        return out._replace(features=f)


class UNetV2(nn.Module):
    """4-stage sparse UNet; returns per-input-voxel features
    (batch_dict['point_features'] analog at voxel granularity)."""

    input_channels: int
    grid_size: Sequence[int]  # (W, H, D)
    channels: Sequence[int] = (16, 16, 32, 64, 64)

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

        x = SubMConvBlock(c[0], name="conv_input")(st, train)
        x_conv1 = SubMConvBlock(c[1], name="conv1")(x, train)
        x = SparseConvBlock(c[2], out_cap=cap, name="down2")(x_conv1, train)
        x_conv2 = SubMConvBlock(c[2], name="conv2")(x, train)
        x = SparseConvBlock(c[3], out_cap=max(cap // 2, 1), name="down3")(x_conv2, train)
        x_conv3 = SubMConvBlock(c[3], name="conv3")(x, train)
        x = SparseConvBlock(c[4], out_cap=max(cap // 4, 1), name="down4")(x_conv3, train)
        x_conv4 = SubMConvBlock(c[4], name="conv4")(x, train)

        # decoder with skip connections (reference UR blocks)
        u3 = InverseConvBlock(c[3], name="up3")(x_conv4, x_conv3, train)
        m3 = u3._replace(features=jnp.concatenate([u3.features, x_conv3.features], axis=-1))
        m3 = SubMConvBlock(c[3], name="merge3")(m3, train)
        u2 = InverseConvBlock(c[2], name="up2")(m3, x_conv2, train)
        m2 = u2._replace(features=jnp.concatenate([u2.features, x_conv2.features], axis=-1))
        m2 = SubMConvBlock(c[2], name="merge2")(m2, train)
        u1 = InverseConvBlock(c[1], name="up1")(m2, x_conv1, train)
        m1 = u1._replace(features=jnp.concatenate([u1.features, x_conv1.features], axis=-1))
        m1 = SubMConvBlock(c[1], name="merge1")(m1, train)

        batch_dict["voxel_point_features"] = m1.features
        batch_dict["unet_out"] = m1
        batch_dict["encoded_spconv_tensor"] = x_conv4
        batch_dict["encoded_spconv_tensor_stride"] = 8
        batch_dict["multi_scale_3d_features"] = {
            "x_conv1": x_conv1, "x_conv2": x_conv2, "x_conv3": x_conv3, "x_conv4": x_conv4,
        }
        return batch_dict


class PointSegHead(nn.Module):
    """Per-voxel/point segmentation head over UNet features (reference
    dense_heads/point_seg_head.py): MLP -> class logits + focal/CE loss."""

    num_classes: int
    hidden: Sequence[int] = (64,)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        x = batch_dict["voxel_point_features"]
        valid = batch_dict["voxel_valid"]
        for h in self.hidden:
            x = nn.Dense(h, use_bias=False)(x)
            x = MaskedBatchNorm()(x, valid, train)
            x = nn.relu(x)
        logits = nn.Dense(self.num_classes)(x)
        batch_dict["seg_logits"] = logits
        return batch_dict

    @staticmethod
    def loss(batch_dict, labels, valid):
        import jax

        logits = batch_dict["seg_logits"]
        nc = logits.shape[-1]
        onehot = jax.nn.one_hot(jnp.clip(labels, 0, nc - 1), nc)
        logp = jax.nn.log_softmax(logits, axis=-1)
        w = (valid & (labels >= 0)).astype(jnp.float32)
        ce = -jnp.sum(onehot * logp, axis=-1) * w
        return jnp.sum(ce) / jnp.maximum(jnp.sum(w), 1.0)
