"""Shared flax layers: masked batch norm and sparse conv blocks.

The sparse blocks mirror the reference's spconv building blocks
(post_act_block / SparseBasicBlock, /root/reference/pcdet/models/blocks/
spconv_blocks.py) on top of ops/sparse_conv.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Sequence

import flax.linen as nn
import numpy as np
import jax
import jax.numpy as jnp

from ..ops import sparse_conv as sc

# trace-time context: when set, every batch-norm layer reduces its moments
# over the named mapped axis — the SPMD equivalent of torch SyncBatchNorm
# (reference tools/train.py:146-147). The data-parallel train step wraps
# model.apply in bn_cross_replica("dp") inside shard_map, which makes the
# dp=K step numerically identical to the dp=1 step (global-batch moments).
_SYNC_AXIS = [None]


@contextmanager
def bn_cross_replica(axis_name):
    prev = _SYNC_AXIS[0]
    _SYNC_AXIS[0] = axis_name
    try:
        yield
    finally:
        _SYNC_AXIS[0] = prev


def _moment_sum(x):
    """Sum a moment accumulator over the sync axis when one is bound."""
    if _SYNC_AXIS[0] is not None:
        return jax.lax.psum(x, _SYNC_AXIS[0])
    return x


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the valid rows of a padded table.

    Statistics exclude padding; running stats follow torch's
    momentum=0.01/eps=1e-3 convention used throughout the reference
    (spconv_backbone.py: norm_fn = partial(BatchNorm1d, eps=1e-3,
    momentum=0.01))."""

    momentum: float = 0.01
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x, valid, train: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            w = valid.astype(x.dtype)[:, None]
            n = jnp.maximum(_moment_sum(jnp.sum(w)), 1.0)
            mean = _moment_sum(jnp.sum(x * w, axis=0)) / n
            var = _moment_sum(jnp.sum(w * (x - mean[None, :]) ** 2, axis=0)) / n
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean[None, :]) * jax.lax.rsqrt(var[None, :] + self.eps)
        y = y * scale[None, :] + bias[None, :]
        return jnp.where(valid[:, None], y, 0.0)


class BatchNorm2d(nn.Module):
    """Dense batch norm over [..., C] feature maps with cross-replica
    moment sync via bn_cross_replica (drop-in for nn.BatchNorm in the BEV
    backbone / heads; torch momentum convention: new = (1-m)*old + m*batch,
    m matching nn.BatchNorm's (1 - momentum))."""

    momentum: float = 0.01
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        axes = tuple(range(x.ndim - 1))

        if train:
            n = _moment_sum(jnp.asarray(np.prod(x.shape[:-1]), x.dtype))
            mean = _moment_sum(jnp.sum(x, axis=axes)) / n
            var = _moment_sum(jnp.sum((x - mean) ** 2, axis=axes)) / n
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


def _kernel_init(k, cin):
    return nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")


class SubMConvBlock(nn.Module):
    """SubMConv3d + BN + ReLU (reference post_act_block, conv_type='subm')."""

    out_channels: int
    kernel_size: object = 3
    use_norm: bool = True
    use_act: bool = True

    @nn.compact
    def __call__(self, st: sc.SparseTensor, train: bool = False, rulebook=None):
        ks = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) else (self.kernel_size,) * 3
        k = int(np.prod(ks))
        cin = st.features.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k, cin, self.out_channels),
        )
        out = sc.subm_conv3d(st, w, kernel_size=self.kernel_size, rulebook=rulebook)
        f = out.features
        if self.use_norm:
            f = MaskedBatchNorm()(f, out.valid, train)
        if self.use_act:
            f = nn.relu(f)
        f = jnp.where(out.valid[:, None], f, 0.0)
        return out._replace(features=f)


class SparseConvBlock(nn.Module):
    """Strided SparseConv3d + BN + ReLU (reference post_act_block,
    conv_type='spconv')."""

    out_channels: int
    kernel_size: object = 3
    stride: object = 2
    padding: object = 1
    out_cap: int | None = None
    use_norm: bool = True
    use_act: bool = True

    @nn.compact
    def __call__(self, st: sc.SparseTensor, train: bool = False):
        ks = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) else (self.kernel_size,) * 3
        k = int(np.prod(ks))
        cin = st.features.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k, cin, self.out_channels),
        )
        out = sc.sparse_conv3d(
            st, w, kernel_size=self.kernel_size, stride=self.stride,
            padding=self.padding, out_cap=self.out_cap,
        )
        f = out.features
        if self.use_norm:
            f = MaskedBatchNorm()(f, out.valid, train)
        if self.use_act:
            f = nn.relu(f)
        f = jnp.where(out.valid[:, None], f, 0.0)
        return out._replace(features=f)


class SparseBasicBlock(nn.Module):
    """Residual submanifold block (reference SparseBasicBlock,
    blocks/spconv_blocks.py / spconv_backbone.py:12-45)."""

    channels: int

    @nn.compact
    def __call__(self, st: sc.SparseTensor, train: bool = False, rulebook=None):
        # both subm convs run on the same coordinate set — one rulebook
        # (built here if the caller didn't pass a stage-shared one)
        if rulebook is None:
            rulebook = sc.build_subm_rulebook(st, 3)
        identity = st.features
        out = SubMConvBlock(self.channels, use_act=True)(st, train, rulebook)
        out = SubMConvBlock(self.channels, use_act=False)(out, train, rulebook)
        f = nn.relu(out.features + identity)
        f = jnp.where(out.valid[:, None], f, 0.0)
        return out._replace(features=f)
