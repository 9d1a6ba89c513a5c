"""KPConv point backbone: encoder of grid-subsampled KPConv dual blocks +
3-NN feature-propagation decoder.

TPU-native rewrite of /root/reference/pcdet/models/backbones_3d/kpconv.py
(KPDualBlock encoder + FPBlockUp decoder over RadiusGraph neighborhoods,
blocks/kpconv_blocks.py). Levels subsample by voxel-grid means; each level
runs two KPConvBlocks (plain + residual, the KPDualBlock shape) over
hash-grid radius neighborhoods; the decoder interpolates coarse features
back with inverse-distance 3-NN (FPBlockUp.up_k=3).

All tables are capacity-padded: level l keeps the full [N] table with a
validity mask (voxel reps only), so shapes stay static.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import hash_graph, sampling
from .blocks import KPConvBlock
from .layers import MaskedBatchNorm


def _grid_reps(bxyz, valid, cell):
    """Voxel-mean representatives in-place: [N, 3] means at first-occurrence
    rows, validity mask for reps."""
    from ..ops import grid_utils, segment_ops

    n = bxyz.shape[0]
    coords = grid_utils.voxel_coords(bxyz, jnp.asarray([cell, cell, cell], bxyz.dtype))
    coords = jnp.where(valid[:, None], coords, jnp.int32(2 ** 24))
    inverse, _, _ = grid_utils.unique_rows(coords)
    inv_safe = jnp.where(valid, inverse, n)
    mean_xyz = segment_ops.segment_mean(
        jnp.where(valid[:, None], bxyz[:, 1:4], 0.0), inv_safe, n + 1
    )[:n]
    rep_xyz = mean_xyz[inverse]
    # first occurrence of each voxel becomes the representative row
    rows = jnp.arange(n, dtype=jnp.int32)
    first_idx = segment_ops.segment_min_or(rows, inv_safe, n + 1, n)[:n]
    rep_valid = valid & (rows == first_idx[inverse])
    return rep_xyz, rep_valid, inverse


class KPConvNet(nn.Module):
    """Encoder-decoder KPConv network producing per-point features."""

    channels: Sequence[int] = (64, 128, 256)
    base_cell: float = 0.1
    nsample: int = 16
    out_channels: int = 64

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        pts = batch_dict["point_bxyz"]
        n = pts.shape[0]
        valid = batch_dict.get("point_valid", jnp.ones(n, bool))
        feats = batch_dict.get("point_feat", jnp.zeros((n, 1)))
        bidx = jnp.round(pts[:, 0]).astype(jnp.float32)

        # encoder: per level, grid-subsample + dual KPConv block
        levels = []  # (xyz, lvalid, feats)
        x = jnp.concatenate([feats, jnp.ones((n, 1), feats.dtype)], axis=-1)
        xyz = pts[:, 1:4]
        lvalid = valid
        for li, ch in enumerate(self.channels):
            cell = self.base_cell * (2 ** li)
            radius = 2.5 * cell
            rep_xyz, rep_valid, inverse = _grid_reps(
                jnp.concatenate([bidx[:, None], xyz], axis=1), lvalid, cell
            )
            # pool features to reps (mean over the voxel)
            from ..ops import segment_ops

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
            x = KPConvBlock(ch, sigma=cell, name=f"kp{li}a")(x, xyz, nbr, nmask, lvalid, train)
            y = KPConvBlock(ch, sigma=cell, name=f"kp{li}b")(x, xyz, nbr, nmask, lvalid, train)
            x = nn.relu(x + y)  # residual dual block
            levels.append((xyz, lvalid, x))

        # decoder: 3-NN inverse-distance interpolation up the pyramid
        up_xyz, up_valid, up_x = levels[-1]
        for li in range(len(self.channels) - 2, -1, -1):
            f_xyz, f_valid, f_x = levels[li]
            idx, d2 = sampling.knn_bruteforce(
                up_xyz + (1e4 * bidx)[:, None] * jnp.asarray([1.0, 0, 0]),
                f_xyz + (1e4 * bidx)[:, None] * jnp.asarray([1.0, 0, 0]),
                3, ref_valid=up_valid,
            )
            w = 1.0 / jnp.maximum(d2, 1e-8)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            interp = jnp.sum(up_x[jnp.clip(idx, 0, n - 1)] * w[..., None], axis=1)
            up_x = jnp.concatenate([f_x, interp], axis=-1)
            up_x = nn.Dense(self.channels[li], use_bias=False, name=f"up{li}")(up_x)
            up_x = MaskedBatchNorm(name=f"up{li}_bn")(up_x, f_valid, train)
            up_x = nn.relu(up_x)
            up_xyz, up_valid = f_xyz, f_valid

        # back to the raw point table via 3-NN from level 0 reps
        idx, d2 = sampling.knn_bruteforce(
            up_xyz + (1e4 * bidx)[:, None] * jnp.asarray([1.0, 0, 0]),
            pts[:, 1:4] + (1e4 * bidx)[:, None] * jnp.asarray([1.0, 0, 0]),
            3, ref_valid=up_valid,
        )
        w = 1.0 / jnp.maximum(d2, 1e-8)
        w = w / jnp.sum(w, axis=1, keepdims=True)
        point_x = jnp.sum(up_x[jnp.clip(idx, 0, n - 1)] * w[..., None], axis=1)
        point_x = nn.Dense(self.out_channels, use_bias=False, name="head")(point_x)
        point_x = MaskedBatchNorm(name="head_bn")(point_x, valid, train)
        point_x = nn.relu(point_x)

        batch_dict["point_features"] = jnp.where(valid[:, None], point_x, 0.0)
        batch_dict["point_coords"] = jnp.concatenate(
            [pts[:, 0:1], pts[:, 1:4]], axis=1
        )
        return batch_dict
