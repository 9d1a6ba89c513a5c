"""Dynamic voxel aggregation — named API parity with the reference
VoxelAggregation (/root/reference/pcdet/ops/voxel/voxel_modules.py:7-130):
per-voxel mean of arbitrary feature dicts plus median for integer labels,
built on grid_utils/segment_ops (the torch.unique + sorted-offset tricks are
the lexicographic sort here)."""

from __future__ import annotations

import jax.numpy as jnp

from . import grid_utils, segment_ops


class VoxelAggregation:
    def __init__(self, voxel_size, num_voxels_cap=None):
        self.voxel_size = [float(v) for v in voxel_size]
        self.num_voxels_cap = num_voxels_cap

    def __call__(self, point_bxyz, feature_dict=None, valid=None):
        """Returns dict(bxyz, valid, inverse, num_voxels, + mean of float
        entries and median of int entries of feature_dict)."""
        n = point_bxyz.shape[0]
        cap = self.num_voxels_cap or n
        if valid is None:
            valid = jnp.ones(n, bool)
        pts = jnp.where(valid[:, None], point_bxyz, 1e8)
        out = grid_utils.grid_sample_mean(pts, self.voxel_size, num_voxels_cap=cap)
        inverse = out["inverse"]
        inv_safe = jnp.where(valid, inverse, cap)
        if feature_dict:
            for k, v in feature_dict.items():
                v = jnp.asarray(v)
                if jnp.issubdtype(v.dtype, jnp.integer):
                    out[k] = segment_ops.segment_median(
                        jnp.where(valid, v, -1), inverse, cap
                    )
                else:
                    out[k] = segment_ops.segment_mean(
                        jnp.where(valid[:, None] if v.ndim > 1 else valid, v, 0.0),
                        inv_safe, cap + 1,
                    )[:cap]
        return out
