"""Voxel-grid utilities: multi-key unique, grid sampling, dynamic voxelization.

Replaces torch_cluster.grid_cluster + GridSampling3D
(/root/reference/pcdet/models/model_utils/grid_sampling.py:7-49) and the
pure-PyTorch VoxelAggregation (/root/reference/pcdet/ops/voxel/voxel_modules.py).

TPU design: no hash tables for uniquing. Integer voxel coordinates are sorted
lexicographically with ``jax.lax.sort`` (multi-operand lexicographic sort,
XLA-native); group boundaries are change flags; the inverse map comes from
scattering group ids back through the sort permutation. All shapes static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import segment_ops


def unique_rows(coords):
    """Group identical integer rows.

    Args:
        coords: [N, D] int32 array of coordinates.
    Returns:
        inverse:     [N] int32 — group id per input row (0..num_groups-1);
                     group ids are assigned in lexicographic row order.
        num_groups:  [] int32 (traced) — number of distinct rows.
        perm:        [N] int32 — sort permutation (coords[perm] is sorted).
    """
    n, d = coords.shape
    keys = tuple(coords[:, i] for i in range(d))
    idx = jnp.arange(n, dtype=jnp.int32)
    out = jax.lax.sort(keys + (idx,), num_keys=d)
    sorted_keys, perm = out[:d], out[d]
    change = jnp.zeros(n, dtype=jnp.int32)
    for k in sorted_keys:
        change = change | (k != jnp.concatenate([k[:1], k[:-1]])).astype(jnp.int32)
    change = change.at[0].set(0)
    group_of_sorted = jnp.cumsum(change)
    num_groups = group_of_sorted[-1] + 1
    inverse = jnp.zeros(n, dtype=jnp.int32).at[perm].set(group_of_sorted.astype(jnp.int32))
    return inverse, num_groups, perm


def voxel_coords(points_bxyz, voxel_size, origin=None, batch_size_hint=None):
    """Integer voxel coordinates [N, 4] = (batch/frame, cx, cy, cz).

    floor((p - origin)/size) per spatial dim; the batch/frame dim is passed
    through rounded (the reference keys the hash on it directly,
    graph_utils.py:174).
    """
    voxel_size = jnp.asarray(voxel_size, dtype=points_bxyz.dtype)
    if origin is None:
        origin = jnp.min(points_bxyz[:, 1:4], axis=0)
    b = jnp.round(points_bxyz[:, 0]).astype(jnp.int32)
    cxyz = jnp.floor((points_bxyz[:, 1:4] - origin) / voxel_size).astype(jnp.int32)
    return jnp.concatenate([b[:, None], cxyz], axis=1)


def grid_sample_mean(points_bxyz, voxel_size, extra=None, num_voxels_cap=None):
    """Voxel-grid downsample by per-voxel mean.

    TPU equivalent of ``GridSampling3D`` + scatter-mean
    (reference grid_sampling.py:7-49, preprocessor_utils.py:21-30).

    Args:
        points_bxyz: [N, 4] (batch/frame, x, y, z)
        voxel_size: [3] spatial voxel size
        extra: optional dict of per-point arrays to also mean-reduce
        num_voxels_cap: static capacity for the voxel table (default N)
    Returns:
        dict with:
          bxyz      [V, 4] per-voxel mean coordinate (V = num_voxels_cap)
          valid     [V] bool — voxel occupancy mask
          inverse   [N] int32 — voxel id per point
          num_voxels traced int32
          plus mean-reduced ``extra`` entries
    """
    n = points_bxyz.shape[0]
    cap = num_voxels_cap or n
    coords = voxel_coords(points_bxyz, voxel_size)
    inverse, num_voxels, _ = unique_rows(coords)
    out = {
        "bxyz": segment_ops.segment_mean(points_bxyz, inverse, cap),
        "valid": segment_ops.segment_count(inverse, cap) > 0.5,
        "inverse": inverse,
        "num_voxels": num_voxels,
    }
    if extra:
        for k, v in extra.items():
            out[k] = segment_ops.segment_mean(v.astype(jnp.float32), inverse, cap)
    return out


def grid_subsample_indices(points_bxyz, voxel_size):
    """One representative point index per voxel (max index, matching the
    reference's scatter-max-of-arange subsample, simple_reg.py:122-124).

    Returns (indices [V<=N padded with -1 at tail? no:], valid mask)
    Here: rep [N-capacity] int32 with rep[v] = chosen point index for voxel v
    (valid where mask), plus inverse map.
    """
    n = points_bxyz.shape[0]
    coords = voxel_coords(points_bxyz, voxel_size)
    inverse, num_voxels, _ = unique_rows(coords)
    idx = jnp.arange(n, dtype=jnp.int32)
    rep = segment_ops.segment_max_or(idx, inverse, n, -1)
    valid = rep >= 0
    return rep, valid, inverse, num_voxels


def dynamic_voxelize(points_bxyz, features, voxel_size, pc_range_min, num_voxels_cap):
    """Dynamic voxelization: mean feature per occupied voxel, no fixed
    max-points-per-voxel (reference DynamicMeanVFE,
    /root/reference/pcdet/models/backbones_3d/vfe/dynamic_mean_vfe.py:14-100).

    Returns:
        voxel_coords_out [V, 4] int32 (b, cz, cy, cx)  — spconv layout
        voxel_feats      [V, C] mean features
        valid            [V] bool
        inverse          [N] int32
    """
    voxel_size = jnp.asarray(voxel_size, dtype=points_bxyz.dtype)
    origin = jnp.asarray(pc_range_min, dtype=points_bxyz.dtype)
    b = jnp.round(points_bxyz[:, 0]).astype(jnp.int32)
    cxyz = jnp.floor((points_bxyz[:, 1:4] - origin) / voxel_size).astype(jnp.int32)
    coords = jnp.concatenate([b[:, None], cxyz], axis=1)
    inverse, num_voxels, _ = unique_rows(coords)
    cap = num_voxels_cap
    feats = segment_ops.segment_mean(features, inverse, cap)
    cnt = segment_ops.segment_count(inverse, cap)
    valid = cnt > 0.5
    # first-occurrence coords per voxel (min works since all rows in a group equal)
    vc = segment_ops.segment_min_or(coords, inverse, cap, 0)
    # reorder to (b, z, y, x) like spconv
    vc_bzyx = jnp.stack([vc[:, 0], vc[:, 3], vc[:, 2], vc[:, 1]], axis=1)
    return vc_bzyx, feats, valid, inverse
