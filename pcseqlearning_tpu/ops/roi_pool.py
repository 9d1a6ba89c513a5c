"""RoI pooling kernels: RoI-aware voxel pooling, RoI grid pooling, and raw
point pooling.

Replaces the reference CUDA extensions roiaware_pool3d
(/root/reference/pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu:
point-in-rotated-box + per-voxel max/avg pooling) and roipoint_pool3d
(/root/reference/pcdet/ops/roipoint_pool3d/src/roipoint_pool3d.cpp), plus the
ball-query grid pooling of pointnet2_stack used by PV-RCNN's RoI head.

TPU design: each RoI's local grid is computed densely — a [R, G^3, ...]
batched tensor of canonical grid-cell assignments via a single rotate+floor
per point-RoI pair; pooling is segment-max over (roi, cell) keys. No per-RoI
dynamic allocation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import segment_ops


def _to_local(points_xyz, rois):
    """[R, N, 3] canonical-frame coordinates of each point in each RoI."""
    d = points_xyz[None, :, :] - rois[:, None, 0:3]
    c = jnp.cos(-rois[:, 6])[:, None]
    s = jnp.sin(-rois[:, 6])[:, None]
    lx = d[..., 0] * c + d[..., 1] * (-s)
    ly = d[..., 0] * s + d[..., 1] * c
    return jnp.stack([lx, ly, d[..., 2]], axis=-1)


@functools.partial(jax.jit, static_argnames=("grid_size", "pool"))
def roiaware_pool3d(points_xyz, point_feats, rois, point_valid=None, roi_valid=None, grid_size=6, pool="max"):
    """RoI-aware grid pooling (reference roiaware_pool3d forward).

    Args:
        points_xyz: [N, 3]; point_feats [N, C]; rois [R, 7].
        grid_size: G (static) — output grid GxGxG per RoI.
        pool: 'max' or 'avg'.
    Returns:
        pooled [R, G, G, G, C]; occupancy [R, G, G, G] bool.
    """
    n = points_xyz.shape[0]
    r = rois.shape[0]
    g = grid_size
    if point_valid is None:
        point_valid = jnp.ones(n, bool)
    if roi_valid is None:
        roi_valid = jnp.ones(r, bool)

    local = _to_local(points_xyz, rois)  # [R, N, 3]
    half = rois[:, None, 3:6] / 2.0
    inside = jnp.all(jnp.abs(local) < half + 1e-6, axis=-1)  # [R, N]
    inside = inside & point_valid[None, :] & roi_valid[:, None]
    cell = jnp.floor((local + half) / (rois[:, None, 3:6] / g)).astype(jnp.int32)
    cell = jnp.clip(cell, 0, g - 1)
    key = ((jnp.arange(r, dtype=jnp.int32)[:, None] * g + cell[..., 0]) * g + cell[..., 1]) * g + cell[..., 2]
    key = jnp.where(inside, key, r * g * g * g)
    flat_key = key.reshape(-1)
    flat_feats = jnp.broadcast_to(point_feats[None], (r,) + point_feats.shape).reshape(r * n, -1)
    num = r * g * g * g
    if pool == "max":
        pooled = segment_ops.segment_max_or(flat_feats, flat_key, num + 1, 0.0)[:num]
    else:
        pooled = segment_ops.segment_mean(flat_feats, flat_key, num + 1)[:num]
    occ = segment_ops.segment_count(flat_key, num + 1)[:num] > 0.5
    c = point_feats.shape[-1]
    return pooled.reshape(r, g, g, g, c), occ.reshape(r, g, g, g)


@functools.partial(jax.jit, static_argnames=("num_sampled",))
def roipoint_pool3d(points_xyz, point_feats, rois, num_sampled=512, point_valid=None):
    """Pool raw points inside each RoI to a fixed count (reference
    roipoint_pool3d: PointRCNN head input). Repeats-first-fill semantics.

    Returns pooled_pts [R, S, 3+C], empty_mask [R].
    """
    n = points_xyz.shape[0]
    r = rois.shape[0]
    if point_valid is None:
        point_valid = jnp.ones(n, bool)
    local = _to_local(points_xyz, rois)
    half = rois[:, None, 3:6] / 2.0
    inside = jnp.all(jnp.abs(local) < half + 1e-6, axis=-1) & point_valid[None, :]
    # rank points per roi; take first num_sampled member indices
    order_key = jnp.where(inside, jnp.arange(n, dtype=jnp.int32)[None, :], n)
    picked = jnp.sort(order_key, axis=1)[:, :num_sampled]  # [R, S]
    ok = picked < n
    first = picked[:, :1]
    picked = jnp.where(ok, picked, jnp.minimum(first, n - 1))  # repeat first member
    feats = jnp.concatenate([points_xyz, point_feats], axis=-1)
    pooled = feats[picked]
    empty = ~jnp.any(inside, axis=1)
    pooled = jnp.where(empty[:, None, None], 0.0, pooled)
    return pooled, empty


@functools.partial(jax.jit, static_argnames=("num_sampled",))
def roipoint_pool3d_masked(points_xyz, point_feats, rois, pair_valid, num_sampled=512):
    """roipoint_pool3d with a per-(roi, point) validity mask [R, N]
    (e.g. restricting each RoI to its own batch sample). Same
    repeats-first-fill semantics as roipoint_pool3d.

    Returns pooled_pts [R, S, 3+C] (xyz CENTERED on the RoI, reference
    pointrcnn_head canonical input) and empty_mask [R].
    """
    n = points_xyz.shape[0]
    local = points_xyz[None, :, :] - rois[:, None, 0:3]
    # rotated inside test in the RoI frame
    canon = _to_local(points_xyz, rois)
    half = rois[:, None, 3:6] / 2.0
    inside = jnp.all(jnp.abs(canon) < half + 1e-6, axis=-1) & pair_valid
    order_key = jnp.where(inside, jnp.arange(n, dtype=jnp.int32)[None, :], n)
    picked = jnp.sort(order_key, axis=1)[:, :num_sampled]
    ok = picked < n
    first = picked[:, :1]
    picked = jnp.where(ok, picked, jnp.minimum(first, n - 1))
    feats = jnp.concatenate([points_xyz, point_feats], axis=-1)
    pooled = feats[picked]
    # center xyz on the RoI (rotation happens in the head)
    pooled = pooled.at[..., :3].add(-rois[:, None, 0:3])
    empty = ~jnp.any(inside, axis=1)
    pooled = jnp.where(empty[:, None, None], 0.0, pooled)
    return pooled, empty


@functools.partial(jax.jit, static_argnames=("grid_size",))
def roi_grid_points(rois, grid_size=6):
    """Global xyz of each RoI's dense GxGxG grid-cell centers (PV-RCNN RoI
    grid pooling, reference roi_heads/pvrcnn_head.py get_global_grid_points).

    Returns [R, G^3, 3].
    """
    g = grid_size
    idx = jnp.stack(
        jnp.meshgrid(jnp.arange(g), jnp.arange(g), jnp.arange(g), indexing="ij"), axis=-1
    ).reshape(-1, 3).astype(jnp.float32)  # [G^3, 3]
    local = (idx + 0.5) / g - 0.5  # in [-0.5, 0.5)
    local = local[None, :, :] * rois[:, None, 3:6]
    c = jnp.cos(rois[:, 6])[:, None]
    s = jnp.sin(rois[:, 6])[:, None]
    gx = local[..., 0] * c - local[..., 1] * s
    gy = local[..., 0] * s + local[..., 1] * c
    pts = jnp.stack([gx, gy, local[..., 2]], axis=-1)
    return pts + rois[:, None, 0:3]
