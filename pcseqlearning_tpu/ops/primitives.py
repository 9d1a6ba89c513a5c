"""Geometric primitive fitting: per-voxel weighted plane/covariance fits.

Replaces the reference hybrid_geop CUDA extension
(/root/reference/pcdet/ops/hybrid_geop/: GPU hash insert + per-voxel weighted
covariance + in-kernel 3x3 SVD, svd3_cuda_device.h) and the primitives CPU
extension (voxelization with ambient edges, voxel graphs). On TPU the whole
fit is segment ops + the batched closed-form eigh3x3 — no custom kernel
needed, and the IRLS loop is a `lax.while_loop`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import geometry, grid_utils, hash_graph, segment_ops


@functools.partial(jax.jit, static_argnames=("num_primitives", "num_iters"))
def primitive_fitting(point_bxyz, point_valid, voxel_size, num_primitives,
                      sigma=0.05, num_iters=10):
    """Fit a plane primitive per voxel via IRLS weighted PCA (reference
    hybrid_geop_modules.PrimitiveFitting).

    Returns dict: centers [P,3], normals [P,3], eigvals [P,3],
    eigvecs [P,3,3], weight-sums, point weights/errors, inverse [N].
    """
    n = point_bxyz.shape[0]
    P = num_primitives
    coords = grid_utils.voxel_coords(point_bxyz, voxel_size)
    coords = jnp.where(point_valid[:, None], coords, jnp.int32(2 ** 24))
    inverse, _, _ = grid_utils.unique_rows(coords)
    pidx = jnp.where(point_valid, inverse, P)
    xyz = point_bxyz[:, 1:4]
    sigma2 = sigma * sigma

    def body(state):
        w, it, _ = state
        center = segment_ops.weighted_segment_mean(xyz, w, pidx, P + 1)[:P]
        d = xyz - center[jnp.clip(pidx, 0, P - 1)]
        ddT = (w[:, None, None] * d[:, :, None]) * d[:, None, :]
        cov = segment_ops.segment_mean(ddT, pidx, P + 1)[:P]
        vals, vecs = geometry.eigh3x3(cov)
        normal = vecs[..., 0]
        err = jnp.abs(jnp.sum(d * normal[jnp.clip(pidx, 0, P - 1)], axis=-1))
        new_w = sigma2 / (err * err + sigma2)
        done = jnp.max(jnp.abs(new_w - w)) < 1e-2
        return new_w, it + 1, done

    def cond(state):
        _, it, done = state
        return (~done) & (it < num_iters)

    w0 = point_valid.astype(xyz.dtype)
    w, _, _ = jax.lax.while_loop(cond, body, (w0, 0, jnp.bool_(False)))

    center = segment_ops.weighted_segment_mean(xyz, w, pidx, P + 1)[:P]
    d = xyz - center[jnp.clip(pidx, 0, P - 1)]
    ddT = (w[:, None, None] * d[:, :, None]) * d[:, None, :]
    cov = segment_ops.segment_mean(ddT, pidx, P + 1)[:P]
    vals, vecs = geometry.eigh3x3(cov)
    wsum = segment_ops.segment_count(pidx, P + 1, weights=w)[:P]
    err = jnp.abs(jnp.sum(d * vecs[..., 0][jnp.clip(pidx, 0, P - 1)], axis=-1))
    return dict(
        centers=center, normals=vecs[..., 0], eigvals=vals, eigvecs=vecs,
        weight_sum=wsum, point_weight=w, point_error=err, inverse=inverse,
        valid=wsum > 1e-3,
    )


def voxel_graph(coords, valid, kernel_offset=1):
    """Edges between voxels within a +-kernel_offset neighborhood — the
    reference primitives_cpu voxel_graph / VoxelGraph (graph_utils.py:215).

    Returns (e_src [V*K], e_dst [V*K], mask) where K = (2k+1)^3 - 1.
    """
    import itertools

    table = hash_graph.build_coord_table(coords, valid)
    offs = [
        o for o in itertools.product(*[range(-kernel_offset, kernel_offset + 1)] * 3)
        if o != (0, 0, 0)
    ]
    v = coords.shape[0]
    srcs, dsts, masks = [], [], []
    for o in offs:
        q = coords.at[:, 1:4].add(jnp.asarray(o, jnp.int32)[None, :])
        idx = hash_graph.coord_lookup(table, q, valid)
        ok = idx >= 0
        srcs.append(jnp.arange(v, dtype=jnp.int32))
        dsts.append(jnp.where(ok, idx, -1))
        masks.append(ok)
    return (
        jnp.concatenate(srcs),
        jnp.concatenate(dsts),
        jnp.concatenate(masks),
    )
