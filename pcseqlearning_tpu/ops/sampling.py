"""Point sampling: farthest point sampling (FPS) and random/grid subsampling.

Replaces pointnet2 furthest_point_sampling
(/root/reference/pcdet/ops/pointnet2/pointnet2_stack/src/sampling_gpu.cu) and
the sampler registry (/root/reference/pcdet/models/model_utils/sampler_utils.py).

TPU design: FPS is an O(S*N) fori_loop of fused distance updates — pure VPU,
no tree structures; padded points are excluded by mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sample(xyz, num_samples, valid=None):
    """Farthest point sampling.

    Args:
        xyz: [N, 3]
        num_samples: static S
        valid: [N] bool
    Returns:
        idx [S] int32 sample indices (repeats the last valid pick if fewer
        than S valid points exist).
    """
    n = xyz.shape[0]
    if valid is None:
        valid = jnp.ones(n, dtype=bool)
    big = jnp.asarray(jnp.inf, dtype=xyz.dtype)
    dist = jnp.where(valid, big, -big)  # invalid points can never be farthest
    first = jnp.argmax(valid)  # first valid point

    def body(i, state):
        dist, picks = state
        last = picks[i - 1]
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        dist = jnp.minimum(dist, jnp.where(valid, d, -big))
        nxt = jnp.argmax(dist)
        picks = picks.at[i].set(nxt.astype(jnp.int32))
        return dist, picks

    picks0 = jnp.zeros(num_samples, dtype=jnp.int32).at[0].set(first.astype(jnp.int32))
    _, picks = jax.lax.fori_loop(1, num_samples, body, (dist, picks0))
    return picks


def batched_farthest_point_sample(xyz, num_samples, valid=None):
    """vmap over a leading batch axis: xyz [B, N, 3] -> [B, S]."""
    fn = functools.partial(farthest_point_sample, num_samples=num_samples)
    if valid is None:
        return jax.vmap(lambda x: fn(x))(xyz)
    return jax.vmap(lambda x, v: fn(x, valid=v))(xyz, valid)


def knn_bruteforce(ref_xyz, query_xyz, k, ref_valid=None, ref_batch=None, query_batch=None):
    """Exact kNN via pairwise distances (MXU-friendly |a-b|^2 expansion).

    Replaces pointops.knnquery (/root/reference/pcdet/ops/pointops/) for
    moderate N (pillar centers, plane centers, sampled keypoints). Optional
    per-point batch ids restrict matches to the same batch element.

    Returns (idx [M, k] int32, dist2 [M, k]).
    """
    n = ref_xyz.shape[0]
    if ref_valid is None:
        ref_valid = jnp.ones(n, dtype=bool)
    # |q - r|^2 = |q|^2 + |r|^2 - 2 q.r  — the cross term rides the MXU.
    # The expansion loses precision in f32 (catastrophic cancellation for
    # near-coincident points), so it only PRESELECTS candidates; the final
    # ranking recomputes distances exactly on the small candidate set.
    qn = jnp.sum(query_xyz * query_xyz, axis=-1)
    rn = jnp.sum(ref_xyz * ref_xyz, axis=-1)
    cross = query_xyz @ ref_xyz.T
    d2 = qn[:, None] + rn[None, :] - 2.0 * cross
    big = jnp.asarray(jnp.inf, dtype=ref_xyz.dtype)
    d2 = jnp.where(ref_valid[None, :], d2, big)
    if ref_batch is not None and query_batch is not None:
        d2 = jnp.where(query_batch[:, None] == ref_batch[None, :], d2, big)
    k2 = min(n, 2 * k + 8)
    _, cand = jax.lax.top_k(-d2, k2)  # [M, k2] candidate preselection
    diff = ref_xyz[cand] - query_xyz[:, None, :]  # exact distances
    d2_exact = jnp.sum(diff * diff, axis=-1)
    invalid = ~ref_valid[cand]
    if ref_batch is not None and query_batch is not None:
        invalid = invalid | (query_batch[:, None] != ref_batch[cand])
    d2_exact = jnp.where(invalid, big, d2_exact)
    neg, pos = jax.lax.top_k(-d2_exact, k)
    idx = jnp.take_along_axis(cand, pos, axis=1)
    return idx.astype(jnp.int32), -neg
