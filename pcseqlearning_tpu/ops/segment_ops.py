"""Segment reducers — the torch_scatter replacement.

The reference leans on ``torch_scatter.scatter`` / ``segment_coo`` everywhere
(/root/reference/pcdet/models/registration/preprocessors/registration_utils.py:12-81).
On TPU these are XLA scatter-reduce primitives via ``jax.ops.segment_*`` with a
static ``num_segments`` (the capacity-padded table size).

All functions are jit-safe: ``num_segments`` must be a Python int.
Out-of-range indices (e.g. -1 for padding) are dropped by jax segment ops
when ``indices_are_sorted=False`` and index < 0 or >= num_segments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_count(segment_ids, num_segments, weights=None, dtype=jnp.float32):
    w = jnp.ones(segment_ids.shape[0], dtype=dtype) if weights is None else weights
    return jax.ops.segment_sum(w, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments, eps=1e-6):
    """Per-segment mean; empty segments yield 0 (matches reference
    robust_mean semantics, registration_utils.py:12-20)."""
    total = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    cnt = segment_count(segment_ids, num_segments, dtype=data.dtype)
    cnt = cnt.reshape((num_segments,) + (1,) * (data.ndim - 1))
    return jnp.where(cnt > 0.5, total / jnp.maximum(cnt, eps), 0.0)


def segment_min(data, segment_ids, num_segments):
    return jax.ops.segment_min(data, segment_ids, num_segments=num_segments)


def segment_max(data, segment_ids, num_segments):
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_min_or(data, segment_ids, num_segments, fill):
    """segment_min but empty segments produce ``fill`` instead of +inf/maxval."""
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
    cnt = segment_count(segment_ids, num_segments)
    cnt = cnt.reshape((num_segments,) + (1,) * (data.ndim - 1))
    return jnp.where(cnt > 0.5, out, fill)


def segment_max_or(data, segment_ids, num_segments, fill):
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    cnt = segment_count(segment_ids, num_segments)
    cnt = cnt.reshape((num_segments,) + (1,) * (data.ndim - 1))
    return jnp.where(cnt > 0.5, out, fill)


def weighted_segment_mean(data, weights, segment_ids, num_segments, eps=1e-6):
    """sum(w*x)/sum(w) per segment; used by IRLS plane fits
    (reference preprocessor_utils.py:46-58)."""
    wd = data * weights.reshape(weights.shape + (1,) * (data.ndim - 1))
    total = jax.ops.segment_sum(wd, segment_ids, num_segments=num_segments)
    wsum = jax.ops.segment_sum(weights, segment_ids, num_segments=num_segments)
    wsum = wsum.reshape((num_segments,) + (1,) * (data.ndim - 1))
    return total / (wsum + eps)


def truncated_segment_mean(data, segment_ids, num_segments, trunc_dist=0.3):
    """Mean, then re-mean after clamping each element to mean +- trunc_dist.

    TPU-native equivalent of ``truncated_robust_mean``
    (reference registration_utils.py:44-58) without the sort (segment_sum
    handles unsorted ids).
    """
    mean0 = segment_mean(data, segment_ids, num_segments)
    per = mean0[segment_ids]
    clamped = jnp.clip(data, per - trunc_dist, per + trunc_dist)
    return segment_mean(clamped, segment_ids, num_segments)


def segment_median(data, segment_ids, num_segments):
    """Per-segment median of integer or float data; empty segments -> -1e10.

    Sort-based, mirroring the reference ``robust_median``
    (registration_utils.py:60-81): sort by (segment, value), then index the
    middle element of each segment run.
    """
    n = data.shape[0]
    # lexicographic sort by (segment_id, value); carry nothing else
    sort_seg, sort_val = jax.lax.sort((segment_ids, data), num_keys=2)
    degree = segment_count(sort_seg, num_segments, dtype=jnp.int32)
    start = jnp.cumsum(degree) - degree
    mid = jnp.clip(start + degree // 2, 0, n - 1)
    med = sort_val[mid]
    if jnp.issubdtype(data.dtype, jnp.integer):
        fill = jnp.asarray(-1, dtype=data.dtype)
    else:
        fill = jnp.asarray(-1e10, dtype=data.dtype)
    return jnp.where(degree > 0, med, fill)
