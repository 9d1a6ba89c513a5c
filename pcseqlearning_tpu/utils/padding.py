"""Capacity bucketing for host->jit boundaries.

XLA recompiles per shape; host code pads ragged arrays to geometric buckets
so a whole Waymo sequence reuses a handful of compiled programs (the
reference's dynamic filter_dict-everywhere has no TPU equivalent; SURVEY.md
§7 'hard parts')."""

from __future__ import annotations

import math

import numpy as np


def bucket_size(n, base=256, growth=1.5):
    """Smallest capacity >= n from the geometric bucket ladder."""
    if n <= base:
        return base
    k = math.ceil(math.log(n / base) / math.log(growth))
    return int(base * growth ** k + 0.5)


def pad_rows(arr, capacity, fill=0):
    """Pad axis 0 of ``arr`` to ``capacity`` with ``fill``; returns
    (padded, valid_mask)."""
    arr = np.asarray(arr)
    n = arr.shape[0]
    assert n <= capacity, (n, capacity)
    valid = np.zeros(capacity, dtype=bool)
    valid[:n] = True
    if n == capacity:
        return arr, valid
    pad_shape = (capacity - n,) + arr.shape[1:]
    pad = np.full(pad_shape, fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0), valid


def pad_dict(d, keys, capacity, fill=0):
    out = dict(d)
    valid = None
    for k in keys:
        out[k], valid = pad_rows(d[k], capacity, fill)
    return out, valid
