"""Dict-of-arrays toolbox, logging, seeding, timing.

TPU-native rewrite of the reference utilities
(/root/reference/pcdet/utils/common_utils.py:53-135,137-160,227-258,407-420).
Arrays may be numpy or jax; masks/indices follow numpy fancy-indexing rules.
"""

from __future__ import annotations

import logging
import random
import time

import numpy as np

try:  # jax is the default array backend; numpy-only use also works
    import jax.numpy as jnp

    _ARRAY_TYPES = (np.ndarray, jnp.ndarray)
except Exception:  # pragma: no cover
    jnp = None
    _ARRAY_TYPES = (np.ndarray,)


def _is_array(x):
    return isinstance(x, _ARRAY_TYPES)


def apply_to_dict(d, fn):
    """Apply ``fn`` to every array entry of dict ``d`` (reference
    common_utils.py:53)."""
    return {k: (fn(v) if _is_array(v) else v) for k, v in d.items()}


def filter_dict(d, mask_or_indices):
    """Index every array leaf of ``d`` along axis 0 (reference
    common_utils.py:67)."""
    out = {}
    for k, v in d.items():
        if _is_array(v) and v.ndim >= 1:
            out[k] = v[mask_or_indices]
        else:
            out[k] = v
    return out


def concat_dicts(dicts, axis=0):
    """Concatenate a list of dicts key-wise (reference common_utils.py:91)."""
    if len(dicts) == 0:
        return {}
    keys = dicts[0].keys()
    out = {}
    xp = jnp if (jnp is not None and any(isinstance(dicts[0][k], jnp.ndarray) for k in keys if _is_array(dicts[0][k]))) else np
    for k in keys:
        vals = [d[k] for d in dicts]
        if _is_array(vals[0]):
            out[k] = xp.concatenate(vals, axis=axis)
        else:
            out[k] = vals
    return out


def stack_dicts(dicts, axis=0):
    """Stack a list of dicts key-wise (reference common_utils.py:109)."""
    if len(dicts) == 0:
        return {}
    keys = dicts[0].keys()
    out = {}
    xp = jnp if (jnp is not None and any(isinstance(dicts[0][k], jnp.ndarray) for k in keys if _is_array(dicts[0][k]))) else np
    for k in keys:
        vals = [d[k] for d in dicts]
        if _is_array(vals[0]):
            out[k] = xp.stack(vals, axis=axis)
        else:
            out[k] = vals
    return out


def indexing_list_elements(cfg_dict, idx):
    """For a cfg whose values may be per-level lists, select element ``idx``
    of every list value (reference common_utils.indexing_list_elements)."""
    out = {}
    for k, v in cfg_dict.items():
        if isinstance(v, list):
            out[k] = v[idx]
        else:
            out[k] = v
    return out


def rotate_points_along_z(points, angle):
    """Rotate points around the z axis.

    Args:
        points: [B, N, 3 + C] or [N, 3 + C]
        angle:  [B] or scalar, radians (counter-clockwise)
    Reference: common_utils.py:137-160.
    """
    xp = jnp if (jnp is not None and isinstance(points, jnp.ndarray)) else np
    single = points.ndim == 2
    if single:
        points = points[None]
        angle = xp.asarray(angle).reshape(1)
    cosa = xp.cos(angle)
    sina = xp.sin(angle)
    zeros = xp.zeros_like(angle)
    ones = xp.ones_like(angle)
    rot = xp.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=1
    ).reshape(-1, 3, 3)
    if xp is jnp:
        import jax

        xyz = jnp.matmul(points[:, :, :3], rot, precision=jax.lax.Precision.HIGHEST)
    else:
        xyz = points[:, :, :3] @ rot
    out = xp.concatenate([xyz, points[:, :, 3:]], axis=-1)
    return out[0] if single else out


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    """Rank-gated file+console logger (reference common_utils.py:227-242)."""
    logger = logging.getLogger(__name__ + (".r%d" % rank))
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    formatter = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    if not logger.handlers:
        console = logging.StreamHandler()
        console.setLevel(log_level if rank == 0 else logging.ERROR)
        console.setFormatter(formatter)
        logger.addHandler(console)
        if log_file is not None:
            fh = logging.FileHandler(log_file)
            fh.setLevel(log_level if rank == 0 else logging.ERROR)
            fh.setFormatter(formatter)
            logger.addHandler(fh)
    return logger


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)


class AverageMeter(object):
    """Tracks mean of a streaming scalar (reference common_utils.py:407)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class Timer:
    """Context manager printing elapsed wall-clock seconds (reference
    utils/timer.py:3-13). On TPU, wrap jax outputs with block_until_ready
    before exiting the context for meaningful numbers."""

    def __init__(self, name="", verbose=True, sync=None):
        self.name = name
        self.verbose = verbose
        self.sync = sync

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *args):
        if self.sync is not None:
            try:
                import jax

                jax.block_until_ready(self.sync)
            except Exception:
                pass
        self.elapsed = time.time() - self.t0
        if self.verbose:
            print(f"[Timer] {self.name}: {self.elapsed:.4f}s")
        return False
