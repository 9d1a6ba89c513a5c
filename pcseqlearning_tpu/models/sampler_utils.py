"""Point sampler registry.

Rewrite of /root/reference/pcdet/models/model_utils/sampler_utils.py:20-391:
FPSSampler, GridSampler, VoxelCenterSampler, HybridSampler + build_sampler.
Each sampler maps a padded point table to a sampled table + inverse/indices.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import grid_utils, sampling
from ..utils.edict import EDict


class FPSSampler:
    """Farthest-point sampling to a fixed count (reference FPSSampler)."""

    def __init__(self, runtime_cfg=None, model_cfg=None):
        cfg = EDict(model_cfg or {})
        self.num_samples = int(cfg.get("NUM_SAMPLES", cfg.get("STRIDE", 4) and 2048))

    def __call__(self, point_bxyz, valid=None):
        idx = sampling.farthest_point_sample(point_bxyz[:, 1:4], self.num_samples, valid=valid)
        return idx


class GridSampler:
    """Voxel-grid downsample; one representative per cell (reference
    GridSampler)."""

    def __init__(self, runtime_cfg=None, model_cfg=None):
        cfg = EDict(model_cfg or {})
        self.grid_size = [float(g) for g in cfg.get("GRID_SIZE", [0.4, 0.4, 0.4])]

    def __call__(self, point_bxyz, valid=None):
        rep, rep_valid, inverse, num = grid_utils.grid_subsample_indices(point_bxyz, self.grid_size)
        return rep, rep_valid, inverse


class VoxelCenterSampler:
    """Voxel centers of occupied cells (reference VoxelCenterSampler)."""

    def __init__(self, runtime_cfg=None, model_cfg=None):
        cfg = EDict(model_cfg or {})
        self.grid_size = [float(g) for g in cfg.get("GRID_SIZE", [0.4, 0.4, 0.4])]

    def __call__(self, point_bxyz, valid=None):
        out = grid_utils.grid_sample_mean(point_bxyz, self.grid_size)
        return out["bxyz"], out["valid"], out["inverse"]


class HybridSampler:
    """Grid-then-FPS (reference HybridSampler)."""

    def __init__(self, runtime_cfg=None, model_cfg=None):
        cfg = EDict(model_cfg or {})
        self.grid = GridSampler(runtime_cfg, cfg)
        self.num_samples = int(cfg.get("NUM_SAMPLES", 2048))

    def __call__(self, point_bxyz, valid=None):
        rep, rep_valid, _ = self.grid(point_bxyz, valid)
        xyz = point_bxyz[jnp.clip(rep, 0, point_bxyz.shape[0] - 1), 1:4]
        idx = sampling.farthest_point_sample(xyz, self.num_samples, valid=rep_valid)
        return rep[idx]


SAMPLERS = {
    "FPSSampler": FPSSampler,
    "GridSampler": GridSampler,
    "VoxelCenterSampler": VoxelCenterSampler,
    "HybridSampler": HybridSampler,
    "VolumeSampler": VoxelCenterSampler,  # volume stats ride the same grid
}


def build_sampler(sampler_cfg, runtime_cfg=None):
    return SAMPLERS[sampler_cfg["TYPE"]](runtime_cfg, sampler_cfg)
