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


class VolumeSampler:
    """Dilated voxel-center sampler (reference sampler_utils.py:134-224).

    Each input position is replicated over a (2*stride[2]-1)^3 stencil of
    fractional offsets dr = (dx/stride[0], dy/stride[1], dz/stride[2]) *
    VOXEL_SIZE (the reference loops all three axes over stride[2]'s bounds —
    kept faithfully), the replicas are aggregated on the finer
    VOXEL_SIZE/DOWNSAMPLE_TIMES grid, and only voxels on the
    downsample-aligned sublattice survive: coords % DOWNSAMPLE_TIMES == 0 on
    x/y and == Z_PADDING on z (== 0 when Z_PADDING is -1).

    Returns an EDict with ``bcoords`` [V, 4] (batch + fine-grid integer
    coords), ``bcenter`` [V, 4] (voxel centers), ``bxyz`` [V, 4] (mean of the
    replicas in each voxel), and ``valid`` [V]. V is the padded capacity
    (K * N); callers mask with ``valid``.
    """

    def __init__(self, runtime_cfg=None, model_cfg=None):
        cfg = EDict(model_cfg or {})
        vs = cfg.get("VOXEL_SIZE", 0.4)
        self.voxel_size = [float(v) for v in (vs if isinstance(vs, (list, tuple)) else [vs] * 3)]
        st = cfg.get("STRIDE", 1)
        self.stride = [int(s) for s in (st if isinstance(st, (list, tuple)) else [st] * 3)]
        dt = cfg.get("DOWNSAMPLE_TIMES", 1)
        self.downsample_times = [int(d) for d in (dt if isinstance(dt, (list, tuple)) else [dt] * 3)]
        self.z_padding = int(cfg.get("Z_PADDING", 1))

    def __call__(self, point_bxyz, valid=None):
        from ..ops import segment_ops

        pts = jnp.asarray(point_bxyz)
        n = pts.shape[0]
        if valid is None:
            valid = jnp.ones(n, bool)
        s0, s1, s2 = self.stride
        vs = jnp.asarray(self.voxel_size, pts.dtype)
        offs = [
            [0.0, dx / s0 * self.voxel_size[0], dy / s1 * self.voxel_size[1],
             dz / s2 * self.voxel_size[2]]
            for dx in range(-s2 + 1, s2)
            for dy in range(-s2 + 1, s2)
            for dz in range(-s2 + 1, s2)
        ]
        offs = jnp.asarray(offs, pts.dtype)  # [K, 4]
        rep = (pts[None, :, :] + offs[:, None, :]).reshape(-1, 4)
        rep_valid = jnp.tile(valid, offs.shape[0])

        fine = jnp.asarray(
            [v / d for v, d in zip(self.voxel_size, self.downsample_times)], pts.dtype
        )
        origin = jnp.min(jnp.where(rep_valid[:, None], rep[:, 1:4], jnp.inf), axis=0)
        coords = grid_utils.voxel_coords(rep, fine, origin=origin)
        coords = jnp.where(rep_valid[:, None], coords, jnp.int32(2 ** 24))
        inverse, _, _ = grid_utils.unique_rows(coords)
        cap = rep.shape[0]
        vox_bxyz = segment_ops.segment_mean(
            jnp.where(rep_valid[:, None], rep, 0.0), inverse, cap)
        cnt = segment_ops.segment_count(jnp.where(rep_valid, inverse, cap), cap + 1)[:cap]
        # integer coords are constant within a voxel: mean == the coord
        vox_coords = segment_ops.segment_mean(
            jnp.where(rep_valid[:, None], coords, 0).astype(pts.dtype), inverse, cap
        ).astype(jnp.int32)
        dst = jnp.asarray(self.downsample_times, jnp.int32)
        zp = 0 if self.z_padding == -1 else self.z_padding
        on_lattice = (
            (vox_coords[:, 1] % dst[0] == 0)
            & (vox_coords[:, 2] % dst[1] == 0)
            & (vox_coords[:, 3] % dst[2] == zp)
        )
        vvalid = (cnt > 0.5) & on_lattice
        bcenter = jnp.concatenate(
            [vox_coords[:, :1].astype(pts.dtype),
             origin[None, :] + (vox_coords[:, 1:4].astype(pts.dtype) + 0.5) * fine[None, :]],
            axis=1,
        )
        return EDict(bcoords=vox_coords, bcenter=bcenter, bxyz=vox_bxyz, valid=vvalid)


SAMPLERS = {
    "FPSSampler": FPSSampler,
    "GridSampler": GridSampler,
    "VoxelCenterSampler": VoxelCenterSampler,
    "HybridSampler": HybridSampler,
    "VolumeSampler": VolumeSampler,
}


def build_sampler(sampler_cfg, runtime_cfg=None):
    return SAMPLERS[sampler_cfg["TYPE"]](runtime_cfg, sampler_cfg)
