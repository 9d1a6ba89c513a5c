"""Config-driven graph builder registry.

API parity with /root/reference/pcdet/models/model_utils/graph_utils.py:
``build_graph(cfg)`` + GRAPHS registry (KNNGraph, KNNGraphV2, RadiusGraph,
VoxelGraph, VolumeGraph) and ``connected_components`` — all on the TPU
kernels (hash_graph / sampling / connected_components) instead of
torch_hash/pointops/scipy. Graphs consume dicts with a RELATIVE_KEY-named
[N, 4] coordinate array plus a ``valid`` mask and return padded edge lists
(e_ref, e_query, e_weight_or_None, e_mask).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import connected_components as cc_ops
from ..ops import geometry, hash_graph, sampling
from ..utils.edict import EDict


def connected_components(e_src, e_dst, num_nodes, e_mask=None):
    """On-device CC (replaces the scipy hop, reference graph_utils.py:40-53).
    Returns (num_components, component)."""
    labels = cc_ops.connected_components(e_src, e_dst, num_nodes, e_mask)
    comp, num = cc_ops.compact_labels(labels)
    return num, comp


class GraphTemplate:
    def __init__(self, model_cfg, runtime_cfg=None):
        self.model_cfg = EDict(model_cfg)
        self.relative_key = self.model_cfg.get("RELATIVE_KEY", "bxyz")

    def _coords(self, d):
        x = d[self.relative_key] if isinstance(d, dict) else d
        return jnp.asarray(x)

    def _valid(self, d, n):
        if isinstance(d, dict) and "valid" in d:
            return jnp.asarray(d["valid"])
        return jnp.ones(n, bool)


class RadiusGraph(GraphTemplate):
    """Fixed-radius nearest-K graph (reference graph_utils.py:131-212)."""

    def __init__(self, model_cfg, runtime_cfg=None):
        super().__init__(model_cfg, runtime_cfg)
        self.radius = self.model_cfg.get("RADIUS", 1.0)
        self.max_num_neighbors = int(self.model_cfg.get("MAX_NUM_NEIGHBORS", 32))
        self.sort_by_dist = bool(self.model_cfg.get("SORT_BY_DIST", False))

    def __call__(self, ref, query):
        r = self._coords(ref)
        q = self._coords(query)
        idx, d2, mask = hash_graph.radius_graph(
            r, q, float(self.radius), self.max_num_neighbors,
            ref_valid=self._valid(ref, r.shape[0]),
            query_valid=self._valid(query, q.shape[0]),
        )
        e_ref, e_query, e_mask = hash_graph.edges_from_neighbors(idx, mask)
        return e_ref, e_query, None, e_mask


class KNNGraph(GraphTemplate):
    """k nearest neighbors regardless of radius (reference
    graph_utils.KNNGraph over pointops.knnquery)."""

    def __init__(self, model_cfg, runtime_cfg=None):
        super().__init__(model_cfg, runtime_cfg)
        self.k = int(self.model_cfg.get("NUM_NEIGHBORS", 32))

    def __call__(self, ref, query):
        r = self._coords(ref)
        q = self._coords(query)
        idx, d2 = sampling.knn_bruteforce(
            r[:, 1:4], q[:, 1:4], self.k,
            ref_valid=self._valid(ref, r.shape[0]),
            ref_batch=jnp.round(r[:, 0]).astype(jnp.int32),
            query_batch=jnp.round(q[:, 0]).astype(jnp.int32),
        )
        mask = jnp.isfinite(d2) & self._valid(query, q.shape[0])[:, None]
        e_ref, e_query, e_mask = hash_graph.edges_from_neighbors(
            jnp.where(mask, idx, -1), mask
        )
        return e_ref, e_query, None, e_mask


class KNNGraphV2(KNNGraph):
    """KNN with median-distance edge reweighting (reference
    graph_utils.KNNGraphV2:360-409)."""

    def __call__(self, ref, query):
        r = self._coords(ref)
        q = self._coords(query)
        idx, d2 = sampling.knn_bruteforce(
            r[:, 1:4], q[:, 1:4], self.k,
            ref_valid=self._valid(ref, r.shape[0]),
            ref_batch=jnp.round(r[:, 0]).astype(jnp.int32),
            query_batch=jnp.round(q[:, 0]).astype(jnp.int32),
        )
        mask = jnp.isfinite(d2)
        flat_d2 = jnp.where(mask, d2, jnp.nan).reshape(-1)
        median = jnp.nanmedian(flat_d2)
        weight = (median / (d2 + median)).reshape(-1)
        e_ref, e_query, e_mask = hash_graph.edges_from_neighbors(
            jnp.where(mask, idx, -1), mask
        )
        return e_ref, e_query, weight, e_mask


class VoxelGraph(GraphTemplate):
    """Kernel-offset voxel neighborhood graph with edge dedup (reference
    graph_utils.VoxelGraph:215-311)."""

    def __init__(self, model_cfg, runtime_cfg=None):
        super().__init__(model_cfg, runtime_cfg)
        self.voxel_size = [float(v) for v in self.model_cfg.get("VOXEL_SIZE", [0.4, 0.4, 0.4])]
        self.kernel_offset = int(self.model_cfg.get("KERNEL_OFFSET", 1))
        self.ref_key = self.model_cfg.get("REF_KEY", "bxyz")
        self.query_key = self.model_cfg.get("QUERY_KEY", "bcenter")

    def __call__(self, ref, query):
        from ..ops import grid_utils
        from ..ops.primitives import voxel_graph as vg

        r = jnp.asarray(ref[self.ref_key] if isinstance(ref, dict) else ref)
        valid = self._valid(ref, r.shape[0])
        coords = grid_utils.voxel_coords(r, self.voxel_size)
        e_src, e_dst, mask = vg(coords, valid, self.kernel_offset)
        return e_src, e_dst, None, mask


class VolumeGraph(VoxelGraph):
    """VoxelGraph + PCA-extent-aware edge weights (reference
    graph_utils.VolumeGraph:314-357). Requires per-node eigvecs /
    l1_proj_min / l1_proj_max in the ref dict (from primitive_fitting)."""

    def __call__(self, ref, query):
        e_src, e_dst, _, mask = super().__call__(ref, query)
        if not (isinstance(ref, dict) and "eigvecs" in ref):
            return e_src, e_dst, None, mask
        bxyz = jnp.asarray(ref[self.ref_key])
        eigvecs = jnp.asarray(ref["eigvecs"])
        pmin = jnp.asarray(ref["l1_proj_min"])
        pmax = jnp.asarray(ref["l1_proj_max"])
        eigvals = jnp.asarray(ref["eigvals"])
        center = bxyz[:, 1:4] + jnp.einsum(
            "nij,nj->ni", eigvecs, (pmin + pmax) / 2.0
        )
        n = bxyz.shape[0]
        es = jnp.clip(e_src, 0, n - 1)
        ed = jnp.clip(e_dst, 0, n - 1)
        diff = center[es] - center[ed]

        def proj_dist(e, diff):
            width = jnp.clip((pmax - pmin)[e] / 2.0, 1e-2, None)
            proj = jnp.abs(jnp.einsum("nij,ni->nj", eigvecs[e], diff))
            proj = jnp.minimum(proj, width)
            lam = jnp.sqrt(jnp.clip(eigvals[e], 1e-8, None))
            return jnp.linalg.norm(lam * proj, axis=-1)

        l1 = proj_dist(es, diff)
        l2 = proj_dist(ed, diff)
        dist = jnp.clip(jnp.linalg.norm(diff, axis=-1) - l1 - l2, 0.0, None)
        cdist = jnp.clip(jnp.linalg.norm(bxyz[es, 1:4] - bxyz[ed, 1:4], axis=-1), 1e-4, None) / 2.0
        w = cdist ** 2 / (dist ** 2 + cdist ** 2)
        return e_src, e_dst, jnp.where(mask, w, 0.0), mask


GRAPHS = {
    "KNNGraph": KNNGraph,
    "KNNGraphV2": KNNGraphV2,
    "RadiusGraph": RadiusGraph,
    "VoxelGraph": VoxelGraph,
    "VolumeGraph": VolumeGraph,
}


def build_graph(graph_cfg, runtime_cfg=None):
    return GRAPHS[graph_cfg["TYPE"]](graph_cfg, runtime_cfg)
