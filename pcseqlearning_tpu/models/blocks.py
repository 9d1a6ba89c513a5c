"""Graph neural blocks: message passing / edge conv / attention / KPConv.

Rewrites of /root/reference/pcdet/models/blocks/ (message_passing_v1/v2,
edge conv, attention, kpconv_blocks — 24 files, ~3.9k LoC of torch+CUDA):
here each block is a function of (features, edge tables) built on the hash-
graph kernels, with the edge MLPs batched on the MXU. The virtual_array
CUDA ops (edge-materialization-free scatter-add / fused outer-product-sum,
/root/reference/pcdet/ops/virtual_array/) are inherently covered: XLA fuses
the gather -> elementwise -> segment_sum chains without materializing edge
tensors.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import segment_ops
from .layers import MaskedBatchNorm


class EdgeConvBlock(nn.Module):
    """DGCNN-style edge convolution: MLP([x_i, x_j - x_i]) max-pooled over
    neighbors (reference blocks/edge_conv.py)."""

    out_channels: int
    mlp: Sequence[int] = ()

    @nn.compact
    def __call__(self, feats, nbr_idx, nbr_mask, valid, train=False):
        """feats [N, C]; nbr_idx [N, K] neighbor rows; nbr_mask [N, K]."""
        n, k = nbr_idx.shape
        xj = feats[jnp.clip(nbr_idx, 0, n - 1)]  # [N, K, C]
        xi = feats[:, None, :]
        e = jnp.concatenate([jnp.broadcast_to(xi, xj.shape), xj - xi], axis=-1)
        h = e.reshape(n * k, -1)
        m = (nbr_mask & valid[:, None]).reshape(-1)
        for c in tuple(self.mlp) + (self.out_channels,):
            h = nn.Dense(c, use_bias=False)(h)
            h = MaskedBatchNorm()(h, m, train)
            h = nn.relu(h)
        h = h.reshape(n, k, -1)
        h = jnp.where(nbr_mask[..., None], h, -jnp.inf)
        out = jnp.max(h, axis=1)
        has = jnp.any(nbr_mask, axis=1) & valid
        return jnp.where(has[:, None], out, 0.0)


class MessagePassingBlock(nn.Module):
    """Generic message passing over a padded edge list: per-edge MLP on
    (src feat, dst feat, relative position) -> segment-sum/mean to dst
    (reference blocks/message_passing_v2.py)."""

    out_channels: int
    aggregate: str = "mean"  # or "sum" / "max"

    @nn.compact
    def __call__(self, src_feats, dst_feats, src_xyz, dst_xyz, e_src, e_dst, e_mask, train=False):
        ns = src_feats.shape[0]
        nd = dst_feats.shape[0]
        es = jnp.clip(e_src, 0, ns - 1)
        ed = jnp.clip(e_dst, 0, nd - 1)
        rel = src_xyz[es] - dst_xyz[ed]
        msg = jnp.concatenate([src_feats[es], dst_feats[ed], rel], axis=-1)
        msg = nn.Dense(self.out_channels, use_bias=False)(msg)
        msg = MaskedBatchNorm()(msg, e_mask, train)
        msg = nn.relu(msg)
        seg = jnp.where(e_mask, ed, nd)
        if self.aggregate == "sum":
            out = segment_ops.segment_sum(jnp.where(e_mask[:, None], msg, 0.0), seg, nd + 1)[:nd]
        elif self.aggregate == "max":
            out = segment_ops.segment_max_or(jnp.where(e_mask[:, None], msg, -jnp.inf), seg, nd + 1, 0.0)[:nd]
        else:
            out = segment_ops.segment_mean(jnp.where(e_mask[:, None], msg, 0.0), seg, nd + 1)[:nd]
        return out


class GraphAttentionBlock(nn.Module):
    """Edge-softmax attention aggregation (reference blocks/attention.py)."""

    out_channels: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, feats, nbr_idx, nbr_mask, valid, train=False):
        n, k = nbr_idx.shape
        h = self.num_heads
        d = self.out_channels // h
        q = nn.Dense(self.out_channels)(feats).reshape(n, h, d)
        kv = feats[jnp.clip(nbr_idx, 0, n - 1)]
        kk = nn.Dense(self.out_channels)(kv).reshape(n, k, h, d)
        vv = nn.Dense(self.out_channels)(kv).reshape(n, k, h, d)
        logits = jnp.einsum("nhd,nkhd->nkh", q, kk) / jnp.sqrt(d)
        logits = jnp.where(nbr_mask[:, :, None], logits, -jnp.inf)
        att = jax.nn.softmax(logits, axis=1)
        att = jnp.where(nbr_mask[:, :, None], att, 0.0)
        out = jnp.einsum("nkh,nkhd->nhd", att, vv).reshape(n, self.out_channels)
        return jnp.where(valid[:, None] & jnp.any(nbr_mask, 1)[:, None], out, 0.0)


def compute_conv3d_positions(voxel_size):
    """27 conv-kernel offsets {-v,0,v}^3 (reference blocks/assigners.py:8-18)."""
    import numpy as np

    vx, vy, vz = voxel_size
    pos = [[dx, dy, dz] for dx in (-vx, 0, vx) for dy in (-vy, 0, vy) for dz in (-vz, 0, vz)]
    return jnp.asarray(np.asarray(pos, np.float32))


def compute_ball_positions(num_kernel_points, radius=0.9):
    """K kernel positions evenly spread in a unit ball via FPS over a dense
    candidate grid (reference blocks/assigners.py:20-41)."""
    import numpy as np

    from ..ops.sampling import farthest_point_sample

    g = np.linspace(-1, 1, 24, dtype=np.float32)
    cand = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1).reshape(-1, 3)
    cand = cand[np.linalg.norm(cand, axis=-1) <= radius]
    idx = np.asarray(farthest_point_sample(jnp.asarray(cand), num_kernel_points))
    return jnp.asarray(cand[idx])


# ---------------------------------------------------------------------------
# Kernel assigners: map each edge (ref -> query) to a conv-kernel index.
# TPU-native rewrite of /root/reference/pcdet/models/blocks/assigners.py —
# pure vectorized functions of the padded edge tables (the reference runs
# these per edge under @torch.no_grad; here they are jit-traced and fused
# into the surrounding conv program).
# ---------------------------------------------------------------------------

def grid_assigner(rel_coords):
    """Sign-of-relative-voxel-coordinate 27-way index (GridAssigner,
    assigners.py:68-85). rel_coords [E, 3] int (ref - query voxel coords)."""
    k = jnp.zeros(rel_coords.shape[0], jnp.int32)
    for i in (2, 1, 0):
        k = k * 3 + (jnp.sign(rel_coords[:, i]).astype(jnp.int32) + 1)
    return k


def grid3x3_assigner(rel_xyz, half_voxel_size):
    """Sign with a +-half-voxel zero band (Grid3x3Assigner, 87-110).
    rel_xyz [E, 3] float."""
    hv = jnp.asarray(half_voxel_size, jnp.float32)
    k = jnp.zeros(rel_xyz.shape[0], jnp.int32)
    for i in (2, 1, 0):
        is_zero = (rel_xyz[:, i] < hv[i]) & (rel_xyz[:, i] > -hv[i])
        s = jnp.where(is_zero, 0, jnp.sign(rel_xyz[:, i])).astype(jnp.int32)
        k = k * 3 + (s + 1)
    return k


def geometric_assigner(rel_xyz, kernel_pos):
    """Nearest kernel position (GeometricAssigner, 112-131).
    kernel_pos [K, 3] from compute_conv3d_positions/compute_ball_positions."""
    d2 = ((rel_xyz[:, None, :] - kernel_pos[None, :, :]) ** 2).sum(-1)
    return jnp.argmin(d2, axis=1).astype(jnp.int32)


def grid_volume_assigner(rel_coords, query_volume_mask, e_query):
    """27-way grid index doubled by the query's volume mask (54 kernels,
    GridVolumeAssigner, assigners.py:44-65)."""
    base = grid_assigner(rel_coords)
    vm = query_volume_mask[jnp.clip(e_query, 0, query_volume_mask.shape[0] - 1)]
    return 2 * base + vm.astype(jnp.int32)


ASSIGNERS = dict(
    GridAssigner=grid_assigner,
    Grid3x3Assigner=grid3x3_assigner,
    GeometricAssigner=geometric_assigner,
    GridVolumeAssigner=grid_volume_assigner,
)


class KernelMessagePassing(nn.Module):
    """Kernel-indexed message passing: every edge applies ONE of num_kernels
    weight matrices to its source feature, summed at the target.

    Reference message_passing_v2.MessagePassing builds a duplicate-kernel
    pool schedule (kernel_dist/pool_gemm, v2.py:10-124) so ragged per-kernel
    edge groups batch onto CUDA GEMMs. The TPU formulation needs no schedule:
    segment-sum the (weighted) source features by the fused key
    ``e_query * K + e_kernel`` — one O(E) scatter — then contract the
    [Nq, K, Cin] pool against the [K, Cin, Cout] kernel stack in ONE einsum
    on the MXU. Linearity of the conv makes the two orders identical.
    """

    out_channels: int
    num_kernels: int = 27

    @nn.compact
    def __call__(self, ref_feats, e_kernel, e_ref, e_query, num_queries, e_mask, e_weight=None):
        cin = ref_feats.shape[-1]
        K = self.num_kernels
        w = self.param(
            "kernel_weights",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (K, cin, self.out_channels),
        )
        src = ref_feats[jnp.clip(e_ref, 0, ref_feats.shape[0] - 1)]
        if e_weight is not None:
            src = src * e_weight[:, None]
        src = jnp.where(e_mask[:, None], src, 0.0)
        key = jnp.where(
            e_mask,
            jnp.clip(e_query, 0, num_queries - 1) * K + jnp.clip(e_kernel, 0, K - 1),
            num_queries * K,
        )
        pooled = jax.ops.segment_sum(src, key, num_segments=num_queries * K + 1)
        pooled = pooled[: num_queries * K].reshape(num_queries, K, cin)
        return jnp.einsum("nkc,kco->no", pooled, w)


class GridConvBlock(nn.Module):
    """Assigner + kernel message passing + norm/act (reference
    blocks/grid_conv.py:36-66). ``assigner`` is a callable producing the
    per-edge kernel index (see ASSIGNERS)."""

    out_channels: int
    num_kernels: int = 27

    @nn.compact
    def __call__(self, ref_feats, e_kernel, e_ref, e_query, num_queries,
                 e_mask, q_valid, e_weight=None, train=False):
        out = KernelMessagePassing(self.out_channels, self.num_kernels)(
            ref_feats, e_kernel, e_ref, e_query, num_queries, e_mask, e_weight
        )
        out = MaskedBatchNorm()(out, q_valid, train)
        out = nn.relu(out)
        return jnp.where(q_valid[:, None], out, 0.0)


class KPConvBlock(nn.Module):
    """Kernel point convolution: fixed kernel points with linear influence
    weighting (reference blocks/kpconv_blocks.py + ops/sparse_kpconv/: the
    memory-efficient aggregation is again a fused gather->weight->segment-sum
    chain here)."""

    out_channels: int
    num_kernel_points: int = 15
    sigma: float = 0.5

    def setup(self):
        import numpy as np

        # kernel point dispositions: center + ring (the reference loads
        # pre-optimized dispositions; a fibonacci sphere is equivalent in
        # coverage for the linear-influence formulation)
        k = self.num_kernel_points
        pts = [np.zeros(3)]
        golden = np.pi * (3 - np.sqrt(5))
        for i in range(k - 1):
            y = 1 - (i / max(k - 2, 1)) * 2
            r = np.sqrt(max(1 - y * y, 0))
            th = golden * i
            pts.append(np.array([np.cos(th) * r, y, np.sin(th) * r]) * self.sigma)
        self.kernel_pts = jnp.asarray(np.stack(pts), dtype=jnp.float32)

    @nn.compact
    def __call__(self, feats, xyz, nbr_idx, nbr_mask, valid, train=False):
        n, k = nbr_idx.shape
        cin = feats.shape[-1]
        w = self.param(
            "kp_weights",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (self.num_kernel_points, cin, self.out_channels),
        )
        rel = xyz[jnp.clip(nbr_idx, 0, n - 1)] - xyz[:, None, :]  # [N, K, 3]
        # linear influence of each kernel point on each neighbor
        d = jnp.linalg.norm(rel[:, :, None, :] - self.kernel_pts[None, None, :, :], axis=-1)
        infl = jnp.maximum(0.0, 1.0 - d / self.sigma)  # [N, K, P]
        infl = jnp.where(nbr_mask[:, :, None], infl, 0.0)
        xj = feats[jnp.clip(nbr_idx, 0, n - 1)]  # [N, K, Cin]
        # sum_k sum_p infl * xj @ w_p  — contract neighbors then kernel pts
        per_p = jnp.einsum("nkp,nkc->npc", infl, xj)  # [N, P, Cin]
        out = jnp.einsum("npc,pco->no", per_p, w)
        out = MaskedBatchNorm()(out, valid, train)
        out = nn.relu(out)
        return jnp.where(valid[:, None], out, 0.0)
