"""RoI heads: proposal layer, target assignment, grid pooling, refinement.

Rewrites of /root/reference/pcdet/models/roi_heads/: RoIHeadTemplate
(proposal NMS -> target assign -> box refinement losses,
roi_head_template.py), VoxelRCNNHead (voxel-query grid pooling,
voxelrcnn_head.py), PVRCNNHead (keypoint grid pooling, pvrcnn_head.py),
PartA2FCHead (RoI-aware voxel pooling). All target machinery is vectorized
over padded RoI/GT tables.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import boxes as box_ops
from ..ops import hash_graph, roi_pool
from ..utils import loss_utils
from ..utils.box_coder_utils import ResidualCoder
from .layers import MaskedBatchNorm
from .pfe import voxel_centers


# ---------------------------------------------------------------------------
# proposal layer + target assignment (RoIHeadTemplate equivalents)
# ---------------------------------------------------------------------------


def proposal_layer(pred_boxes, pred_scores, num_rois=128, nms_thresh=0.7, pre_max=1024):
    """Score top-k + NMS -> fixed-count RoIs per sample (reference
    RoIHeadTemplate.proposal_layer). pred_boxes [A, 7], pred_scores [A]."""
    k = min(pre_max, pred_scores.shape[0])
    top_s, top_i = jax.lax.top_k(pred_scores, k)
    cand = pred_boxes[top_i]
    keep = box_ops.nms_bev(cand, top_s, nms_thresh)
    order = jnp.argsort(-jnp.where(keep, top_s, -jnp.inf))[:num_rois]
    rois = cand[order]
    roi_scores = top_s[order]
    roi_valid = keep[order]
    return rois, roi_scores, roi_valid


def assign_roi_targets(rois, roi_valid, gt_boxes, gt_classes, gt_valid,
                       fg_thresh=0.55, bg_thresh=0.1, coder=None):
    """IoU-match each RoI to its best GT; produce cls (IoU-guided) and reg
    targets in the RoI canonical frame (reference
    target_assigner/proposal_target_layer.py semantics, vectorized)."""
    coder = coder or ResidualCoder()
    iou = box_ops.boxes_iou3d(rois, gt_boxes)
    iou = jnp.where(gt_valid[None, :] & roi_valid[:, None], iou, -1.0)
    best = jnp.max(iou, axis=1)
    arg = jnp.argmax(iou, axis=1)
    tgt = gt_boxes[arg]
    # cls target: clamped interpolation of IoU between bg/fg thresholds
    cls_t = jnp.clip((best - bg_thresh) / (fg_thresh - bg_thresh), 0.0, 1.0)
    fg = best >= fg_thresh
    # canonical-frame regression target (translate+rotate into RoI frame)
    dxy = tgt[:, 0:2] - rois[:, 0:2]
    c, s = jnp.cos(-rois[:, 6]), jnp.sin(-rois[:, 6])
    lx = dxy[:, 0] * c - dxy[:, 1] * s
    ly = dxy[:, 0] * s + dxy[:, 1] * c
    # heading residual: wrap mod 2pi, flip opposite-facing pairs by pi, and
    # clamp to [-pi/2, pi/2] (reference RoIHeadTemplate.assign_targets)
    dh = jnp.remainder(tgt[:, 6] - rois[:, 6], 2 * jnp.pi)
    opposite = (dh > jnp.pi * 0.5) & (dh < jnp.pi * 1.5)
    dh = jnp.where(opposite, jnp.remainder(dh + jnp.pi, 2 * jnp.pi), dh)
    dh = jnp.where(dh > jnp.pi, dh - 2 * jnp.pi, dh)
    dh = jnp.clip(dh, -jnp.pi / 2, jnp.pi / 2)
    local_tgt = jnp.concatenate(
        [
            jnp.stack([lx, ly, tgt[:, 2] - rois[:, 2]], axis=-1),
            tgt[:, 3:6],
            dh[:, None],
        ],
        axis=-1,
    )
    canon_roi = jnp.concatenate(
        [jnp.zeros_like(rois[:, :3]), rois[:, 3:6], jnp.zeros_like(rois[:, 6:7])], axis=-1
    )
    reg_t = coder.encode(local_tgt, canon_roi)
    return cls_t, reg_t, fg, best, arg


def decode_roi_boxes(rois, reg_preds, coder=None):
    """Refined boxes from canonical residuals (reference
    generate_predicted_boxes of RoIHeadTemplate)."""
    coder = coder or ResidualCoder()
    canon_roi = jnp.concatenate(
        [jnp.zeros_like(rois[:, :3]), rois[:, 3:6], jnp.zeros_like(rois[:, 6:7])], axis=-1
    )
    local = coder.decode(reg_preds, canon_roi)
    c, s = jnp.cos(rois[:, 6]), jnp.sin(rois[:, 6])
    gx = local[:, 0] * c - local[:, 1] * s + rois[:, 0]
    gy = local[:, 0] * s + local[:, 1] * c + rois[:, 1]
    return jnp.concatenate(
        [
            jnp.stack([gx, gy, local[:, 2] + rois[:, 2]], axis=-1),
            local[:, 3:6],
            (local[:, 6] + rois[:, 6])[:, None],
        ],
        axis=-1,
    )


def roi_head_loss(cls_preds, reg_preds, cls_t, reg_t, fg, roi_valid, code_weights=None):
    """IoU-guided BCE cls + fg smooth-L1 reg (reference
    RoIHeadTemplate.get_box_cls/reg_layer_loss)."""
    v = roi_valid.astype(jnp.float32)
    nv = jnp.maximum(jnp.sum(v), 1.0)
    bce = (
        jnp.clip(cls_preds, 0) - cls_preds * cls_t + jnp.log1p(jnp.exp(-jnp.abs(cls_preds)))
    )
    cls_loss = jnp.sum(bce * v) / nv
    fgw = (fg & roi_valid).astype(jnp.float32)
    nfg = jnp.maximum(jnp.sum(fgw), 1.0)
    reg_loss = jnp.sum(
        loss_utils.weighted_smooth_l1_loss(reg_preds, reg_t, fgw / nfg, code_weights=code_weights)
    )
    return cls_loss, reg_loss


# ---------------------------------------------------------------------------
# pooled-feature heads
# ---------------------------------------------------------------------------


class _FCHead(nn.Module):
    """Shared FC trunk + cls/reg branches."""

    shared: Sequence[int] = (256, 256)
    code_size: int = 7

    @nn.compact
    def __call__(self, x, valid, train=False):
        for c in self.shared:
            x = nn.Dense(c, use_bias=False)(x)
            x = MaskedBatchNorm()(x, valid, train)
            x = nn.relu(x)
        cls = nn.Dense(1)(x)[:, 0]
        reg = nn.Dense(self.code_size)(x)
        return cls, reg


class VoxelRCNNHead(nn.Module):
    """Grid pooling from multi-scale voxel tables via radius query around
    RoI grid points (reference voxelrcnn_head.py: voxel query pooling)."""

    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    grid_size: int = 6
    pool_radius: Sequence[float] = (0.8, 1.6)
    nsample: int = 16
    features_source: Sequence[str] = ("x_conv3", "x_conv4")

    @nn.compact
    def __call__(self, batch_dict, rois, roi_valid, train=False):
        r = rois.shape[0]
        g = self.grid_size
        grid_pts = roi_pool.roi_grid_points(rois, g).reshape(r * g ** 3, 3)
        grid_b = jnp.repeat(batch_dict.get("roi_batch", jnp.zeros(r, jnp.int32)), g ** 3)

        ms = batch_dict["multi_scale_3d_features"]
        strides = {"x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8}
        pooled = []
        for src, radius in zip(self.features_source, self.pool_radius):
            st = ms[src]
            centers = voxel_centers(
                st.coords, st.valid, self.voxel_size, self.point_cloud_range[:3], strides[src]
            )
            src_f = jnp.concatenate([st.coords[:, 0:1].astype(jnp.float32), centers], axis=1)
            q_f = jnp.concatenate([grid_b[:, None].astype(jnp.float32), grid_pts], axis=1)
            grid = hash_graph.build_hash_grid(src_f, radius, st.valid)
            idx, _, mask = hash_graph.radius_neighbors(
                grid, q_f, radius, self.nsample, cell_cap=self.nsample + 16
            )
            ns = centers.shape[0]
            rel = jnp.where(
                mask[..., None], centers[jnp.clip(idx, 0, ns - 1)] - grid_pts[:, None, :], 0.0
            )
            gf = jnp.where(mask[..., None], st.features[jnp.clip(idx, 0, ns - 1)], 0.0)
            x = jnp.concatenate([rel, gf], axis=-1)
            flat_v = mask.reshape(-1)
            h = x.reshape(-1, x.shape[-1])
            h = nn.Dense(32, use_bias=False, name=f"pool_{src}_fc")(h)
            h = MaskedBatchNorm(name=f"pool_{src}_bn")(h, flat_v, train)
            h = nn.relu(h)
            h = h.reshape(r * g ** 3, self.nsample, -1)
            h = jnp.where(mask[..., None], h, -jnp.inf)
            hmax = jnp.max(h, axis=1)
            pooled.append(jnp.where(jnp.any(mask, 1)[:, None], hmax, 0.0))

        feat = jnp.concatenate(pooled, axis=-1).reshape(r, -1)
        cls, reg = _FCHead(name="head")(feat, roi_valid, train)
        return cls, reg


class PVRCNNHead(nn.Module):
    """Grid pooling from VoxelSetAbstraction keypoints (reference
    pvrcnn_head.py)."""

    grid_size: int = 6
    pool_radius: float = 1.6
    nsample: int = 16

    @nn.compact
    def __call__(self, batch_dict, rois, roi_valid, train=False):
        r = rois.shape[0]
        g = self.grid_size
        grid_pts = roi_pool.roi_grid_points(rois, g).reshape(r * g ** 3, 3)
        grid_b = jnp.repeat(batch_dict.get("roi_batch", jnp.zeros(r, jnp.int32)), g ** 3)
        kp_coords = batch_dict["point_coords"]  # [K, 4] (b, x, y, z)
        kp_feats = batch_dict["point_features"]
        q_f = jnp.concatenate([grid_b[:, None].astype(jnp.float32), grid_pts], axis=1)
        grid = hash_graph.build_hash_grid(kp_coords, self.pool_radius)
        idx, _, mask = hash_graph.radius_neighbors(
            grid, q_f, self.pool_radius, self.nsample, cell_cap=self.nsample + 16
        )
        nk = kp_coords.shape[0]
        rel = jnp.where(
            mask[..., None], kp_coords[jnp.clip(idx, 0, nk - 1), 1:4] - grid_pts[:, None, :], 0.0
        )
        gf = jnp.where(mask[..., None], kp_feats[jnp.clip(idx, 0, nk - 1)], 0.0)
        x = jnp.concatenate([rel, gf], axis=-1)
        h = x.reshape(-1, x.shape[-1])
        flat_v = mask.reshape(-1)
        h = nn.Dense(64, use_bias=False)(h)
        h = MaskedBatchNorm()(h, flat_v, train)
        h = nn.relu(h)
        h = h.reshape(r * g ** 3, self.nsample, -1)
        h = jnp.where(mask[..., None], h, -jnp.inf)
        hmax = jnp.max(h, axis=1)
        hmax = jnp.where(jnp.any(mask, 1)[:, None], hmax, 0.0)
        feat = hmax.reshape(r, -1)
        cls, reg = _FCHead(name="head")(feat, roi_valid, train)
        return cls, reg


class PartA2FCHead(nn.Module):
    """RoI-aware voxel pooling head (reference parta2_head.py)."""

    grid_size: int = 12

    @nn.compact
    def __call__(self, batch_dict, rois, roi_valid, train=False):
        pts = batch_dict["point_bxyz"][:, 1:4]
        feats = batch_dict.get("point_feat", jnp.zeros((pts.shape[0], 1)))
        valid = batch_dict.get("point_valid", jnp.ones(pts.shape[0], bool))
        pooled, occ = roi_pool.roiaware_pool3d(
            pts, feats, rois, point_valid=valid, roi_valid=roi_valid,
            grid_size=self.grid_size, pool="avg",
        )
        r = rois.shape[0]
        feat = pooled.reshape(r, -1)
        cls, reg = _FCHead(name="head")(feat, roi_valid, train)
        return cls, reg


class PointRCNNHead(nn.Module):
    """RoI-point pooling head (reference roi_heads/pointrcnn_head.py +
    ops/roipoint_pool3d): samples raw points inside each RoI, canonically
    transforms them into the RoI frame, appends depth + point features,
    and encodes with a shared-MLP PointNet before the FC cls/reg trunk."""

    num_sampled: int = 128
    xyz_up: Sequence[int] = (128, 128)
    shared_mlp: Sequence[int] = (128, 256)

    @nn.compact
    def __call__(self, batch_dict, rois, roi_valid, train=False):
        pts_bxyz = batch_dict["point_bxyz"]
        xyz = pts_bxyz[:, 1:4]
        bidx = jnp.round(pts_bxyz[:, 0]).astype(jnp.int32)
        valid = batch_dict.get("point_valid", jnp.ones(xyz.shape[0], bool))
        feats = batch_dict.get("point_features", batch_dict.get("point_feat", jnp.zeros((xyz.shape[0], 1))))
        scores = batch_dict.get("point_cls_scores", jnp.ones(xyz.shape[0]))

        r = rois.shape[0]
        roi_b = batch_dict.get("roi_batch", jnp.zeros(r, jnp.int32))
        # restrict pooling to the RoI's own sample via the validity mask
        pv = valid[None, :] & (bidx[None, :] == roi_b[:, None])  # [R, N]
        depth = jnp.linalg.norm(xyz, axis=-1, keepdims=True) / 70.0 - 0.5
        ext = jnp.concatenate([feats, scores[:, None], depth], axis=-1)
        pooled, empty = roi_pool.roipoint_pool3d_masked(
            xyz, ext, rois, pv, num_sampled=self.num_sampled
        )  # [R, S, 3+C]
        local = pooled[..., :3]
        # canonical rotation into the RoI frame (reference pointrcnn_head
        # roipool3d_utils canonical transform)
        c, s = jnp.cos(-rois[:, 6]), jnp.sin(-rois[:, 6])
        lx = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
        ly = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
        canon = jnp.stack([lx, ly, local[..., 2]], axis=-1)
        x = jnp.concatenate([canon, pooled[..., 3:]], axis=-1)

        flat_v = jnp.broadcast_to((~empty)[:, None], (r, self.num_sampled)).reshape(-1)
        h = x.reshape(r * self.num_sampled, -1)
        for i, ch in enumerate(self.xyz_up):
            h = nn.Dense(ch, use_bias=False, name=f"xyz_up{i}")(h)
            h = MaskedBatchNorm(name=f"xyz_up_bn{i}")(h, flat_v, train)
            h = nn.relu(h)
        for i, ch in enumerate(self.shared_mlp):
            h = nn.Dense(ch, use_bias=False, name=f"shared{i}")(h)
            h = MaskedBatchNorm(name=f"shared_bn{i}")(h, flat_v, train)
            h = nn.relu(h)
        h = h.reshape(r, self.num_sampled, -1)
        feat = jnp.max(jnp.where(empty[:, None, None], -jnp.inf, h), axis=1)
        feat = jnp.where(empty[:, None], 0.0, feat)
        cls, reg = _FCHead(name="head")(feat, roi_valid & ~empty, train)
        return cls, reg


class SECONDHead(PartA2FCHead):
    """SECOND's RoI refinement rides the RoI-aware pooling trunk
    (reference roi_heads/second_head.py pools BEV features; the point
    pooling is the shared mechanism here)."""


ROI_HEADS = {
    "VoxelRCNNHead": VoxelRCNNHead,
    "PVRCNNHead": PVRCNNHead,
    "PartA2FCHead": PartA2FCHead,
    "PointRCNNHead": PointRCNNHead,
    "SECONDHead": SECONDHead,
}
