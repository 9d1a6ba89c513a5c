"""Dense detection heads: AnchorHeadSingle and CenterHead.

TPU-native rewrites of /root/reference/pcdet/models/dense_heads/
(anchor_head_single.py + anchor_head_template.py + target_assigner/, and
center_head.py + model_utils/centernet_utils.py). Target assignment is fully
vectorized over padded GT tables — no per-sample Python loops inside jit.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils import loss_utils
from ..utils.box_coder_utils import ResidualCoder


# ---------------------------------------------------------------------------
# anchors
# ---------------------------------------------------------------------------


def generate_anchors(grid_size_xy, point_cloud_range, anchor_sizes, anchor_rotations, anchor_heights):
    """[H, W, S, R, 7] anchors on the BEV grid (reference
    target_assigner/anchor_generator.py). grid_size_xy = (nx, ny) of the
    feature map; anchor centers at cell centers of the feature grid."""
    nx, ny = grid_size_xy
    pcr = np.asarray(point_cloud_range, np.float32)
    stride_x = (pcr[3] - pcr[0]) / nx
    stride_y = (pcr[4] - pcr[1]) / ny
    xs = pcr[0] + (np.arange(nx, dtype=np.float32) + 0.5) * stride_x
    ys = pcr[1] + (np.arange(ny, dtype=np.float32) + 0.5) * stride_y
    sizes = np.asarray(anchor_sizes, np.float32)  # [S, 3]
    rots = np.asarray(anchor_rotations, np.float32)  # [R]
    hts = np.asarray(anchor_heights, np.float32)  # [S]
    S, R = len(sizes), len(rots)
    anchors = np.zeros((ny, nx, S, R, 7), np.float32)
    anchors[..., 0] = xs[None, :, None, None]
    anchors[..., 1] = ys[:, None, None, None]
    z = hts + sizes[:, 2] / 2.0  # anchor center z = bottom + dz/2, [S]
    anchors[..., 2] = z[None, None, :, None]
    anchors[..., 3:6] = sizes[None, None, :, None, :]
    anchors[..., 6] = rots[None, None, None, :]
    return anchors  # [ny, nx, S, R, 7]


def _nearest_bev_boxes(boxes):
    """Axis-aligned BEV extents with heading rounded to the nearest multiple
    of pi/2 (reference box_utils.boxes3d_nearest_bev_iou)."""
    rot = jnp.abs(jnp.remainder(boxes[..., 6], jnp.pi))
    swap = (rot > jnp.pi / 4) & (rot < 3 * jnp.pi / 4)
    dx = jnp.where(swap, boxes[..., 4], boxes[..., 3])
    dy = jnp.where(swap, boxes[..., 3], boxes[..., 4])
    x1 = boxes[..., 0] - dx / 2
    x2 = boxes[..., 0] + dx / 2
    y1 = boxes[..., 1] - dy / 2
    y2 = boxes[..., 1] + dy / 2
    return x1, y1, x2, y2


def nearest_bev_iou(boxes_a, boxes_b):
    """[A, B] axis-aligned nearest-BEV IoU used by the anchor matcher."""
    ax1, ay1, ax2, ay2 = _nearest_bev_boxes(boxes_a)
    bx1, by1, bx2, by2 = _nearest_bev_boxes(boxes_b)
    iw = jnp.maximum(jnp.minimum(ax2[:, None], bx2[None, :]) - jnp.maximum(ax1[:, None], bx1[None, :]), 0.0)
    ih = jnp.maximum(jnp.minimum(ay2[:, None], by2[None, :]) - jnp.maximum(ay1[:, None], by1[None, :]), 0.0)
    inter = iw * ih
    aa = (ax2 - ax1) * (ay2 - ay1)
    ab = (bx2 - bx1) * (by2 - by1)
    return inter / jnp.maximum(aa[:, None] + ab[None, :] - inter, 1e-6)


def assign_anchor_targets(anchors_flat, gt_boxes, gt_classes, gt_valid, class_id, matched_thr, unmatched_thr, coder, anchor_mask=None):
    """Single-class, single-sample anchor assignment (reference
    AxisAlignedTargetAssigner.assign_targets_single).

    anchors_flat [A, 7]; gt_* padded [G]; class_id int (1-based).
    anchor_mask [A] restricts matching AND force-matching to this class's
    own anchor rows, as the reference assigner does by slicing anchors per
    class before IoU.
    Returns labels [A] (-1 ignore / 0 bg / class_id fg), reg targets [A, C].
    """
    g_mask = gt_valid & (gt_classes == class_id)
    if anchor_mask is None:
        anchor_mask = jnp.ones(anchors_flat.shape[0], bool)
    iou = nearest_bev_iou(anchors_flat, gt_boxes)  # [A, G]
    iou = jnp.where(g_mask[None, :] & anchor_mask[:, None], iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    argmax_gt = jnp.argmax(iou, axis=1)

    labels = jnp.full(anchors_flat.shape[0], -1, jnp.int32)
    labels = jnp.where(max_iou >= matched_thr, class_id, labels)
    labels = jnp.where(max_iou < unmatched_thr, 0, labels)
    # force-match: the best anchor (within this class's rows) of each GT
    # becomes fg
    best_anchor = jnp.argmax(iou, axis=0)  # [G]
    force = jnp.zeros(anchors_flat.shape[0], bool).at[best_anchor].set(g_mask)
    force = force & anchor_mask
    labels = jnp.where(force, class_id, labels)
    argmax_gt = jnp.where(force, jnp.argmax(jnp.where(force[:, None], iou, -1.0), axis=1), argmax_gt)

    tgt_boxes = gt_boxes[argmax_gt]
    reg = coder.encode(tgt_boxes, anchors_flat)
    fg = (labels == class_id) & anchor_mask
    labels = jnp.where(anchor_mask, labels, -1)
    reg = jnp.where(fg[:, None], reg, 0.0)
    return labels, reg, fg


class AnchorHeadSingle(nn.Module):
    """Single-scale anchor head (reference anchor_head_single.py).

    Config: CLASS_NAMES with per-class anchor sizes/rotations/heights and
    match thresholds; DIR_OFFSET/DIR_LIMIT_OFFSET/NUM_DIR_BINS defaults as
    in the reference (0.78539, 0, 2)."""

    num_classes: int
    grid_size_xy: Sequence[int]
    point_cloud_range: Sequence[float]
    anchor_cfgs: tuple  # per class: dict(sizes, rotations, heights, matched, unmatched)
    dir_offset: float = 0.78539
    num_dir_bins: int = 2
    code_weights: Sequence[float] = (1.0,) * 7
    predict_iou: bool = False  # SECONDNetIoU: per-anchor IoU rectification

    def setup(self):
        anchors = []
        slices = []
        off = 0
        for cfg in self.anchor_cfgs:
            a = generate_anchors(
                self.grid_size_xy, self.point_cloud_range,
                cfg["sizes"], cfg["rotations"], cfg["heights"],
            )
            a = a.reshape(a.shape[0], a.shape[1], -1, 7)
            anchors.append(a)
            slices.append((off, a.shape[2]))
            off += a.shape[2]
        # per-class slices in the per-location anchor axis: class ci owns
        # rows [off, off+cnt) of the M dimension (reference assigner matches
        # each class's GTs only against its own anchor set)
        self.anchor_class_slices = tuple(slices)
        self.anchors = jnp.asarray(np.concatenate(anchors, axis=2))  # [ny, nx, M, 7]
        self.num_anchors_per_loc = self.anchors.shape[2]
        self.coder = ResidualCoder()
        self.conv_cls = nn.Conv(self.num_anchors_per_loc * self.num_classes, (1, 1))
        self.conv_box = nn.Conv(self.num_anchors_per_loc * self.coder.code_size, (1, 1))
        self.conv_dir = nn.Conv(self.num_anchors_per_loc * self.num_dir_bins, (1, 1))
        if self.predict_iou:
            self.conv_iou = nn.Conv(self.num_anchors_per_loc, (1, 1))

    def __call__(self, batch_dict, train: bool = False):
        x = batch_dict["spatial_features_2d"]  # [B, H, W, C]
        b, h, w, _ = x.shape
        cls = self.conv_cls(x).reshape(b, h, w, self.num_anchors_per_loc, self.num_classes)
        box = self.conv_box(x).reshape(b, h, w, self.num_anchors_per_loc, self.coder.code_size)
        dirp = self.conv_dir(x).reshape(b, h, w, self.num_anchors_per_loc, self.num_dir_bins)
        batch_dict["cls_preds"] = cls
        batch_dict["box_preds"] = box
        batch_dict["dir_preds"] = dirp
        batch_dict["anchors"] = self.anchors
        if self.predict_iou:
            batch_dict["iou_preds"] = self.conv_iou(x).reshape(b, h, w, self.num_anchors_per_loc)
        return batch_dict

    # -- losses ---------------------------------------------------------
    def loss(self, batch_dict):
        """gt_boxes: [B, G, 8] (7 box params + class id, zero-padded)."""
        cls_preds = batch_dict["cls_preds"]
        box_preds = batch_dict["box_preds"]
        dir_preds = batch_dict["dir_preds"]
        gt = batch_dict["gt_boxes"]
        b, h, w, m, _ = cls_preds.shape
        anchors_flat = self.anchors.reshape(-1, 7)

        def one_sample(cls_p, box_p, dir_p, gt_b):
            gt_boxes = gt_b[:, :7]
            gt_cls = gt_b[:, 7].astype(jnp.int32)
            gt_valid = gt_cls > 0
            labels = jnp.full(anchors_flat.shape[0], -1, jnp.int32)
            regs = jnp.zeros((anchors_flat.shape[0], self.coder.code_size))
            fg_any = jnp.zeros(anchors_flat.shape[0], bool)
            m_total = self.num_anchors_per_loc
            m_ids = jnp.arange(anchors_flat.shape[0], dtype=jnp.int32) % m_total
            for ci, cfg in enumerate(self.anchor_cfgs):
                off, cnt = self.anchor_class_slices[ci]
                amask = (m_ids >= off) & (m_ids < off + cnt)
                l, r, fg = assign_anchor_targets(
                    anchors_flat, gt_boxes, gt_cls, gt_valid, ci + 1,
                    cfg["matched_threshold"], cfg["unmatched_threshold"], self.coder,
                    anchor_mask=amask,
                )
                # each class's results only touch its own anchor rows
                labels = jnp.where(amask, l, labels)
                regs = jnp.where((amask & fg)[:, None], r, regs)
                fg_any = fg_any | fg

            cls_p = cls_p.reshape(-1, self.num_classes)
            box_p = box_p.reshape(-1, self.coder.code_size)
            dir_p = dir_p.reshape(-1, self.num_dir_bins)

            pos = labels > 0
            neg = labels == 0
            num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
            cls_w = (pos | neg).astype(jnp.float32) / num_pos
            one_hot = jax.nn.one_hot(jnp.maximum(labels, 0), self.num_classes + 1)[:, 1:]
            cls_loss = jnp.sum(loss_utils.sigmoid_focal_cls_loss(cls_p, one_hot, cls_w))

            reg_w = pos.astype(jnp.float32) / num_pos
            # sin-difference encoding of the angle channel (reference
            # add_sin_difference, anchor_head_template.py)
            bp_sin = box_p.at[:, 6].set(
                jnp.sin(box_p[:, 6]) * jnp.cos(regs[:, 6])
            )
            rg_sin = regs.at[:, 6].set(jnp.cos(box_p[:, 6]) * jnp.sin(regs[:, 6]))
            loc_loss = jnp.sum(
                loss_utils.weighted_smooth_l1_loss(bp_sin, rg_sin, reg_w, code_weights=self.code_weights)
            )

            # direction targets
            gt_rot = anchors_flat[:, 6] + regs[:, 6]
            dir_t = jnp.floor((gt_rot - self.dir_offset) / (2 * jnp.pi / self.num_dir_bins)).astype(jnp.int32)
            dir_t = jnp.clip(dir_t % self.num_dir_bins, 0, self.num_dir_bins - 1)
            dir_loss = jnp.sum(
                loss_utils.weighted_cross_entropy_loss(
                    dir_p, jax.nn.one_hot(dir_t, self.num_dir_bins), reg_w
                )
            )
            return cls_loss, loc_loss, dir_loss

        cls_l, loc_l, dir_l = jax.vmap(one_sample)(cls_preds, box_preds, dir_preds, gt)
        losses = {
            "rpn_loss_cls": jnp.mean(cls_l),
            "rpn_loss_loc": jnp.mean(loc_l) * 2.0,
            "rpn_loss_dir": jnp.mean(dir_l) * 0.2,
        }
        losses["rpn_loss"] = losses["rpn_loss_cls"] + losses["rpn_loss_loc"] + losses["rpn_loss_dir"]
        if self.predict_iou:
            losses["rpn_loss_iou"] = self.iou_loss(batch_dict)
            losses["rpn_loss"] = losses["rpn_loss"] + losses["rpn_loss_iou"]
        return losses

    def iou_loss(self, batch_dict):
        """IoU-rectification branch (SECONDNetIoU, reference
        detectors/second_net_iou.py + anchor_head IoU target assignment):
        smooth-L1 on (2*iou - 0.5) targets between decoded boxes and their
        best GT, computed with the axis-aligned nearest-BEV IoU."""
        gt = batch_dict["gt_boxes"]
        iou_preds = batch_dict["iou_preds"]
        b = iou_preds.shape[0]
        anchors_flat = self.anchors.reshape(-1, 7)
        box_preds = batch_dict["box_preds"].reshape(b, -1, self.coder.code_size)

        def one(bp, iou_p, gt_b):
            boxes = self.coder.decode(bp, anchors_flat)
            gtb = gt_b[:, :7]
            gvalid = gt_b[:, 7] > 0
            iou = nearest_bev_iou(boxes, gtb)
            iou = jnp.where(gvalid[None, :], iou, 0.0)
            best = jnp.max(iou, axis=1)
            fg = best > 0.3
            tgt = jnp.clip(2.0 * best - 0.5, 0.0, 1.0)
            w = fg.astype(jnp.float32) / jnp.maximum(jnp.sum(fg), 1.0)
            diff = jax.nn.sigmoid(iou_p.reshape(-1)) - tgt
            return jnp.sum(loss_utils.smooth_l1(diff) * w)

        return jnp.mean(jax.vmap(one)(box_preds, iou_preds, gt))

    def generate_predicted_boxes(self, batch_dict):
        cls_preds = batch_dict["cls_preds"]
        box_preds = batch_dict["box_preds"]
        dir_preds = batch_dict["dir_preds"]
        b = cls_preds.shape[0]
        anchors_flat = self.anchors.reshape(-1, 7)
        cls = jax.nn.sigmoid(cls_preds.reshape(b, -1, self.num_classes))
        boxes = self.coder.decode(box_preds.reshape(b, -1, self.coder.code_size), anchors_flat[None])
        dir_labels = jnp.argmax(dir_preds.reshape(b, -1, self.num_dir_bins), axis=-1)
        period = 2 * jnp.pi / self.num_dir_bins
        rot = boxes[..., 6] - self.dir_offset
        rot = rot - jnp.floor(rot / period) * period
        boxes = boxes.at[..., 6].set(rot + self.dir_offset + period * dir_labels)
        return boxes, cls


# ---------------------------------------------------------------------------
# CenterHead
# ---------------------------------------------------------------------------


def gaussian_radius(dx, dy, min_overlap=0.1):
    """CenterNet gaussian radius (reference centernet_utils.gaussian_radius)."""
    a1 = 1
    b1 = dx + dy
    c1 = dx * dy * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0))
    r1 = (b1 + sq1) / 2
    a2 = 4
    b2 = 2 * (dx + dy)
    c2 = (1 - min_overlap) * dx * dy
    sq2 = jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0))
    r2 = (b2 + sq2) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (dx + dy)
    c3 = (min_overlap - 1) * dx * dy
    sq3 = jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0))
    r3 = (b3 + sq3) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


class CenterHead(nn.Module):
    """Center-based head (reference center_head.py, single head group over
    all classes): shared conv -> heatmap + (center, center_z, dim, rot)."""

    num_classes: int
    grid_size_xy: Sequence[int]
    point_cloud_range: Sequence[float]
    feature_stride: int = 8
    shared_channels: int = 64
    max_objs: int = 500
    gaussian_overlap: float = 0.1
    min_radius: int = 2

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        x = batch_dict["spatial_features_2d"]
        x = nn.Conv(self.shared_channels, (3, 3), padding=1, use_bias=False)(x)
        from .layers import BatchNorm2d
        x = BatchNorm2d()(x, train)
        x = nn.relu(x)
        hm = nn.Conv(self.num_classes, (3, 3), padding=1,
                     bias_init=nn.initializers.constant(-2.19))(x)
        center = nn.Conv(2, (3, 3), padding=1)(x)
        center_z = nn.Conv(1, (3, 3), padding=1)(x)
        dim = nn.Conv(3, (3, 3), padding=1)(x)
        rot = nn.Conv(2, (3, 3), padding=1)(x)
        batch_dict["center_preds"] = {
            "hm": hm, "center": center, "center_z": center_z, "dim": dim, "rot": rot,
        }
        return batch_dict

    # -- targets + loss -------------------------------------------------
    def build_targets(self, gt_boxes):
        """gt_boxes [B, G, 8]; returns heatmap [B, H, W, ncls], reg targets
        [B, K, 8], inds [B, K], mask [B, K] (K = max_objs)."""
        nx, ny = self.grid_size_xy
        # ceil-div: the stride-2 spconv stack emits ceil(n/2) per stage
        # (ceil(ceil(ceil(n/2)/2)/2) == ceil(n/8)), so a grid not divisible
        # by the stride still matches the conv output's spatial dims
        fx = -(-nx // self.feature_stride)
        fy = -(-ny // self.feature_stride)
        pcr = jnp.asarray(self.point_cloud_range)
        vx = (pcr[3] - pcr[0]) / nx
        vy = (pcr[4] - pcr[1]) / ny

        def one(gt):
            boxes = gt[:, :7]
            cls = gt[:, 7].astype(jnp.int32)
            valid = cls > 0
            cx = (boxes[:, 0] - pcr[0]) / vx / self.feature_stride
            cy = (boxes[:, 1] - pcr[1]) / vy / self.feature_stride
            dx = boxes[:, 3] / vx / self.feature_stride
            dy = boxes[:, 4] / vy / self.feature_stride
            radius = gaussian_radius(dy, dx, self.gaussian_overlap)
            radius = jnp.maximum(radius.astype(jnp.int32), self.min_radius).astype(jnp.float32)
            ix = jnp.clip(cx.astype(jnp.int32), 0, fx - 1)
            iy = jnp.clip(cy.astype(jnp.int32), 0, fy - 1)
            in_grid = (cx >= 0) & (cx < fx) & (cy >= 0) & (cy < fy) & (dx > 0) & (dy > 0)
            ok = valid & in_grid

            ygrid = jnp.arange(fy, dtype=jnp.float32)
            xgrid = jnp.arange(fx, dtype=jnp.float32)

            def draw(carry, i):
                hm = carry
                sigma = radius[i] / 3.0
                g = jnp.exp(
                    -(
                        (xgrid[None, :] - ix[i]) ** 2 + (ygrid[:, None] - iy[i]) ** 2
                    )
                    / jnp.maximum(2 * sigma * sigma, 1e-6)
                )
                g = jnp.where(ok[i], g, 0.0)
                c = jnp.clip(cls[i] - 1, 0, self.num_classes - 1)
                onehot = jax.nn.one_hot(c, self.num_classes)
                hm = jnp.maximum(hm, g[:, :, None] * onehot[None, None, :])
                return hm, None

            G = gt.shape[0]
            # zero-valued data dependency keeps the scan carry's sharding
            # variance consistent under shard_map
            hm0 = jnp.zeros((fy, fx, self.num_classes)) + gt.ravel()[0] * 0.0
            hm, _ = jax.lax.scan(draw, hm0, jnp.arange(G))

            K = self.max_objs
            k = jnp.minimum(G, K)
            inds = (iy * fx + ix)[:K] if G >= K else jnp.pad(iy * fx + ix, (0, K - G))
            mask = ok[:K] if G >= K else jnp.pad(ok, (0, K - G))
            tgt = jnp.zeros((K, 8))
            src = jnp.stack(
                [
                    cx - ix.astype(jnp.float32),
                    cy - iy.astype(jnp.float32),
                    boxes[:, 2],
                    jnp.log(jnp.maximum(boxes[:, 3], 1e-5)),
                    jnp.log(jnp.maximum(boxes[:, 4], 1e-5)),
                    jnp.log(jnp.maximum(boxes[:, 5], 1e-5)),
                    jnp.cos(boxes[:, 6]),
                    jnp.sin(boxes[:, 6]),
                ],
                axis=-1,
            )
            tgt = src[:K] if G >= K else jnp.pad(src, ((0, K - G), (0, 0)))
            return hm, tgt, inds, mask

        return jax.vmap(one)(gt_boxes)

    def loss(self, batch_dict):
        preds = batch_dict["center_preds"]
        gt = batch_dict["gt_boxes"]
        hm_t, reg_t, inds, mask = self.build_targets(gt)
        hm_p = jax.nn.sigmoid(preds["hm"])
        hm_loss = loss_utils.focal_loss_centernet(hm_p, hm_t)

        b, fy, fx, _ = preds["hm"].shape
        reg_p = jnp.concatenate(
            [preds["center"], preds["center_z"], preds["dim"], preds["rot"]], axis=-1
        ).reshape(b, fy * fx, 8)
        gathered = jnp.take_along_axis(reg_p, inds[..., None], axis=1)
        reg_loss = loss_utils.reg_loss_centernet(gathered, reg_t, mask)
        code_weights = jnp.asarray([1.0] * 8)
        loc_loss = jnp.sum(reg_loss * code_weights)
        return {
            "hm_loss": hm_loss,
            "loc_loss": loc_loss * 2.0,
            "center_loss": hm_loss + loc_loss * 2.0,
        }

    def generate_predicted_boxes(self, batch_dict, k=500, score_thresh=0.1):
        """Top-K peak decode (reference centernet_utils.decode_bbox_from_heatmap)."""
        preds = batch_dict["center_preds"]
        hm = jax.nn.sigmoid(preds["hm"])
        b, fy, fx, ncls = hm.shape
        pcr = jnp.asarray(self.point_cloud_range)
        nx, ny = self.grid_size_xy
        vx = (pcr[3] - pcr[0]) / nx
        vy = (pcr[4] - pcr[1]) / ny

        # 3x3 max-pool NMS on the heatmap
        pooled = nn.max_pool(hm, (3, 3), strides=(1, 1), padding="SAME")
        hm = jnp.where(jnp.abs(hm - pooled) < 1e-6, hm, 0.0)

        flat = hm.reshape(b, fy * fx * ncls)
        k = min(k, flat.shape[1])
        scores, idx = jax.lax.top_k(flat, k)
        cls_id = idx % ncls
        spatial = idx // ncls
        iy = spatial // fx
        ix = spatial % fx

        reg = jnp.concatenate(
            [preds["center"], preds["center_z"], preds["dim"], preds["rot"]], axis=-1
        ).reshape(b, fy * fx, 8)
        g = jnp.take_along_axis(reg, spatial[..., None], axis=1)
        cx = (ix.astype(jnp.float32) + g[..., 0]) * vx * self.feature_stride + pcr[0]
        cy = (iy.astype(jnp.float32) + g[..., 1]) * vy * self.feature_stride + pcr[1]
        cz = g[..., 2]
        dims = jnp.exp(g[..., 3:6])
        rot = jnp.arctan2(g[..., 7], g[..., 6])
        boxes = jnp.stack([cx, cy, cz, dims[..., 0], dims[..., 1], dims[..., 2], rot], axis=-1)
        valid = scores > score_thresh
        return boxes, scores, cls_id + 1, valid


DENSE_HEADS = {"AnchorHeadSingle": AnchorHeadSingle, "CenterHead": CenterHead}
