"""Point-based backbones: PointNet++ set-abstraction / feature-propagation.

Rewrite of /root/reference/pcdet/models/backbones_3d/pointnet2_backbone.py
(PointNet2MSG over the pointnet2_batch CUDA ops): SA layers = FPS + ball
query + shared MLP + max; FP layers = 3-NN inverse-distance interpolation +
unit MLP. Serves PointRCNN and the point-head models.

TPU design: ragged batches ride padded per-sample tables; ball query is the
hash-grid kernel; 3-NN interpolation uses the brute-force kNN (MXU distance
matrix) since FP levels are a few thousand points.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import hash_graph, sampling
from .layers import MaskedBatchNorm
from .pfe import SAGroup


class SALayer(nn.Module):
    """Set abstraction: FPS to npoint centers, ball-query group, MLP+max."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz, batch_idx, feats, valid, train=False):
        n = xyz.shape[0]
        # per-batch FPS: valid mask restricted per batch element is handled
        # by FPS over the whole table with batch-aware distance masking —
        # simple approach: FPS per batch element via fori over B is host-side;
        # here we FPS globally but seed per batch by masking (adequate when
        # batch elements occupy disjoint regions, which holds after the
        # batch-index coordinate trick below)
        # add a huge per-batch offset to separate batches spatially
        sep = batch_idx.astype(xyz.dtype)[:, None] * 1e4
        xyz_sep = xyz + sep
        idx = sampling.farthest_point_sample(xyz_sep, self.npoint, valid=valid)
        new_xyz = xyz[idx]
        new_batch = batch_idx[idx]
        new_valid = valid[idx]
        out = SAGroup(self.radius, self.nsample, tuple(self.mlp))(
            new_xyz, new_batch, xyz, batch_idx, feats, valid, train
        )
        return new_xyz, new_batch, out, new_valid, idx


class FPLayer(nn.Module):
    """Feature propagation: 3-NN inverse-distance-weighted interpolation of
    coarse features onto fine points + unit MLP."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, fine_xyz, fine_batch, fine_feats, fine_valid,
                 coarse_xyz, coarse_batch, coarse_feats, coarse_valid, train=False):
        idx, d2 = sampling.knn_bruteforce(
            coarse_xyz, fine_xyz, 3, ref_valid=coarse_valid,
            ref_batch=coarse_batch, query_batch=fine_batch,
        )
        w = 1.0 / jnp.maximum(d2, 1e-8)
        w = w / jnp.sum(w, axis=1, keepdims=True)
        interp = jnp.sum(coarse_feats[idx] * w[..., None], axis=1)
        x = interp if fine_feats is None else jnp.concatenate([fine_feats, interp], axis=-1)
        for c in self.mlp:
            x = nn.Dense(c, use_bias=False)(x)
            x = MaskedBatchNorm()(x, fine_valid, train)
            x = nn.relu(x)
        return jnp.where(fine_valid[:, None], x, 0.0)


class PointNet2MSG(nn.Module):
    """4-level SA encoder + FP decoder returning per-point features
    (reference pointnet2_backbone.PointNet2MSG; single-scale groups per
    level for the TPU build — MSG radii collapse into the widest, which the
    hash-grid kernel serves at the same cost)."""

    input_channels: int = 1
    npoints: Sequence[int] = (4096, 1024, 256, 64)
    radii: Sequence[float] = (0.4, 0.8, 1.6, 3.2)
    nsamples: Sequence[int] = (16, 16, 16, 16)
    channels: Sequence[int] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        pts = batch_dict["point_bxyz"]
        valid = batch_dict.get("point_valid", jnp.ones(pts.shape[0], bool))
        feats = batch_dict.get("point_feat", jnp.zeros((pts.shape[0], 1)))
        xyz = pts[:, 1:4]
        bidx = jnp.round(pts[:, 0]).astype(jnp.int32)

        levels = [(xyz, bidx, feats, valid)]
        for i in range(len(self.npoints)):
            lx, lb, lf, lv = levels[-1]
            nx, nb, nf, nv, _ = SALayer(
                self.npoints[i], self.radii[i], self.nsamples[i],
                (self.channels[i], self.channels[i]), name=f"sa{i}",
            )(lx, lb, lf, lv, train)
            levels.append((nx, nb, nf, nv))

        # decoder
        up_f = levels[-1][2]
        for i in range(len(self.npoints) - 1, -1, -1):
            fx, fb, ff, fv = levels[i]
            cx, cb, _, cv = levels[i + 1]
            up_f = FPLayer((self.channels[max(i - 1, 0)],) * 2, name=f"fp{i}")(
                fx, fb, ff, fv, cx, cb, up_f, cv, train
            )

        batch_dict["point_features"] = up_f
        batch_dict["point_coords"] = jnp.concatenate(
            [bidx[:, None].astype(jnp.float32), xyz], axis=1
        )
        return batch_dict


class PointHeadSimple(nn.Module):
    """Point-wise foreground classification head (reference
    point_head_simple.py): MLP over point features -> class logits; targets
    from points-in-gt-boxes."""

    num_classes: int
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        x = batch_dict["point_features"]
        valid = batch_dict.get("point_valid", jnp.ones(x.shape[0], bool))
        for h in self.hidden:
            x = nn.Dense(h, use_bias=False)(x)
            x = MaskedBatchNorm()(x, valid, train)
            x = nn.relu(x)
        batch_dict["point_cls_preds"] = nn.Dense(self.num_classes)(x)
        return batch_dict

    @staticmethod
    def loss(batch_dict, gt_boxes):
        """Focal loss with points-in-boxes targets (reference
        assign_stack_targets)."""
        from ..ops.boxes import points_in_boxes
        from ..utils.loss_utils import sigmoid_focal_cls_loss

        logits = batch_dict["point_cls_preds"]
        coords = batch_dict["point_coords"]
        valid = batch_dict.get("point_valid", jnp.ones(logits.shape[0], bool))
        nc = logits.shape[-1]

        def one(gt_b, b):
            boxes = gt_b[:, :7]
            cls = gt_b[:, 7].astype(jnp.int32)
            bp = points_in_boxes(coords[:, 1:4], boxes)
            bp = bp & (cls > 0)[:, None] & (jnp.round(coords[:, 0]).astype(jnp.int32) == b)[None, :]
            in_any = jnp.any(bp, axis=0)
            lab = jnp.where(in_any, cls[jnp.argmax(bp, axis=0)], 0)
            return lab

        B = gt_boxes.shape[0]
        labels = jnp.zeros(logits.shape[0], jnp.int32)
        for b in range(B):
            lb = one(gt_boxes[b], b)
            labels = jnp.where(jnp.round(coords[:, 0]).astype(jnp.int32) == b, lb, labels)
        onehot = jax.nn.one_hot(jnp.maximum(labels, 0), nc + 1)[:, 1:]
        num_pos = jnp.maximum(jnp.sum((labels > 0) & valid), 1)
        w = valid.astype(jnp.float32) / num_pos
        return jnp.sum(sigmoid_focal_cls_loss(logits, onehot, w))


class PointHeadBox(nn.Module):
    """Point-wise classification + box regression head — PointRCNN's
    first stage (reference dense_heads/point_head_box.py): foreground
    points regress a full box via PointResidualCoder; decoded per-point
    boxes become the second stage's proposals."""

    num_classes: int
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        from ..utils.box_coder_utils import PointResidualCoder

        x = batch_dict["point_features"]
        valid = batch_dict.get("point_valid", jnp.ones(x.shape[0], bool))
        h = x
        for c in self.hidden:
            h = nn.Dense(c, use_bias=False)(h)
            h = MaskedBatchNorm()(h, valid, train)
            h = nn.relu(h)
        coder = PointResidualCoder()
        batch_dict["point_cls_preds"] = nn.Dense(self.num_classes, name="cls")(h)
        batch_dict["point_box_preds"] = nn.Dense(coder.code_size, name="box")(h)
        return batch_dict

    @staticmethod
    def assign_targets(coords, valid, gt_boxes):
        """Per-point class label + encoded box target from points-in-boxes
        (reference PointHeadTemplate.assign_stack_targets with
        ret_box_labels=True). coords [N, 4] (b, xyz); gt_boxes [B, G, 8]."""
        from ..ops.boxes import points_in_boxes
        from ..utils.box_coder_utils import PointResidualCoder

        coder = PointResidualCoder()
        n = coords.shape[0]
        bidx = jnp.round(coords[:, 0]).astype(jnp.int32)
        labels = jnp.zeros(n, jnp.int32)
        box_t = jnp.zeros((n, coder.code_size), jnp.float32)
        for b in range(gt_boxes.shape[0]):
            gt_b = gt_boxes[b]
            boxes = gt_b[:, :7]
            cls = gt_b[:, 7].astype(jnp.int32)
            bp = points_in_boxes(coords[:, 1:4], boxes) & (cls > 0)[:, None]
            in_any = jnp.any(bp, axis=0) & (bidx == b) & valid
            gi = jnp.argmax(bp, axis=0)
            lab_b = jnp.where(in_any, cls[gi], 0)
            tgt_b = coder.encode(boxes[gi], coords[:, 1:4], cls[gi])
            sel = bidx == b
            labels = jnp.where(sel, lab_b, labels)
            box_t = jnp.where((sel & in_any)[:, None], tgt_b, box_t)
        return labels, box_t

    @staticmethod
    def loss(batch_dict, gt_boxes):
        """Focal cls + fg smooth-L1 box loss (reference
        point_head_box.get_loss)."""
        from ..utils.loss_utils import sigmoid_focal_cls_loss, weighted_smooth_l1_loss

        logits = batch_dict["point_cls_preds"]
        box_p = batch_dict["point_box_preds"]
        coords = batch_dict["point_coords"]
        valid = batch_dict.get("point_valid", jnp.ones(logits.shape[0], bool))
        nc = logits.shape[-1]
        labels, box_t = PointHeadBox.assign_targets(coords, valid, gt_boxes)
        onehot = jax.nn.one_hot(jnp.maximum(labels, 0), nc + 1)[:, 1:]
        fg = (labels > 0) & valid
        num_pos = jnp.maximum(jnp.sum(fg), 1)
        cls_w = valid.astype(jnp.float32) / num_pos
        cls_loss = jnp.sum(sigmoid_focal_cls_loss(logits, onehot, cls_w))
        reg_w = fg.astype(jnp.float32) / num_pos
        reg_loss = jnp.sum(weighted_smooth_l1_loss(box_p, box_t, reg_w))
        return {"point_loss_cls": cls_loss, "point_loss_box": reg_loss,
                "point_loss": cls_loss + reg_loss}

    @staticmethod
    def generate_predicted_boxes(batch_dict):
        """Flat per-point decoded boxes + scores (reference
        PointHeadTemplate.generate_predicted_boxes)."""
        from ..utils.box_coder_utils import PointResidualCoder

        coder = PointResidualCoder()
        logits = batch_dict["point_cls_preds"]
        coords = batch_dict["point_coords"]
        valid = batch_dict.get("point_valid", jnp.ones(logits.shape[0], bool))
        probs = jax.nn.sigmoid(logits)
        scores = jnp.where(valid, jnp.max(probs, axis=-1), 0.0)
        cls_pred = jnp.argmax(probs, axis=-1).astype(jnp.int32) + 1
        boxes = coder.decode(batch_dict["point_box_preds"], coords[:, 1:4], cls_pred)
        return boxes, scores, cls_pred


BACKBONES_POINT = {"PointNet2MSG": PointNet2MSG, "PointNet2Backbone": PointNet2MSG}
