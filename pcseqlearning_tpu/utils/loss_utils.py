"""Detection losses.

TPU rewrites of /root/reference/pcdet/utils/loss_utils.py:
SigmoidFocalClassificationLoss (:244), WeightedSmoothL1Loss (:313),
WeightedL1Loss (:377), WeightedCrossEntropyLoss (:422), centernet focal/reg
losses (FocalLossCenterNet / RegLossCenterNet), and corner loss (:450).
All are pure jnp functions over arbitrary batch shapes with explicit weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_cls_loss(logits, targets, weights, gamma=2.0, alpha=0.25):
    """Per-anchor focal loss (reference loss_utils.py:244-311).

    logits/targets: [..., C]; weights: broadcastable to [...] (applied per
    anchor). Returns elementwise loss [..., C].
    """
    p = jax.nn.sigmoid(logits)
    alpha_w = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    pt = targets * (1.0 - p) + (1.0 - targets) * p
    focal = alpha_w * jnp.power(pt, gamma)
    bce = jnp.clip(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = focal * bce
    return loss * weights[..., None]


def smooth_l1(diff, beta=1.0 / 9.0):
    ad = jnp.abs(diff)
    return jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)


def weighted_smooth_l1_loss(pred, target, weights, beta=1.0 / 9.0, code_weights=None):
    """[..., C] smooth-L1 with per-anchor weights (reference :313-375)."""
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, pred.dtype)
    loss = smooth_l1(diff, beta)
    return loss * weights[..., None]


def weighted_l1_loss(pred, target, weights, code_weights=None):
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, pred.dtype)
    return jnp.abs(diff) * weights[..., None]


def weighted_cross_entropy_loss(logits, one_hot_targets, weights):
    """Softmax CE with per-anchor weights (reference :422-448, used for
    direction classification)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(one_hot_targets * logp, axis=-1)
    return loss * weights


def focal_loss_centernet(pred_sigmoid, gt_heatmap, eps=1e-4):
    """Penalty-reduced pixelwise focal loss (CornerNet/CenterNet form;
    reference FocalLossCenterNet + neg_loss_cornernet). Returns a scalar
    normalized by the number of positives."""
    pred = jnp.clip(pred_sigmoid, eps, 1.0 - eps)
    pos_mask = gt_heatmap == 1.0
    neg_weights = jnp.power(1.0 - gt_heatmap, 4.0)
    pos_loss = jnp.log(pred) * jnp.power(1.0 - pred, 2.0) * pos_mask
    neg_loss = jnp.log(1.0 - pred) * jnp.power(pred, 2.0) * neg_weights * (~pos_mask)
    num_pos = jnp.sum(pos_mask.astype(pred.dtype))
    loss = -(jnp.sum(pos_loss) + jnp.sum(neg_loss))
    return jnp.where(num_pos > 0, loss / jnp.maximum(num_pos, 1.0), -jnp.sum(neg_loss))


def reg_loss_centernet(pred, target, mask):
    """Masked L1 over regression targets at GT centers (reference
    RegLossCenterNet). pred/target [B, K, C], mask [B, K]."""
    w = mask.astype(pred.dtype)[..., None]
    loss = jnp.abs(pred - target) * w
    return jnp.sum(loss, axis=(0, 1)) / jnp.maximum(jnp.sum(w), 1.0)


def get_corner_loss_lidar(pred_boxes, gt_boxes):
    """Corner-to-corner smooth-L1 with flipped-heading minimum (reference
    :450-478). pred/gt: [N, 7]."""
    from ..ops.boxes import boxes_to_corners_3d

    pc = boxes_to_corners_3d(pred_boxes)
    gc = boxes_to_corners_3d(gt_boxes)
    gt_flip = gt_boxes.at[:, 6].add(jnp.pi)
    gcf = boxes_to_corners_3d(gt_flip)
    d1 = jnp.linalg.norm(pc - gc, axis=-1)
    d2 = jnp.linalg.norm(pc - gcf, axis=-1)
    corner_dist = jnp.minimum(d1, d2)
    return smooth_l1(corner_dist, beta=1.0).mean(axis=-1)


def ohem_ce_loss(logits, labels, valid, thresh=0.7, min_kept=0.001):
    """Online hard-example-mining cross entropy (reference
    loss_utils.OHEMLoss:205-243, after mmseg's OHEM pixel sampler): keep
    pixels whose gt-class probability is below max(thresh, k-th smallest
    prob) where k = min_kept * N, weight 1 on kept pixels.

    logits [N, C]; labels [N] int (invalid rows masked by ``valid``)."""
    import jax

    n, c = logits.shape
    lab = jnp.clip(labels, 0, c - 1)
    prob = jax.nn.softmax(logits, axis=-1)
    gt_prob = jnp.take_along_axis(prob, lab[:, None], axis=1)[:, 0]
    gt_prob = jnp.where(valid, gt_prob, jnp.inf)
    batch_kept = jnp.maximum((min_kept * jnp.sum(valid)).astype(jnp.int32), 1)
    sorted_prob = jnp.sort(gt_prob)
    kth = sorted_prob[jnp.clip(batch_kept, 0, n - 1)]
    threshold = jnp.maximum(kth, thresh)
    w = (valid & (gt_prob < threshold)).astype(logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, lab[:, None], axis=1)[:, 0]
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(valid), 1.0)


def ohem_reg_loss(pred, target, gap, weight_dict):
    """Gap-reweighted MSE (reference OHEMRegLoss:183-203): per-row weight
    from the largest threshold in ``weight_dict`` below the row's gap."""
    w = jnp.ones_like(gap)
    for threshold in sorted(float(k) for k in weight_dict):
        w = jnp.where(gap > threshold, weight_dict[threshold] if threshold in weight_dict else weight_dict[str(threshold)], w)
    loss = (pred - target) ** 2
    return jnp.mean(loss * w[:, None])
