"""NMS front-ends: class-agnostic and per-class multi-class NMS.

API parity with /root/reference/pcdet/models/model_utils/model_nms_utils.py
(class_agnostic_nms:6, multi_classes_nms:28) on the exact rotated-BEV NMS
kernel (ops/boxes.nms_bev).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import boxes as box_ops


def class_agnostic_nms(box_scores, box_preds, nms_config, score_thresh=None):
    """Args: box_scores [A], box_preds [A, 7], nms_config dict with
    NMS_PRE_MAXSIZE / NMS_POST_MAXSIZE / NMS_THRESH.
    Returns (selected_scores [post], selected_boxes [post, 7], valid [post]).
    """
    pre = int(nms_config.get("NMS_PRE_MAXSIZE", 4096))
    post = int(nms_config.get("NMS_POST_MAXSIZE", 500))
    thresh = float(nms_config.get("NMS_THRESH", 0.7))
    valid = jnp.ones_like(box_scores, bool)
    if score_thresh is not None:
        valid = box_scores >= score_thresh
    k = min(pre, box_scores.shape[0])
    top_s, top_i = jax.lax.top_k(jnp.where(valid, box_scores, -jnp.inf), k)
    cand = box_preds[top_i]
    keep = box_ops.nms_bev(cand, top_s, thresh, valid=jnp.isfinite(top_s))
    order = jnp.argsort(-jnp.where(keep, top_s, -jnp.inf))[:post]
    return top_s[order], cand[order], keep[order] & jnp.isfinite(top_s[order])


def multi_classes_nms(cls_scores, box_preds, nms_config, score_thresh=None):
    """Per-class NMS (reference :28): cls_scores [A, C]. Returns per-class
    concatenated (scores, labels, boxes, valid) with post_max per class."""
    num_classes = cls_scores.shape[1]
    outs = []
    for c in range(num_classes):
        s, b, v = class_agnostic_nms(cls_scores[:, c], box_preds, nms_config, score_thresh)
        outs.append((s, jnp.full_like(s, c + 1, dtype=jnp.int32), b, v))
    scores = jnp.concatenate([o[0] for o in outs])
    labels = jnp.concatenate([o[1] for o in outs])
    boxes = jnp.concatenate([o[2] for o in outs])
    valid = jnp.concatenate([o[3] for o in outs])
    return scores, labels, boxes, valid
