"""Evaluation: detection recall/AP and segmentation IoU tables.

Native replacements for the in-repo metric paths of the reference
(eval_one_epoch recall records, detector3d_template.generate_recall_record,
and the seg IoU table at waymo_dataset.py:860-885). The official
waymo-open-dataset TF metrics remain an optional host-side dependency, same
stance as the reference (waymo_eval.py imports TF lazily).
"""

from __future__ import annotations

import numpy as np


def _iou3d_np(boxes_a, boxes_b):
    import jax.numpy as jnp

    from ..ops.boxes import boxes_iou3d

    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)), np.float32)
    return np.asarray(
        boxes_iou3d(jnp.asarray(boxes_a.astype(np.float32)), jnp.asarray(boxes_b.astype(np.float32)))
    )


def compute_recall(pred_boxes, gt_boxes, thresholds=(0.3, 0.5, 0.7)):
    """Recall of GT boxes by predictions at IoU thresholds (reference
    generate_recall_record)."""
    out = {f"recall_{t}": 0 for t in thresholds}
    out["num_gt"] = len(gt_boxes)
    if len(gt_boxes) == 0:
        return out
    iou = _iou3d_np(gt_boxes[:, :7], pred_boxes[:, :7]) if len(pred_boxes) else np.zeros((len(gt_boxes), 0))
    best = iou.max(axis=1) if iou.shape[1] else np.zeros(len(gt_boxes))
    for t in thresholds:
        out[f"recall_{t}"] = int((best > t).sum())
    return out


def average_precision(scores, matched, num_gt):
    """11-point-free AP: precision envelope over recall."""
    if num_gt == 0 or len(scores) == 0:
        return 0.0
    order = np.argsort(-scores)
    matched = np.asarray(matched)[order]
    tp = np.cumsum(matched)
    fp = np.cumsum(~matched)
    recall = tp / num_gt
    precision = tp / np.maximum(tp + fp, 1)
    # precision envelope
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    idx = np.where(np.diff(np.concatenate([[0], recall])) > 0)[0]
    return float((precision[idx] * np.diff(np.concatenate([[0], recall]))[idx]).sum())


def simple_detection_eval(det_annos, gt_annos, class_names, iou_threshold=0.7):
    """Per-class AP with greedy IoU matching — the native metric path; use
    the official Waymo metrics for leaderboard numbers."""
    results = {}
    for ci, cname in enumerate(class_names):
        scores_all, matched_all, num_gt = [], [], 0
        for det, gt in zip(det_annos, gt_annos):
            det_mask = np.asarray(det["name"]) == cname
            det_boxes = np.asarray(det["boxes_lidar"])[det_mask]
            det_scores = np.asarray(det["score"])[det_mask]
            gt_names = np.asarray(gt.get("name", []))
            gt_mask = gt_names == cname
            gt_boxes = np.asarray(gt.get("gt_boxes_lidar", np.zeros((0, 7))))[gt_mask]
            num_gt += len(gt_boxes)
            if len(det_boxes) == 0:
                continue
            iou = _iou3d_np(det_boxes[:, :7], gt_boxes[:, :7])
            taken = np.zeros(len(gt_boxes), bool)
            m = np.zeros(len(det_boxes), bool)
            for i in np.argsort(-det_scores):
                if iou.shape[1] == 0:
                    break
                j = int(np.argmax(np.where(taken, -1.0, iou[i])))
                if iou[i, j] > iou_threshold and not taken[j]:
                    taken[j] = True
                    m[i] = True
            scores_all.append(det_scores)
            matched_all.append(m)
        scores_all = np.concatenate(scores_all) if scores_all else np.zeros(0)
        matched_all = np.concatenate(matched_all) if matched_all else np.zeros(0, bool)
        results[f"{cname}_AP@{iou_threshold}"] = average_precision(scores_all, matched_all, num_gt)
    result_str = "\n".join(f"{k}: {v:.4f}" for k, v in results.items())
    return result_str, results


def segmentation_iou_table(pred_labels, gt_labels, num_classes, class_names=None):
    """Per-class IoU / mIoU / FG-BG table (reference waymo_dataset.py:860-885)."""
    ious = {}
    valid = gt_labels >= 0
    pred, gt = pred_labels[valid], gt_labels[valid]
    for c in range(num_classes):
        inter = int(((pred == c) & (gt == c)).sum())
        union = int(((pred == c) | (gt == c)).sum())
        name = class_names[c] if class_names else str(c)
        ious[name] = inter / union if union else float("nan")
    vals = [v for v in ious.values() if v == v]
    ious["mIoU"] = float(np.mean(vals)) if vals else float("nan")
    return ious
