"""Interaction-index computation and II-breakdown detection metrics.

Native (TF-free) rewrite of the reference interaction-index subsystem:
  * computing per-box interaction masks from segmentation-labeled points
    (/root/reference/pcdet/datasets/waymo/waymo_utils.py:537-592:
    ``check_box_interaction`` / ``compute_interaction_index_for_frame``) —
    a box "interacts" at radius r when its r-enlarged volume contains
    foreground points that are neither its own members nor share its
    instance label;
  * AP/APH broken down by interaction-index difficulty level
    (/root/reference/pcdet/datasets/waymo/waymo_eval_ii.py:26-101: level =
    position of the smallest interacting radius in the difficulty ladder;
    level 0 = never interacting). The reference's
    tools/eval_utils/ii_metrics.py coverage helper is an unfinished
    debugger stub; the AP breakdown here follows the estimator semantics.
"""

from __future__ import annotations

import numpy as np

# the reference's difficulty ladder (waymo_eval_ii.py:56)
II_DIFFICULTIES = (0, 0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 2.0, 4.0, 6.0, 8.0)

_ROAD_CLS = 10
_SIDEWALK_CLS = 11


def split_by_seg_label(points, labels):
    """Split into (road, sidewalk, other_obj, other_labels) by segment
    class (reference waymo_utils.split_by_seg_label)."""
    points = points[: labels.shape[0]]
    seg = labels[:, 1]
    road_m = seg == _ROAD_CLS
    side_m = seg == _SIDEWALK_CLS
    other_m = ~road_m & ~side_m
    return points[road_m, :3], points[side_m, :3], points[other_m, :3], labels[other_m]


def _points_in_boxes_np(points, boxes):
    """[B, N] bool, rotated boxes (numpy; jit op avoided for host tooling)."""
    if len(points) == 0 or len(boxes) == 0:
        return np.zeros((len(boxes), len(points)), bool)
    d = points[None, :, :3] - boxes[:, None, :3]
    c = np.cos(-boxes[:, 6])[:, None]
    s = np.sin(-boxes[:, 6])[:, None]
    lx = d[..., 0] * c - d[..., 1] * s
    ly = d[..., 0] * s + d[..., 1] * c
    return (
        (np.abs(lx) < boxes[:, None, 3] / 2)
        & (np.abs(ly) < boxes[:, None, 4] / 2)
        & (np.abs(d[..., 2]) < boxes[:, None, 5] / 2)
    )


def check_box_interaction(boxes, radius, other_obj, seg_labels):
    """[B] bool: box contains non-member, non-same-instance points within
    ``radius`` of its boundary (reference waymo_utils.check_box_interaction)."""
    expected = _points_in_boxes_np(other_obj, boxes)
    # per-box instance label: median instance among member points
    box_inst = np.zeros(len(boxes), np.int64)
    for i in range(len(boxes)):
        m = expected[i]
        box_inst[i] = np.median(seg_labels[m, 0]) if m.any() else -1
    enlarged = boxes.copy()
    enlarged[:, 3:6] += radius
    inter = _points_in_boxes_np(other_obj, enlarged)
    inter[expected] = False
    bi, pi = np.nonzero(inter)
    same = box_inst[bi] == seg_labels[pi, 0]
    inter[bi[same], pi[same]] = False
    return inter.any(axis=1)


def compute_interaction_index(points, seg_labels, boxes, radius_list=II_DIFFICULTIES):
    """{str(radius): [B] bool} interaction masks for one frame (reference
    compute_interaction_index_for_frame)."""
    if len(boxes) == 0:
        return {str(r): np.zeros(0, bool) for r in radius_list}
    _, _, other_obj, other_lab = split_by_seg_label(points, seg_labels)
    return {
        str(r): check_box_interaction(boxes, r, other_obj, other_lab)
        for r in radius_list
    }


def ii_difficulty_levels(interaction_index, num_boxes):
    """[B] int levels from per-radius masks: level L = box interacts at the
    L-th smallest ladder radius (reference waymo_eval_ii.py:56-64; level 0
    = interacts at no radius)."""
    levels = np.zeros(num_boxes, np.int32)
    for level, r in enumerate(reversed(II_DIFFICULTIES)):
        key = str(r)
        if key in interaction_index:
            levels[np.asarray(interaction_index[key], bool)] = level + 1
    return levels


def ap_by_interaction_index(det_annos, gt_annos, class_names, level_groups=((0,), (1, 2, 3), (4, 5, 6, 7, 8, 9, 10, 11))):
    """AP/APH per interaction-index level group. gt_annos carry
    'interaction_index' dicts; GTs outside a group are don't-care for that
    group (estimator OBJECT_TYPE x II breakdown semantics)."""
    from ..runtime.eval_utils import _ap_from_matches, _heading_accuracy, _iou3d_np, _IOU_THRESH
    from scipy.optimize import linear_sum_assignment

    results = {}
    for cname in class_names:
        thr = _IOU_THRESH.get(cname, 0.5)
        acc = {g: [[], [], [], 0] for g in level_groups}
        for det, gt in zip(det_annos, gt_annos):
            det_mask = np.asarray(det["name"]) == cname
            d_boxes = np.asarray(det["boxes_lidar"], np.float32)[det_mask]
            d_scores = np.asarray(det["score"], np.float32)[det_mask]
            gt_names = np.asarray(gt.get("name", []))
            g_mask = gt_names == cname
            g_boxes = np.asarray(gt.get("gt_boxes_lidar", np.zeros((0, 7))), np.float32)[g_mask]
            levels = ii_difficulty_levels(gt.get("interaction_index", {}), len(gt_names))[g_mask]

            iou = _iou3d_np(d_boxes[:, :7], g_boxes[:, :7])
            match_gt = np.full(len(d_boxes), -1, np.int64)
            if iou.size:
                ri, ci = linear_sum_assignment(-iou)
                for i, j in zip(ri, ci):
                    if iou[i, j] >= thr:
                        match_gt[i] = j
            mm = match_gt >= 0
            hacc = np.zeros(len(d_boxes))
            if mm.any():
                hacc[mm] = _heading_accuracy(d_boxes[mm, 6], g_boxes[match_gt[mm], 6])

            for group in level_groups:
                gsel = np.isin(levels, np.asarray(group))
                care = ~mm | gsel[np.clip(match_gt, 0, None)]
                tp = mm & gsel[np.clip(match_gt, 0, None)]
                acc[group][0].append(d_scores[care])
                acc[group][1].append(tp[care].astype(np.float64))
                acc[group][2].append((hacc * tp)[care])
                acc[group][3] += int(gsel.sum())

        for group in level_groups:
            s, t, h, ng = acc[group]
            s = np.concatenate(s) if s else np.zeros(0)
            t = np.concatenate(t) if t else np.zeros(0)
            h = np.concatenate(h) if h else np.zeros(0)
            ap, aph = _ap_from_matches(s, t, h, ng)
            tag = "II_" + "_".join(str(g) for g in group)
            results[f"{cname}/{tag}/AP"] = ap
            results[f"{cname}/{tag}/APH"] = aph
    result_str = "\n".join(f"{k}: {v:.4f}" for k, v in sorted(results.items()))
    return result_str, results
