"""Randomized cross-check of the native Waymo-style AP.

``waymo_style_ap`` (runtime/eval_utils.py) is anchored by 4 hand-derived
fixtures (test_waymo_ap.py); this file adds a PROPERTY-style check on 100
randomized scenes against a from-first-principles reimplementation with
deliberately different structure:

  * matching: exhaustive search over all assignments (itertools
    permutations on the padded square matrix) instead of scipy Hungarian;
  * PR curve: explicit score-cutoff sweep (precision/recall evaluated at
    every distinct detection score, the official estimator's formulation,
    /root/reference/pcdet/datasets/waymo/waymo_eval.py:52-58 score_cutoffs)
    instead of cumsum-over-sorted;
  * difficulty / don't-care / range-bucket logic rewritten independently.

The box-IoU kernel (ops/boxes.boxes_iou3d) is shared — it has its own
shapely oracle (test_geometry_boxes.py) — so disagreements here isolate
structural bugs in matching/PR/level logic that twin implementations of the
same author could otherwise share.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from pcseqlearning_tpu.runtime.eval_utils import _iou3d_np, waymo_style_ap

_THR = {"Vehicle": 0.7, "Pedestrian": 0.5}
_RANGES = ((0.0, 30.0), (30.0, 50.0), (50.0, np.inf))


# ---------------------------------------------------------------------------
# independent oracle
# ---------------------------------------------------------------------------

def _best_assignment(iou):
    """Max-total-IoU one-to-one assignment by exhaustive search.
    Returns det->gt map (-1 unmatched). iou: [D, G]."""
    D, G = iou.shape
    if D == 0 or G == 0:
        return np.full(D, -1, np.int64)
    n = max(D, G)
    pad = np.zeros((n, n))
    pad[:D, :G] = iou
    best, best_perm = -1.0, None
    for perm in itertools.permutations(range(n)):
        tot = pad[np.arange(n), perm].sum()
        if tot > best + 1e-12:
            best, best_perm = tot, perm
    out = np.full(D, -1, np.int64)
    for d in range(D):
        g = best_perm[d]
        if g < G:
            out[d] = g
    return out


def _heading_acc(dh, gh):
    d = abs(float(dh) - float(gh)) % (2 * np.pi)
    d = min(d, 2 * np.pi - d)
    return max(0.0, 1.0 - d / np.pi)


def _pr_sweep_ap(scores, tp, hw, num_gt):
    """AP/APH via explicit score-cutoff sweep + envelope integration."""
    if num_gt == 0 or len(scores) == 0:
        return 0.0, 0.0
    scores = np.asarray(scores, np.float64)
    tp = np.asarray(tp, np.float64)
    hw = np.asarray(hw, np.float64)
    pts = []
    for c in sorted(set(scores.tolist()), reverse=True):
        sel = scores >= c
        TP = tp[sel].sum()
        HW = hw[sel].sum()
        FP = (1.0 - tp[sel]).sum()
        denom = max(TP + FP, 1e-9)
        pts.append((TP / num_gt, TP / denom, HW / denom))
    ap = aph = 0.0
    prev_r = 0.0
    for i, (r, _, _) in enumerate(pts):
        # precision envelope: max precision among all points at recall >= r
        p_env = max(p for rr, p, _ in pts[i:])
        ph_env = max(ph for rr, _, ph in pts[i:])
        ap += (r - prev_r) * p_env
        aph += (r - prev_r) * ph_env
        prev_r = r
    return float(ap), float(aph)


def oracle_waymo_ap(det_annos, gt_annos, class_names):
    """Independent Waymo-style AP: per-frame exhaustive matching, explicit
    level/don't-care/range handling, cutoff-sweep PR."""
    results = {}
    for cname in class_names:
        thr = _THR.get(cname, 0.5)
        per_level = {lv: ([], [], [], [0]) for lv in
                     ("L1", "L2") + tuple(_RANGES)}
        for det, gt in zip(det_annos, gt_annos):
            dsel = np.asarray(det["name"]) == cname
            db = np.asarray(det["boxes_lidar"], np.float32)[dsel]
            ds = np.asarray(det["score"], np.float32)[dsel]
            gnames = np.asarray(gt.get("name", []))
            gsel_c = gnames == cname
            gb = np.asarray(gt.get("gt_boxes_lidar", np.zeros((0, 7))),
                            np.float32)[gsel_c]
            gd = np.asarray(gt.get("difficulty",
                                   np.zeros(len(gnames))), np.int64)[gsel_c]
            if "num_points_in_gt" in gt:
                npts = np.asarray(gt["num_points_in_gt"])[gsel_c]
                gd = np.array([1 if (d == 0 and n > 5) else (2 if d == 0 else d)
                               for d, n in zip(gd, npts)])
                keep = npts > 0
                gb, gd = gb[keep], gd[keep]
            else:
                gd = np.where(gd == 0, 1, gd)

            iou = _iou3d_np(db[:, :7], gb[:, :7]) if len(db) and len(gb) \
                else np.zeros((len(db), len(gb)))
            assign = _best_assignment(iou)
            # threshold the assignment
            for d in range(len(db)):
                if assign[d] >= 0 and iou[d, assign[d]] < thr:
                    assign[d] = -1
            grange = (np.linalg.norm(gb[:, :2], axis=1)
                      if len(gb) else np.zeros(0))
            drange = (np.linalg.norm(db[:, :2], axis=1)
                      if len(db) else np.zeros(0))

            def gt_in_level(g, lv):
                if lv == "L1":
                    return gd[g] <= 1
                if lv == "L2":
                    return True
                lo, hi = lv
                return lo <= grange[g] < hi

            for lv, (S, T, H, NG) in per_level.items():
                NG[0] += sum(1 for g in range(len(gb)) if gt_in_level(g, lv))
                for d in range(len(db)):
                    g = assign[d]
                    if g >= 0:
                        if gt_in_level(g, lv):  # TP in this level
                            S.append(ds[d])
                            T.append(1.0)
                            H.append(_heading_acc(db[d, 6], gb[g, 6]))
                        # matched to out-of-level GT: don't-care, dropped
                    else:  # unmatched det: FP if it belongs to the level
                        if lv in ("L1", "L2"):
                            in_lv = True
                        else:
                            lo, hi = lv
                            in_lv = lo <= drange[d] < hi
                        if in_lv:
                            S.append(ds[d])
                            T.append(0.0)
                            H.append(0.0)
        for lv, (S, T, H, NG) in per_level.items():
            ap, aph = _pr_sweep_ap(S, T, H, NG[0])
            if lv == "L1" or lv == "L2":
                key = f"{cname}/{lv}"
            else:
                hi = "INF" if np.isinf(lv[1]) else f"{lv[1]:.0f}"
                key = f"{cname}/RANGE_[{lv[0]:.0f},{hi})"
            results[f"{key}/AP"] = ap
            results[f"{key}/APH"] = aph
    return results


# ---------------------------------------------------------------------------
# random scene generator
# ---------------------------------------------------------------------------

def _rand_scene(rng, n_frames=2, classes=("Vehicle", "Pedestrian")):
    det_annos, gt_annos = [], []
    for _ in range(n_frames):
        g_boxes, g_names, g_diff, g_npts = [], [], [], []
        d_boxes, d_names, d_scores = [], [], []
        for cname in classes:
            ng = rng.randint(0, 5)
            for _ in range(ng):
                ctr = rng.uniform(-60, 60, 2)
                b = np.array([ctr[0], ctr[1], rng.uniform(-1, 1),
                              rng.uniform(3, 5), rng.uniform(1.6, 2.2),
                              rng.uniform(1.4, 1.9),
                              rng.uniform(-np.pi, np.pi)])
                g_boxes.append(b)
                g_names.append(cname)
                g_diff.append(rng.randint(0, 3))
                g_npts.append(rng.randint(0, 11))
                if rng.rand() < 0.75:  # matching det: perturbed copy
                    d = b.copy()
                    d[:3] += rng.randn(3) * 0.15
                    d[6] += rng.randn() * 0.25
                    d_boxes.append(d)
                    d_names.append(cname)
                    d_scores.append(rng.rand())
            for _ in range(rng.randint(0, 3)):  # false positives
                ctr = rng.uniform(-60, 60, 2)
                d_boxes.append(np.array([
                    ctr[0], ctr[1], rng.uniform(-1, 1), rng.uniform(3, 5),
                    rng.uniform(1.6, 2.2), rng.uniform(1.4, 1.9),
                    rng.uniform(-np.pi, np.pi)]))
                d_names.append(cname)
                d_scores.append(rng.rand())
        scores = np.asarray(d_scores, np.float32)
        if len(scores) and rng.rand() < 0.5:
            scores = np.round(scores, 1)  # force score ties
        det_annos.append(dict(
            name=np.asarray(d_names),
            score=scores,
            boxes_lidar=(np.asarray(d_boxes, np.float32).reshape(-1, 7)
                         if d_boxes else np.zeros((0, 7), np.float32)),
        ))
        gt_annos.append(dict(
            name=np.asarray(g_names),
            gt_boxes_lidar=(np.asarray(g_boxes, np.float32).reshape(-1, 7)
                            if g_boxes else np.zeros((0, 7), np.float32)),
            difficulty=np.asarray(g_diff, np.int64),
            num_points_in_gt=np.asarray(g_npts, np.int64),
        ))
    return det_annos, gt_annos


@pytest.mark.parametrize("chunk", range(10))
def test_waymo_ap_matches_independent_oracle(chunk):
    """100 random scenes (10 per chunk): every AP/APH key must agree with
    the exhaustive-matching cutoff-sweep oracle to 1e-6."""
    classes = ("Vehicle", "Pedestrian")
    for s in range(10):
        rng = np.random.RandomState(1000 + chunk * 10 + s)
        det_annos, gt_annos = _rand_scene(rng)
        _, got = waymo_style_ap(det_annos, gt_annos, list(classes))
        want = oracle_waymo_ap(det_annos, gt_annos, classes)
        assert set(want).issubset(set(got))
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-6, (
                f"scene seed {1000 + chunk * 10 + s}: {k} "
                f"native={got[k]:.8f} oracle={v:.8f}")
