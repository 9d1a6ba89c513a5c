"""Native Waymo-style AP/APH (runtime/eval_utils.waymo_style_ap) against a
hand-computed fixture: L1/L2 difficulty handling, heading-weighted APH,
don't-care out-of-level matches, and range buckets."""

import numpy as np


def _fixture():
    gt = [dict(
        name=np.array(["Vehicle", "Vehicle"]),
        gt_boxes_lidar=np.array([
            [0.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],
            [40.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],
        ], np.float32),
        difficulty=np.array([0, 0]),
        num_points_in_gt=np.array([10, 3]),  # -> difficulty 1, 2
    )]
    det = [dict(
        name=np.array(["Vehicle", "Vehicle", "Vehicle"]),
        score=np.array([0.9, 0.8, 0.7], np.float32),
        boxes_lidar=np.array([
            [0.0, 0.0, 0.5, 4.0, 4.0, 1.5, np.pi / 2],  # TP on G0 (square box), heading off 90deg
            [40.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],       # TP on G1 (level-2 GT)
            [10.0, 10.0, 0.5, 4.0, 4.0, 1.5, 0.0],      # FP
        ], np.float32),
    )]
    return det, gt


def test_waymo_style_ap_fixture():
    from pcseqlearning_tpu.runtime.eval_utils import waymo_style_ap

    det, gt = _fixture()
    _, r = waymo_style_ap(det, gt, ["Vehicle"])
    # L1: G0 only; D1's match is a level-2 GT -> don't care; D0 TP, D2 FP
    assert abs(r["Vehicle/L1/AP"] - 1.0) < 1e-6
    assert abs(r["Vehicle/L1/APH"] - 0.5) < 1e-6  # 90deg heading error
    # L2: both GTs; D0 TP (h=0.5), D1 TP (h=1), D2 FP
    assert abs(r["Vehicle/L2/AP"] - 1.0) < 1e-6
    assert abs(r["Vehicle/L2/APH"] - 0.75) < 1e-6
    # range buckets
    assert abs(r["Vehicle/RANGE_[0,30)/AP"] - 1.0) < 1e-6
    assert abs(r["Vehicle/RANGE_[0,30)/APH"] - 0.5) < 1e-6
    assert abs(r["Vehicle/RANGE_[30,50)/AP"] - 1.0) < 1e-6
    assert abs(r["Vehicle/RANGE_[30,50)/APH"] - 1.0) < 1e-6
    assert r["Vehicle/RANGE_[50,INF)/AP"] == 0.0


def test_waymo_style_ap_envelope_integration_hand_derived():
    """Anchor the PR-curve math against a FULLY hand-derived case (the
    official TF estimator cannot run in this image — no waymo-open-dataset
    — so the anchor is the analytic output of the precision-envelope
    integration the official ComputeMeanAveragePrecision performs on a
    discrete PR curve; VERDICT r2 next #6, best available in-image).

    4 L1 GT vehicles, 5 detections by descending score:
      s=.9 TP (heading exact, h-weight 1)
      s=.8 FP
      s=.7 TP (heading off pi/2, h-weight 1 - (pi/2)/pi = 0.5)
      s=.6 TP (heading exact)
      s=.5 FP

    prefix: tp  fp  recall  prec   cum_h  prec_h
      1      1   0   .25    1.0    1.0    1.0
      2      1   1   .25    .5     1.0    .5
      3      2   1   .50    2/3    1.5    .5
      4      3   1   .75    .75    2.5    .625
      5      3   2   .75    .6     2.5    .5
    precision envelope (right-to-left max): [1, .75, .75, .75, .6]
    h envelope:                             [1, .625, .625, .625, .5]
    recall increases at prefixes 1, 3, 4 (dr = .25 each):
      AP  = .25*(1 + .75 + .75)      = 0.625
      APH = .25*(1 + .625 + .625)    = 0.5625
    """
    from pcseqlearning_tpu.runtime.eval_utils import waymo_style_ap

    gt = [dict(
        name=np.array(["Vehicle"] * 4),
        gt_boxes_lidar=np.array([
            [0.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],
            [10.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],
            [20.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],
            [0.0, 10.0, 0.5, 4.0, 4.0, 1.5, 0.0],
        ], np.float32),
        difficulty=np.array([1, 1, 1, 1]),
        num_points_in_gt=np.array([10, 10, 10, 10]),
    )]
    det = [dict(
        name=np.array(["Vehicle"] * 5),
        score=np.array([0.9, 0.8, 0.7, 0.6, 0.5], np.float32),
        boxes_lidar=np.array([
            [0.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],        # TP G0, exact heading
            [30.0, 30.0, 0.5, 4.0, 4.0, 1.5, 0.0],      # FP
            [10.0, 0.0, 0.5, 4.0, 4.0, 1.5, np.pi / 2], # TP G1, h-weight .5
            [20.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],       # TP G2, exact
            [40.0, 40.0, 0.5, 4.0, 4.0, 1.5, 0.0],      # FP
        ], np.float32),
    )]
    _, r = waymo_style_ap(det, gt, ["Vehicle"], with_range_breakdown=False)
    assert abs(r["Vehicle/L1/AP"] - 0.625) < 1e-6, r["Vehicle/L1/AP"]
    assert abs(r["Vehicle/L1/APH"] - 0.5625) < 1e-6, r["Vehicle/L1/APH"]


def test_waymo_style_ap_misses_and_thresholds():
    from pcseqlearning_tpu.runtime.eval_utils import waymo_style_ap

    gt = [dict(
        name=np.array(["Pedestrian"]),
        gt_boxes_lidar=np.array([[5.0, 0.0, 0.9, 0.9, 0.8, 1.8, 0.0]], np.float32),
        difficulty=np.array([1]),
    )]
    # offset detection: IoU below the 0.5 pedestrian threshold -> FP
    det = [dict(
        name=np.array(["Pedestrian"]),
        score=np.array([0.9], np.float32),
        boxes_lidar=np.array([[5.8, 0.0, 0.9, 0.9, 0.8, 1.8, 0.0]], np.float32),
    )]
    _, r = waymo_style_ap(det, gt, ["Pedestrian"], with_range_breakdown=False)
    assert r["Pedestrian/L1/AP"] == 0.0
    # exact hit -> AP 1
    det[0]["boxes_lidar"][0, 0] = 5.0
    _, r = waymo_style_ap(det, gt, ["Pedestrian"], with_range_breakdown=False)
    assert abs(r["Pedestrian/L1/AP"] - 1.0) < 1e-6
    assert abs(r["Pedestrian/L1/APH"] - 1.0) < 1e-6


def test_feature_leakage_eval():
    """waymo_fl_eval completes the reference's WIP intent: per-class,
    per-tracking-difficulty best-IoU stats. A perfect prediction set gives
    mean_iou ~1; an empty one gives 0."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from waymo_fl_eval import eval_feature_leakage

    gt_boxes = np.asarray(
        [[0, 0, 1, 4, 2, 1.6, 0.3], [10, 5, 1, 4.5, 2, 1.7, 1.2]], np.float32)
    gt = [dict(frame_id="f0", name=np.asarray(["Vehicle", "Vehicle"]),
               gt_boxes_lidar=gt_boxes,
               tracking_difficulty=np.asarray([0, 1]))]
    pred_perfect = [dict(frame_id="f0", name=np.asarray(["Vehicle", "Vehicle"]),
                         boxes_lidar=gt_boxes, score=np.ones(2))]
    stats = eval_feature_leakage(gt, pred_perfect, ["Vehicle"])
    assert stats["Vehicle"][0]["mean_iou"] > 0.99
    assert stats["Vehicle"][1]["recall_0_7"] == 1.0
    pred_empty = [dict(frame_id="f0", name=np.asarray([]),
                       boxes_lidar=np.zeros((0, 7), np.float32), score=np.zeros(0))]
    stats = eval_feature_leakage(gt, pred_empty, ["Vehicle"])
    assert stats["Vehicle"][0]["mean_iou"] == 0.0


def test_waymo_style_ap_score_ties_grouped():
    """Official-estimator tie semantics (VERDICT r3 next #3): the PR curve
    is formed at score CUTOFFS, so a TP and an FP sharing one score enter
    the same PR point. 2 L1 GTs; detections:
      s=.9 TP, s=.9 FP  (one tied group)
    cutoff <= .9: tp=1, fp=1 -> recall .5, precision .5 — the ONLY PR point.
      AP = .5 (dr from 0) * .5 (envelope precision) = 0.25
    A per-detection curve that orders the TP first would instead see an
    intermediate (r=.5, p=1) point and report AP = 0.5 — wrong.
    """
    from pcseqlearning_tpu.runtime.eval_utils import waymo_style_ap

    gt = [dict(
        name=np.array(["Vehicle", "Vehicle"]),
        gt_boxes_lidar=np.array([
            [0.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],
            [10.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],
        ], np.float32),
        difficulty=np.array([1, 1]),
    )]
    det = [dict(
        name=np.array(["Vehicle", "Vehicle"]),
        score=np.array([0.9, 0.9], np.float32),
        boxes_lidar=np.array([
            [0.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],     # TP G0
            [30.0, 30.0, 0.5, 4.0, 4.0, 1.5, 0.0],   # FP, same score
        ], np.float32),
    )]
    _, r = waymo_style_ap(det, gt, ["Vehicle"], with_range_breakdown=False)
    assert abs(r["Vehicle/L1/AP"] - 0.25) < 1e-9, r["Vehicle/L1/AP"]


def test_waymo_style_ap_heading_flip_and_wrap():
    """Heading cases hand-derived from the APH definition
    (h = max(0, 1 - |wrapped dh| / pi), waymo metrics spec):
      pi flip   -> |dh| wraps to pi   -> h = 0 (AP unaffected, APH loses it)
      2pi wrap  -> -pi vs +pi         -> |dh| wraps to 0 -> h = 1
    2 L1 GTs, 2 TPs (distinct scores, both exact position):
      s=.9 on G0 with heading +pi (GT 0)      -> h = 0
      s=.8 on G1 with heading -pi (GT +pi)    -> h = 1
    prefix: tp fp recall prec  cum_h prec_h
      1      1  0  .5    1     0     0
      2      2  0  1     1     1     .5
    envelopes: p=[1,1], ph=[.5,.5]; dr=.5 at both points
      AP = 1.0, APH = .5*.5 + .5*.5 = 0.5
    """
    from pcseqlearning_tpu.runtime.eval_utils import waymo_style_ap

    gt = [dict(
        name=np.array(["Vehicle", "Vehicle"]),
        gt_boxes_lidar=np.array([
            [0.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],
            [10.0, 0.0, 0.5, 4.0, 4.0, 1.5, np.pi],
        ], np.float32),
        difficulty=np.array([1, 1]),
    )]
    det = [dict(
        name=np.array(["Vehicle", "Vehicle"]),
        score=np.array([0.9, 0.8], np.float32),
        boxes_lidar=np.array([
            [0.0, 0.0, 0.5, 4.0, 4.0, 1.5, np.pi],    # TP, pi flip -> h 0
            [10.0, 0.0, 0.5, 4.0, 4.0, 1.5, -np.pi],  # TP, -pi == +pi -> h 1
        ], np.float32),
    )]
    _, r = waymo_style_ap(det, gt, ["Vehicle"], with_range_breakdown=False)
    assert abs(r["Vehicle/L1/AP"] - 1.0) < 1e-9
    assert abs(r["Vehicle/L1/APH"] - 0.5) < 1e-9, r["Vehicle/L1/APH"]


def test_waymo_style_ap_zero_point_gt_dropped():
    """GTs with num_points_in_gt == 0 are dropped entirely
    (waymo_eval.py:44-48 convention): a lone 0-point GT means num_gt = 0,
    and a detection on it is an unmatched FP -> AP 0 at both levels."""
    from pcseqlearning_tpu.runtime.eval_utils import waymo_style_ap

    gt = [dict(
        name=np.array(["Vehicle"]),
        gt_boxes_lidar=np.array([[0.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0]], np.float32),
        difficulty=np.array([0]),
        num_points_in_gt=np.array([0]),
    )]
    det = [dict(
        name=np.array(["Vehicle"]),
        score=np.array([0.9], np.float32),
        boxes_lidar=np.array([[0.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0]], np.float32),
    )]
    _, r = waymo_style_ap(det, gt, ["Vehicle"], with_range_breakdown=False)
    assert r["Vehicle/L1/AP"] == 0.0
    assert r["Vehicle/L2/AP"] == 0.0


def test_waymo_style_ap_l2_dont_care_not_fp():
    """A detection Hungarian-matched to a difficulty-2 GT is DON'T-CARE at
    LEVEL_1 (dropped, not an FP): with one L1 GT + one L2 GT and two exact
    detections, L1 sees 1 TP / 0 FP over 1 GT -> AP 1, even though the
    L2-matched detection has the higher score."""
    from pcseqlearning_tpu.runtime.eval_utils import waymo_style_ap

    gt = [dict(
        name=np.array(["Vehicle", "Vehicle"]),
        gt_boxes_lidar=np.array([
            [0.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],
            [10.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],
        ], np.float32),
        difficulty=np.array([1, 2]),
    )]
    det = [dict(
        name=np.array(["Vehicle", "Vehicle"]),
        score=np.array([0.95, 0.6], np.float32),
        boxes_lidar=np.array([
            [10.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],  # matches the L2 GT
            [0.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],   # matches the L1 GT
        ], np.float32),
    )]
    _, r = waymo_style_ap(det, gt, ["Vehicle"], with_range_breakdown=False)
    assert abs(r["Vehicle/L1/AP"] - 1.0) < 1e-9
    assert abs(r["Vehicle/L2/AP"] - 1.0) < 1e-9
