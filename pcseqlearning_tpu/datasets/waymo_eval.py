"""Official Waymo detection metrics wrapper (TF-gated) + native fallback.

Reference: /root/reference/pcdet/datasets/waymo/waymo_eval.py:22-230
(OpenPCDetWaymoDetectionMetricsEstimator — a TF graph over
waymo_open_dataset.metrics). Same stance here: TF + waymo-open-dataset are
optional host-side deps used only at eval time; without them the native
AP path (runtime/eval_utils.py) serves.
"""

from __future__ import annotations

import numpy as np

CLASS_TO_WAYMO_TYPE = {"Vehicle": 1, "Pedestrian": 2, "Sign": 3, "Cyclist": 4}


class WaymoDetectionMetricsEstimator:
    def __init__(self):
        try:
            import tensorflow as tf
            from waymo_open_dataset.metrics.python import detection_metrics
            from waymo_open_dataset.protos import metrics_pb2

            self._tf = tf
            self._detection_metrics = detection_metrics
            self._metrics_pb2 = metrics_pb2
            self.available = True
        except ImportError:
            self.available = False

    def _build_config(self):
        from waymo_open_dataset.protos import metrics_pb2
        import google.protobuf.text_format as text_format

        config = metrics_pb2.Config()
        config_text = """
        breakdown_generator_ids: OBJECT_TYPE
        difficulties { levels: 1 levels: 2 }
        matcher_type: TYPE_HUNGARIAN
        iou_thresholds: 0.0
        iou_thresholds: 0.7
        iou_thresholds: 0.5
        iou_thresholds: 0.5
        iou_thresholds: 0.5
        box_type: TYPE_3D
        """
        for x in range(0, 100):
            config.score_cutoffs.append(x * 0.01)
        config.score_cutoffs.append(1.0)
        text_format.Merge(config_text, config)
        return config

    def evaluate(self, det_annos, gt_annos, class_names, distance_thresh=1000):
        """Returns (result_str, result_dict) of mAP/mAPH per class/level."""
        if not self.available:
            from ..runtime.eval_utils import simple_detection_eval

            return simple_detection_eval(det_annos, gt_annos, class_names)

        tf = self._tf
        pd_frameid, pd_boxes, pd_type, pd_score = [], [], [], []
        gt_frameid, gt_boxes, gt_type, gt_diff = [], [], [], []
        for fid, (det, gt) in enumerate(zip(det_annos, gt_annos)):
            for b, name, score in zip(det["boxes_lidar"], det["name"], det["score"]):
                if name not in CLASS_TO_WAYMO_TYPE:
                    continue
                pd_frameid.append(fid)
                pd_boxes.append(b[:7])
                pd_type.append(CLASS_TO_WAYMO_TYPE[name])
                pd_score.append(score)
            names = np.asarray(gt.get("name", []))
            boxes = np.asarray(gt.get("gt_boxes_lidar", np.zeros((0, 7))))
            diffs = np.asarray(gt.get("difficulty", np.ones(len(names))))
            npts = np.asarray(gt.get("num_points_in_gt", np.full(len(names), 10)))
            for b, name, d, n in zip(boxes, names, diffs, npts):
                if name not in CLASS_TO_WAYMO_TYPE or n <= 0:
                    continue
                dist = float(np.linalg.norm(b[:2]))
                if dist > distance_thresh:
                    continue
                gt_frameid.append(fid)
                gt_boxes.append(b[:7])
                gt_type.append(CLASS_TO_WAYMO_TYPE[name])
                gt_diff.append(2 if (d == 2 or n <= 5) else 1)

        config = self._build_config()
        metrics = self._detection_metrics.get_detection_metric_ops(
            config,
            prediction_frame_id=tf.constant(pd_frameid, tf.int64),
            prediction_bbox=tf.constant(np.asarray(pd_boxes, np.float32).reshape(-1, 7)),
            prediction_type=tf.constant(pd_type, tf.uint8),
            prediction_score=tf.constant(pd_score, tf.float32),
            prediction_overlap_nlz=tf.zeros(len(pd_score), tf.bool),
            ground_truth_frame_id=tf.constant(gt_frameid, tf.int64),
            ground_truth_bbox=tf.constant(np.asarray(gt_boxes, np.float32).reshape(-1, 7)),
            ground_truth_type=tf.constant(gt_type, tf.uint8),
            ground_truth_difficulty=tf.constant(gt_diff, tf.uint8),
        )
        results = {k: float(v[0].numpy()) if hasattr(v[0], "numpy") else float(v[0]) for k, v in metrics.items()}
        result_str = "\n".join(f"{k}: {v:.4f}" for k, v in sorted(results.items()))
        return result_str, results
