"""SimpleReg — the extraction-pipeline driver.

TPU-native rewrite of the reference driver
(/root/reference/pcdet/models/registration/simple_reg.py): splits a batch
into per-sequence dicts, optionally 8 cm grid-subsamples, formats GT
boxes/traces/velocities, and runs the preprocessor chain once per sequence
with per-sequence "already extracted -> skip" idempotency.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..ops import boxes as box_ops
from ..ops import grid_utils
from ..utils.edict import EDict


def build_preprocessors(model_cfg, runtime_cfg=None):
    from . import PREPROCESSORS

    mods = []
    for pcfg in model_cfg.get("PREPROCESSORS", []):
        mods.append(PREPROCESSORS[pcfg["NAME"]](pcfg, runtime_cfg))
    return mods


class SimpleReg:
    def __init__(self, model_cfg, runtime_cfg=None, dataset=None):
        self.model_cfg = EDict(model_cfg)
        self.dataset = dataset
        self.preprocessors = build_preprocessors(self.model_cfg, runtime_cfg)
        self.subsample = bool(self.model_cfg.get("SUBSAMPLE", False))
        self.training = True

    # ------------------------------------------------------------------
    def format_boxes(self, seq_dict):
        """Per-box frame ids, trace ids from object ids, velocity from
        corner diffs, moving flag (reference simple_reg.py:35-101)."""
        sweeps = np.asarray(seq_dict["point_sweep"]).reshape(-1)
        num_frames = int(sweeps.max()) - int(sweeps.min()) + 1

        attr = np.asarray(seq_dict["gt_box_attr"]).reshape(-1, 7)
        cls_label = np.asarray(seq_dict["gt_box_cls_label"]).reshape(-1)
        assert attr.shape[0] % num_frames == 0, "boxes must be padded per frame"
        per_frame = attr.shape[0] // num_frames
        frame_id = np.repeat(np.arange(num_frames), per_frame)

        boxes = EDict(
            gt_box_attr=attr,
            gt_box_cls_label=cls_label,
            gt_box_frame=frame_id,
        )
        non_empty = np.linalg.norm(attr[:, 3:6], axis=-1) > 1e-5
        for k in boxes:
            boxes[k] = boxes[k][non_empty]
        obj_ids = np.asarray(seq_dict["obj_ids"]).reshape(-1)[non_empty].astype(str)
        track_label = np.unique(obj_ids, return_inverse=True)[1]
        boxes.gt_box_track_label = track_label

        # per-trace velocity: mean corner displacement between consecutive
        # frames of the trace (simple_reg.py:81-95)
        velo = np.zeros(boxes.gt_box_attr.shape[0], np.float32)
        for t in np.unique(track_label):
            tm = track_label == t
            tf = boxes.gt_box_frame[tm]
            order = np.argsort(tf)
            tattr = boxes.gt_box_attr[tm][order]
            corners = np.asarray(box_ops.boxes_to_corners_3d(jnp.asarray(tattr.astype(np.float32))))
            tv = np.zeros(len(tattr), np.float32)
            if len(tattr) > 1:
                tv[1:] = np.linalg.norm(corners[1:] - corners[:-1], axis=-1).mean(-1)
                tv[0] = tv[1]
            velo[np.nonzero(tm)[0][order]] = tv
        boxes.gt_box_velo = velo
        boxes.moving = velo > 5e-2

        seq_dict.update(boxes)
        seq_dict["obj_ids"] = obj_ids
        return seq_dict

    # ------------------------------------------------------------------
    def process_sequence(self, seq_dict):
        for module in self.preprocessors:
            seq_dict = module(seq_dict)
        return seq_dict

    def forward(self, batch_dict):
        batch_size = int(batch_dict["batch_size"])
        point_bxyz = np.asarray(batch_dict["point_bxyz"])
        for b in range(batch_size):
            m = point_bxyz[:, 0].round().astype(int) == b
            seq_dict = EDict()
            for key in ["point_feat", "segmentation_label", "instance_label", "is_foreground", "point_sweep"]:
                if key in batch_dict:
                    seq_dict[key] = np.asarray(batch_dict[key])[m]
            sweep = np.asarray(seq_dict["point_sweep"]).reshape(-1, 1).astype(np.float32)
            seq_dict["point_fxyz"] = np.concatenate([sweep, point_bxyz[m][:, 1:4]], axis=1)

            if self.subsample:
                rep, valid, _, _ = grid_utils.grid_subsample_indices(
                    jnp.asarray(seq_dict["point_fxyz"].astype(np.float32)), [0.08, 0.08, 0.08]
                )
                idx = np.asarray(rep)[np.asarray(valid)]
                print(f"num points={len(idx)}")
                for key in ["point_fxyz", "point_feat", "segmentation_label", "instance_label", "is_foreground", "point_sweep"]:
                    if key in seq_dict:
                        seq_dict[key] = np.asarray(seq_dict[key])[idx]

            for key in ["gt_box_cls_label", "gt_box_attr", "augmented", "num_points_in_gt",
                        "gt_boxes", "obj_ids", "frame_id", "pose", "top_lidar_origin", "num_sweeps"]:
                if key in batch_dict:
                    v = batch_dict[key]
                    seq_dict[key] = v[b] if isinstance(v, (list, np.ndarray)) and len(v) == batch_size else v

            seq_dict = self.format_boxes(seq_dict)

            sequence_id = str(seq_dict.get("frame_id", ["seq_000"])[0] if isinstance(seq_dict.get("frame_id"), (list, np.ndarray)) else seq_dict.get("frame_id", "seq_000"))
            seq_dict["frame_id"] = sequence_id
            save_dir = self.model_cfg.get("SAVE_DIR", None)
            done = save_dir and os.path.exists(os.path.join(save_dir, sequence_id[:-4], "all.pkl"))
            if not done:
                print(f"Working on {sequence_id}")
                self.process_sequence(seq_dict)
            else:
                print(f"Skipping {sequence_id}")
            batch_dict[f"seq_{b}"] = seq_dict

        if self.training:
            return dict(loss=0.0), {}, {}
        return {}, None

    __call__ = forward
