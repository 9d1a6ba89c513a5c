"""Waymo sequence dataset — npy-based, TF-free at runtime.

Rewrite of /root/reference/pcdet/datasets/waymo/waymo_dataset.py: per-sequence
info pkls feed an (sequence, sample) pool; ``get_lidar`` loads ``NNNN.npy``
with the reference's channel normalization (waymo_dataset.py:334-343:
tanh(intensity), range/75, rimage_w*2650, rimage_h*64); seg labels come from
``NNNN_seg.npy`` / ``_propseg.npy``; multi-sweep assembly ego-pose-aligns all
frames to the last one, estimates per-object global transforms by box-corner
Procrustes, optionally synchronizes moving points, attaches the sweep id as a
point channel, and pads objects per sweep (502-682).

Offline extraction from TFRecords (waymo_utils.process_single_sequence)
requires the `waymo-open-dataset` TF reader and lives in tools/; this module
only consumes its npy/pkl outputs.
"""

from __future__ import annotations

import copy
import os
import pickle
from pathlib import Path

import numpy as np

from ..ops import boxes as box_ops
from ..utils.edict import EDict
from .dataset import DatasetTemplate


def _boxes_to_corners_np(boxes):
    import jax.numpy as jnp

    if len(boxes) == 0:
        return np.zeros((0, 8, 3), np.float32)
    return np.asarray(box_ops.boxes_to_corners_3d(jnp.asarray(boxes[:, :7].astype(np.float32))))


class WaymoDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None, logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names, training=training,
                         root_path=root_path, logger=logger)
        cfg = self.dataset_cfg
        self.data_path = Path(root_path or cfg.get("DATA_PATH", ".")) / cfg.get("PROCESSED_DATA_TAG", "waymo_processed_data")
        self.split = cfg.get("DATA_SPLIT", {}).get("train" if training else "test", "train")
        self.num_sweeps = int(cfg.get("NUM_SWEEPS", 1))
        self.sweep_dir = int(cfg.get("SWEEP_DIR", -1))
        self.with_time_feat = bool(cfg.get("WITH_TIME_FEAT", False))
        self.sync_moving_points = bool(cfg.get("SYNC_MOVING_POINTS", False))
        self.load_seg = bool(cfg.get("LOAD_SEG", False))
        self.sampled_interval = int(cfg.get("SAMPLED_INTERVAL", {}).get("train" if training else "test", 1)) if isinstance(cfg.get("SAMPLED_INTERVAL", 1), dict) else int(cfg.get("SAMPLED_INTERVAL", 1))

        self.infos = []
        self.info_pool = {}
        self.include_waymo_data()

    # ------------------------------------------------------------------
    def include_waymo_data(self):
        """Load per-sequence info pkls (reference include_waymo_data,
        waymo_dataset.py:181-245)."""
        split_file = self.dataset_cfg.get("SPLIT_DIR", None)
        seq_list = []
        if split_file and os.path.exists(split_file):
            with open(split_file) as f:
                seq_list = [x.strip().split(".")[0] for x in f if x.strip()]
        elif self.data_path.exists():
            seq_list = sorted(
                d.name for d in self.data_path.iterdir() if d.is_dir()
            )
        for seq in seq_list:
            pkl = self.data_path / seq / f"{seq}.pkl"
            if not pkl.exists():
                continue
            with open(pkl, "rb") as f:
                infos = pickle.load(f)
            self.infos.extend(infos[:: self.sampled_interval])
        for info in self.infos:
            pc = info["point_cloud"]
            self.info_pool[(pc["lidar_sequence"], pc["sample_idx"])] = info

        # sequence mode: one item per sequence (NUM_SWEEPS covers the whole
        # sequence, all_sequence.yaml)
        if self.num_sweeps > 1 and self.dataset_cfg.get("SEQUENCE_MODE", self.num_sweeps >= 100):
            starts = {}
            for info in self.infos:
                pc = info["point_cloud"]
                seq = pc["lidar_sequence"]
                if seq not in starts or pc["sample_idx"] > starts[seq]["point_cloud"]["sample_idx"]:
                    starts[seq] = info
            self.infos = [starts[s] for s in sorted(starts)]

    def __len__(self):
        return len(self.infos)

    # ------------------------------------------------------------------
    def get_lidar(self, sequence_name, sample_idx):
        # in-process decoded-frame cache — the role of the reference's
        # SharedArray /dev/shm cache (waymo_dataset.py:247-294); our input
        # pipeline is in-process (no fork/pickle), so a bounded dict
        # suffices
        key = (sequence_name, int(sample_idx))
        cache = getattr(self, "_frame_cache", None)
        if cache is None:
            cache = self._frame_cache = {}
        if key in cache:
            return cache[key].copy()
        lidar_file = self.data_path / sequence_name / ("%04d.npy" % sample_idx)
        pts = np.load(lidar_file).astype(np.float32)
        pts[:, 3] = np.tanh(pts[:, 3])
        if pts.shape[1] > 5:
            pts[:, 5] /= 75.0
        if pts.shape[1] > 7:
            pts[:, 7] *= 64
            pts[:, 6] *= 2650
        if bool(self.dataset_cfg.get("USE_SHARED_MEMORY", False)):
            if len(cache) > int(self.dataset_cfg.get("SHARED_MEMORY_CACHE_SIZE", 512)):
                cache.pop(next(iter(cache)))
            cache[key] = pts.copy()
        return pts

    def spherical_resampling(self, point_wise, config=None):
        """Densify each lidar scanline by interpolating along azimuth gaps
        (reference waymo_dataset.py:115-179): per range-image row, each
        point connects to its nearest smaller-azimuth neighbor within 0.3 m
        and new points are linearly interpolated every ~0.1 m along the
        edge; auxiliary per-point keys propagate from the 1-NN original."""
        from sklearn.neighbors import NearestNeighbors

        from ..utils.polar_utils import cartesian_to_spherical

        config = config or {}
        point_xyz = point_wise["point_xyz"]
        point_feat = point_wise["point_feat"]
        if "point_rimage_h" in point_wise:
            rim_h = np.round(np.asarray(point_wise["point_rimage_h"])).astype(np.int64)
        elif point_feat.shape[1] > 4:
            rim_h = np.round(point_feat[:, 4]).astype(np.int64)
        else:
            return point_wise
        new_xyz, new_feat = [point_xyz], [point_feat]
        for h in np.unique(rim_h):
            rows = np.nonzero(rim_h == h)[0]
            if len(rows) < 10:
                continue
            p = point_xyz[rows]
            f = point_feat[rows]
            azimuth = np.asarray(cartesian_to_spherical(p))[:, 2]
            tree = NearestNeighbors(n_neighbors=min(10, len(rows))).fit(p)
            dists, e1 = tree.kneighbors(p)
            e0 = np.arange(len(rows))[:, None]
            az_diff = azimuth[e0] - azimuth[e1]
            az_diff[az_diff < 1e-6] = 1e10
            nn_index = az_diff.argmin(axis=-1)
            e0 = e0[:, 0]
            d = dists[(e0, nn_index)]
            e1 = e1[(e0, nn_index)]
            keep = d < 0.3
            e0, e1, d = e0[keep], e1[keep], d[keep]
            if len(e0) == 0:
                continue
            n_samp = np.ceil((d + 1e-6) / 0.1) + 1
            for s in range(1, int(n_samp.max())):
                em = s <= n_samp - 1
                ratio = s / (n_samp - 1)
                em = em & (ratio > 1e-6) & (ratio < 1 - 1e-6)
                if em.any():
                    r = ratio[em, None]
                    new_xyz.append(p[e0[em]] * r + p[e1[em]] * (1.0 - r))
                    new_feat.append(f[e0[em]] * r + f[e1[em]] * (1.0 - r))
        out = dict(
            point_xyz=np.concatenate(new_xyz).astype(np.float32),
            point_feat=np.concatenate(new_feat).astype(np.float32),
        )
        tree = NearestNeighbors(n_neighbors=1).fit(point_xyz)
        _, idx = tree.kneighbors(out["point_xyz"])
        idx = idx[:, 0]
        for key in point_wise:
            if key not in out:
                out[key] = np.asarray(point_wise[key])[idx]
        return EDict(out)

    def get_seg_label(self, sequence_name, sample_idx):
        seg_file = self.data_path / sequence_name / ("%04d_seg.npy" % sample_idx)
        if not seg_file.exists():
            seg_file = self.data_path / sequence_name / ("%04d_propseg.npy" % sample_idx)
        if not seg_file.exists():
            return None
        return np.load(seg_file)

    def load_frame(self, info):
        """One frame as point/object/scene dicts (reference load_data)."""
        pc = info["point_cloud"]
        seq, idx = pc["lidar_sequence"], pc["sample_idx"]
        points = self.get_lidar(seq, idx)
        point_wise = EDict(
            point_xyz=points[:, :3],
            point_feat=points[:, 3:],
        )
        if self.load_seg:
            seg = self.get_seg_label(seq, idx)
            if seg is not None:
                point_wise.instance_label = seg[:, 0].astype(np.int64)
                point_wise.segmentation_label = seg[:, 1].astype(np.int64)
        if bool(self.dataset_cfg.get("SPHERICAL_RESAMPLING", False)):
            point_wise = self.spherical_resampling(point_wise)
        annos = info.get("annos", {})
        object_wise = EDict(
            gt_box_attr=np.asarray(annos.get("gt_boxes_lidar", np.zeros((0, 7)))).astype(np.float32).reshape(-1, 7),
            gt_names=np.asarray(annos.get("name", [])).astype(str),
            obj_ids=np.asarray(annos.get("obj_ids", [])).astype(str),
            num_points_in_gt=np.asarray(annos.get("num_points_in_gt", np.zeros(0))).astype(np.int64),
        )
        scene_wise = EDict(
            frame_id=info.get("frame_id", f"{seq}_{idx:03d}"),
            pose=np.asarray(info.get("pose", np.eye(4))).reshape(4, 4),
        )
        if "top_lidar_pose" in info:
            scene_wise.top_lidar_origin = np.asarray(info["top_lidar_pose"]).reshape(4, 4)[:3, 3]
        return EDict(point_wise=point_wise, object_wise=object_wise, scene_wise=scene_wise)

    # ------------------------------------------------------------------
    def assemble_sweeps(self, index):
        """Multi-sweep assembly (reference __getitem__, 502-682)."""
        info = copy.deepcopy(self.infos[index])
        first = self.load_frame(info)
        cur_idx = info["point_cloud"]["sample_idx"]
        seq = info["point_cloud"]["lidar_sequence"]
        data_dicts = [first]

        if self.num_sweeps > 1:
            for cur in range(cur_idx + self.sweep_dir, cur_idx + self.sweep_dir * self.num_sweeps, self.sweep_dir):
                key = (seq, cur)
                if key not in self.info_pool:
                    continue
                dd = self.load_frame(self.info_pool[key])
                if self.sweep_dir == -1:
                    data_dicts = [dd] + data_dicts
                else:
                    data_dicts = data_dicts + [dd]

        # per-object global transforms from box-corner Procrustes vs the
        # anchor frame (549-564)
        anchor = data_dicts[-1] if self.sweep_dir == -1 else data_dicts[0]
        a_corners = _boxes_to_corners_np(anchor.object_wise.gt_box_attr)
        obj2idx = {o: i for i, o in enumerate(anchor.object_wise.obj_ids.tolist())}

        T0 = anchor.scene_wise.pose
        T0_inv = np.linalg.inv(T0)

        max_objs = 0
        num_sweeps = len(data_dicts)
        for dd in data_dicts:
            T = T0_inv @ dd.scene_wise.pose
            pw = dd.point_wise
            pw.point_xyz = (pw.point_xyz @ T[:3, :3].T + T[:3, 3]).astype(np.float32)

            # sweep id channel (620-630)
            fid = int(str(dd.scene_wise.frame_id)[-3:])
            n = len(pw.point_xyz)
            pw.point_sweep = np.full((n, 1), fid, np.int32)
            if self.num_sweeps > 1 and self.with_time_feat:
                pw.point_feat = np.concatenate(
                    [pw.point_sweep.astype(np.float32) / max(num_sweeps - 1, 1), pw.point_feat], axis=-1
                )

            boxes = dd.object_wise.gt_box_attr
            if len(boxes):
                corners = _boxes_to_corners_np(boxes)
                corners = (corners @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
                boxes[:, :3] = boxes[:, :3] @ T[:3, :3].T + T[:3, 3]
                # heading re-rotation through T (643-648)
                theta = boxes[:, 6]
                heading = np.stack([np.cos(theta), np.sin(theta), np.zeros_like(theta)], -1)
                heading = heading @ T[:3, :3].T
                nrm = np.linalg.norm(heading[:, :2], axis=-1, keepdims=True)
                heading[:, :2] /= np.maximum(nrm, 1e-6)
                boxes[:, 6] = np.arctan2(heading[:, 1], heading[:, 0])
                dd.object_wise.gt_box_corners_3d = corners.reshape(-1, 24)
            else:
                dd.object_wise.gt_box_corners_3d = np.zeros((0, 24), np.float32)
            dd.object_wise.gt_box_attr = boxes
            if "top_lidar_origin" in dd.scene_wise:
                o = dd.scene_wise.top_lidar_origin
                dd.scene_wise.top_lidar_origin = o @ T[:3, :3].T + T[:3, 3]
            max_objs = max(max_objs, len(boxes))

        # pad objects per sweep and flatten (object padding, 664-670)
        max_objs = max(max_objs, 1)
        obj_keys = ["gt_box_attr", "gt_names", "obj_ids", "num_points_in_gt", "gt_box_corners_3d"]
        merged = EDict(
            point_wise=EDict(), object_wise=EDict(), scene_wise=EDict()
        )
        for k in data_dicts[0].point_wise:
            merged.point_wise[k] = np.concatenate([dd.point_wise[k] for dd in data_dicts], axis=0)
        for k in obj_keys:
            padded = []
            for dd in data_dicts:
                v = dd.object_wise.get(k)
                if v is None:
                    continue
                v = np.asarray(v)
                pad_n = max_objs - v.shape[0]
                if pad_n > 0:
                    if v.dtype.kind in "US":
                        pad = np.full((pad_n,), "", v.dtype)
                    else:
                        pad = np.zeros((pad_n,) + v.shape[1:], v.dtype)
                    v = np.concatenate([v, pad], axis=0)
                padded.append(v)
            if padded:
                merged.object_wise[k] = np.concatenate(padded, axis=0)
        merged.scene_wise.frame_id = anchor.scene_wise.frame_id
        merged.scene_wise.pose = np.stack([dd.scene_wise.pose for dd in data_dicts])
        merged.scene_wise.num_sweeps = num_sweeps
        if "top_lidar_origin" in anchor.scene_wise:
            merged.scene_wise.top_lidar_origin = np.stack(
                [dd.scene_wise.get("top_lidar_origin", np.zeros(3)) for dd in data_dicts]
            )
        return merged

    def __getitem__(self, index, _mix3d_inner=False):
        merged = self.assemble_sweeps(index)
        cls_map = {n: i + 1 for i, n in enumerate(self.class_names)}
        names = merged.object_wise.get("gt_names", np.zeros(0, str))
        cls_label = np.asarray([cls_map.get(n, 0) for n in names], np.int64)
        data_dict = {
            "points": np.concatenate(
                [merged.point_wise.point_xyz, merged.point_wise.point_feat], axis=1
            ).astype(np.float32),
            "point_sweep": merged.point_wise.point_sweep.reshape(-1),
            "frame_id": str(merged.scene_wise.frame_id),
            "pose": merged.scene_wise.pose,
            "num_sweeps": merged.scene_wise.num_sweeps,
            "gt_box_attr": merged.object_wise.get("gt_box_attr", np.zeros((0, 7), np.float32)),
            "gt_box_cls_label": cls_label,
            "obj_ids": merged.object_wise.get("obj_ids", np.zeros(0, str)),
            "num_points_in_gt": merged.object_wise.get("num_points_in_gt", np.zeros(0, np.int64)),
            "gt_box_corners_3d": merged.object_wise.get("gt_box_corners_3d", np.zeros((0, 24), np.float32)),
            "augmented": np.zeros(len(names), bool),
            "gt_boxes": np.concatenate(
                [
                    merged.object_wise.get("gt_box_attr", np.zeros((0, 7), np.float32)),
                    cls_label[:, None].astype(np.float32),
                ],
                axis=1,
            ) if len(names) else np.zeros((0, 8), np.float32),
            "gt_names": names,
        }
        for k in ["segmentation_label", "instance_label"]:
            if k in merged.point_wise:
                data_dict[k] = merged.point_wise[k]
        data_dict = self.prepare_data(data_dict)
        # mix3d scene mixing (reference waymo_dataset.py:671-678)
        mix_cfg = self.dataset_cfg.get("MIX3D", None)
        if mix_cfg and self.training and not _mix3d_inner:
            if np.random.rand() < float(mix_cfg.get("PROB", 1.0)):
                other = self.__getitem__(np.random.randint(len(self)), _mix3d_inner=True)
                for key in ["points", "point_sweep", "segmentation_label", "instance_label"]:
                    if key in data_dict and key in other:
                        data_dict[key] = np.concatenate([data_dict[key], other[key]], axis=0)
                for key in ["gt_boxes", "gt_names"]:
                    if key in data_dict and key in other and len(other[key]):
                        data_dict[key] = np.concatenate([data_dict[key], other[key]], axis=0)
        return data_dict

    # ------------------------------------------------------------------
    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names, output_path=None):
        """Format predictions for evaluation (reference 684-790)."""
        annos = []
        for i, pd in enumerate(pred_dicts):
            boxes = np.asarray(pd["pred_boxes"])
            scores = np.asarray(pd["pred_scores"])
            labels = np.asarray(pd["pred_labels"]).astype(int)
            annos.append(
                dict(
                    frame_id=batch_dict["frame_id"][i],
                    boxes_lidar=boxes,
                    score=scores,
                    name=np.asarray([class_names[max(l - 1, 0)] for l in labels]),
                    pred_labels=labels,
                )
            )
        return annos

    def evaluation(self, det_annos, class_names, eval_metric="waymo", **kwargs):
        """Detection metric dispatch (reference waymo_dataset.py:785):
        'waymo' -> the native TF-free Waymo-style AP/APH (L1/L2, Hungarian,
        range buckets); 'waymo_ii' adds the interaction-index breakdown;
        'simple' -> greedy-matching AP. The official TF estimator remains
        an optional host dependency as in the reference."""
        gt_annos = [copy.deepcopy(info["annos"]) for info in self.infos[: len(det_annos)]]
        if eval_metric == "simple":
            from ..runtime.eval_utils import simple_detection_eval

            return simple_detection_eval(det_annos, gt_annos, class_names)
        if eval_metric == "waymo_ii":
            from .waymo_eval_ii import ap_by_interaction_index

            return ap_by_interaction_index(det_annos, gt_annos, class_names)
        from ..runtime.eval_utils import waymo_style_ap

        return waymo_style_ap(det_annos, gt_annos, class_names)
