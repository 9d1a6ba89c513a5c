"""Point feature encoding + config-driven data processing queue.

Rewrites of /root/reference/pcdet/datasets/processor/:
PointFeatureEncoder (point_feature_encoder.py) and DataProcessor
(data_processor.py:71-516) — the processor queue dispatches on cfg NAME and
runs on host numpy (CPU input pipeline; jit transforms consume the result).
"""

from __future__ import annotations

import numpy as np

from ..utils.edict import EDict


class PointFeatureEncoder:
    """Selects/normalizes feature channels per POINT_FEATURE_ENCODING cfg
    (reference point_feature_encoder.py). src list names channels of the raw
    point array; used list selects the encoded output (x, y, z first)."""

    def __init__(self, config):
        self.config = EDict(config)
        self.src_list = list(self.config.get("src_feature_list", ["x", "y", "z", "intensity"]))
        self.used_list = list(self.config.get("used_feature_list", ["x", "y", "z", "intensity"]))

    @property
    def num_point_features(self):
        return len(self.used_list)

    def __call__(self, data_dict):
        pts = data_dict["points"]
        idx = [self.src_list.index(f) for f in self.used_list]
        data_dict["points"] = pts[:, idx]
        data_dict["use_lead_xyz"] = True
        return data_dict


class DataProcessor:
    """Processor queue (reference data_processor.py:71-87): each cfg entry's
    NAME selects a method; the method returns a partial-applied callable."""

    def __init__(self, processor_configs, point_cloud_range, training, num_point_features=4):
        self.point_cloud_range = np.asarray(point_cloud_range, np.float32)
        self.training = training
        self.num_point_features = num_point_features
        self.grid_size = None
        self.voxel_size = None
        self.queue = []
        for cfg in processor_configs:
            cfg = EDict(cfg)
            self.queue.append(getattr(self, cfg.NAME)(config=cfg))

    # -- processors -----------------------------------------------------
    def mask_points_and_boxes_outside_range(self, data_dict=None, config=None):
        if data_dict is None:
            return lambda d: self.mask_points_and_boxes_outside_range(d, config)
        pts = data_dict["points"]
        pcr = self.point_cloud_range
        mask = np.all((pts[:, 0:3] >= pcr[0:3]) & (pts[:, 0:3] <= pcr[3:6]), axis=1)
        for key in ["points", "point_sweep", "segmentation_label", "instance_label"]:
            if key in data_dict and data_dict[key] is not None and len(data_dict[key]) == len(mask):
                data_dict[key] = data_dict[key][mask]
        if config.get("REMOVE_OUTSIDE_BOXES", True) and self.training and "gt_boxes" in data_dict:
            gb = data_dict["gt_boxes"]
            bm = np.all((gb[:, 0:3] >= pcr[0:3] - 1) & (gb[:, 0:3] <= pcr[3:6] + 1), axis=1)
            data_dict["gt_boxes"] = gb[bm]
            for k in ["gt_names"]:
                if k in data_dict:
                    data_dict[k] = np.asarray(data_dict[k])[bm]
        return data_dict

    def shuffle_points(self, data_dict=None, config=None):
        if data_dict is None:
            return lambda d: self.shuffle_points(d, config)
        if config.get("SHUFFLE_ENABLED", {}).get("train" if self.training else "test", self.training):
            n = len(data_dict["points"])
            perm = np.random.permutation(n)
            for key in ["points", "point_sweep", "segmentation_label", "instance_label"]:
                if key in data_dict and data_dict[key] is not None and len(data_dict[key]) == n:
                    data_dict[key] = data_dict[key][perm]
        return data_dict

    def limit_num_points(self, data_dict=None, config=None):
        """UNIFORM subsample to MAX_NUM_POINTS (reference :120-151)."""
        if data_dict is None:
            return lambda d: self.limit_num_points(d, config)
        max_n = int(config["MAX_NUM_POINTS"])
        n = len(data_dict["points"])
        if n > max_n:
            sel = np.random.choice(n, max_n, replace=False)
            for key in ["points", "point_sweep", "segmentation_label", "instance_label"]:
                if key in data_dict and data_dict[key] is not None and len(data_dict[key]) == n:
                    data_dict[key] = data_dict[key][sel]
        return data_dict

    def transform_points_to_voxels(self, data_dict=None, config=None):
        """DRY mode records the grid geometry only (reference :163-209 —
        dynamic VFEs voxelize on device, so host voxelization is skipped
        whenever DRY: True, which is what the shipped Waymo cfgs use)."""
        if data_dict is None:
            vs = np.asarray(config["VOXEL_SIZE"], np.float32)
            self.voxel_size = vs
            grid = (self.point_cloud_range[3:6] - self.point_cloud_range[0:3]) / vs
            self.grid_size = np.round(grid).astype(np.int64)
            return lambda d: self.transform_points_to_voxels(d, config)
        data_dict["voxel_size"] = self.voxel_size
        data_dict["grid_size"] = self.grid_size
        return data_dict

    def propagate_box_label_to_points(self, data_dict=None, config=None):
        if data_dict is None:
            return lambda d: self.propagate_box_label_to_points(d, config)
        import jax.numpy as jnp

        from ..ops.boxes import points_in_boxes

        if "gt_boxes" in data_dict and len(data_dict["gt_boxes"]):
            bp = np.asarray(points_in_boxes(
                jnp.asarray(data_dict["points"][:, :3].astype(np.float32)),
                jnp.asarray(data_dict["gt_boxes"][:, :7].astype(np.float32)),
            ))
            data_dict["point_box_label"] = np.where(bp.any(0), bp.argmax(0), -1)
        else:
            data_dict["point_box_label"] = np.full(len(data_dict["points"]), -1)
        return data_dict

    def attach_spherical_feature(self, data_dict=None, config=None):
        """Append (r, theta, phi) polar coords (reference :various)."""
        if data_dict is None:
            return lambda d: self.attach_spherical_feature(d, config)
        xyz = data_dict["points"][:, :3]
        r = np.linalg.norm(xyz, axis=1)
        theta = np.arccos(np.clip(xyz[:, 2] / np.maximum(r, 1e-6), -1, 1))
        phi = np.arctan2(xyz[:, 1], xyz[:, 0])
        data_dict["points"] = np.concatenate(
            [data_dict["points"], np.stack([r, theta, phi], 1).astype(np.float32)], axis=1
        )
        return data_dict

    def point_centering(self, data_dict=None, config=None):
        if data_dict is None:
            return lambda d: self.point_centering(d, config)
        center = data_dict["points"][:, :3].mean(0)
        data_dict["points"][:, :3] -= center
        data_dict["center_offset"] = center
        return data_dict

    def remove_seg_class(self, data_dict=None, config=None):
        if data_dict is None:
            return lambda d: self.remove_seg_class(d, config)
        if "segmentation_label" in data_dict:
            seg = data_dict["segmentation_label"]
            keep = ~np.isin(seg, np.asarray(config["CLASS_IDS"]))
            n = len(seg)
            for key in ["points", "point_sweep", "segmentation_label", "instance_label"]:
                if key in data_dict and data_dict[key] is not None and len(data_dict[key]) == n:
                    data_dict[key] = data_dict[key][keep]
        return data_dict

    def shift_to_top_lidar_origin(self, data_dict=None, config=None):
        """Re-origin points at the top lidar (reference
        data_processor.py:307-317)."""
        if data_dict is None:
            return lambda d: self.shift_to_top_lidar_origin(d, config)
        origin = np.asarray(data_dict.get("top_lidar_origin", np.zeros(3)), np.float32)
        data_dict["points"][:, :3] -= origin
        data_dict["top_lidar_origin"] = np.zeros_like(origin)
        return data_dict

    def estimate_velocity(self, data_dict=None, config=None):
        """Keep only object traces observed from sweep 0 (the reference's
        estimate_velocity gates traces whose earliest obj_sweep != 0,
        data_processor.py:367-393)."""
        if data_dict is None:
            return lambda d: self.estimate_velocity(d, config)
        if "obj_ids" not in data_dict or "obj_sweep" not in data_dict:
            return data_dict
        obj_ids = np.asarray(data_dict["obj_ids"])
        obj_sweeps = np.asarray(data_dict["obj_sweep"])
        keep = np.ones(len(obj_ids), bool)
        for oid in np.unique(obj_ids):
            m = obj_ids == oid
            if obj_sweeps[m].min() != 0:
                keep[m] = False
        n = len(obj_ids)
        for key in list(data_dict.keys()):
            v = data_dict[key]
            if isinstance(v, np.ndarray) and len(v) == n and key.startswith(("obj_", "gt_")):
                data_dict[key] = v[keep]
        data_dict.pop("obj_ids", None)
        return data_dict

    def sync_box_motion(self, data_dict=None, config=None):
        """Registered for config parity; the reference's implementation is a
        debugger stub (data_processor.py:345-351, `ipdb.set_trace()`), so
        this stage is a documented no-op."""
        if data_dict is None:
            return lambda d: self.sync_box_motion(d, config)
        return data_dict

    def lidar_line_segment(self, data_dict=None, config=None):
        """Registered for config parity; the reference's v1 is a debugger
        stub (data_processor.py:425-428) — dispatches to v2."""
        if data_dict is None:
            return lambda d: self.lidar_line_segment(d, config)
        return self.lidar_line_segment_v2(data_dict, config)

    def lidar_line_segment_v2(self, data_dict=None, config=None):
        """Per-scanline segment labeling (reference
        data_processor.py:459-506): for each range-image row, a 10-NN graph
        thresholded by range-normalized distance feeds connected components;
        points get a global segment id and a large-segment flag."""
        if data_dict is None:
            return lambda d: self.lidar_line_segment_v2(d, config)
        cfg = config or {}
        dist_th = float(cfg.get("DIST_TH", 0.05))
        min_large = int(cfg.get("LARGE_SEGMENT_SIZE", 30))
        pts = data_dict["points"][:, :3]
        n = len(pts)
        if "point_rimage_h" not in data_dict or n == 0:
            data_dict["point_segment_id"] = np.zeros(n, np.int64)
            data_dict["point_in_large_segment"] = np.zeros(n, bool)
            return data_dict
        import scipy.sparse as sp
        import scipy.sparse.csgraph as csg
        from sklearn.neighbors import NearestNeighbors

        rh = np.asarray(data_dict["point_rimage_h"]).astype(np.int64)
        seg_id = np.zeros(n, np.int64)
        offset = 0
        for h in np.unique(rh):
            rows = np.nonzero(rh == h)[0]
            if len(rows) == 0:
                continue
            p = pts[rows]
            kk = min(10, len(rows))
            tree = NearestNeighbors(n_neighbors=kk).fit(p)
            dists, idx = tree.kneighbors(p)
            prange = np.linalg.norm(p, axis=-1)
            e0 = np.arange(len(rows)).repeat(kk)
            e1 = idx.reshape(-1)
            ok = dists.reshape(-1) / (prange.repeat(kk) + 1e-6) < dist_th
            g = sp.csr_matrix(
                (np.ones(ok.sum()), (e0[ok], e1[ok])), shape=(len(rows), len(rows))
            )
            nc, lab = csg.connected_components(g, directed=False)
            seg_id[rows] = offset + lab
            offset += nc
        data_dict["point_segment_id"] = seg_id
        _, inv, counts = np.unique(seg_id, return_inverse=True, return_counts=True)
        data_dict["point_in_large_segment"] = counts[inv] > min_large
        return data_dict

    def forward(self, data_dict):
        for proc in self.queue:
            data_dict = proc(data_dict)
        return data_dict

    __call__ = forward
