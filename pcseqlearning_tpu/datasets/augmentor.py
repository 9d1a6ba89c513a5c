"""Data augmentation: global flip / rotation / scaling / translation.

Rewrites of /root/reference/pcdet/datasets/augmentor/data_augmentor.py:66-221
(the geometric transforms used by the shipped Waymo configs). GT-database
paste augmentation (database_sampler.py) is host-side and data-dependent;
provided as a stub registry entry until the GT database tooling lands.
"""

from __future__ import annotations

import numpy as np

from ..utils.edict import EDict


def _rotate_z(pts, angle):
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], np.float32)
    return pts @ rot


class DataAugmentor:
    def __init__(self, augmentor_configs, class_names=None, root_path=None, logger=None):
        self.class_names = class_names
        cfg_list = (
            augmentor_configs["AUG_CONFIG_LIST"]
            if isinstance(augmentor_configs, dict)
            else augmentor_configs
        )
        disable = (
            augmentor_configs.get("DISABLE_AUG_LIST", [])
            if isinstance(augmentor_configs, dict)
            else []
        )
        self.queue = []
        for cfg in cfg_list:
            cfg = EDict(cfg)
            if cfg.NAME in disable:
                continue
            self.queue.append(getattr(self, cfg.NAME)(config=cfg))

    # -- augmentors -----------------------------------------------------
    def random_world_flip(self, data_dict=None, config=None):
        if data_dict is None:
            return lambda d: self.random_world_flip(d, config)
        for axis in config.get("ALONG_AXIS_LIST", ["x"]):
            if np.random.rand() < 0.5:
                continue
            pts = data_dict["points"]
            gb = data_dict.get("gt_boxes")
            if axis == "x":  # flip y
                pts[:, 1] = -pts[:, 1]
                if gb is not None and len(gb):
                    gb[:, 1] = -gb[:, 1]
                    gb[:, 6] = -gb[:, 6]
            else:  # flip x
                pts[:, 0] = -pts[:, 0]
                if gb is not None and len(gb):
                    gb[:, 0] = -gb[:, 0]
                    gb[:, 6] = -(gb[:, 6] + np.pi)
        return data_dict

    def random_world_rotation(self, data_dict=None, config=None):
        if data_dict is None:
            return lambda d: self.random_world_rotation(d, config)
        rot_range = config.get("WORLD_ROT_ANGLE", [-0.78539816, 0.78539816])
        angle = np.random.uniform(rot_range[0], rot_range[1])
        pts = data_dict["points"]
        pts[:, :3] = _rotate_z(pts[:, :3], angle)
        gb = data_dict.get("gt_boxes")
        if gb is not None and len(gb):
            gb[:, :3] = _rotate_z(gb[:, :3], angle)
            gb[:, 6] += angle
        data_dict["aug_world_rotation"] = angle
        return data_dict

    def random_world_scaling(self, data_dict=None, config=None):
        if data_dict is None:
            return lambda d: self.random_world_scaling(d, config)
        rng = config.get("WORLD_SCALE_RANGE", [0.95, 1.05])
        scale = np.random.uniform(rng[0], rng[1])
        data_dict["points"][:, :3] *= scale
        gb = data_dict.get("gt_boxes")
        if gb is not None and len(gb):
            gb[:, :6] *= scale
        data_dict["aug_world_scaling"] = scale
        return data_dict

    def random_world_translation(self, data_dict=None, config=None):
        if data_dict is None:
            return lambda d: self.random_world_translation(d, config)
        std = config.get("NOISE_TRANSLATE_STD", [0.0, 0.0, 0.0])
        offset = np.random.normal(0, std, 3).astype(np.float32)
        data_dict["points"][:, :3] += offset
        gb = data_dict.get("gt_boxes")
        if gb is not None and len(gb):
            gb[:, :3] += offset
        return data_dict

    def gt_sampling(self, data_dict=None, config=None):
        """GT-database paste augmentation — no-op until a database is built
        (reference augmentor/database_sampler.py)."""
        if data_dict is None:
            return lambda d: self.gt_sampling(d, config)
        return data_dict

    def forward(self, data_dict):
        for aug in self.queue:
            data_dict = aug(data_dict)
        return data_dict

    __call__ = forward
