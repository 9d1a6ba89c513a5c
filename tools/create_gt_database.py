"""Build the GT-sampling database: per-object point crops + dbinfos pkl.

Reference: waymo_dataset.create_groundtruth_database
(/root/reference/pcdet/datasets/waymo/waymo_dataset.py:889-968): for each
frame, extract the points inside each GT box (points_in_boxes), save each
object's points as .bin, and record dbinfos for the gt_sampling augmentor.

Usage:
    python tools/create_gt_database.py <data_cfg.yaml> [--split train]
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_cfg", type=str)
    ap.add_argument("--split", default="train")
    ap.add_argument("--sampled_interval", type=int, default=10)
    args = ap.parse_args()

    import jax.numpy as jnp

    from pcseqlearning_tpu.config import cfg, cfg_from_yaml_file
    from pcseqlearning_tpu.datasets import WaymoDataset
    from pcseqlearning_tpu.ops.boxes import points_in_boxes

    cfg_from_yaml_file(args.data_cfg, cfg)
    data_cfg = cfg.DATA_CONFIG
    class_names = list(cfg.get("CLASS_NAMES", ["Vehicle", "Pedestrian", "Cyclist"]))
    dataset = WaymoDataset(data_cfg, class_names, training=(args.split == "train"))

    db_root = dataset.data_path.parent / f"gt_database_{args.split}"
    db_root.mkdir(parents=True, exist_ok=True)
    db_infos = {n: [] for n in class_names}

    for idx in range(0, len(dataset.infos), args.sampled_interval):
        info = dataset.infos[idx]
        pc = info["point_cloud"]
        seq, sample = pc["lidar_sequence"], pc["sample_idx"]
        points = dataset.get_lidar(seq, sample)
        annos = info.get("annos", {})
        boxes = np.asarray(annos.get("gt_boxes_lidar", np.zeros((0, 7)))).reshape(-1, 7)
        names = np.asarray(annos.get("name", []))
        if len(boxes) == 0:
            continue
        bp = np.asarray(points_in_boxes(
            jnp.asarray(points[:, :3].astype(np.float32)),
            jnp.asarray(boxes.astype(np.float32)),
        ))
        for j, name in enumerate(names):
            if name not in db_infos:
                continue
            obj_pts = points[bp[j]]
            if len(obj_pts) == 0:
                continue
            obj_pts = obj_pts.copy()
            obj_pts[:, :3] -= boxes[j, :3]
            fname = f"{seq}_{sample:04d}_{name}_{j}.bin"
            obj_pts.astype(np.float32).tofile(db_root / fname)
            db_infos[name].append(dict(
                name=name, path=str(Path(db_root.name) / fname),
                sequence_name=seq, sample_idx=sample, gt_idx=j,
                box3d_lidar=boxes[j], num_points_in_gt=len(obj_pts),
                num_features=obj_pts.shape[1],
            ))
        if idx % 100 == 0:
            print(f"[{idx}/{len(dataset.infos)}]", flush=True)

    out = dataset.data_path.parent / f"waymo_dbinfos_{args.split}.pkl"
    with open(out, "wb") as f:
        pickle.dump(db_infos, f)
    for k, v in db_infos.items():
        print(f"{k}: {len(v)} objects")
    print("saved", out)


if __name__ == "__main__":
    main()
