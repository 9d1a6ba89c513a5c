"""Propagate sparse per-frame segmentation labels across a sequence via GT
boxes: the median label of each object's points over its labeled frames is
written to all its unlabeled frames as ``_propseg.npy``.

Reference: waymo_utils.propagate_segmentation_labels
(/root/reference/pcdet/datasets/waymo/waymo_utils.py:341-500) invoked through
waymo_dataset.py:1039. TF-free: operates on the extracted npy/pkl artifacts.

Usage: python tools/propagate_segmentation_labels.py <data_cfg.yaml>
"""

from __future__ import annotations

import argparse
import pickle
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def process_sequence(seq_dir, infos):
    import jax.numpy as jnp

    from pcseqlearning_tpu.ops.boxes import points_in_boxes

    # pass 1: collect per-object median labels from labeled frames
    obj_labels = defaultdict(list)
    for info in infos:
        idx = info["point_cloud"]["sample_idx"]
        seg_file = seq_dir / ("%04d_seg.npy" % idx)
        if not seg_file.exists():
            continue
        seg = np.load(seg_file)
        pts = np.load(seq_dir / ("%04d.npy" % idx))[:, :3]
        annos = info.get("annos", {})
        boxes = np.asarray(annos.get("gt_boxes_lidar", np.zeros((0, 7)))).reshape(-1, 7)
        obj_ids = np.asarray(annos.get("obj_ids", []))
        if len(boxes) == 0:
            continue
        bp = np.asarray(points_in_boxes(
            jnp.asarray(pts.astype(np.float32)), jnp.asarray(boxes.astype(np.float32))
        ))
        for j, oid in enumerate(obj_ids):
            lab = seg[bp[j], 1]
            lab = lab[lab > 0]
            if len(lab):
                obj_labels[oid].append(int(np.median(lab)))

    obj_label = {k: int(np.median(v)) for k, v in obj_labels.items() if v}

    # pass 2: write _propseg for unlabeled frames
    n_written = 0
    for info in infos:
        idx = info["point_cloud"]["sample_idx"]
        if (seq_dir / ("%04d_seg.npy" % idx)).exists():
            continue
        pts = np.load(seq_dir / ("%04d.npy" % idx))[:, :3]
        annos = info.get("annos", {})
        boxes = np.asarray(annos.get("gt_boxes_lidar", np.zeros((0, 7)))).reshape(-1, 7)
        obj_ids = np.asarray(annos.get("obj_ids", []))
        prop = np.zeros((len(pts), 2), np.int64)
        if len(boxes):
            bp = np.asarray(points_in_boxes(
                jnp.asarray(pts.astype(np.float32)), jnp.asarray(boxes.astype(np.float32))
            ))
            for j, oid in enumerate(obj_ids):
                if oid in obj_label:
                    prop[bp[j], 1] = obj_label[oid]
                    prop[bp[j], 0] = j + 1
        np.save(seq_dir / ("%04d_propseg.npy" % idx), prop)
        n_written += 1
    return n_written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_cfg", type=str)
    args = ap.parse_args()

    from pcseqlearning_tpu.config import cfg, cfg_from_yaml_file

    cfg_from_yaml_file(args.data_cfg, cfg)
    data_path = Path(cfg.DATA_CONFIG.get("DATA_PATH", ".")) / cfg.DATA_CONFIG.get(
        "PROCESSED_DATA_TAG", "waymo_processed_data"
    )
    for seq_dir in sorted(p for p in data_path.iterdir() if p.is_dir()):
        pkl = seq_dir / f"{seq_dir.name}.pkl"
        if not pkl.exists():
            continue
        with open(pkl, "rb") as f:
            infos = pickle.load(f)
        n = process_sequence(seq_dir, infos)
        print(f"{seq_dir.name}: wrote {n} propseg frames")


if __name__ == "__main__":
    main()
