"""Offline Waymo TFRecord extraction -> per-sequence npy + info pkls.

Reference: /root/reference/pcdet/datasets/waymo/waymo_utils.py
(process_single_sequence: range image -> [x, y, z, intensity, elongation,
range, ...] npy + _seg.npy + info dicts with poses) and
waymo_dataset.create_waymo_infos (waymo_dataset.py:992-1032).

Three dependency tiers, best available wins:
  1. waymo-open-dataset + TF: official frame_utils projection (per-pixel
     rolling-shutter pose correction for the TOP lidar).
  2. TF only: vendored protos (datasets/waymo_protos) + native spherical
     math (datasets/range_image.py).
  3. Nothing: vendored protos + pure-python TFRecord reader
     (datasets/tfrecord_io.py) + native math — zero heavy deps.

Usage:
    python tools/create_waymo_infos.py --raw_dir <tfrecords> --out_dir <processed>
"""

from __future__ import annotations

import argparse
import pickle
import sys
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _resolve_backend():
    """Returns (record_iter(path) -> bytes payloads, dataset_pb2,
    frame_utils or None)."""
    try:
        from waymo_open_dataset import dataset_pb2  # type: ignore
    except ImportError:
        from pcseqlearning_tpu.datasets.waymo_protos import dataset_pb2
        frame_utils = None
    else:
        try:
            from waymo_open_dataset.utils import frame_utils  # type: ignore
        except ImportError:
            frame_utils = None
    try:
        import tensorflow as tf

        def record_iter(path):
            for data in tf.data.TFRecordDataset(str(path), compression_type=""):
                yield bytes(data.numpy())
    except ImportError:
        from pcseqlearning_tpu.datasets.tfrecord_io import read_tfrecord

        def record_iter(path):
            yield from read_tfrecord(path)

        frame_utils = None  # frame_utils needs TF
    return record_iter, dataset_pb2, frame_utils


def _parse_matrix(comp_bytes, msg):
    """ZLIB-compressed serialized MatrixFloat/MatrixInt32 -> ndarray."""
    msg.ParseFromString(zlib.decompress(comp_bytes))
    return np.asarray(msg.data).reshape(list(msg.shape.dims))


def _extract_points_native(frame, calibration, dataset_pb2):
    """First-return extraction via the native spherical math
    (pcseqlearning_tpu/datasets/range_image.py) — used when
    waymo_open_dataset.utils is absent. Skips the TOP lidar's per-pixel
    rolling-shutter pose correction (cm-scale; frame_utils applies it when
    available). Returns ([N, 6] points, [N, 2] (instance, semantic) seg
    labels — zeros when the laser carries none)."""
    from pcseqlearning_tpu.datasets.range_image import extract_points

    laser = next(l for l in frame.lasers if l.name == calibration.name)
    comp = laser.ri_return1.range_image_compressed
    if not comp:
        return np.zeros((0, 6), np.float32), np.zeros((0, 2), np.int32)
    t = _parse_matrix(comp, dataset_pb2.MatrixFloat()).astype(np.float32)
    extrinsic = np.asarray(calibration.extrinsic.transform,
                           np.float64).reshape(4, 4)
    incl = (np.asarray(calibration.beam_inclinations, np.float64)
            if len(calibration.beam_inclinations)
            else None)
    rng = (calibration.beam_inclination_min, calibration.beam_inclination_max)
    pts = extract_points(t, extrinsic, inclination=incl,
                         inclination_range=rng)
    mask = t[..., 0] > 0
    seg_comp = laser.ri_return1.segmentation_label_compressed
    if seg_comp:
        seg = _parse_matrix(seg_comp, dataset_pb2.MatrixInt32())
        seg_pts = seg[mask].astype(np.int32)  # [N, 2] (instance, semantic)
    else:
        seg_pts = np.zeros((int(mask.sum()), 2), np.int32)
    return pts, seg_pts


def process_single_sequence(seq_file, out_dir, has_label=True, sampled_interval=1):
    record_iter, dataset_pb2, frame_utils = _resolve_backend()

    seq_name = Path(seq_file).stem.replace(".tfrecord", "")
    seq_dir = Path(out_dir) / seq_name
    seq_dir.mkdir(parents=True, exist_ok=True)
    infos = []
    for idx, data in enumerate(record_iter(seq_file)):
        if idx % sampled_interval != 0:
            continue
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data))
        seg_pts = None
        if frame_utils is not None:
            ri, cp, seg_labels, ri_pose = frame_utils.parse_range_image_and_camera_projection(frame)
            # range image -> point cloud with polar features + image coords
            points, cp_points = frame_utils.convert_range_image_to_point_cloud(
                frame, ri, cp, ri_pose, keep_polar_features=True
            )
            pts = np.concatenate(points, axis=0)  # [N, 6]: range, intensity, elongation, x, y, z
        else:
            per_laser = [
                _extract_points_native(frame, c, dataset_pb2)
                for c in frame.context.laser_calibrations]
            pts = np.concatenate([p for p, _ in per_laser], axis=0)
            seg_pts = np.concatenate([s for _, s in per_laser], axis=0)
        xyz = pts[:, 3:6]
        out = np.zeros((len(xyz), 8), np.float32)
        out[:, 0:3] = xyz
        out[:, 3] = pts[:, 1]  # intensity
        out[:, 4] = pts[:, 2]  # elongation
        out[:, 5] = pts[:, 0]  # range
        np.save(seq_dir / ("%04d.npy" % idx), out)
        if seg_pts is not None and (seg_pts != 0).any():
            np.save(seq_dir / ("%04d_seg.npy" % idx), seg_pts)

        annos = dict(name=[], gt_boxes_lidar=[], obj_ids=[], num_points_in_gt=[],
                     difficulty=[])
        if has_label:
            for obj in frame.laser_labels:
                b = obj.box
                annos["gt_boxes_lidar"].append(
                    [b.center_x, b.center_y, b.center_z, b.length, b.width, b.height, b.heading]
                )
                type_names = {1: "Vehicle", 2: "Pedestrian", 3: "Sign", 4: "Cyclist"}
                annos["name"].append(type_names.get(obj.type, "Unknown"))
                annos["obj_ids"].append(obj.id)
                annos["num_points_in_gt"].append(obj.num_lidar_points_in_box)
                annos["difficulty"].append(obj.detection_difficulty_level)
        annos = {
            "name": np.asarray(annos["name"]),
            "gt_boxes_lidar": np.asarray(annos["gt_boxes_lidar"], np.float32).reshape(-1, 7),
            "obj_ids": np.asarray(annos["obj_ids"]),
            "num_points_in_gt": np.asarray(annos["num_points_in_gt"], np.int64),
            "difficulty": np.asarray(annos["difficulty"], np.int64),
        }
        infos.append(
            dict(
                point_cloud=dict(lidar_sequence=seq_name, sample_idx=idx),
                frame_id=f"{seq_name}_{idx:03d}",
                pose=np.asarray(frame.pose.transform, np.float64).reshape(4, 4),
                annos=annos,
            )
        )
    with open(seq_dir / f"{seq_name}.pkl", "wb") as f:
        pickle.dump(infos, f)
    return infos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--sampled_interval", type=int, default=1)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    seq_files = sorted(Path(args.raw_dir).glob("*.tfrecord"))
    print(f"extracting {len(seq_files)} sequences -> {args.out_dir}")
    import multiprocessing as mp
    from functools import partial

    fn = partial(process_single_sequence, out_dir=args.out_dir,
                 sampled_interval=args.sampled_interval)
    with mp.Pool(args.workers) as pool:
        for i, _ in enumerate(pool.imap(fn, map(str, seq_files))):
            print(f"[{i + 1}/{len(seq_files)}] done")


if __name__ == "__main__":
    main()
