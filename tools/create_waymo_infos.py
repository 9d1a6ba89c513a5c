"""Offline Waymo TFRecord extraction -> per-sequence npy + info pkls.

Reference: /root/reference/pcdet/datasets/waymo/waymo_utils.py
(process_single_sequence: range image -> [x, y, z, intensity, elongation,
range, rimage_w, rimage_h] npy + _seg.npy + info dicts with poses) and
waymo_dataset.create_waymo_infos (waymo_dataset.py:992-1032).

Requires the optional `waymo-open-dataset` TF reader (same stance as the
reference: heavy TF deps only for offline conversion, never at train time).

Usage:
    python tools/create_waymo_infos.py --raw_dir <tfrecords> --out_dir <processed>
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _extract_points_native(frame, calibration, dataset_pb2, tf):
    """First-return extraction via the native spherical math
    (pcseqlearning_tpu/datasets/range_image.py) — used when
    waymo_open_dataset.utils is absent. Skips the TOP lidar's per-pixel
    rolling-shutter pose correction (cm-scale; frame_utils applies it when
    available)."""
    from pcseqlearning_tpu.datasets.range_image import extract_points

    laser = next(l for l in frame.lasers if l.name == calibration.name)
    comp = laser.ri_return1.range_image_compressed
    if not comp:
        return np.zeros((0, 6), np.float32)
    ri = dataset_pb2.MatrixFloat()
    ri.ParseFromString(bytearray(
        tf.io.decode_compressed(comp, "ZLIB").numpy()))
    t = np.asarray(ri.data, np.float32).reshape(ri.shape.dims)
    extrinsic = np.asarray(calibration.extrinsic.transform,
                           np.float64).reshape(4, 4)
    incl = (np.asarray(calibration.beam_inclinations, np.float64)
            if len(calibration.beam_inclinations)
            else None)
    rng = (calibration.beam_inclination_min, calibration.beam_inclination_max)
    return extract_points(t, extrinsic, inclination=incl,
                          inclination_range=rng)


def process_single_sequence(seq_file, out_dir, has_label=True, sampled_interval=1):
    try:
        import tensorflow as tf
        from waymo_open_dataset import dataset_pb2
    except ImportError as e:
        raise SystemExit(
            "waymo-open-dataset protos + tensorflow are required to parse "
            "TFRecords; install them in a separate conversion environment"
        ) from e
    try:
        from waymo_open_dataset.utils import frame_utils
    except ImportError:
        # the projection math is native (oracle-tested in
        # tests/test_range_image.py) — only proto parsing needs the package
        frame_utils = None

    seq_name = Path(seq_file).stem.replace(".tfrecord", "")
    seq_dir = Path(out_dir) / seq_name
    seq_dir.mkdir(parents=True, exist_ok=True)
    infos = []
    ds = tf.data.TFRecordDataset(str(seq_file), compression_type="")
    for idx, data in enumerate(ds):
        if idx % sampled_interval != 0:
            continue
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        if frame_utils is not None:
            ri, cp, seg_labels, ri_pose = frame_utils.parse_range_image_and_camera_projection(frame)
            # range image -> point cloud with polar features + image coords
            points, cp_points = frame_utils.convert_range_image_to_point_cloud(
                frame, ri, cp, ri_pose, keep_polar_features=True
            )
            pts = np.concatenate(points, axis=0)  # [N, 6]: range, intensity, elongation, x, y, z
        else:
            pts = np.concatenate(
                [_extract_points_native(frame, c, dataset_pb2, tf)
                 for c in frame.context.laser_calibrations], axis=0)
        xyz = pts[:, 3:6]
        out = np.zeros((len(xyz), 8), np.float32)
        out[:, 0:3] = xyz
        out[:, 3] = pts[:, 1]  # intensity
        out[:, 4] = pts[:, 2]  # elongation
        out[:, 5] = pts[:, 0]  # range
        np.save(seq_dir / ("%04d.npy" % idx), out)

        annos = dict(name=[], gt_boxes_lidar=[], obj_ids=[], num_points_in_gt=[])
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
        annos = {
            "name": np.asarray(annos["name"]),
            "gt_boxes_lidar": np.asarray(annos["gt_boxes_lidar"], np.float32).reshape(-1, 7),
            "obj_ids": np.asarray(annos["obj_ids"]),
            "num_points_in_gt": np.asarray(annos["num_points_in_gt"], np.int64),
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
