"""End-to-end Waymo TFRecord conversion on synthetic protos.

Closes the "converter never produced an artifact" gap: builds real Frame
protos (vendored minimal schema, datasets/waymo_protos), compresses range
images / seg labels the way the wire format does (ZLIB MatrixFloat /
MatrixInt32), writes a genuine .tfrecord (pure-python writer with masked
CRC32C), and drives tools/create_waymo_infos.process_single_sequence to
npy + _seg.npy + info pkl — then re-loads and checks every field.

Reference semantics: /root/reference/pcdet/datasets/waymo/waymo_utils.py
:216-340 (process_single_sequence) — label/pose/seg extraction layout.
"""

from __future__ import annotations

import pickle
import sys
import zlib
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from pcseqlearning_tpu.datasets import tfrecord_io
from pcseqlearning_tpu.datasets.range_image import extract_points
from pcseqlearning_tpu.datasets.waymo_protos import dataset_pb2


def _make_range_image(rng, H=8, W=16, n_valid=25):
    t = np.zeros((H, W, 4), np.float32)
    idx = rng.choice(H * W, size=n_valid, replace=False)
    rows, cols = idx // W, idx % W
    t[rows, cols, 0] = rng.uniform(2.0, 60.0, n_valid)   # range
    t[rows, cols, 1] = rng.uniform(0, 1, n_valid)        # intensity
    t[rows, cols, 2] = rng.uniform(0, 0.3, n_valid)      # elongation
    return t


def _compress_matrix(arr, msg):
    msg.shape.dims.extend(arr.shape)
    msg.data.extend(arr.reshape(-1).tolist())
    return zlib.compress(msg.SerializeToString())


def _build_frame(rng, seed_pose=0):
    frame = dataset_pb2.Frame()
    frame.timestamp_micros = 1_000_000 + seed_pose
    pose = np.eye(4)
    pose[:3, 3] = [seed_pose * 2.0, 1.0, 0.0]
    frame.pose.transform.extend(pose.reshape(-1).tolist())

    # TOP laser: explicit beam inclinations + yawed extrinsic + seg labels
    incl = np.linspace(-0.3, 0.05, 8)
    yaw = 0.3
    ex = np.eye(4)
    ex[:3, :3] = [[np.cos(yaw), -np.sin(yaw), 0],
                  [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
    ex[:3, 3] = [1.2, 0.1, 2.0]
    cal = frame.context.laser_calibrations.add()
    cal.name = dataset_pb2.LaserName.TOP
    cal.beam_inclinations.extend(incl.tolist())
    cal.extrinsic.transform.extend(ex.reshape(-1).tolist())

    ri_top = _make_range_image(rng)
    laser = frame.lasers.add()
    laser.name = dataset_pb2.LaserName.TOP
    laser.ri_return1.range_image_compressed = _compress_matrix(
        ri_top, dataset_pb2.MatrixFloat())
    seg = np.zeros(ri_top.shape[:2] + (2,), np.int32)
    mask = ri_top[..., 0] > 0
    seg[mask, 0] = rng.randint(1, 50, int(mask.sum()))   # instance
    seg[mask, 1] = rng.randint(1, 23, int(mask.sum()))   # semantic
    laser.ri_return1.segmentation_label_compressed = _compress_matrix(
        seg, dataset_pb2.MatrixInt32())

    # FRONT laser: min/max inclination range, no seg
    cal2 = frame.context.laser_calibrations.add()
    cal2.name = dataset_pb2.LaserName.FRONT
    cal2.beam_inclination_min = -0.8
    cal2.beam_inclination_max = 0.3
    ex2 = np.eye(4)
    ex2[:3, 3] = [4.0, 0.0, 0.6]
    cal2.extrinsic.transform.extend(ex2.reshape(-1).tolist())
    ri_front = _make_range_image(rng, H=4, W=8, n_valid=7)
    laser2 = frame.lasers.add()
    laser2.name = dataset_pb2.LaserName.FRONT
    laser2.ri_return1.range_image_compressed = _compress_matrix(
        ri_front, dataset_pb2.MatrixFloat())

    # labels
    box = frame.laser_labels.add()
    box.box.center_x, box.box.center_y, box.box.center_z = 10.0, -3.0, 1.0
    box.box.length, box.box.width, box.box.height = 4.5, 2.0, 1.8
    box.box.heading = 0.7
    box.type = dataset_pb2.Label.TYPE_VEHICLE
    box.id = f"veh_{seed_pose}"
    box.num_lidar_points_in_box = 42
    box.detection_difficulty_level = dataset_pb2.Label.LEVEL_1
    ped = frame.laser_labels.add()
    ped.box.center_x, ped.box.center_y, ped.box.center_z = -5.0, 2.0, 0.9
    ped.box.length, ped.box.width, ped.box.height = 0.9, 0.8, 1.7
    ped.box.heading = -1.2
    ped.type = dataset_pb2.Label.TYPE_PEDESTRIAN
    ped.id = f"ped_{seed_pose}"
    ped.num_lidar_points_in_box = 7
    ped.detection_difficulty_level = dataset_pb2.Label.LEVEL_2

    expected = dict(ri_top=ri_top, seg=seg, incl=incl, ex=ex,
                    ri_front=ri_front, ex2=ex2, pose=pose)
    return frame, expected


def test_tfrecord_pure_roundtrip(tmp_path):
    payloads = [b"alpha", b"b" * 1000, b""]
    p = tmp_path / "x.tfrecord"
    tfrecord_io.write_tfrecord(p, payloads)
    got = list(tfrecord_io.read_tfrecord(p, verify_crc=True))
    assert got == payloads


def test_tfrecord_crc_matches_tensorflow(tmp_path):
    """Cross-validate the pure-python masked CRC32C against TF's writer."""
    tf = pytest.importorskip("tensorflow")
    p = str(tmp_path / "tfw.tfrecord")
    with tf.io.TFRecordWriter(p) as w:
        w.write(b"hello waymo")
        w.write(b"\x00" * 77)
    got = list(tfrecord_io.read_tfrecord(p, verify_crc=True))
    assert got == [b"hello waymo", b"\x00" * 77]
    # and the reverse: TF reads our writer's output
    p2 = str(tmp_path / "ours.tfrecord")
    tfrecord_io.write_tfrecord(p2, [b"ping", b"pong" * 50])
    back = [bytes(r.numpy()) for r in tf.data.TFRecordDataset(p2)]
    assert back == [b"ping", b"pong" * 50]


def test_process_single_sequence_end_to_end(tmp_path):
    from create_waymo_infos import process_single_sequence

    rng = np.random.RandomState(7)
    frames, expected = zip(*[_build_frame(rng, i) for i in range(3)])
    raw = tmp_path / "seg-001.tfrecord"
    tfrecord_io.write_tfrecord(raw, [f.SerializeToString() for f in frames])

    out_dir = tmp_path / "processed"
    infos = process_single_sequence(str(raw), str(out_dir))
    assert len(infos) == 3

    seq_dir = out_dir / "seg-001"
    with open(seq_dir / "seg-001.pkl", "rb") as f:
        infos_reloaded = pickle.load(f)
    assert len(infos_reloaded) == 3

    for idx, exp in enumerate(expected):
        info = infos_reloaded[idx]
        np.testing.assert_allclose(info["pose"], exp["pose"])
        assert info["frame_id"] == f"seg-001_{idx:03d}"
        an = info["annos"]
        assert list(an["name"]) == ["Vehicle", "Pedestrian"]
        np.testing.assert_allclose(
            an["gt_boxes_lidar"][0], [10.0, -3.0, 1.0, 4.5, 2.0, 1.8, 0.7],
            atol=1e-6)
        assert an["num_points_in_gt"].tolist() == [42, 7]
        assert an["difficulty"].tolist() == [1, 2]
        assert list(an["obj_ids"]) == [f"veh_{idx}", f"ped_{idx}"]

        pts = np.load(seq_dir / f"{idx:04d}.npy")
        # expected: native math on the same tensors, TOP then FRONT
        e_top = extract_points(exp["ri_top"], exp["ex"],
                               inclination=exp["incl"])
        e_front = extract_points(exp["ri_front"], exp["ex2"],
                                 inclination_range=(-0.8, 0.3))
        e = np.concatenate([e_top, e_front])
        assert pts.shape == (len(e), 8)
        np.testing.assert_allclose(pts[:, 0:3], e[:, 3:6], atol=1e-5)  # xyz
        np.testing.assert_allclose(pts[:, 3], e[:, 1], atol=1e-6)  # intensity
        np.testing.assert_allclose(pts[:, 4], e[:, 2], atol=1e-6)  # elong
        np.testing.assert_allclose(pts[:, 5], e[:, 0], atol=1e-5)  # range

        seg_pts = np.load(seq_dir / f"{idx:04d}_seg.npy")
        mask = exp["ri_top"][..., 0] > 0
        want_seg = np.concatenate([
            exp["seg"][mask],
            np.zeros((len(e_front), 2), np.int32)])
        np.testing.assert_array_equal(seg_pts, want_seg)
