"""Tests for round-2 dataset-layer additions: interaction index,
DataProcessor stages, local augmentations, spherical resampling, and the
gt_sampling point-removal fix."""

import os
import numpy as np
import pytest


# ---------------------------------------------------------------------------
# interaction index
# ---------------------------------------------------------------------------


def test_interaction_index_masks():
    from pcseqlearning_tpu.datasets.waymo_eval_ii import (
        check_box_interaction, compute_interaction_index, ii_difficulty_levels)

    rng = np.random.RandomState(0)
    # box A isolated; box B with a foreign instance point 0.2m outside
    boxes = np.array([
        [0.0, 0.0, 1.0, 4.0, 2.0, 1.6, 0.0],
        [20.0, 0.0, 1.0, 4.0, 2.0, 1.6, 0.0],
    ], np.float32)
    # members of each box (instance 1 / 2) + an intruder near B (instance 3)
    mem_a = rng.randn(20, 3) * 0.3 + [0, 0, 1.0]
    mem_b = rng.randn(20, 3) * 0.3 + [20, 0, 1.0]
    intruder = np.array([[20.0 + 2.0 + 0.2, 0.0, 1.0]])  # 0.2m past B's +x face
    pts = np.concatenate([mem_a, mem_b, intruder]).astype(np.float32)
    inst = np.concatenate([np.ones(20), np.full(20, 2), [3]]).astype(np.int64)
    seg = np.full(41, 5, np.int64)  # some foreground class
    labels = np.stack([inst, seg], axis=1)

    out = check_box_interaction(boxes, 0.1, pts, labels)
    assert not out[0] and not out[1]  # 0.1 enlargement: half-extent grows 0.05
    out = check_box_interaction(boxes, 0.5, pts, labels)
    assert not out[0] and out[1]  # half-extent grows 0.25 > 0.2 gap

    ii = compute_interaction_index(pts, labels, boxes, radius_list=(0.1, 0.5, 2.0))
    assert not ii["0.1"][1] and ii["0.5"][1] and ii["2.0"][1]
    lv = ii_difficulty_levels(ii, 2)
    assert lv[0] == 0 and lv[1] > 0


def test_ap_by_interaction_index():
    from pcseqlearning_tpu.datasets.waymo_eval_ii import ap_by_interaction_index

    gt = [dict(
        name=np.array(["Vehicle", "Vehicle"]),
        gt_boxes_lidar=np.array([
            [0.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],
            [40.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0],
        ], np.float32),
        interaction_index={"8.0": np.array([False, True])},  # box 1 crowded
    )]
    det = [dict(
        name=np.array(["Vehicle"]),
        score=np.array([0.9], np.float32),
        boxes_lidar=np.array([[0.0, 0.0, 0.5, 4.0, 4.0, 1.5, 0.0]], np.float32),
    )]
    _, r = ap_by_interaction_index(det, gt, ["Vehicle"], level_groups=((0,), (1,)))
    assert abs(r["Vehicle/II_0/AP"] - 1.0) < 1e-6  # isolated box detected
    assert r["Vehicle/II_1/AP"] == 0.0  # crowded box missed


# ---------------------------------------------------------------------------
# processor stages
# ---------------------------------------------------------------------------


def _proc(methods):
    from pcseqlearning_tpu.datasets.processor import DataProcessor
    from pcseqlearning_tpu.utils.edict import EDict

    cfgs = [EDict(m) for m in methods]
    return DataProcessor(cfgs, point_cloud_range=[-75, -75, -2, 75, 75, 4], training=True)


def test_shift_to_top_lidar_origin():
    p = _proc([{"NAME": "shift_to_top_lidar_origin"}])
    d = {"points": np.ones((5, 4), np.float32), "top_lidar_origin": np.array([1.0, 2.0, 3.0])}
    d = p(d)
    assert np.allclose(d["points"][:, :3], [0, -1, -2])
    assert np.allclose(d["top_lidar_origin"], 0)


def test_estimate_velocity_trace_gating():
    p = _proc([{"NAME": "estimate_velocity"}])
    d = {
        "points": np.zeros((1, 4), np.float32),
        "obj_ids": np.array(["a", "a", "b", "b"]),
        "obj_sweep": np.array([0, 1, 1, 2]),
        "gt_box_attr": np.arange(4, dtype=np.float32),
    }
    d = p(d)
    # trace 'b' starts at sweep 1 -> removed; obj_ids popped
    assert "obj_ids" not in d
    assert np.allclose(d["gt_box_attr"], [0, 1])


def test_lidar_line_segment_v2():
    p = _proc([{"NAME": "lidar_line_segment_v2", "DIST_TH": 0.05, "LARGE_SEGMENT_SIZE": 30}])
    # two scanline arcs at range ~10, one long (60 pts), one short (5 pts)
    n1, n2 = 60, 5
    th1 = np.linspace(0, 0.5, n1)
    th2 = np.linspace(2.0, 2.02, n2)
    pts = np.concatenate([
        np.stack([10 * np.cos(th1), 10 * np.sin(th1), np.zeros(n1)], 1),
        np.stack([10 * np.cos(th2), 10 * np.sin(th2), np.zeros(n2)], 1),
    ]).astype(np.float32)
    d = {
        "points": np.concatenate([pts, np.zeros((n1 + n2, 1), np.float32)], 1),
        "point_rimage_h": np.zeros(n1 + n2, np.int64),
    }
    d = p(d)
    seg = d["point_segment_id"]
    assert len(np.unique(seg[:n1])) == 1
    assert len(np.unique(seg)) >= 2
    assert d["point_in_large_segment"][:n1].all()
    assert not d["point_in_large_segment"][n1:].any()


# ---------------------------------------------------------------------------
# local augmentations + gt_sampling point removal
# ---------------------------------------------------------------------------


def _aug(cfg_list):
    from pcseqlearning_tpu.datasets.augmentor import DataAugmentor
    from pcseqlearning_tpu.utils.edict import EDict

    return DataAugmentor(EDict(AUG_CONFIG_LIST=[EDict(c) for c in cfg_list]))


def test_random_local_rotation_moves_members_only():
    np.random.seed(0)
    aug = _aug([{"NAME": "random_local_rotation", "LOCAL_ROT_ANGLE": [0.5, 0.5]}])
    box = np.array([[5.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]], np.float32)
    inside = np.array([[5.5, 0.2, 0.0, 0.0]], np.float32)
    outside = np.array([[20.0, 0.0, 0.0, 0.0]], np.float32)
    d = {"points": np.concatenate([inside, outside]), "gt_boxes": box.copy()}
    d = aug(d)
    assert abs(d["gt_boxes"][0, 6] - 0.5) < 1e-6
    assert np.allclose(d["points"][1, :3], [20, 0, 0])  # untouched
    # member rotated about box center by 0.5
    rel = inside[0, :3] - box[0, :3]
    c, s = np.cos(0.5), np.sin(0.5)
    want = box[0, :3] + np.array([rel[0] * c - rel[1] * s, rel[0] * s + rel[1] * c, rel[2]])
    assert np.allclose(d["points"][0, :3], want, atol=1e-5)


def test_random_local_scaling_and_translation():
    np.random.seed(0)
    aug = _aug([
        {"NAME": "random_local_scaling", "LOCAL_SCALE_RANGE": [1.2, 1.2]},
        {"NAME": "random_local_translation", "LOCAL_TRANSLATION_RANGE": [0.3, 0.3],
         "ALONG_AXIS_LIST": ["x"]},
    ])
    box = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]], np.float32)
    pt = np.array([[0.5, 0.0, 0.0, 0.0]], np.float32)
    d = {"points": pt.copy(), "gt_boxes": box.copy()}
    d = aug(d)
    assert np.allclose(d["gt_boxes"][0, 3:6], 2.4, atol=1e-5)
    assert abs(d["gt_boxes"][0, 0] - 0.3) < 1e-6
    assert abs(d["points"][0, 0] - (0.5 * 1.2 + 0.3)) < 1e-5


def test_gt_sampling_removes_occupied_points(tmp_path):
    from pcseqlearning_tpu.datasets.augmentor import DataAugmentor
    from pcseqlearning_tpu.utils.edict import EDict
    import pickle

    # build a one-object database
    obj = np.zeros((10, 4), np.float32)
    (tmp_path / "gt_db").mkdir()
    obj.tofile(tmp_path / "gt_db" / "obj0.bin")
    infos = {"Vehicle": [dict(path="gt_db/obj0.bin", box3d_lidar=[8.0, 8.0, 0.0, 2.0, 2.0, 2.0, 0.0], num_features=4, num_points_in_gt=10)]}
    with open(tmp_path / "dbinfos.pkl", "wb") as f:
        pickle.dump(infos, f)

    aug = DataAugmentor(EDict(AUG_CONFIG_LIST=[EDict(
        NAME="gt_sampling", DB_INFO_PATH="dbinfos.pkl",
        SAMPLE_GROUPS=["Vehicle:1"],
    )]), root_path=str(tmp_path))
    # scene has a background point inside the pasted box location
    bg_in = np.array([[8.0, 8.0, 0.2, 0.0]], np.float32)
    bg_out = np.array([[-20.0, 0.0, 0.0, 0.0]], np.float32)
    d = {"points": np.concatenate([bg_in, bg_out]),
         "gt_boxes": np.zeros((0, 7), np.float32), "gt_names": np.array([], str)}
    d = aug(d)
    assert len(d["gt_boxes"]) == 1
    # the background point inside the sampled box must be gone
    assert not any(np.allclose(p[:3], [8.0, 8.0, 0.2]) for p in d["points"])
    assert any(np.allclose(p[:3], [-20.0, 0.0, 0.0]) for p in d["points"])


def test_spherical_resampling_densifies_scanline():
    from pcseqlearning_tpu.datasets.waymo_dataset import WaymoDataset

    # a sparse arc at range 10 with ~0.25m azimuth gaps -> interpolation
    n = 30
    th = np.linspace(0, 0.7, n)
    xyz = np.stack([10 * np.cos(th), 10 * np.sin(th), np.zeros(n)], 1).astype(np.float32)
    feat = np.ones((n, 2), np.float32)
    pw = dict(point_xyz=xyz, point_feat=feat, point_rimage_h=np.zeros(n, np.int64),
              segmentation_label=np.arange(n))
    out = WaymoDataset.spherical_resampling(None, pw)
    assert len(out["point_xyz"]) > n  # densified
    assert len(out["segmentation_label"]) == len(out["point_xyz"])  # propagated
    # all new points still on the arc (range ~10)
    r = np.linalg.norm(out["point_xyz"][:, :2], axis=1)
    assert np.abs(r - 10).max() < 0.2


def test_semantic_seg_sampler(tmp_path):
    import pickle
    from pcseqlearning_tpu.datasets.augmentor import SemanticSegSampler
    from pcseqlearning_tpu.utils.edict import EDict

    rng = np.random.RandomState(0)
    crop = np.concatenate([rng.randn(30, 3) * 0.3, np.ones((30, 1))], 1).astype(np.float32)
    db = {"infos": [dict(points=crop, support_cls=18, trans_z=0.9)], "by_cls": {2: [0]}}
    with open(tmp_path / "segdb.pkl", "wb") as f:
        pickle.dump(db, f)
    sampler = SemanticSegSampler(EDict(DB_PATH="segdb.pkl", SAMPLE_GROUPS=["2:1"],
                                       SUPPORT_CLASSES=[18]), root_path=str(tmp_path))
    pts = np.zeros((100, 4), np.float32)
    pts[:, :2] = rng.rand(100, 2) * 20
    seg = np.full(100, 18, np.int64)  # all road -> support surface
    d = {"points": pts.copy(), "segmentation_label": seg.copy()}
    d = sampler(d)
    assert len(d["points"]) == 130
    assert (d["segmentation_label"] == 2).sum() == 30
    # pasted crop sits near some road point, z-aligned by trans_z
    pasted = d["points"][100:]
    assert abs(pasted[:, 2].mean() - 0.9) < 0.3


def test_point_contrast_views():
    from pcseqlearning_tpu.datasets.augmentor import point_contrast_views

    np.random.seed(0)
    pts = np.random.rand(50, 4).astype(np.float32)
    v1, v2, pairs = point_contrast_views(pts)
    assert v1.shape == v2.shape == pts.shape
    assert (pairs == np.arange(50)).all()
    # rigid-ish: pairwise distances preserved up to scale+jitter
    d0 = np.linalg.norm(pts[0, :3] - pts[1, :3])
    d1 = np.linalg.norm(v1[0, :3] - v1[1, :3])
    assert abs(d1 - d0) < 0.3 * d0 + 0.2


def test_extract_foreground_instances(tmp_path):
    """Seg-driven instance extraction (waymo_utils.py:593-749 — upstream
    WIP completed with an explicit strategy table): instance peeling by
    label, box attachment at >90%% coverage, support-surface z-gap."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from extract_foreground_instances import extract_foreground_instances

    rng = np.random.RandomState(0)
    # two car instances (cls 1) on a ground plane (cls 17)
    ground = np.concatenate(
        [rng.rand(500, 2) * 30 - 15, np.zeros((500, 1))], axis=1)
    car1 = rng.randn(60, 3) * 0.5 + np.asarray([3.0, 0.0, 1.0])
    car2 = rng.randn(60, 3) * 0.5 + np.asarray([-5.0, 2.0, 1.2])
    pts = np.concatenate([ground, car1, car2]).astype(np.float32)
    seg_cls = np.concatenate(
        [np.full(500, 17), np.full(60, 1), np.full(60, 1)])
    seg_inst = np.concatenate(
        [np.zeros(500), np.full(60, 7), np.full(60, 9)]).astype(np.int64)
    boxes = np.asarray([[3.0, 0.0, 1.0, 4.0, 4.0, 4.0, 0.0]], np.float32)

    out = extract_foreground_instances(
        pts, seg_cls, seg_inst, boxes, "0001", str(tmp_path),
        strategies={1: dict(support=[17], radius=3.0, min_num_points=20,
                            use_inst_label=True, attach_box=True)},
    )
    recs = out[1]
    assert len(recs) == 2
    attached = [r for r in recs if r["box3d"] is not None]
    assert len(attached) == 1  # only car1 is covered by the GT box
    for r in recs:
        assert r["support"] == 17
        assert abs(r["trans_z"]) < 3.0
        assert os.path.exists(r["path"])
        assert np.load(r["path"]).shape[0] == r["num_points"]
