import pickle

import numpy as np
import pytest

from pcseqlearning_tpu.datasets import build_dataloader, collate_batch
from pcseqlearning_tpu.datasets.processor import DataProcessor, PointFeatureEncoder
from pcseqlearning_tpu.datasets.augmentor import DataAugmentor
from pcseqlearning_tpu.utils.edict import EDict


def _write_fake_waymo(root, num_seqs=2, num_frames=4, rng=None):
    rng = rng or np.random.RandomState(0)
    data_dir = root / "waymo_processed_data_v0_5_0"
    for s in range(num_seqs):
        seq = f"segment-{s:04d}"
        d = data_dir / seq
        d.mkdir(parents=True)
        infos = []
        for f in range(num_frames):
            pts = np.zeros((200, 8), np.float32)
            pts[:, :3] = rng.rand(200, 3) * 40 - 20
            pts[:, 3] = rng.rand(200)
            np.save(d / ("%04d.npy" % f), pts)
            seg = np.stack([np.zeros(200), rng.randint(0, 20, 200)], 1).astype(np.int64)
            np.save(d / ("%04d_seg.npy" % f), seg)
            pose = np.eye(4)
            pose[0, 3] = f * 0.5  # ego moves in x
            infos.append(dict(
                point_cloud=dict(lidar_sequence=seq, sample_idx=f),
                frame_id=f"{seq}_{f:03d}",
                pose=pose,
                annos=dict(
                    name=np.array(["Vehicle"]),
                    gt_boxes_lidar=np.array([[1.0, 2.0, 0.0, 4, 2, 1.8, 0.1]], np.float32),
                    obj_ids=np.array([f"obj-{s}"]),
                    num_points_in_gt=np.array([50]),
                ),
            ))
        with open(d / f"{seq}.pkl", "wb") as fo:
            pickle.dump(infos, fo)
    return data_dir


def test_waymo_dataset_single_sweep(tmp_path, rng):
    _write_fake_waymo(tmp_path, rng=rng)
    cfg = EDict(
        DATASET="WaymoDataset",
        PROCESSED_DATA_TAG="waymo_processed_data_v0_5_0",
        POINT_CLOUD_RANGE=[-30, -30, -3, 30, 30, 5],
        NUM_SWEEPS=1,
        LOAD_SEG=True,
        POINT_FEATURE_ENCODING=dict(
            used_feature_list=["x", "y", "z", "intensity"],
            src_feature_list=["x", "y", "z", "intensity", "elongation", "range", "rimage_w", "rimage_h"],
        ),
        DATA_PROCESSOR=[
            dict(NAME="mask_points_and_boxes_outside_range", REMOVE_OUTSIDE_BOXES=True),
            dict(NAME="shuffle_points", SHUFFLE_ENABLED=dict(train=True, test=False)),
        ],
    )
    ds, loader = build_dataloader(cfg, ["Vehicle"], batch_size=2, root_path=str(tmp_path), training=True)
    assert len(ds) == 8  # 2 seqs x 4 frames
    batch = next(iter(loader))
    assert batch["batch_size"] == 2
    assert batch["point_bxyz"].shape[1] == 4
    assert set(np.unique(batch["point_bxyz"][:, 0]).astype(int)) <= {0, 1}
    assert batch["gt_boxes"].shape[-1] == 8
    assert batch["gt_boxes"][0, 0, 7] == 1  # class id


def test_waymo_dataset_sequence_mode(tmp_path, rng):
    _write_fake_waymo(tmp_path, rng=rng)
    cfg = EDict(
        DATASET="WaymoDataset",
        PROCESSED_DATA_TAG="waymo_processed_data_v0_5_0",
        POINT_CLOUD_RANGE=[-30, -30, -3, 30, 30, 5],
        NUM_SWEEPS=4,
        SWEEP_DIR=-1,
        SEQUENCE_MODE=True,
        LOAD_SEG=True,
        POINT_FEATURE_ENCODING=dict(
            used_feature_list=["x", "y", "z", "intensity"],
            src_feature_list=["x", "y", "z", "intensity", "elongation", "range", "rimage_w", "rimage_h"],
        ),
        DATA_PROCESSOR=[],
    )
    ds, loader = build_dataloader(cfg, ["Vehicle"], batch_size=1, root_path=str(tmp_path), training=True)
    assert len(ds) == 2  # one item per sequence
    sample = ds[0]
    sweeps = np.unique(sample["point_sweep"])
    assert len(sweeps) == 4  # all frames assembled
    # ego-pose alignment: frame f shifted by -0.5*(last-f) in x relative to
    # its raw coords; just verify per-sweep mean x differs as expected
    assert sample["points"].shape[1] == 4
    assert len(sample["gt_box_attr"]) == 4  # padded per sweep (1 obj x 4)


def test_augmentor_consistency(rng):
    pts = rng.rand(100, 4).astype(np.float32) * 10
    boxes = np.array([[1, 2, 0, 4, 2, 1.5, 0.3]], np.float32)
    aug = DataAugmentor(dict(AUG_CONFIG_LIST=[
        dict(NAME="random_world_rotation", WORLD_ROT_ANGLE=[0.5, 0.5]),
        dict(NAME="random_world_scaling", WORLD_SCALE_RANGE=[1.1, 1.1]),
    ]))
    d = aug({"points": pts.copy(), "gt_boxes": boxes.copy()})
    # deterministic rotation+scale: point-box relation preserved
    c, s = np.cos(0.5), np.sin(0.5)
    rot = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], np.float32)
    expect_center = (boxes[0, :3] @ rot) * 1.1
    np.testing.assert_allclose(d["gt_boxes"][0, :3], expect_center, rtol=1e-5)
    np.testing.assert_allclose(d["gt_boxes"][0, 3:6], boxes[0, 3:6] * 1.1, rtol=1e-5)
    assert abs(d["gt_boxes"][0, 6] - 0.8) < 1e-5


def test_optimizers_and_schedules():
    import jax.numpy as jnp

    from pcseqlearning_tpu.runtime.optimization import build_optimizer, build_onecycle_schedule

    tx, sched = build_optimizer({"OPTIMIZER": "adamW_onecycle", "LR": 0.01, "PCT_START": 0.4}, 10, 10)
    lrs = [float(sched(i)) for i in range(0, 100, 10)]
    assert lrs[0] < lrs[3]  # warmup ascends
    assert lrs[-1] < lrs[4]  # anneal descends
    assert max(lrs) <= 0.0101
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    updates, _ = tx.update(g, state, params)
    assert jnp.all(jnp.isfinite(updates["w"]))

    tx2, sched2 = build_optimizer({"OPTIMIZER": "adamW", "LR": 0.01, "DECAY_STEP_LIST": [5], "LR_DECAY": 0.1}, 1, 10)
    assert abs(float(sched2(0)) - 0.01) < 1e-9
    assert abs(float(sched2(6)) - 0.001) < 1e-9


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from pcseqlearning_tpu.parallel.train_step import TrainState
    from pcseqlearning_tpu.runtime.train_utils import latest_checkpoint, load_checkpoint, save_checkpoint

    state = TrainState(
        params={"w": jnp.arange(4.0)}, batch_stats={"m": jnp.ones(2)},
        opt_state=(), step=jnp.asarray(7),
    )
    save_checkpoint(state, str(tmp_path), 1)
    save_checkpoint(state._replace(step=jnp.asarray(9)), str(tmp_path), 2, max_keep=1)
    latest = latest_checkpoint(str(tmp_path))
    assert latest.endswith("checkpoint_epoch_2")
    restored = load_checkpoint(latest, state)
    assert int(restored.step) == 9
    np.testing.assert_allclose(np.asarray(restored.params["w"]), np.arange(4.0))


def test_load_params_shape_adaptation(tmp_path):
    """Non-strict loading: matching keys load, count-matching shapes
    reshape (layout adaptation), mismatches keep init values."""
    import jax
    import orbax.checkpoint as ocp
    from pcseqlearning_tpu.runtime.train_utils import load_params_from_file

    src = {"a": np.arange(12, dtype=np.float32).reshape(3, 4),
           "b": np.ones((2, 2), np.float32)}
    ckptr = ocp.StandardCheckpointer()
    path = str(tmp_path / "ck")
    ckptr.save(path, src)
    ckptr.wait_until_finished()

    tgt = {"a": np.zeros((4, 3), np.float32),   # same count, new layout
           "b": np.zeros((5, 5), np.float32),   # mismatch -> keep init
           "c": np.full((2,), 7.0, np.float32)}  # missing -> keep init
    out = load_params_from_file(path, tgt)
    assert np.allclose(np.asarray(out["a"]).ravel(), np.arange(12))
    assert out["a"].shape == (4, 3)
    assert np.allclose(out["b"], 0)
    assert np.allclose(out["c"], 7.0)
