"""End-to-end extraction-pipeline integration test on a synthetic scene:
flat ground + two elevated clusters, one translating rigidly. Mirrors the
reference's metric-driven validation style (SURVEY.md §4)."""

import numpy as np
import pytest

from pcseqlearning_tpu.utils.edict import EDict


def _scene(num_frames=4, seed=0):
    rng = np.random.RandomState(seed)
    frames = []
    seg = []
    for f in range(num_frames):
        gx = rng.rand(1500, 2) * 30 - 15
        ground = np.stack([gx[:, 0], gx[:, 1], rng.randn(1500) * 0.02], 1)
        # cluster A moves +0.4m/frame in x; cluster B static
        a = rng.randn(120, 3) * 0.4 + np.array([2.0 + 0.4 * f, 3.0, 1.2])
        b = rng.randn(100, 3) * 0.4 + np.array([-5.0, -4.0, 1.0])
        xyz = np.concatenate([ground, a, b]).astype(np.float32)
        fcol = np.full((len(xyz), 1), f, np.float32)
        frames.append(np.concatenate([fcol, xyz], 1))
        s = np.zeros(len(xyz), np.int64)
        s[:1500] = 17  # ground labels
        s[1500:1620] = 1  # vehicle-ish
        s[1620:] = 1
        seg.append(s)
    return np.concatenate(frames), np.concatenate(seg)


@pytest.fixture(scope="module")
def seq_dict(tmp_path_factory):
    pts, seg = _scene()
    d = {
        "point_fxyz": pts,
        "point_sweep": pts[:, 0].astype(np.int64),
        "point_feat": np.zeros((len(pts), 1), np.float32),
        "segmentation_label": seg,
        "frame_id": "test_seq_000",
    }
    return d


def test_ground_removal(seq_dict, tmp_path):
    from pcseqlearning_tpu.preprocessing.ground_removal import GroundPlaneRemover

    remover = GroundPlaneRemover(EDict(
        PILLAR_SIZE=[2, 2], LR=0.01, DECAY_STEPS=[200], RIGID_WEIGHT=0.5,
        MAX_NUM_ITERS=300, TRUNCATE_HEIGHT=[0.5], RANSAC=False, JointOpt=True,
        SIGMA2=0.0025, K=8,
        DIR=str(tmp_path / "height"), LOG_DIR=str(tmp_path / "log"),
    ))
    out = remover(dict(seq_dict))
    # ground (z~0) removed, clusters (z~1+) kept
    kept = out["point_fxyz"]
    seg_kept = out["segmentation_label"]
    frac_ground_kept = (seg_kept == 17).mean()
    frac_cluster_kept = (seg_kept == 1).mean()
    assert frac_cluster_kept > 0.5, "clusters should dominate the kept points"
    assert len(kept) < len(seq_dict["point_fxyz"]) * 0.5, "most ground removed"
    # stats file written
    stats = list((tmp_path / "log").rglob("*.txt"))
    assert stats, "per-sequence stats file missing"
    txt = stats[0].read_text()
    assert "ground_coverage" in txt and "foreground_precision" in txt


@pytest.mark.parametrize("device_walk", [False, True])
def test_cluster_proposal_and_tracking(seq_dict, tmp_path, device_walk):
    from pcseqlearning_tpu.preprocessing.cluster_proposal import ClusterProposal
    from pcseqlearning_tpu.preprocessing.cluster_tracking import ClusterTracking

    # feed only above-ground points (simulate post-removal)
    pts = seq_dict["point_fxyz"]
    above = pts[:, 3] > 0.4
    d = {
        "point_fxyz": pts[above],
        "point_sweep": seq_dict["point_sweep"][above],
        "segmentation_label": seq_dict["segmentation_label"][above],
        "frame_id": "test_seq_000",
        # GT: one box per frame per cluster (A moving, B static)
        "gt_box_attr": np.concatenate([
            np.array([[2.0 + 0.4 * f, 3.0, 1.2, 2.4, 2.4, 2.4, 0.0],
                      [-5.0, -4.0, 1.0, 2.4, 2.4, 2.4, 0.0]], np.float32)
            for f in range(4)
        ]),
        "gt_box_cls_label": np.tile([1, 1], 4),
        "gt_box_track_label": np.tile([0, 1], 4),
        "gt_box_frame": np.repeat(np.arange(4), 2),
        "gt_box_velo": np.tile([0.4, 0.0], 4).astype(np.float32),
        "moving": np.tile([True, False], 4),
    }
    proposal = ClusterProposal(EDict(
        GRAPH=EDict(TYPE="RadiusGraph", RADIUS=[1.0], MAX_NUM_NEIGHBORS=16,
                    SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
        COMPONENT_KEYS=["component_rad1x0"],
        CHUNK_FRAMES=10,
    ))
    d = proposal(d)
    comp = d["point_component_rad1x0"]
    assert comp.min() >= 0
    # within one frame, cluster A and B points get different components
    f0 = d["point_sweep"] == 0
    seg0 = d["segmentation_label"][f0]
    c0 = comp[f0]
    cluster_comps = set(c0[(seg0 == 1)].tolist())  # clusters A and B
    assert len(cluster_comps) >= 2  # two spatially separated clusters
    # proposals score well against GT boxes
    assert d["gt_box_best_iou"].max() > 0.8

    tracking = ClusterTracking(EDict(
        ANGLE_REGULARIZER=10,
        COMPONENT_KEYS=["component_rad1x0"],
        REGISTRATION=EDict(
            GRAPH=EDict(TYPE="RadiusGraph", RADIUS=[2.5, 1.0], MAX_NUM_NEIGHBORS=1,
                        SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
            VOXEL_SIZE=[[0.4, 0.4, 0.6], [0.2, 0.2, 0.3]],
            STOPPING_DELTA=[0.05, 0.05],
        ),
        NN_GRAPH=EDict(TYPE="RadiusGraph", RADIUS=0.5, MAX_NUM_NEIGHBORS=1,
                       SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
        DIR=str(tmp_path / "tracking"),
        TRACKING_PARAMS=EDict(REGISTRATION_ERROR_COEFFICIENT=0.5, TRACK_INTERVAL=3,
                              ANGLE_THRESHOLD=45, MIN_MOVE_FRAME=2),
        MAX_ICP_ITER=10,
        DEVICE_WALK=device_walk,
    ))
    d["full_point_fxyz"] = seq_dict["point_fxyz"]
    d["full_point_sweep"] = seq_dict["point_sweep"]
    d["full_point_height"] = seq_dict["point_fxyz"][:, 3].copy()
    d["full_segmentation_label"] = seq_dict["segmentation_label"]
    d = tracking(d)
    sb = d["seq_boxes"]
    # tracking must cover the boxes with decent IoU
    assert sb.best_iou.max() > 0.5
    # artifacts written with the reference's naming scheme
    files = list((tmp_path / "tracking").rglob("*.pkl"))
    assert any(f.name == "all.pkl" for f in files)


def test_ground_removal_ransac(seq_dict, tmp_path):
    """RANSAC + TLS path (batched 30-ratio IRLS)."""
    from pcseqlearning_tpu.preprocessing.ground_removal import GroundPlaneRemover

    remover = GroundPlaneRemover(EDict(
        PILLAR_SIZE=[4, 4], LR=0.01, DECAY_STEPS=[100], RIGID_WEIGHT=0.5,
        MAX_NUM_ITERS=150, TRUNCATE_HEIGHT=[0.5], RANSAC=True, JointOpt=True,
        SIGMA2=0.0025, K=4,
    ))
    out = remover(dict(seq_dict))
    seg_kept = out["segmentation_label"]
    assert (seg_kept == 1).mean() > 0.5  # clusters dominate kept points
    # the flat ground must be fit: pillar heights near 0
    heights = np.asarray(out["full_point_height"])
    ground_pts = seq_dict["segmentation_label"] == 17
    assert np.median(np.abs(heights[ground_pts])) < 0.3


def test_voxel_count_scatter_matches_unique(rng):
    """The scatter-based occupancy counter (ground solve-grid sizing) must
    match host np.unique at every dyadic coarsening level it evaluates."""
    import jax.numpy as jnp
    from pcseqlearning_tpu.preprocessing.ground_removal import (
        _COUNT_TABLE_CAP, _count_voxels_scatter)

    pts = rng.rand(30000, 3).astype(np.float32) * np.array([35, 35, 4], np.float32)
    fx = np.concatenate([np.zeros((30000, 1), np.float32), pts], axis=1)
    base = np.array([0.10, 0.10, 0.03])
    ext = pts.max(0) - pts.min(0)
    for s in range(3):
        cell = base * 2.0 ** s
        dims = np.floor(ext / cell).astype(np.int64) + 1
        assert dims.prod() <= _COUNT_TABLE_CAP
        got = int(_count_voxels_scatter(
            jnp.asarray(fx), jnp.asarray(30000, jnp.int32),
            jnp.asarray(1.0 / cell, jnp.float32), jnp.asarray(dims, jnp.int32),
            _COUNT_TABLE_CAP))
        c = np.floor((pts - pts.min(0)) / cell).astype(np.int64)
        want = len(np.unique(c[:, 0] * (1 << 42) + c[:, 1] * (1 << 21) + c[:, 2]))
        # f32-vs-f64 boundary jitter only (count sizes a padded table)
        assert abs(got - want) <= max(3, int(0.002 * want)), (s, got, want)


def test_voxel_count_hier_matches_unique(rng):
    """The one-pass hierarchical counter (scatter once at the finest level,
    max-pool the occupancy table per coarser level) must match np.unique at
    EVERY level — pooled counts are exact because floor-division nests."""
    import jax.numpy as jnp
    from pcseqlearning_tpu.preprocessing.ground_removal import _count_voxel_hier

    rs = np.random.RandomState(7)
    pts = rs.rand(40000, 3).astype(np.float32) * np.array([30, 30, 5], np.float32)
    fx = np.concatenate([np.zeros((40000, 1), np.float32), pts], axis=1)
    base = np.array([0.10, 0.10, 0.03])
    n_lv = 4
    dims = np.floor((pts.max(0) - pts.min(0)) / base).astype(np.int64) + 1
    mult = (1 << (n_lv - 1)) * 8
    dims_p = tuple(int(d) for d in (dims + mult - 1) // mult * mult)
    got = np.asarray(_count_voxel_hier(
        jnp.asarray(fx), jnp.asarray(40000, jnp.int32),
        jnp.asarray(1.0 / base, jnp.float32), dims_p, n_lv))
    for s in range(n_lv):
        cell = base * 2.0 ** s
        c = np.floor((pts - pts.min(0)) / cell).astype(np.int64)
        want = len(np.unique(c[:, 0] * (1 << 42) + c[:, 1] * (1 << 21) + c[:, 2]))
        assert abs(int(got[s]) - want) <= max(3, int(0.002 * want)), (s, int(got[s]), want)
