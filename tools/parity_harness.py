"""Golden-sequence parity harness: run the full extraction pipeline on a
deterministic synthetic sequence and emit the reference's stats formats —
ground removal precision/coverage (reference
ground_plane_remover.py:159-183), proposal mIoU / trace mIoU
(cluster_proposal.py:265-270), tracking segment coverage and box/moving
mIoU (cluster_tracking.py:890-910).

Usage:
    python tools/parity_harness.py [--frames 12] [--points 20000] [--json]

tests/test_golden_parity.py pins the small-scale numbers; bench.py runs the
full-density equivalent on TPU.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def run(num_frames=12, points_per_frame=20_000, seed=0, track_interval=4,
        cell_cap=None):
    from bench import make_scene
    from pcseqlearning_tpu.preprocessing.ground_removal import GroundPlaneRemover
    from pcseqlearning_tpu.preprocessing.cluster_proposal import ClusterProposal
    from pcseqlearning_tpu.preprocessing.cluster_tracking import ClusterTracking
    from pcseqlearning_tpu.utils.edict import EDict

    seq, gt = make_scene(num_frames=num_frames, points_per_frame=points_per_frame, seed=seed)
    d = {
        "point_fxyz": seq,
        "point_sweep": seq[:, 0].astype(np.int64),
        "point_feat": np.zeros((len(seq), 1), np.float32),
        "frame_id": "parity_seq_000",
        **gt,
    }

    remover = GroundPlaneRemover(EDict(
        PILLAR_SIZE=[2, 2], LR=0.01, DECAY_STEPS=[400], RIGID_WEIGHT=0.5,
        MAX_NUM_ITERS=500, TRUNCATE_HEIGHT=[0.5], RANSAC=True, JointOpt=True,
        SIGMA2=0.0025, K=8,
    ))
    d = remover(d)
    stats = {}
    # ground stats from the removal pass: removed = below truncate height
    seg_kept = d["segmentation_label"] if "segmentation_label" in d else None
    full_h = np.asarray(d["full_point_height"]).reshape(-1)
    # synthetic GT: ground points have z < 0.3 in the raw scene
    raw_z = np.asarray(d["full_point_fxyz"])[:, 3]
    is_ground = raw_z < 0.3
    removed = full_h <= 0.5
    stats["ground_coverage"] = float((removed & is_ground).sum() / max(is_ground.sum(), 1))
    stats["foreground_precision"] = float((~removed & ~is_ground).sum() / max((~removed).sum(), 1))

    prop_cfg = EDict(
        GRAPH=EDict(TYPE="RadiusGraph", RADIUS=[1.25], MAX_NUM_NEIGHBORS=32,
                    SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
        COMPONENT_KEYS=["component_rad1x25"],
    )
    if cell_cap is not None:
        # truncation-bound A/B (VERDICT r4 #3): the per-bucket scan cap of
        # the radius-CC hash grid — the reference scans whole cells
        # (torch_hash_kernel.cu:224-420)
        prop_cfg.CELL_CAP = int(cell_cap)
        prop_cfg.CC_CELL_CAP = int(cell_cap)
    proposal = ClusterProposal(prop_cfg)
    d = proposal(d)
    stats["proposal_miou"] = float(np.asarray(d["gt_box_best_iou"]).mean())
    stats["trace_miou"] = float(np.asarray(d["gt_trace_best_iou"]).mean())
    stats["num_components"] = int(np.asarray(d["point_component_rad1x25"]).max()) + 1

    tracking = ClusterTracking(EDict(
        ANGLE_REGULARIZER=10,
        COMPONENT_KEYS=["component_rad1x25"],
        REGISTRATION=EDict(
            GRAPH=EDict(TYPE="RadiusGraph", RADIUS=[2.5, 1.25, 1.0], MAX_NUM_NEIGHBORS=1,
                        SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
            VOXEL_SIZE=[[0.4, 0.4, 0.6], [0.2, 0.2, 0.3], [0.1, 0.1, 0.15]],
            STOPPING_DELTA=[0.05, 0.05, 0.05],
        ),
        NN_GRAPH=EDict(TYPE="RadiusGraph", RADIUS=0.5, MAX_NUM_NEIGHBORS=1,
                       SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
        TRACKING_PARAMS=EDict(REGISTRATION_ERROR_COEFFICIENT=0.13,
                              TRACK_INTERVAL=track_interval,
                              ANGLE_THRESHOLD=45, MIN_MOVE_FRAME=3),
        MAX_ICP_ITER=20,
    ))
    d = tracking(d)
    sb = d["seq_boxes"]
    stats["tracking_coverage_0.7"] = float((sb.best_iou > 0.7).mean())
    stats["box_miou"] = float(sb.best_iou.mean())
    mov = sb.moving.astype(bool)
    stats["moving_box_miou"] = float(sb.best_iou[mov].mean()) if mov.any() else float("nan")
    return stats


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--points", type=int, default=20_000)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    stats = run(num_frames=args.frames, points_per_frame=args.points)
    if args.json:
        print(json.dumps(stats))
    else:
        for k, v in stats.items():
            print(f"{k}: {v}")
