"""Host-walk vs batched-walk parity at bench density (VERDICT r3 item 4).

Runs ground removal + cluster proposal ONCE on a bench-density scene, then
tracks the same proposals twice — WALK_MODE=host (reference-shaped NN-graph
walk) and WALK_MODE=batched (the MXU claim-tile walk) — and reports per-box
best-IoU deltas, coverage, and the boxes only one walk finds.

tests/test_walk_parity.py is the CPU-scaled committed twin; this tool runs
the identical comparison at full bench density on the TPU:

    python tools/walk_parity.py --frames 24 --points 90000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--points", type=int, default=90_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--interval", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import bench

    bench._enable_compilation_cache()
    from pcseqlearning_tpu.utils.warmup import warm_d2h_async

    warm_d2h_async()

    from pcseqlearning_tpu.preprocessing.cluster_proposal import ClusterProposal
    from pcseqlearning_tpu.preprocessing.cluster_tracking import ClusterTracking
    from pcseqlearning_tpu.preprocessing.ground_removal import GroundPlaneRemover
    from pcseqlearning_tpu.utils.edict import EDict

    seq, gt = bench.make_scene(num_frames=args.frames,
                               points_per_frame=args.points, seed=args.seed)
    seq_dict = {
        "point_fxyz": seq,
        "point_sweep": seq[:, 0].astype(np.int64),
        "point_feat": np.zeros((len(seq), 1), np.float32),
        "frame_id": "parity_seq_000",
        **gt,
    }
    remover = GroundPlaneRemover(EDict(
        PILLAR_SIZE=[2, 2], LR=0.01, DECAY_STEPS=[1600], RIGID_WEIGHT=0.5,
        MAX_NUM_ITERS=2000, TRUNCATE_HEIGHT=[0.5], RANSAC=True, JointOpt=True,
        SIGMA2=0.0025, K=8,
    ))
    proposal = ClusterProposal(EDict(
        GRAPH=EDict(TYPE="RadiusGraph", RADIUS=[1.25], MAX_NUM_NEIGHBORS=32,
                    SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
        COMPONENT_KEYS=["component_rad1x25"],
    ))
    tracking_cfg = dict(
        ANGLE_REGULARIZER=10,
        COMPONENT_KEYS=["component_rad1x25"],
        REGISTRATION=EDict(
            GRAPH=EDict(TYPE="RadiusGraph", RADIUS=[2.5, 1.25, 1.0],
                        MAX_NUM_NEIGHBORS=1, SORT_BY_DIST=True,
                        RELATIVE_KEY="fxyz"),
            VOXEL_SIZE=[[0.4, 0.4, 0.6], [0.2, 0.2, 0.3], [0.1, 0.1, 0.15]],
            STOPPING_DELTA=[0.05, 0.05, 0.05],
        ),
        NN_GRAPH=EDict(TYPE="RadiusGraph", RADIUS=0.5, MAX_NUM_NEIGHBORS=1,
                       SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
        TRACKING_PARAMS=EDict(REGISTRATION_ERROR_COEFFICIENT=0.13,
                              TRACK_INTERVAL=args.interval,
                              ANGLE_THRESHOLD=45, MIN_MOVE_FRAME=6),
        MAX_ICP_ITER=20,
    )

    out = remover(dict(seq_dict))
    out = proposal(out)

    results = {}
    for mode in ("batched", "host"):
        t0 = time.time()
        tr = ClusterTracking(EDict(dict(tracking_cfg, WALK_MODE=mode)))
        o = tr(dict(out))
        sb = o["seq_boxes"]
        iou = np.asarray(sb.best_iou)
        mov = np.asarray(sb.moving, bool)
        results[mode] = dict(
            wall_s=round(time.time() - t0, 1),
            box_miou=round(float(iou.mean()), 4),
            coverage_0p7=round(float((iou > 0.7).mean()), 4),
            moving_miou=round(float(iou[mov].mean()), 4) if mov.any() else None,
            static_miou=round(float(iou[~mov].mean()), 4) if (~mov).any() else None,
            iou=iou,
        )
        print(f"[{mode}] {dict((k, v) for k, v in results[mode].items() if k != 'iou')}",
              flush=True)

    ih, ib = results["host"].pop("iou"), results["batched"].pop("iou")
    delta = ib - ih
    nailed = ih > 0.8
    rec = dict(
        scene=f"{args.frames} frames x {args.points // 1000}k pts (bench density)",
        host={k: v for k, v in results["host"].items()},
        batched={k: v for k, v in results["batched"].items()},
        iou_delta_mean=round(float(delta.mean()), 4),
        iou_delta_p10=round(float(np.percentile(delta, 10)), 4),
        iou_delta_p90=round(float(np.percentile(delta, 90)), 4),
        host_nailed_batched_found=(
            round(float((ib[nailed] > 0.3).mean()), 4) if nailed.any() else None),
        batched_only=int(((ib > 0.7) & (ih <= 0.7)).sum()),
        host_only=int(((ih > 0.7) & (ib <= 0.7)).sum()),
        num_boxes=int(len(ih)),
    )
    print(json.dumps(rec, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
