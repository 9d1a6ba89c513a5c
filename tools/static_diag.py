"""Static-vs-moving tracking quality diagnosis (VERDICT r4 weak #6).

Runs the bench pipeline on a small mixed scene and reports per-cluster-type
quality plus per-gate ablations, to attribute the static-box mIoU gap
(fullscale r4: static 0.457 vs moving 0.553).

Usage: python tools/static_diag.py [--frames 24] [--points 20000]
       [--ablate none|angle|regerr|devvelo|minmove]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(frames, points, ablate="none", platform="cpu"):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import bench
    from pcseqlearning_tpu.preprocessing.cluster_proposal import ClusterProposal
    from pcseqlearning_tpu.preprocessing.cluster_tracking import ClusterTracking
    from pcseqlearning_tpu.preprocessing.ground_removal import GroundPlaneRemover
    from pcseqlearning_tpu.utils.edict import EDict

    bench._enable_compilation_cache()
    seq, gt = bench.make_scene(num_frames=frames, points_per_frame=points)
    seq_dict = {
        "point_fxyz": seq,
        "point_sweep": seq[:, 0].astype(np.int64),
        "point_feat": np.zeros((len(seq), 1), np.float32),
        "frame_id": "diag_seq_000",
        **gt,
    }
    remover = GroundPlaneRemover(EDict(
        PILLAR_SIZE=[2, 2], LR=0.01, DECAY_STEPS=[1600], RIGID_WEIGHT=0.5,
        MAX_NUM_ITERS=2000, TRUNCATE_HEIGHT=[0.5], RANSAC=True, JointOpt=True,
        SIGMA2=0.0025, K=8,
    ))
    proposal = ClusterProposal(EDict(
        GRAPH=EDict(TYPE="RadiusGraph", RADIUS=[1.25, 0.75], MAX_NUM_NEIGHBORS=32,
                    SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
        COMPONENT_KEYS=["component_rad1x25", "component_rad0x75"],
    ))
    angle = 45 if ablate != "angle" else 179
    coeff = 0.13 if ablate != "regerr" else 10.0
    minmove = 6 if ablate != "minmove" else 0
    tcfg = EDict(
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
        TRACKING_PARAMS=EDict(REGISTRATION_ERROR_COEFFICIENT=coeff, TRACK_INTERVAL=8,
                              ANGLE_THRESHOLD=angle, MIN_MOVE_FRAME=minmove),
        MAX_ICP_ITER=20,
    )
    if ablate == "devvelo":
        os.environ["PCSEQ_NO_DEVVELO_GATE"] = "1"
    tracking = ClusterTracking(tcfg)
    out = remover(dict(seq_dict))
    out = proposal(out)
    out = tracking(out)
    sb = out["seq_boxes"]
    mov = np.asarray(sb.moving, bool)
    biou = np.asarray(sb.best_iou)
    # proposal-stage quality split (before tracking)
    prop_iou = np.asarray(out.get("best_iou_after_component_rad1x25",
                                  np.zeros(len(mov))))
    rec = dict(
        ablate=ablate,
        frames=frames, points=points,
        all_miou=round(float(biou.mean()), 4),
        moving_miou=round(float(biou[mov].mean()), 4),
        static_miou=round(float(biou[~mov].mean()), 4),
        prop_moving_miou=round(float(prop_iou[mov].mean()), 4),
        prop_static_miou=round(float(prop_iou[~mov].mean()), 4),
        frac_zero_static=round(float((biou[~mov] < 0.05).mean()), 4),
        frac_zero_moving=round(float((biou[mov] < 0.05).mean()), 4),
    )
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--points", type=int, default=20_000)
    ap.add_argument("--ablate", default="none")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()
    rec = run(args.frames, args.points, args.ablate, args.platform)
    print("STATIC_DIAG " + json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
