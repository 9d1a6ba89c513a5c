"""Reference-envelope capacity run: 210 sweeps x 170k pts = 35.7M points
(the `all_sequence.yaml` workload: NUM_SWEEPS=210, MAX_NUM_POINTS=4e7 —
/root/reference/tools/cfgs/dataset_configs/waymo/PCsequence/registration/
all_sequence.yaml). Writes FULLSCALE_r<N>.json with warmup, per-stage
steady splits, throughput, quality and truncation telemetry.

Usage:  python tools/fullscale_bench.py [--round 4] [--passes 2]
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
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--frames", type=int, default=210)
    ap.add_argument("--points", type=int, default=170_000)
    ap.add_argument("--moving_fraction", type=float, default=0.5,
                    help="1.0 = the r3 all-moving scene (attribution A/B)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import bench  # repo-root bench.py: scene builder + cache setup

    bench._enable_compilation_cache()
    import jax

    # absorb the tunneled backend's first-D2H channel stall (minutes)
    # behind the host-only 35.7M-point scene build
    from pcseqlearning_tpu.utils.warmup import warm_d2h_async

    warm_d2h_async()

    from pcseqlearning_tpu.preprocessing.cluster_proposal import ClusterProposal
    from pcseqlearning_tpu.preprocessing.cluster_tracking import ClusterTracking
    from pcseqlearning_tpu.preprocessing.ground_removal import GroundPlaneRemover
    from pcseqlearning_tpu.utils import telemetry
    from pcseqlearning_tpu.utils.edict import EDict

    def build_seq(jitter_seed):
        # fresh input VALUES per timed pass via a 0.1 mm jitter on the
        # same scene: defeats relay memoization of identical (program,
        # input) pairs without changing any shape bucket (see bench.py —
        # fully-reseeded scenes minted compile variants inside the timed
        # passes)
        seq, gt = bench.make_scene(num_frames=args.frames,
                                   points_per_frame=args.points,
                                   moving_fraction=args.moving_fraction)
        if jitter_seed:
            jr = np.random.RandomState(1000 + jitter_seed)
            seq = seq.copy()
            seq[:, 1:4] += jr.uniform(-1e-4, 1e-4, (len(seq), 3)).astype(np.float32)
        return {
            "point_fxyz": seq,
            "point_sweep": seq[:, 0].astype(np.int64),
            "point_feat": np.zeros((len(seq), 1), np.float32),
            "frame_id": f"fullscale_seq_{jitter_seed:03d}",
            **gt,
        }

    seq_dict = build_seq(0)

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
        TRACKING_PARAMS=EDict(REGISTRATION_ERROR_COEFFICIENT=0.13, TRACK_INTERVAL=8,
                              ANGLE_THRESHOLD=45, MIN_MOVE_FRAME=6),
        MAX_ICP_ITER=20,
    ))

    def run_once(d):
        splits = {}
        t = time.time()
        out = remover(dict(d))
        splits["ground_s"] = round(time.time() - t, 1)
        t = time.time()
        out = proposal(out)
        splits["proposal_s"] = round(time.time() - t, 1)
        t = time.time()
        out = tracking(out)
        splits["tracking_s"] = round(time.time() - t, 1)
        jax.block_until_ready(jax.numpy.zeros(1))
        return out, splits

    t0 = time.time()
    out, _ = run_once(seq_dict)  # quality record: canonical seed-0 scene
    warmup_s = round(time.time() - t0, 1)
    print(f"# warmup: {warmup_s}s", flush=True)

    telemetry.reset()
    best = None
    for i in range(args.passes):
        t0 = time.time()
        _, splits = run_once(build_seq(i + 1))
        dt = time.time() - t0
        print(f"# pass {i}: {dt:.1f}s {splits}", flush=True)
        if best is None or dt < best[0]:
            best = (dt, splits)
    steady_s, splits = best
    counters = telemetry.snapshot()
    for k in ("proposal_scan_windows_truncated", "proposal_halo_truncated",
              "tracking_claim_windows_truncated", "tracking_claim_overflow"):
        counters.setdefault(k, 0)

    sb = out["seq_boxes"]
    mov = np.asarray(sb.moving, bool)
    biou = np.asarray(sb.best_iou)
    rec = {
        "scene": (f"synthetic all_sequence envelope: {args.frames} sweeps x "
                  f"{args.points // 1000}k pts = "
                  f"{args.frames * args.points / 1e6:.1f}M points "
                  f"(reference NUM_SWEEPS=210, MAX_NUM_POINTS=4e7), "
                  f"moving_fraction={args.moving_fraction}"),
        "moving_fraction": args.moving_fraction,
        "warmup_s": warmup_s,
        "steady_pass_s": round(steady_s, 1),
        "steady_ground_s": splits["ground_s"],
        "steady_proposal_s": splits["proposal_s"],
        "steady_tracking_s": splits["tracking_s"],
        "frames_per_hour_per_chip": round(args.frames / steady_s * 3600.0, 1),
        "box_miou": round(float(biou.mean()), 4),
        "moving_box_miou": round(float(biou[mov].mean()), 4) if mov.any() else None,
        "static_box_miou": round(float(biou[~mov].mean()), 4) if (~mov).any() else None,
        "num_moving_gt": int(mov.sum()),
        "num_static_gt": int((~mov).sum()),
        "truncation_telemetry": {k: int(v) for k, v in sorted(counters.items())},
    }
    path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"FULLSCALE_r{args.round:02d}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
