"""Truncation quality A/Bs on the bench scene (VERDICT r4 next-round #3):

  A) hash-grid per-bucket cell cap (production 48/24 vs effectively
     uncapped 256) — the reference scans whole cells
     (/root/reference/pcdet/ops/torch_hash/src/torch_hash_kernel.cu:224-420)
  B) int16 5 mm wire quantization for >2M-point sequence uploads
     (utils/device_seq.py) on vs off

Each arm runs the FULL extraction pipeline (ground -> proposal -> tracking)
in a subprocess (the cell cap and the quant switch are process-wide trace
-time constants) and reports all/moving/static box mIoU. Deltas land in
CELLCAP_AB.json at the repo root; bench.py merges that file into its JSON
line so the BENCH_r<N>.json record carries the measured truncation cost.

Usage: python tools/cellcap_ab.py [--frames 40] [--points 90000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys
sys.path.insert(0, {root!r})
import numpy as np
import bench
bench._enable_compilation_cache()
from pcseqlearning_tpu.utils.warmup import warm_d2h_async
warm_d2h_async()
from pcseqlearning_tpu.preprocessing.ground_removal import GroundPlaneRemover
from pcseqlearning_tpu.preprocessing.cluster_proposal import ClusterProposal
from pcseqlearning_tpu.preprocessing.cluster_tracking import ClusterTracking
from pcseqlearning_tpu.utils.edict import EDict

seq, gt = bench.make_scene(num_frames={frames}, points_per_frame={points})
d = dict(point_fxyz=seq, point_sweep=seq[:, 0].astype(np.int64),
         point_feat=np.zeros((len(seq), 1), np.float32),
         frame_id="ab_seq_000", **gt)
remover = GroundPlaneRemover(EDict(
    PILLAR_SIZE=[2, 2], LR=0.01, DECAY_STEPS=[1600], RIGID_WEIGHT=0.5,
    MAX_NUM_ITERS=2000, TRUNCATE_HEIGHT=[0.5], RANSAC=True, JointOpt=True,
    SIGMA2=0.0025, K=8))
proposal = ClusterProposal(EDict(
    GRAPH=EDict(TYPE="RadiusGraph", RADIUS=[1.25, 0.75], MAX_NUM_NEIGHBORS=32,
                SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
    COMPONENT_KEYS=["component_rad1x25", "component_rad0x75"]))
tracking = ClusterTracking(EDict(
    ANGLE_REGULARIZER=10, COMPONENT_KEYS=["component_rad1x25"],
    REGISTRATION=EDict(
        GRAPH=EDict(TYPE="RadiusGraph", RADIUS=[2.5, 1.25, 1.0],
                    MAX_NUM_NEIGHBORS=1, SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
        VOXEL_SIZE=[[0.4, 0.4, 0.6], [0.2, 0.2, 0.3], [0.1, 0.1, 0.15]],
        STOPPING_DELTA=[0.05, 0.05, 0.05]),
    NN_GRAPH=EDict(TYPE="RadiusGraph", RADIUS=0.5, MAX_NUM_NEIGHBORS=1,
                   SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
    TRACKING_PARAMS=EDict(REGISTRATION_ERROR_COEFFICIENT=0.13, TRACK_INTERVAL=8,
                          ANGLE_THRESHOLD=45, MIN_MOVE_FRAME=6),
    MAX_ICP_ITER=20))
out = tracking(proposal(remover(d)))
sb = out["seq_boxes"]
mov = np.asarray(sb.moving, bool)
biou = np.asarray(sb.best_iou)
print("ABRESULT " + json.dumps(dict(
    all_miou=round(float(biou.mean()), 4),
    moving_miou=round(float(biou[mov].mean()), 4) if mov.any() else None,
    static_miou=round(float(biou[~mov].mean()), 4) if (~mov).any() else None,
)))
"""


def run_arm(name, env_overrides, frames, points):
    env = dict(os.environ, **env_overrides)
    code = _CHILD.format(root=ROOT, frames=frames, points=points)
    print(f"# arm {name}: {env_overrides}", flush=True)
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=5400, env=env)
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            rec = json.loads(line[len("ABRESULT "):])
            print(f"# arm {name}: {rec}", flush=True)
            return rec
    print(p.stdout[-3000:], file=sys.stderr)
    print(p.stderr[-3000:], file=sys.stderr)
    raise RuntimeError(f"arm {name} produced no result (rc={p.returncode})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--points", type=int, default=90_000)
    ap.add_argument("--skip-quant", action="store_true")
    ap.add_argument("--out", default=os.path.join(ROOT, "CELLCAP_AB.json"))
    args = ap.parse_args()

    rec = {"frames": args.frames, "points": args.points}
    base = run_arm("base(cap48)", {}, args.frames, args.points)
    hi = run_arm("cap256", {"PCSEQ_CELL_CAP": "256"}, args.frames, args.points)
    rec["cellcap_48"] = base
    rec["cellcap_256"] = hi
    rec["cellcap_miou_delta"] = round(hi["all_miou"] - base["all_miou"], 4)

    if not args.skip_quant:
        # PCSEQ_WIRE_QUANT=1 FORCES the int16 wire (the adaptive gate
        # would skip it on a fast link); 40 x 90k = 3.6M rows > the 2M
        # engage threshold
        q_on = run_arm("quant_on", {"PCSEQ_WIRE_QUANT": "1"}, args.frames, args.points)
        q_off = run_arm("quant_off", {"PCSEQ_WIRE_QUANT": "0"}, args.frames, args.points)
        rec["wire_quant_on"] = q_on
        rec["wire_quant_off"] = q_off
        rec["wire_quant_miou_delta"] = round(q_on["all_miou"] - q_off["all_miou"], 4)

    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
