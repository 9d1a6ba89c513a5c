"""Aggregate cluster-tracking artifacts: per-sequence coverage and box/moving
mIoU at an IoU threshold (reference
/root/reference/tools/parse_cluster_tracking_results.py:43,60-92).

Usage: python tools/parse_cluster_tracking_results.py <DIR> [--thresh 0.7]
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir", type=str)
    ap.add_argument("--thresh", type=float, default=0.7)
    args = ap.parse_args()

    root = Path(args.dir)
    all_iou, all_moving_iou, seq_cov = [], [], []
    for seq_dir in sorted(p for p in root.iterdir() if p.is_dir()):
        pkl = seq_dir / "all.pkl"
        if not pkl.exists():
            continue
        with open(pkl, "rb") as f:
            boxes = pickle.load(f)
        best_iou = np.asarray(boxes["best_iou"])
        moving = np.asarray(boxes["moving"]).astype(bool)
        cov = float((best_iou > args.thresh).mean()) if len(best_iou) else 0.0
        miou = float(best_iou.mean()) if len(best_iou) else 0.0
        m_miou = float(best_iou[moving].mean()) if moving.any() else float("nan")
        print(f"{seq_dir.name}: boxes={len(best_iou)} coverage@{args.thresh}={cov:.4f} "
              f"mIoU={miou:.4f} moving_mIoU={m_miou:.4f}")
        all_iou.append(best_iou)
        if moving.any():
            all_moving_iou.append(best_iou[moving])
        seq_cov.append(cov)

    if all_iou:
        cat = np.concatenate(all_iou)
        print(f"TOTAL: boxes={len(cat)} coverage@{args.thresh}={(cat > args.thresh).mean():.4f} "
              f"mIoU={cat.mean():.4f}")
    if all_moving_iou:
        cat = np.concatenate(all_moving_iou)
        print(f"MOVING: boxes={len(cat)} coverage@{args.thresh}={(cat > args.thresh).mean():.4f} "
              f"mIoU={cat.mean():.4f}")


if __name__ == "__main__":
    main()
