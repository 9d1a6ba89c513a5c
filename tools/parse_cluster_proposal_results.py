"""Aggregate cluster-proposal evaluation outputs: per-class box IoU
histograms and mIoU per radius (reference
/root/reference/tools/parse_cluster_proposal_results.py).

Usage: python tools/parse_cluster_proposal_results.py <DIR>
"""

from __future__ import annotations

import pickle
import sys
from pathlib import Path

import numpy as np


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 else
                "output/waymo_sequence_registration/cluster_proposal/TLS_multiradius")
    per_key = {}
    for pkl in sorted(root.rglob("*.box.pkl")):
        with open(pkl, "rb") as f:
            boxes = pickle.load(f)
        for k, v in boxes.items():
            if k.startswith("best_iou_after_"):
                per_key.setdefault(k, []).append(np.asarray(v))
    for k, vals in per_key.items():
        cat = np.concatenate(vals)
        hist, edges = np.histogram(cat, bins=10, range=(0, 1))
        print(f"{k}: boxes={len(cat)} mIoU={cat.mean():.4f}")
        for h, e in zip(hist, edges):
            print(f"  [{e:.1f},{e + 0.1:.1f}): {h}")


if __name__ == "__main__":
    main()
