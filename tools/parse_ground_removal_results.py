"""Aggregate per-sequence ground-removal stats into precision/coverage
trade-off tables (reference /root/reference/tools/parse_ground_removal_results.py).

Usage: python tools/parse_ground_removal_results.py <LOG_DIR> [heightX ...]
"""

from __future__ import annotations

import sys
from pathlib import Path


def parse_stats_file(path):
    out = {}
    for line in Path(path).read_text().splitlines():
        if "=" in line:
            k, v = line.lstrip("#").split("=", 1)
            try:
                out[k] = float(v)
            except ValueError:
                pass
    return out


def main():
    log_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "output/waymo_sequence_registration/ground_removal/TLS/log")
    height_dirs = sorted(log_dir.glob("height*")) or [log_dir]
    for hd in height_dirs:
        stats = [parse_stats_file(p) for p in sorted(hd.glob("*.txt"))]
        stats = [s for s in stats if s]
        if not stats:
            continue
        n = len(stats)
        keys = ["ground_precision", "ground_coverage", "foreground_precision", "foreground_coverage"]
        agg = {k: sum(s.get(k, 0.0) for s in stats) / n for k in keys}
        print(f"{hd.name}: sequences={n} " + " ".join(f"{k}={v:.6f}" for k, v in agg.items()))


if __name__ == "__main__":
    main()
