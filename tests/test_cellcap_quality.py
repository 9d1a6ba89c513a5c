"""Truncation-cost bound for the hash-grid per-bucket cell cap (VERDICT r4
weak #4 / next-round #3).

The reference's radius scan reads every point of every touched cell
(/root/reference/pcdet/ops/torch_hash/src/torch_hash_kernel.cu:224-420);
the TPU hash grid clips each xy-column probe at ``cell_cap`` candidates
(ops/hash_graph.radius_neighbors). This test runs the full extraction
pipeline twice on the deterministic parity scene — once at the production
cap (24, the proposal-CC default) and once effectively uncapped (256) —
and asserts the end-to-end box mIoU moves by < 0.01: the dropped candidates
are redundant intra-cluster edges, not connectivity-carrying ones.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.mark.slow
def test_cell_cap_miou_delta_small():
    from parity_harness import run

    lo = run(num_frames=8, points_per_frame=10_000, cell_cap=24)
    hi = run(num_frames=8, points_per_frame=10_000, cell_cap=256)
    delta = abs(hi["box_miou"] - lo["box_miou"])
    assert delta < 0.01, (
        f"cell_cap 24 vs 256 moved box mIoU by {delta:.4f} "
        f"({lo['box_miou']:.4f} -> {hi['box_miou']:.4f})"
    )
    # connectivity itself must also be stable: component count within 5%
    rel = abs(hi["num_components"] - lo["num_components"]) / max(lo["num_components"], 1)
    assert rel < 0.05, (
        f"cell_cap changed component count {lo['num_components']} -> "
        f"{hi['num_components']}"
    )
