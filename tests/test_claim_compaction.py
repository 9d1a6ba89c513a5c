"""Sparse-claim extraction wire format: the device compaction
(_compact_claims + _box_assign_batch2) and the batched-claim
orchestration in extract_traces_and_update_boxes must reproduce the dense
per-frame claim path exactly (the TPU-only Pallas claim kernel is
substituted with a brute-force CPU twin)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcseqlearning_tpu.preprocessing import cluster_tracking as ct
from pcseqlearning_tpu.utils.edict import EDict


def test_compact_claims_and_box_counts():
    from pcseqlearning_tpu.preprocessing.cluster_tracking import (
        _box_assign_batch2, _compact_claims)

    rng = np.random.RandomState(0)
    M = 512
    comp = np.full(M, -1, np.int16)
    hit = rng.rand(M) < 0.1
    comp[hit] = rng.randint(0, 5, hit.sum())
    gt = rng.randint(-1, 3, M).astype(np.int16)
    pos, cc, gg, cnt = _compact_claims(jnp.asarray(comp), jnp.asarray(gt), 128)
    n = int(cnt)
    assert n == hit.sum()
    pos = np.asarray(pos)[:n]
    assert sorted(pos) == sorted(np.nonzero(hit)[0].tolist())
    np.testing.assert_array_equal(np.asarray(cc)[:n], comp[pos])
    np.testing.assert_array_equal(np.asarray(gg)[:n], gt[pos])

    pts = rng.rand(2, 64, 3).astype(np.float32) * 8 - 4
    boxes = np.zeros((2, 4, 7), np.float32)
    boxes[:, :2] = [0, 0, 0, 3, 3, 3, 0.2]
    bval = np.zeros((2, 4), bool)
    bval[:, :2] = True
    gid, m1 = _box_assign_batch2(
        jnp.asarray(pts), jnp.asarray(boxes), jnp.asarray(bval))
    gid, m1 = np.asarray(gid), np.asarray(m1)
    for f in range(2):
        want = np.bincount(gid[f][gid[f] >= 0], minlength=4)
        np.testing.assert_array_equal(m1[f], want)


def _cpu_window_claim(refs, rvalid, ref_comp, q, qv, radius, F, X, Y,
                      W=2048, Bq=256):
    """Brute-force same-frame NN claim with the z-band test — the CPU twin
    of _window_claim_pallas for orchestration testing."""
    refs, rvalid = np.asarray(refs), np.asarray(rvalid)
    ref_comp = np.asarray(ref_comp)
    q, qv = np.asarray(q), np.asarray(qv)
    r = float(radius)
    out = np.full(len(q), -1, np.int16)
    for i in range(len(q)):
        if not qv[i]:
            continue
        same = rvalid & (np.round(refs[:, 0]) == np.round(q[i, 0]))
        if not same.any():
            continue
        d2 = ((refs[same, 1:4] - q[i, 1:4]) ** 2).sum(1)
        j = np.argmin(d2)
        if d2[j] > r * r:
            continue
        jj = np.nonzero(same)[0][j]
        zdiff = refs[jj, 3] - q[i, 3]
        if -0.05 < zdiff < 0.5:
            out[i] = ref_comp[jj]
    return jnp.asarray(out), jnp.asarray(0)


def _scene():
    rng = np.random.RandomState(2)
    frames, comps = [], []
    for f in range(3):
        for c in range(3):
            pts = rng.randn(30, 3).astype(np.float32) * 0.3
            pts[:, :2] += np.asarray([c * 6.0 + f * 0.2, c * 2.0])
            pts[:, 2] += 1.0
            frames.append(np.concatenate(
                [np.full((30, 1), f, np.float32), pts], 1))
            comps.append(np.full(30, c))
    fxyz = np.concatenate(frames)
    comp = np.concatenate(comps)
    order = np.argsort(fxyz[:, 0], kind="stable")
    return fxyz[order], comp[order]


def _run_extract(monkey_sparse):
    fxyz, comp = _scene()
    all_points = EDict(
        xyz=fxyz[:, 1:4],
        frame=fxyz[:, 0].astype(int),
        segmentation_label=np.zeros(len(fxyz), np.int64),
    )
    extracted = EDict(
        fxyz=fxyz.copy(), component=comp.astype(np.int64),
        segmentation_label=np.zeros(len(fxyz), np.int64),
        original_indices=np.arange(len(fxyz)),
        moving=np.ones(len(fxyz), bool),
        transforms=np.zeros((3, 7, 4, 4), np.float32),
        reg_errors=np.zeros((3, 7), np.float32),
        comp_edge_ratios=np.ones((3, 7), np.float32),
    )
    boxes_attr = np.asarray(
        [[c * 6.0 + f * 0.2, c * 2.0, 1.0, 2.5, 2.5, 2.0, 0.0]
         for f in range(3) for c in range(3)], np.float32)
    seq_boxes = EDict(
        attr=boxes_attr,
        frame=np.repeat(np.arange(3), 3),
        trace_id=np.tile(np.arange(3), 3),
        cls_label=np.ones(9, np.int64),
        moving=np.ones(9, bool),
        best_iou=np.zeros(9, np.float32),
    )
    tr = ct.ClusterTracking(EDict(
        ANGLE_REGULARIZER=10,
        COMPONENT_KEYS=["c"],
        REGISTRATION=EDict(GRAPH=EDict(TYPE="RadiusGraph", RADIUS=[1.0],
                                       MAX_NUM_NEIGHBORS=1, SORT_BY_DIST=True,
                                       RELATIVE_KEY="fxyz"),
                           VOXEL_SIZE=[[0.2, 0.2, 0.3]],
                           STOPPING_DELTA=[0.05]),
        NN_GRAPH=EDict(TYPE="RadiusGraph", RADIUS=0.5, MAX_NUM_NEIGHBORS=1,
                       SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
        TRACKING_PARAMS=EDict(TRACK_INTERVAL=3),
    ))
    if monkey_sparse:
        from pcseqlearning_tpu.ops import pallas_scan

        orig_use, orig_claim = pallas_scan.use_pallas_scan, ct._window_claim_pallas
        pallas_scan.use_pallas_scan = lambda: True
        ct._window_claim_pallas = _cpu_window_claim
        try:
            out, sb = tr.extract_traces_and_update_boxes(
                all_points, extracted, seq_boxes)
        finally:
            pallas_scan.use_pallas_scan = orig_use
            ct._window_claim_pallas = orig_claim
    else:
        out, sb = tr.extract_traces_and_update_boxes(
            all_points, extracted, seq_boxes)
    return out, sb


def test_sparse_claim_orchestration_matches_dense():
    out_s, sb_s = _run_extract(monkey_sparse=True)
    out_d, sb_d = _run_extract(monkey_sparse=False)
    # both paths must claim every point into its own component and agree
    # on the box IoU bookkeeping
    assert len(out_s.fxyz) > 0
    np.testing.assert_allclose(sb_s.best_iou, sb_d.best_iou, atol=2e-2)
    assert (sb_s.best_iou > 0.5).all()
    rows_s = {(int(f), int(c)) for f, c in
              zip(out_s.original_indices, out_s.component)}
    rows_d = {(int(f), int(c)) for f, c in
              zip(out_d.original_indices, out_d.component)}
    inter = len(rows_s & rows_d)
    assert inter / max(len(rows_s), len(rows_d)) > 0.95
