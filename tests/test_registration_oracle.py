"""Reference-parity oracle for the registration core.

The reference's hottest math — ``register_to_next_frame`` + the robust
reducers (/root/reference/pcdet/models/registration/preprocessors/
registration_utils.py:12-206) — re-expressed here as a PLAIN NUMPY f64
oracle (independent structure: per-edge python loops over brute-force NN,
np.linalg.svd, explicit countdown), asserted against the repo's batched
jitted ICP (preprocessing/registration.py) per ITERATION on random rigid
scenes. This replaces "golden = our own round-1 output" with true
reference-semantics parity for the pipeline's core.
"""

from __future__ import annotations

import numpy as np
import pytest

from pcseqlearning_tpu.ops import segment_ops
from pcseqlearning_tpu.preprocessing.registration import register_to_next_frame


# ---------------------------------------------------------------------------
# numpy oracle: reference semantics, f64, loop-per-edge clarity over speed
# ---------------------------------------------------------------------------

def _nn_within(src, dst, radius):
    """For each src point: index of nearest dst point if within radius."""
    d2 = ((src[:, None, :] - dst[None, :, :]) ** 2).sum(-1)
    idx = d2.argmin(1)
    ok = d2[np.arange(len(src)), idx] <= radius * radius
    return idx, ok


def _seg_mean(vals, ids, C):
    out = np.zeros((C,) + vals.shape[1:], np.float64)
    cnt = np.zeros(C, np.float64)
    for v, i in zip(vals, ids):
        out[i] += v
        cnt[i] += 1
    nz = cnt > 0
    out[nz] = out[nz] / cnt[nz].reshape((-1,) + (1,) * (vals.ndim - 1))
    return out


def _trunc_robust_mean(vals, ids, C, trunc):
    """mean -> clamp each element to segment-mean +- trunc -> mean again
    (reference truncated_robust_mean, registration_utils.py:44-58)."""
    m0 = _seg_mean(vals, ids, C)
    clamped = np.clip(vals, m0[ids] - trunc, m0[ids] + trunc)
    return _seg_mean(clamped, ids, C)


def oracle_icp(moving_xyz, comp, ref_xyz, C, radius, angle_reg=10.0,
               max_iter=20, stopping_delta=5e-2, trunc_dist=0.3):
    """Reference register_to_next_frame semantics (lines 125-186), f64.

    Returns the list of per-iteration (T [C,4,4], l1_error [C], loss)
    after each executed body, with the reference's countdown stopping."""
    xyz = moving_xyz.astype(np.float64).copy()
    ref = ref_xyz.astype(np.float64)
    T = np.tile(np.eye(4), (C, 1, 1))
    last, countdown = 1e10, 3
    history = []
    for _ in range(max_iter):
        f_idx, f_ok = _nn_within(xyz, ref, radius)     # moving -> ref
        b_idx, b_ok = _nn_within(ref, xyz, radius)     # ref -> moving
        e_m = np.concatenate([np.arange(len(xyz))[f_ok], b_idx[b_ok]])
        e_r = np.concatenate([f_idx[f_ok], np.arange(len(ref))[b_ok]])
        e_c = comp[e_m]

        mc = _seg_mean(xyz[e_m], e_c, C)
        rc = _seg_mean(ref[e_r], e_c, C)
        P = xyz[e_m] - mc[e_c]
        Q = ref[e_r] - rc[e_c]
        dist = np.linalg.norm(P - Q, axis=-1)
        l1 = _trunc_robust_mean(dist, e_c, C, trunc_dist)
        loss = float((dist ** 2).sum())

        cov = _seg_mean(P[:, :, None] * Q[:, None, :], e_c, C)
        A = cov + T[:, :3, :3] * angle_reg
        R = np.zeros((C, 3, 3))
        for c in range(C):
            U, _, VT = np.linalg.svd(A[c])
            V = VT.T
            sign = np.diag([1.0, 1.0, np.linalg.det(V @ U.T)])
            R[c] = V @ sign @ U.T
        t = rc - np.einsum("cij,cj->ci", R, mc)
        Ti = np.tile(np.eye(4), (C, 1, 1))
        Ti[:, :3, :3] = R
        Ti[:, :3, 3] = t
        T = Ti @ T
        xyz = np.einsum("nij,nj->ni", R[comp], xyz) + t[comp]
        history.append((T.copy(), l1.copy(), loss))
        if last - loss < stopping_delta:
            countdown -= 1
        else:
            countdown = 3
        if countdown <= 0:
            break
        last = loss
    return history


def make_rigid_scene(seed, C=5, per=60, rot_deg=8.0, trans=0.4):
    """C well-separated clusters; ref = per-component rigid motion of
    moving. Separation (>=12 m) >> radius so components can't cross-match."""
    rng = np.random.RandomState(seed)
    centers = np.stack([np.arange(C) * 14.0,
                        (np.arange(C) % 2) * 14.0,
                        np.zeros(C)], 1) + rng.randn(C, 3)
    pts, comp, gt_T = [], [], []
    for c in range(C):
        p = centers[c] + rng.randn(per, 3) * np.array([1.2, 1.0, 0.5])
        ang = np.deg2rad(rng.uniform(-rot_deg, rot_deg))
        ca, sa = np.cos(ang), np.sin(ang)
        R = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1.0]])
        t = rng.uniform(-trans, trans, 3)
        # rotate about the cluster center, then translate
        q = (p - centers[c]) @ R.T + centers[c] + t
        pts.append((p, q))
        comp.append(np.full(per, c))
        M = np.eye(4)
        M[:3, :3] = R
        M[:3, 3] = centers[c] - R @ centers[c] + t
        gt_T.append(M)
    moving = np.concatenate([p for p, _ in pts]).astype(np.float32)
    ref = np.concatenate([q for _, q in pts]).astype(np.float32)
    return moving, np.concatenate(comp).astype(np.int32), ref, np.stack(gt_T)


def _run_repo(moving, comp, ref, C, radius, max_iter):
    n = len(moving)
    T, l1, ratio, moved = register_to_next_frame(
        moving, comp, np.ones(n, bool), ref, np.ones(len(ref), bool),
        num_components=C, radius=radius, angle_regularizer=10.0,
        max_iter=max_iter, stopping_delta=5e-2, trunc_dist=0.3)
    return np.asarray(T), np.asarray(l1), np.asarray(ratio), np.asarray(moved)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_icp_matches_reference_oracle_per_iteration(seed):
    """The repo's batched jitted ICP must track the f64 reference-semantics
    oracle ITERATION BY ITERATION: same incremental transforms, same
    truncated-robust errors, under the same countdown stopping."""
    moving, comp, ref, _ = make_rigid_scene(seed)
    C, radius = 5, 2.0
    hist = oracle_icp(moving, comp, ref, C, radius)
    for k in (1, 2, 4, len(hist)):
        k = min(k, len(hist))
        T_o, l1_o, _ = hist[k - 1]
        T_r, l1_r, _, _ = _run_repo(moving, comp, ref, C, radius, max_iter=k)
        np.testing.assert_allclose(T_r, T_o, atol=2e-3,
                                   err_msg=f"seed={seed} iter={k} transform")
        np.testing.assert_allclose(l1_r, l1_o, atol=2e-3,
                                   err_msg=f"seed={seed} iter={k} l1_error")


@pytest.mark.parametrize("seed", [0, 3])
def test_icp_recovers_ground_truth_motion(seed):
    """Converged per-component transforms must approximate the true rigid
    motion (sanity that oracle+repo aren't agreeing on garbage)."""
    moving, comp, ref, gt_T = make_rigid_scene(seed, rot_deg=5.0, trans=0.3)
    T_r, _, ratio, moved = _run_repo(moving, comp, ref, 5, 2.0, max_iter=40)
    # transformed moving points should land near their rigid images
    gt_moved = np.einsum("nij,nj->ni",
                         gt_T[comp][:, :3, :3], moving) + gt_T[comp][:, :3, 3]
    err = np.linalg.norm(moved - gt_moved, axis=-1)
    assert np.median(err) < 0.08, np.median(err)
    assert ratio.min() > 0.9  # nearly every point found a correspondence


def test_truncated_robust_mean_oracle(rng):
    """truncated_segment_mean == the reference clamp-then-remean, f64."""
    ids = rng.randint(0, 7, 500).astype(np.int32)
    vals = (rng.randn(500) * 2).astype(np.float32)
    got = np.asarray(segment_ops.truncated_segment_mean(vals, ids, 7, 0.3))
    want = _trunc_robust_mean(vals.astype(np.float64), ids, 7, 0.3)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_robust_mean_empty_segments(rng):
    """Empty segments yield 0 (reference robust_mean valid_mask path,
    registration_utils.py:12-20)."""
    ids = np.array([0, 0, 2], np.int32)
    vals = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], np.float32)
    got = np.asarray(segment_ops.segment_mean(vals, ids, 4))
    np.testing.assert_allclose(got[1], 0.0)
    np.testing.assert_allclose(got[3], 0.0)
    np.testing.assert_allclose(got[0], [2.0, 3.0])
    np.testing.assert_allclose(got[2], [5.0, 6.0])
