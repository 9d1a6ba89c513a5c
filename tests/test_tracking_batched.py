"""Unit tests for the component-bucketed tracking walk
(preprocessing/tracking_batched.py): host packing, per-component voxel
dedup, batched ICP, and the full two-cluster walk with extraction."""

import numpy as np
import jax.numpy as jnp


def test_pack_components_stride_subsample():
    from pcseqlearning_tpu.preprocessing.tracking_batched import pack_components

    rng = np.random.RandomState(0)
    xyz = rng.rand(300, 3).astype(np.float32)
    comp = np.concatenate([np.zeros(250, np.int64), np.ones(50, np.int64)])
    cx, cm = pack_components(xyz, comp, np.ones(300, bool), 2, 64)
    assert cm[0].sum() <= 64 and cm[0].sum() >= 60  # stride-subsampled
    assert cm[1].sum() == 50
    # packed rows are actual member points
    packed = cx[1][cm[1]]
    assert all(any(np.allclose(p, q) for q in xyz[250:]) for p in packed[:5])
    # keep mask respected
    cx2, cm2 = pack_components(xyz, comp, comp == 0, 2, 64)
    assert cm2[1].sum() == 0


def test_voxel_dedup_means():
    from pcseqlearning_tpu.preprocessing.tracking_batched import _voxel_dedup

    xx = np.zeros((2, 8, 3), np.float32)
    xx[0, :4] = [[0.01, 0, 0], [0.03, 0, 0], [1.0, 0, 0], [1.04, 0, 0]]
    xx[1, :2] = [[5.0, 5.0, 5.0], [5.01, 5.0, 5.0]]
    mk = np.zeros((2, 8), bool)
    mk[0, :4] = True
    mk[1, :2] = True
    rx, rm = _voxel_dedup(jnp.asarray(xx), jnp.asarray(mk), jnp.asarray([0.1, 0.1, 0.1], jnp.float32))
    rx, rm = np.asarray(rx), np.asarray(rm)
    assert rm[0].sum() == 2
    assert np.allclose(sorted(rx[0][rm[0]][:, 0]), [0.02, 1.02], atol=1e-6)
    assert rm[1].sum() == 1
    assert np.allclose(rx[1][rm[1]][0], [5.005, 5.0, 5.0], atol=1e-6)


def test_icp_level_recovers_rigid_motion():
    from pcseqlearning_tpu.preprocessing.tracking_batched import _icp_level

    rng = np.random.RandomState(1)
    P = 64
    src = (rng.rand(P, 3) * [3, 1.5, 1.2]).astype(np.float32)
    ang = 0.06
    R = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([0.3, -0.2, 0.0], np.float32)
    dst = src @ R.T + t
    m = jnp.asarray(src[None])
    r = jnp.asarray(dst[None])
    mask = jnp.ones((1, P), bool)
    T0 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (1, 4, 4))
    T, l1, ratio = _icp_level(
        m, mask, r, mask, T0, jnp.asarray(1.0, jnp.float32),
        jnp.asarray(0.0, jnp.float32), 40, jnp.asarray(1e-6, jnp.float32),
    )
    T = np.asarray(T)[0]
    assert np.abs(T[:3, :3] - R).max() < 5e-3
    assert np.abs(T[:3, 3] - t).max() < 5e-3
    assert float(ratio[0]) > 0.95


def test_track_window_batched_two_clusters():
    from pcseqlearning_tpu.preprocessing.tracking_batched import (
        pack_components, track_window_batched)

    rng = np.random.RandomState(0)
    W, interval = 7, 3
    n_a, n_b = 80, 60
    a0 = rng.randn(n_a, 3).astype(np.float32) * 0.3 + [2.0, 3.0, 1.0]
    b0 = rng.randn(n_b, 3).astype(np.float32) * 0.3 + [-4.0, -2.0, 1.0]
    va = np.array([0.4, 0.0, 0.0], np.float32)
    N = 256
    wxyz = np.full((W, N, 3), 1e8, np.float32)
    wval = np.zeros((W, N), bool)
    for w in range(W):
        f = w - interval
        pts_w = np.concatenate([a0 + va * f, b0])
        wxyz[w, :len(pts_w)] = pts_w
        wval[w, :len(pts_w)] = True
    comp = np.concatenate([np.zeros(n_a, np.int64), np.ones(n_b, np.int64)])
    cx, cm = pack_components(np.concatenate([a0, b0]), comp, np.ones(n_a + n_b, bool), 2, 128)
    out = track_window_batched(
        wxyz, wval, np.zeros((W, N), bool), cx, cm,
        np.array([True, True]), np.array([1.5, 1.5], np.float32),
        np.array([n_a, n_b], np.float32),
        interval=interval, levels=((0.2, 0.2, 0.3, 1.0, 1e-4), (0.1, 0.1, 0.15, 0.5, 1e-4)),
        num_candidates=128, nn_radius=0.3, angle_regularizer=10.0,
        reg_error_coeff=0.5, angle_threshold_deg=45.0, min_move_frame=2, max_icp_iter=20)

    assert out["valid_final"][:2].all()
    # moving cluster A translated ~0.4*3 in x over the forward walk
    Ta = out["transforms"][0, W - 1]
    assert abs(Ta[0, 3] - 1.2) < 0.15, Ta[:3, 3]
    # static cluster B stays put
    Tb = out["transforms"][1, W - 1]
    assert np.abs(Tb[:3, 3]).max() < 0.1, Tb[:3, 3]
    assert out["moving"][0] and not out["moving"][1]
    # member-point extraction claims next-frame points to the right component
    from pcseqlearning_tpu.preprocessing.tracking_batched import densify_claims
    ec = densify_claims(out["extract_comp"])
    assert (ec[W - 1, :n_a] == 0).mean() > 0.85
    assert (ec[W - 1, n_a:n_a + n_b] == 1).mean() > 0.85
    # reach bookkeeping: both clusters tracked to the window edges
    assert (out["reach_max"][:2] == W - 1).all()
    assert (out["reach_min"][:2] == 0).all()
