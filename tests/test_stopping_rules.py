"""Per-rule tests for the tracking walk's stopping rules (reference
cluster_tracking.py:675-708 semantics, batched implementation
preprocessing/tracking_batched.py:406-426):

  1. registration-error stop   l1 > coeff * diam * (1 + dist_comp)
  2. edge-ratio stop           matched fraction < 0.5
  3. min-move gate             at s == min_move_frame, moved <= 0.08*diam
                               -> not moving (ANDed across BOTH directions)
  4. velocity-deviation stop   |v - v_prev| > 0.24 * diam
  5. angle stop                heading change > threshold at speed > 0.01
  6. final validity            tracked >= min_move_frame in one direction

Each test builds a window where exactly ONE rule can fire (the others are
disabled via extreme thresholds) and asserts the walk's reach/moving/valid
bookkeeping.
"""

import numpy as np
import pytest

from pcseqlearning_tpu.preprocessing.tracking_batched import (
    pack_components, track_window_batched)

INTERVAL = 4
W = 2 * INTERVAL + 1
N_SLOT = 256
BIG = 1e6  # disables a threshold-based rule

# wide first level so a legal velocity change never starves correspondences
LEVELS = ((0.4, 0.4, 0.6, 2.5, 1e-4), (0.1, 0.1, 0.15, 0.5, 1e-4))


def _blob(rng, n=96, scale=(1.2, 0.8, 0.5), center=(0.0, 0.0, 1.0)):
    return (rng.randn(n, 3) * scale + center).astype(np.float32)


def _window_from_traj(blob, traj, drop_mask=None):
    """Window tables: blob translated by traj[w] per frame; ``drop_mask``
    optionally hides blob points at given frames ({w: keep_bool})."""
    wxyz = np.full((W, N_SLOT, 3), 1e8, np.float32)
    wval = np.zeros((W, N_SLOT), bool)
    for w in range(W):
        pts = blob + np.asarray(traj[w], np.float32)
        if drop_mask and w in drop_mask:
            pts = pts[drop_mask[w]]
        wxyz[w, : len(pts)] = pts
        wval[w, : len(pts)] = True
    return wxyz, wval


def _run(blob, traj, *, reg_error_coeff=BIG, angle_threshold_deg=BIG,
         min_move_frame=2, drop_mask=None, diameter=None):
    wxyz, wval = _window_from_traj(blob, traj, drop_mask)
    n = len(blob)
    anchor = blob + np.asarray(traj[INTERVAL], np.float32)
    cx, cm = pack_components(anchor, np.zeros(n, np.int64), np.ones(n, bool), 1, 128)
    if diameter is None:
        c = anchor[:, :2].mean(0)
        diameter = float(np.linalg.norm(anchor[:, :2] - c, axis=1).max()) * 2
    return track_window_batched(
        wxyz, wval, np.zeros((W, N_SLOT), bool), cx, cm,
        np.array([True]), np.array([diameter], np.float32),
        np.array([float(n)], np.float32),
        interval=INTERVAL, levels=LEVELS, num_candidates=128,
        nn_radius=0.3, angle_regularizer=10.0,
        reg_error_coeff=reg_error_coeff,
        angle_threshold_deg=angle_threshold_deg,
        min_move_frame=min_move_frame, max_icp_iter=20)


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(7)


def test_reg_error_stop(rng):
    """A teleport two steps forward blows the ICP residual past
    coeff*diam — the walk must stop there and reach_max must freeze at the
    last good frame; the backward side is clean and reaches the edge."""
    blob = _blob(rng)
    traj = [(0.2 * (w - INTERVAL), 0, 0) for w in range(W)]
    tw = INTERVAL + 2
    for w in range(tw, W):
        traj[w] = (traj[w][0] + 30.0, 30.0, 0)  # out of every search radius
    out = _run(blob, traj, reg_error_coeff=0.13)
    assert out["reach_max"][0] == tw - 1, out["reach_max"]
    assert out["reach_min"][0] == 0
    # control: no teleport -> full reach
    out2 = _run(blob, [(0.2 * (w - INTERVAL), 0, 0) for w in range(W)],
                reg_error_coeff=0.13)
    assert out2["reach_max"][0] == W - 1 and out2["reach_min"][0] == 0


def test_edge_ratio_stop(rng):
    """The object vanishes two steps forward (a decoy cluster keeps those
    frames non-empty): the matched fraction collapses below 0.5 and the
    walk stops there (reg/angle rules disabled)."""
    blob = _blob(rng, n=120)
    decoy = _blob(rng, n=60, center=(40.0, 40.0, 1.0))
    tw = INTERVAL + 2
    wxyz = np.full((W, N_SLOT, 3), 1e8, np.float32)
    wval = np.zeros((W, N_SLOT), bool)
    for w in range(W):
        pts = np.concatenate([blob, decoy]) if w < tw else decoy
        wxyz[w, : len(pts)] = pts
        wval[w, : len(pts)] = True
    n = len(blob)
    cx, cm = pack_components(blob, np.zeros(n, np.int64), np.ones(n, bool), 1, 128)
    c = blob[:, :2].mean(0)
    diam = float(np.linalg.norm(blob[:, :2] - c, axis=1).max()) * 2
    out = track_window_batched(
        wxyz, wval, np.zeros((W, N_SLOT), bool), cx, cm,
        np.array([True]), np.array([diam], np.float32),
        np.array([float(n)], np.float32),
        interval=INTERVAL, levels=LEVELS, num_candidates=128,
        nn_radius=0.3, angle_regularizer=10.0,
        reg_error_coeff=BIG, angle_threshold_deg=BIG,
        min_move_frame=1, max_icp_iter=20)
    assert out["reach_max"][0] == tw - 1, out["reach_max"]
    assert out["edge_ratios"][0, tw] < 0.5
    assert out["reach_min"][0] == 0


def test_min_move_gate_static_vs_moving(rng):
    """At s == min_move_frame the cluster must have moved > 0.08*diam from
    the anchor to stay 'moving'."""
    blob = _blob(rng)
    static = [(0.001 * (w - INTERVAL), 0, 0) for w in range(W)]
    out_s = _run(blob, static, min_move_frame=2)
    assert not out_s["moving"][0]
    moving = [(0.4 * (w - INTERVAL), 0, 0) for w in range(W)]
    out_m = _run(blob, moving, min_move_frame=2)
    assert out_m["moving"][0]


def test_min_move_gate_ands_both_directions(rng):
    """Host-walk semantics (cluster_tracking.py:929): moving_total is the
    AND over both directions. A cluster that moves only AFTER the anchor
    frame is static on the backward side -> overall not moving."""
    blob = _blob(rng)
    traj = [(0.0, 0, 0)] * (INTERVAL + 1) + [
        (0.4 * s, 0, 0) for s in range(1, INTERVAL + 1)
    ]
    out = _run(blob, traj, min_move_frame=2)
    assert not out["moving"][0], "backward-static cluster must not be moving"


def test_velocity_deviation_stop(rng):
    """A velocity jump from 0.1 to 2.2 m/frame on a ~3 m-diameter cluster
    exceeds 0.24*diam even after the L1 temporal smoother halves the step
    change — the dev rule stops the walk while the ICP still registers
    every frame (reg/angle rules disabled; edge ratio stays >= 0.5, proving
    the stop came from the dev rule)."""
    blob = _blob(rng, scale=(0.6, 0.5, 0.4))
    tw = INTERVAL + 2
    traj = []
    for w in range(W):
        if w <= tw - 1:
            traj.append((0.1 * (w - INTERVAL), 0, 0))
        else:  # jump from 0.1 to 2.2 m/frame, same heading
            traj.append((0.1 * (tw - 1 - INTERVAL) + 2.2 * (w - (tw - 1)), 0, 0))
    out = _run(blob, traj, min_move_frame=1)
    assert out["reach_max"][0] < W - 1, out["reach_max"]
    stop_pos = out["reach_max"][0] + 1
    assert out["edge_ratios"][0, stop_pos] >= 0.5  # not an edge-ratio stop
    assert out["reach_min"][0] == 0
    # control: constant velocity -> full reach
    out2 = _run(blob, [(0.1 * (w - INTERVAL), 0, 0) for w in range(W)],
                min_move_frame=1)
    assert out2["reach_max"][0] == W - 1


def test_angle_stop(rng):
    """A sustained 45-degree-per-frame turn at speed 1.2 m/frame exceeds a
    10-degree configured heading threshold even after the L1 temporal
    smoother (which flattens one-shot turns — sustained turns survive it);
    the per-step velocity change (2*1.2*sin(22.5) = 0.92) stays below
    0.24*diam = 1.44, keeping the dev rule silent and isolating the angle
    rule."""
    blob = _blob(rng, scale=(2.5, 2.0, 0.6))
    speed, turn = 1.2, np.pi / 4
    tw = INTERVAL + 2
    pos, heading = np.zeros(2), 0.0
    xs = {INTERVAL: pos.copy()}
    for w in range(INTERVAL + 1, W):
        if w >= tw:
            heading += turn
        pos = pos + speed * np.array([np.cos(heading), np.sin(heading)])
        xs[w] = pos.copy()
    for w in range(INTERVAL - 1, -1, -1):  # straight backward history
        xs[w] = xs[w + 1] - np.array([speed, 0.0])
    traj = [(xs[w][0], xs[w][1], 0) for w in range(W)]
    out = _run(blob, traj, angle_threshold_deg=10.0, min_move_frame=1,
               diameter=6.0)
    assert out["reach_max"][0] < W - 1, out["reach_max"]
    stop_pos = out["reach_max"][0] + 1
    assert out["edge_ratios"][0, stop_pos] >= 0.5  # not an edge-ratio stop
    # control: straight line at the same speed passes the 10-degree gate
    out2 = _run(blob, [(speed * (w - INTERVAL), 0, 0) for w in range(W)],
                angle_threshold_deg=10.0, min_move_frame=1, diameter=6.0)
    assert out2["reach_max"][0] == W - 1


def test_final_validity_requires_min_track(rng):
    """A cluster that teleports away one step out in BOTH directions is
    tracked < min_move_frame frames on each side -> valid_final False."""
    blob = _blob(rng)
    traj = [(30.0 + 10.0 * w, 40.0, 0) for w in range(W)]
    traj[INTERVAL] = (0.0, 0.0, 0.0)  # only the anchor frame is sane
    out = _run(blob, traj, reg_error_coeff=0.13, min_move_frame=2)
    assert not out["valid_final"][0]
    # control: trackable cluster is valid
    out2 = _run(blob, [(0.2 * (w - INTERVAL), 0, 0) for w in range(W)],
                reg_error_coeff=0.13, min_move_frame=2)
    assert out2["valid_final"][0]
