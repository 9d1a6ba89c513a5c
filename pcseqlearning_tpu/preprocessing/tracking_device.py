"""Device-resident tracking walk: the +-TRACK_INTERVAL bidirectional frame
walk of ClusterTracking with all point-scale math compiled.

The reference walks frames in Python, launching CUDA kernels per step
(cluster_tracking.py:553-727); a direct port costs ~170 dispatch+transfer
round trips per tracked frame. Here the window of frames stays resident in
HBM as a [W, N, 3] tensor and a single compiled STEP function (3-level ICP
pyramid, velocity smoothing, stopping rules, NN extraction — with traced
position and direction) advances the walk:

  * ``track_window_stepped`` (default): host drives 2*interval calls of the
    one compiled step, state stays on device, no host syncs inside the walk.
  * ``track_window`` (full graph): the whole walk in one lax.scan program —
    fastest dispatch-wise but the fused program can exceed TPU kernel limits
    at large (N, C, W) (observed device faults at N*C ~ 8M), so it serves
    CPU tests and small scenes.

Semantics preserved from the reference walk: velocity warm-start (572-573),
3-level grid-subsample + registration pyramid (574-627), robust-mean
velocity + AdamW temporal smoothing (629-642), stopping rules incl.
small-component compensation and velocity-angle gating (675-708), per-step
NN extraction (710-721), anchor-velocity seeding (702-703), per-direction
``moving`` reset with the forward pass surviving (546-548).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# see tracking_batched._ANGLE_VELO_EXEMPT — the angle-gate velocity
# exemption rescaled to this implementation's ICP noise floor
_ANGLE_VELO_EXEMPT = float(os.environ.get("PCSEQ_ANGLE_VELO_EXEMPT", 0.05))

from ..ops import grid_utils, hash_graph, segment_ops
from .registration import register_to_next_frame


def _grid_sample_masked(xyz, comp, stationary, valid, voxel_size):
    """Per-voxel mean xyz / median comp / mean stationary (sample_frame)."""
    n = xyz.shape[0]
    fxyz = jnp.concatenate([jnp.zeros((n, 1), xyz.dtype), xyz], axis=1)
    coords = grid_utils.voxel_coords(fxyz, voxel_size)
    coords = jnp.where(valid[:, None], coords, jnp.int32(2 ** 24))
    inverse, _, _ = grid_utils.unique_rows(coords)
    mean_xyz = segment_ops.segment_mean(jnp.where(valid[:, None], xyz, 0.0), inverse, n)
    stat = segment_ops.segment_mean(jnp.where(valid, stationary.astype(xyz.dtype), 0.0), inverse, n) > 0.5
    med_comp = segment_ops.segment_median(jnp.where(valid, comp, jnp.int32(-1)), inverse, n)
    occ = segment_ops.segment_count(jnp.where(valid, inverse, n), n + 1)[:n]
    vvalid = (occ > 0.5) & (med_comp >= 0)
    return mean_xyz, med_comp, stat, vvalid


def _smooth_velos(velos, diffs, active, num_itr=300, stopping=1e-3, weight0=1.0, weight=10.0):
    """AdamW velocity smoothing over the active span (reference smooth_velo)."""
    import optax

    def lr_fn(step):
        mult = jnp.asarray(1.0)
        for d in (100, 200, 300):
            mult = mult * jnp.where(step >= d, 0.1, 1.0)
        return 1e-2 * mult

    opt = optax.adamw(learning_rate=lr_fn)
    act = active.astype(velos.dtype)[None, :, None]
    pair_act = (active[:-1] & active[1:]).astype(velos.dtype)[None, :, None]
    n_act = jnp.maximum(jnp.sum(act) * 2.0, 1.0) * velos.shape[0]
    n_pair = jnp.maximum(jnp.sum(pair_act) * 2.0, 1.0) * velos.shape[0]

    def loss_fn(v):
        fit = jnp.sum(((v - diffs)[..., :2] * act) ** 2) / n_act
        smooth = jnp.sum(jnp.abs((v[:, :-1, :2] - v[:, 1:, :2]) * pair_act)) / n_pair
        return fit * weight0 + smooth * weight

    grad_fn = jax.value_and_grad(loss_fn)

    def cond(s):
        _, _, it, last, cd = s
        return (cd > 0) & (it < num_itr)

    def body(s):
        v, o, it, last, cd = s
        loss, g = grad_fn(v)
        upd, o = opt.update(g, o, v)
        v = optax.apply_updates(v, upd)
        cd = jnp.where(last - loss < stopping, cd - 1, 3)
        return v, o, it + 1, loss, cd

    state = (velos, opt.init(velos), 0, jnp.asarray(1e10, velos.dtype), 3)
    v, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    return jnp.where(active[None, :, None], v, velos)


def _comp_stats(xyz, comp_safe, valid, C):
    deg = segment_ops.segment_count(jnp.where(valid, comp_safe, C), C + 1)[:C]
    center = segment_ops.segment_mean(jnp.where(valid[:, None], xyz, 0.0), jnp.where(valid, comp_safe, C), C + 1)[:C]
    return deg, center


# ---------------------------------------------------------------------------
# the shared step body (one walk step; pos/direction traced)
# ---------------------------------------------------------------------------


def _step_impl(consts, carry, track_dir, s, *, C, anchor_pos, levels, max_icp_iter, min_move_frame):
    (window_xyz, window_valid, anchor_comp, anchor_stationary, comp_diameter,
     dist_comp, comp_safe, anchor_valid, nn_radius, angle_regularizer,
     reg_error_coeff, angle_threshold_deg) = consts
    (cur_xyz, last_xyz, stopped, moving, last_velo, has_last_velo,
     transforms, comp_velos, comp_centers, comp_center_diffs,
     reg_errors, edge_ratios, extract_src, reach_min, reach_max) = carry

    W, N, _ = window_xyz.shape
    pos = anchor_pos + track_dir * s
    in_win = (pos >= 0) & (pos < W)
    pos_c = jnp.clip(pos, 0, W - 1)
    nxt_xyz = window_xyz[pos_c]
    nxt_valid = window_valid[pos_c] & in_win
    frame_has_points = jnp.any(nxt_valid)
    active = in_win & frame_has_points & jnp.any(~stopped)

    T_cum = transforms[:, jnp.clip(pos - track_dir, 0, W - 1)]

    # velocity warm start (reference 569-573)
    trans = jnp.where((~stopped & has_last_velo)[:, None], last_velo, 0.0)
    cur_xyz = cur_xyz + trans[jnp.clip(comp_safe, 0, C - 1)] * track_dir * active
    T_cum = T_cum.at[:, :3, 3].add(trans * track_dir * active)

    l1_err = jnp.zeros((C,), jnp.float32)
    edge_ratio = jnp.zeros((C,), jnp.float32)
    for li, (vx, vy, vz, radius, sdelta) in enumerate(levels):
        vs = jnp.asarray([vx, vy, vz], jnp.float32)
        m_xyz, m_comp, m_stat, m_valid = _grid_sample_masked(
            cur_xyz, anchor_comp, anchor_stationary, anchor_valid, vs
        )
        r_xyz, _, r_stat, r_valid = _grid_sample_masked(
            nxt_xyz, jnp.zeros(N, jnp.int32), jnp.zeros(N, bool), nxt_valid, vs
        )
        m_use = m_valid & ~m_stat & active
        r_use = r_valid & active
        T_l, l1_l, ratio_l, _ = register_to_next_frame(
            m_xyz, m_comp, m_use, r_xyz, r_use, C,
            jnp.asarray(radius, jnp.float32),
            angle_regularizer=angle_regularizer,
            max_iter=max_icp_iter,
            stopping_delta=jnp.asarray(sdelta, jnp.float32),
        )
        if li == 0:
            edge_ratio = ratio_l
        if li == len(levels) - 1:
            l1_err = l1_l
        R = T_l[:, :3, :3]
        t = T_l[:, :3, 3]
        ci = jnp.clip(comp_safe, 0, C - 1)
        moved = jnp.einsum(
            "nij,nj->ni", R[ci], cur_xyz, precision=jax.lax.Precision.HIGHEST
        ) + t[ci]
        cur_xyz = jnp.where(active, moved, cur_xyz)
        T_cum = jnp.where(
            active,
            jnp.matmul(T_l, T_cum, precision=jax.lax.Precision.HIGHEST),
            T_cum,
        )

    # component centers + velocity (reference 629-642)
    _, centers = _comp_stats(cur_xyz, comp_safe, anchor_valid, C)
    comp_centers = comp_centers.at[:, pos_c].set(
        jnp.where(active, centers, comp_centers[:, pos_c])
    )
    point_velo = (cur_xyz - last_xyz) * track_dir
    velo = segment_ops.segment_mean(
        jnp.where(anchor_valid[:, None], point_velo, 0.0),
        jnp.where(anchor_valid, comp_safe, C), C + 1,
    )[:C]
    velo = velo.at[:, 2].set(0.0)
    comp_velos = comp_velos.at[:, pos_c].set(jnp.where(active, velo, comp_velos[:, pos_c]))
    # first backward step seeds the anchor frame's velocity (reference 702-703)
    seed_anchor = active & (track_dir == -1) & (s == 1)
    comp_velos = comp_velos.at[:, anchor_pos].set(
        jnp.where(seed_anchor, velo, comp_velos[:, anchor_pos])
    )
    diff = (comp_centers[:, pos_c] - comp_centers[:, jnp.clip(pos - track_dir, 0, W - 1)]) * track_dir
    comp_center_diffs = comp_center_diffs.at[:, pos_c].set(
        jnp.where(active, diff, comp_center_diffs[:, pos_c])
    )

    # temporal smoothing over the walked span
    w_idx = jnp.arange(W)
    lo = jnp.minimum(anchor_pos + track_dir, pos)
    hi = jnp.maximum(anchor_pos + track_dir, pos)
    span = (w_idx >= lo) & (w_idx <= hi)
    sm = _smooth_velos(comp_velos, comp_center_diffs, span)
    comp_velos = jnp.where(active, sm, comp_velos)
    delta = comp_velos[:, pos_c] - velo
    velo = comp_velos[:, pos_c]
    ci = jnp.clip(comp_safe, 0, C - 1)
    cur_xyz = cur_xyz + delta[ci] * track_dir * active
    T_cum = T_cum.at[:, :3, 3].add(delta * track_dir * active)
    last_xyz_new = cur_xyz

    transforms = transforms.at[:, pos_c].set(jnp.where(active, T_cum, transforms[:, pos_c]))

    # stopping rules (reference 675-708)
    new_stopped = stopped | (l1_err > reg_error_coeff * comp_diameter * (1.0 + dist_comp))
    new_stopped = new_stopped | (edge_ratio < 0.5)
    new_moving = moving
    if min_move_frame >= 1:
        at_min_move = s == min_move_frame
        moved_dist = jnp.linalg.norm(comp_centers[:, pos_c] - comp_centers[:, anchor_pos], axis=-1)
        new_moving = jnp.where(at_min_move, moving & (moved_dist > 0.08 * comp_diameter), moving)
    dev = jnp.linalg.norm(velo - last_velo, axis=-1)
    new_stopped = new_stopped | (has_last_velo & (dev > 0.24 * comp_diameter))
    prev_v = comp_velos[:, jnp.clip(pos - track_dir, 0, W - 1)]
    nrm = jnp.maximum(jnp.linalg.norm(velo, axis=-1) * jnp.linalg.norm(prev_v, axis=-1), 1e-6)
    ang = jnp.degrees(jnp.arccos(jnp.clip(jnp.sum(velo * prev_v, -1) / nrm, -1, 1)))
    new_stopped = new_stopped | (
        has_last_velo & (ang > angle_threshold_deg)
        & (jnp.linalg.norm(velo[:, :2], axis=-1) > _ANGLE_VELO_EXEMPT)
    )
    new_stopped = jnp.where(active, new_stopped, stopped)
    new_moving = jnp.where(active, new_moving, moving)

    reach_min = jnp.where(active & (track_dir == -1) & ~new_stopped, pos_c, reach_min)
    reach_max = jnp.where(active & (track_dir == 1) & ~new_stopped, pos_c, reach_max)

    # NN extraction of target-frame member points (710-721)
    N_ = cur_xyz.shape[0]
    cur_f = jnp.concatenate([jnp.zeros((N_, 1), jnp.float32), cur_xyz], axis=1)
    nxt_f = jnp.concatenate([jnp.zeros((N_, 1), jnp.float32), nxt_xyz], axis=1)
    grid = hash_graph.build_hash_grid(cur_f, nn_radius, anchor_valid & active)
    nn_idx, _, nn_ok = hash_graph.radius_neighbors(
        grid, nxt_f, nn_radius, 1, query_valid=nxt_valid & active, cell_cap=hash_graph.DEFAULT_CELL_CAP
    )
    src = nn_idx[:, 0]
    ok = nn_ok[:, 0]
    src_comp = jnp.where(ok, anchor_comp[jnp.clip(src, 0, N_ - 1)], -1)
    keep = ok & (src_comp >= 0) & ~new_stopped[jnp.clip(src_comp, 0, C - 1)]
    extract_src = extract_src.at[pos_c].set(jnp.where(keep & active, src, extract_src[pos_c]))

    reg_errors = reg_errors.at[:, pos_c].set(jnp.where(active, l1_err, reg_errors[:, pos_c]))
    edge_ratios = edge_ratios.at[:, pos_c].set(jnp.where(active, edge_ratio, edge_ratios[:, pos_c]))

    return (
        cur_xyz, last_xyz_new, new_stopped, new_moving, velo, jnp.asarray(True),
        transforms, comp_velos, comp_centers, comp_center_diffs,
        reg_errors, edge_ratios, extract_src, reach_min, reach_max,
    )


def _make_consts(window_xyz, window_valid, anchor_comp, anchor_stationary,
                 comp_valid0, comp_diameter, comp_deg, C, anchor_pos,
                 nn_radius, angle_regularizer, reg_error_coeff, angle_threshold_deg):
    anchor_valid = window_valid[anchor_pos]
    comp_safe = jnp.where(anchor_valid & (anchor_comp >= 0), anchor_comp, C)
    dist_comp = jnp.zeros((C,), jnp.float32)
    for lo, hi, v in ((0, 10, 1.0), (10, 40, 0.5), (40, 100, 0.3), (100, 200, 0.2), (200, 400, 0.1)):
        dist_comp = jnp.where((comp_deg >= lo) & (comp_deg < hi), v, dist_comp)
    return (window_xyz, window_valid, anchor_comp, anchor_stationary,
            comp_diameter, dist_comp, comp_safe, anchor_valid,
            nn_radius, angle_regularizer, reg_error_coeff, angle_threshold_deg)


def _init_arrays(window_xyz, comp_valid0, comp_safe, anchor_valid, C, anchor_pos):
    W, N, _ = window_xyz.shape
    anchor_xyz = window_xyz[anchor_pos]
    _, center0 = _comp_stats(anchor_xyz, comp_safe, anchor_valid, C)
    return dict(
        transforms=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (C, W, 4, 4)),
        comp_velos=jnp.zeros((C, W, 3), jnp.float32),
        comp_centers=jnp.zeros((C, W, 3), jnp.float32).at[:, anchor_pos].set(center0),
        comp_center_diffs=jnp.zeros((C, W, 3), jnp.float32),
        reg_errors=jnp.zeros((C, W), jnp.float32),
        edge_ratios=jnp.zeros((C, W), jnp.float32),
        extract_src=jnp.full((W, N), -1, jnp.int32),
        reach_min=jnp.full((C,), anchor_pos, jnp.int32),
        reach_max=jnp.full((C,), anchor_pos, jnp.int32),
    )


_GLOBAL_KEYS = ("transforms", "comp_velos", "comp_centers", "comp_center_diffs",
                "reg_errors", "edge_ratios", "extract_src", "reach_min", "reach_max")


def _finalize(g, comp_valid0, anchor_pos, min_move_frame, moving):
    valid_final = comp_valid0 & (
        (g["reach_max"] >= anchor_pos + min_move_frame)
        | (g["reach_min"] <= anchor_pos - min_move_frame)
    )
    return dict(
        transforms=g["transforms"], comp_velos=g["comp_velos"],
        comp_centers=g["comp_centers"], reg_errors=g["reg_errors"],
        edge_ratios=g["edge_ratios"], extract_src=g["extract_src"],
        reach_min=g["reach_min"], reach_max=g["reach_max"],
        moving=moving, valid_final=valid_final,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_components", "interval", "levels", "max_icp_iter", "min_move_frame"),
)
def _track_step_jit(consts, carry, track_dir, s, num_components, interval,
                    levels, max_icp_iter, min_move_frame):
    return _step_impl(
        consts, carry, track_dir, s,
        C=num_components, anchor_pos=interval, levels=levels,
        max_icp_iter=max_icp_iter, min_move_frame=min_move_frame,
    )


def track_window_stepped(
    window_xyz, window_valid, anchor_comp, anchor_stationary,
    comp_valid0, comp_diameter, comp_deg,
    num_components, interval, levels,
    nn_radius, angle_regularizer, reg_error_coeff, angle_threshold_deg,
    min_move_frame, max_icp_iter=80,
):
    """Host-driven walk over the single compiled step (default path)."""
    C = num_components
    anchor_pos = interval
    consts = _make_consts(
        jnp.asarray(window_xyz), jnp.asarray(window_valid),
        jnp.asarray(anchor_comp), jnp.asarray(anchor_stationary),
        jnp.asarray(comp_valid0), jnp.asarray(comp_diameter),
        jnp.asarray(comp_deg), C, anchor_pos,
        nn_radius, angle_regularizer, reg_error_coeff, angle_threshold_deg,
    )
    comp_safe, anchor_valid = consts[6], consts[7]
    g = _init_arrays(consts[0], jnp.asarray(comp_valid0), comp_safe, anchor_valid, C, anchor_pos)
    anchor_xyz = consts[0][anchor_pos]
    comp_valid0 = jnp.asarray(comp_valid0)

    moving_final = jnp.ones((C,), bool) & comp_valid0
    for track_dir in (-1, 1):
        moving = jnp.ones((C,), bool) & comp_valid0
        has_lv = jnp.asarray(track_dir == 1) & jnp.any(g["comp_velos"][:, anchor_pos] != 0)
        carry = (
            anchor_xyz, anchor_xyz, ~comp_valid0, moving,
            g["comp_velos"][:, anchor_pos], has_lv,
            g["transforms"], g["comp_velos"], g["comp_centers"], g["comp_center_diffs"],
            g["reg_errors"], g["edge_ratios"], g["extract_src"], g["reach_min"], g["reach_max"],
        )
        for s in range(1, interval + 1):
            carry = _track_step_jit(
                consts, carry, jnp.asarray(track_dir), jnp.asarray(s),
                num_components=C, interval=interval, levels=levels,
                max_icp_iter=max_icp_iter, min_move_frame=min_move_frame,
            )
        moving_final = carry[3]
        for i, k in enumerate(_GLOBAL_KEYS):
            g[k] = carry[6 + i]
    return _finalize(g, comp_valid0, anchor_pos, min_move_frame, moving_final)


@functools.partial(
    jax.jit,
    static_argnames=("num_components", "interval", "levels", "max_icp_iter", "min_move_frame"),
)
def track_window(
    window_xyz, window_valid, anchor_comp, anchor_stationary,
    comp_valid0, comp_diameter, comp_deg,
    num_components, interval, levels,
    nn_radius, angle_regularizer, reg_error_coeff, angle_threshold_deg,
    min_move_frame, max_icp_iter=80,
):
    """Whole walk as one compiled scan program (see module docstring for the
    size caveat on TPU)."""
    C = num_components
    anchor_pos = interval
    consts = _make_consts(
        window_xyz, window_valid, anchor_comp, anchor_stationary,
        comp_valid0, comp_diameter, comp_deg, C, anchor_pos,
        nn_radius, angle_regularizer, reg_error_coeff, angle_threshold_deg,
    )
    comp_safe, anchor_valid = consts[6], consts[7]
    g = _init_arrays(window_xyz, comp_valid0, comp_safe, anchor_valid, C, anchor_pos)
    anchor_xyz = window_xyz[anchor_pos]

    moving_final = jnp.ones((C,), bool) & comp_valid0
    for track_dir in (-1, 1):
        moving = jnp.ones((C,), bool) & comp_valid0
        has_lv = jnp.asarray(track_dir == 1) & jnp.any(g["comp_velos"][:, anchor_pos] != 0)
        carry0 = (
            anchor_xyz, anchor_xyz, ~comp_valid0, moving,
            g["comp_velos"][:, anchor_pos], has_lv,
            g["transforms"], g["comp_velos"], g["comp_centers"], g["comp_center_diffs"],
            g["reg_errors"], g["edge_ratios"], g["extract_src"], g["reach_min"], g["reach_max"],
        )

        def scan_body(carry, s, _dir=track_dir):
            out = _step_impl(
                consts, carry, _dir, s,
                C=C, anchor_pos=anchor_pos, levels=levels,
                max_icp_iter=max_icp_iter, min_move_frame=min_move_frame,
            )
            return out, None

        carry, _ = jax.lax.scan(scan_body, carry0, jnp.arange(1, interval + 1))
        moving_final = carry[3]
        for i, k in enumerate(_GLOBAL_KEYS):
            g[k] = carry[6 + i]
    return _finalize(g, comp_valid0, anchor_pos, min_move_frame, moving_final)
