"""Component-bucketed tracking walk — the MXU-native redesign of the
ClusterTracking frame walk.

The reference walks frames in Python and, per ICP iteration, queries a GPU
hash table over the WHOLE next frame
(/root/reference/pcdet/models/registration/preprocessors/cluster_tracking.py:553-727,
registration_utils.py:83-206). A faithful port is gather-bound on TPU: every
correspondence is a random HBM gather. This module restructures the walk
around the observation that ICP is per-component and components are small:

  * anchor points are packed into a dense ``[C, P]`` tile (one host pack per
    tracked frame);
  * per walk step, each component selects its ``Q`` nearest next-frame
    candidate points ONCE (a single ``[C, N]`` distance matmul +
    ``approx_max_k`` + one gather);
  * the entire 3-level ICP pyramid then runs on ``[C, P, Q]`` batched
    distance matrices — pure MXU batched matmuls with NO gathers in the
    inner loop. Forward and backward correspondences fall out of the same
    matrix (row-min / column-min).

Semantics preserved from the reference walk (and the host walk in
cluster_tracking.py): per-component voxel-mean dedup per pyramid level
(grid_sample), bidirectional truncated-robust-mean Procrustes ICP with the
accumulated-rotation prior, velocity warm start + AdamW temporal smoothing,
the full stopping-rule set, NN member-point extraction with
nearest-component claim resolution, and the reach/min-move finalization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry
from ..utils.edict import EDict
from ..utils.padding import bucket_size
from .tracking_device import _smooth_velos

_HI = jax.lax.Precision.HIGHEST
_BIG = 1e8

# profiling-only ablations (PCSEQ_WALK_ABLATE=nosmooth|noext), read at trace
# time — used to attribute walk-step device cost, never in production runs
import os as _os

_ABLATE = _os.environ.get("PCSEQ_WALK_ABLATE", "")

# angle-gate velocity exemption (reference cluster_tracking.py:691: the
# 45-degree velocity-angle stop only applies when |velo_xy| > 0.01 m/frame
# — i.e. objects whose velocity is indistinguishable from noise are never
# angle-stopped). The reference's f64 full-resolution 80-iter ICP has a
# ~mm noise floor, so 0.01 exempts its statics; this port's f32 tile ICP
# sits at cm scale, which un-exempts statics and angle-stops them on
# noise (STATIC_DIAG r5: ablating the gate lifted static mIoU
# 0.52->0.71; raising the exemption to 0.05 recovered +0.021 static with
# moving untouched). Default 0.05 = this implementation's measured noise
# floor; PCSEQ_ANGLE_VELO_EXEMPT=0.01 restores the reference constant.
_ANGLE_VELO_EXEMPT = float(_os.environ.get("PCSEQ_ANGLE_VELO_EXEMPT", 0.05))

# wall-time breakdown of the walk (cumulative; reset externally)
PROF = {}


def _tick(key, t0):
    import time as _t

    PROF[key] = PROF.get(key, 0.0) + (_t.time() - t0)
    return _t.time()


# ---------------------------------------------------------------------------
# host-side packing
# ---------------------------------------------------------------------------


def pack_components(xyz, component, keep_mask, num_components, P):
    """Pack per-point arrays into a [C, P, 3] tile (+ [C, P] mask).

    Components with more than P kept points are stride-subsampled evenly
    (the walk registers voxel-dedup'd points anyway, so P bounds the dedup
    input, not the object's raw point count).
    """
    C = num_components
    comp_xyz = np.zeros((C, P, 3), np.float32)
    comp_mask = np.zeros((C, P), bool)
    keep = np.nonzero(keep_mask)[0]
    if len(keep) == 0:
        return comp_xyz, comp_mask
    c = component[keep]
    order = np.argsort(c, kind="stable")
    keep = keep[order]
    c = c[order]
    counts = np.bincount(c, minlength=C)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(keep)) - starts[c]
    stride = np.maximum(1, -(-counts // P))  # ceil(cnt / P)
    sel = (pos % stride[c]) == 0
    slot = pos[sel] // stride[c[sel]]
    sel_rows = keep[sel]
    in_cap = slot < P
    comp_xyz[c[sel][in_cap], slot[in_cap]] = xyz[sel_rows[in_cap]]
    comp_mask[c[sel][in_cap], slot[in_cap]] = True
    return comp_xyz, comp_mask


@functools.partial(jax.jit, static_argnames=("C", "P"))
def pack_components_device(xyz, comp, keep, C, P):
    """Device twin of pack_components: [K] anchor rows -> [C, P, 3] tiles.

    Same stride-subsample semantics (components larger than P keep every
    ceil(cnt/P)-th point in original order); runs on the resident frame
    table so the per-tracked-frame [C, P, 3] host pack + H2D disappears.
    """
    K = xyz.shape[0]
    ok = keep & (comp >= 0) & (comp < C)
    skey = jnp.where(ok, comp, C).astype(jnp.int32)
    iota = jnp.arange(K, dtype=jnp.int32)
    skey_s, idx_s = jax.lax.sort((skey, iota), num_keys=1)  # stable
    xyz_s = xyz[idx_s]
    ok_s = skey_s < C
    # position within the component: iota - start-of-segment (running max
    # of first-occurrence positions)
    first = jnp.concatenate(
        [jnp.ones(1, bool), skey_s[1:] != skey_s[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, iota, -1))
    pos = iota - seg_start
    cnt = jax.ops.segment_sum(
        ok_s.astype(jnp.int32), jnp.where(ok_s, skey_s, C), num_segments=C + 1
    )[:C]
    stride = jnp.maximum(1, -(-cnt // P))  # ceil(cnt / P) per component
    st = stride[jnp.clip(skey_s, 0, C - 1)]
    slot = pos // st
    sel = ok_s & (pos % st == 0) & (slot < P)
    flat = jnp.where(sel, jnp.clip(skey_s, 0, C - 1) * P + slot, C * P)
    tile = jnp.zeros((C * P + 1, 3), xyz.dtype).at[flat].set(
        jnp.where(sel[:, None], xyz_s, 0.0))[: C * P]
    mask = jnp.zeros(C * P + 1, bool).at[flat].set(sel)[: C * P]
    return tile.reshape(C, P, 3), mask.reshape(C, P)


# ---------------------------------------------------------------------------
# jitted pieces
# ---------------------------------------------------------------------------


def _masked_center(pts, mask):
    """[C, K, 3], [C, K] -> [C, 3] mean over the mask."""
    w = mask.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    return jnp.sum(pts * w[..., None], axis=1) / n[:, None]


def _voxel_dedup(xyz, mask, voxel_size):
    """Per-component voxel-mean dedup in the [C, K] tile layout.

    Matches the reference grid_sample semantics (per-voxel mean position,
    cluster_tracking.py:39-51) component-locally: voxel keys are sorted per
    row, per-voxel means come from one flat segment-sum, and the first
    occurrence of each voxel becomes the representative.

    Returns (rep_xyz [C, K, 3], rep_mask [C, K]) in sorted-key order (the
    downstream ICP treats rows as unordered point sets).
    """
    C, K, _ = xyz.shape
    vs = jnp.asarray(voxel_size, xyz.dtype)
    coords = jnp.floor(xyz / vs).astype(jnp.int32)
    # pack relative coords (bounded by the component's spatial extent) into
    # one sortable int32 key; invalid rows get the +inf sentinel
    cmin = jnp.min(jnp.where(mask[..., None], coords, 2 ** 20), axis=1, keepdims=True)
    rel = jnp.clip(coords - cmin, 0, 1023)
    key = (rel[..., 0] << 20) | (rel[..., 1] << 10) | rel[..., 2]
    key = jnp.where(mask, key, jnp.int32(2 ** 30))
    slot = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (C, K))
    skey, sidx = jax.lax.sort((key, slot), num_keys=1, dimension=1)
    sxyz = jnp.take_along_axis(xyz, sidx[..., None], axis=1)
    svalid = skey != jnp.int32(2 ** 30)
    first = jnp.concatenate(
        [jnp.ones((C, 1), bool), skey[:, 1:] != skey[:, :-1]], axis=1
    ) & svalid
    seg_in_row = jnp.cumsum(first.astype(jnp.int32), axis=1)  # 1-based
    gid = (
        jnp.arange(C, dtype=jnp.int32)[:, None] * (K + 1)
        + jnp.where(svalid, seg_in_row, 0)
    ).reshape(-1)
    flat_xyz = jnp.where(svalid[..., None], sxyz, 0.0).reshape(C * K, 3)
    w = svalid.astype(xyz.dtype).reshape(-1)
    sums = jax.ops.segment_sum(flat_xyz * w[:, None], gid, num_segments=C * (K + 1))
    cnts = jax.ops.segment_sum(w, gid, num_segments=C * (K + 1))
    means = sums / jnp.maximum(cnts, 1.0)[:, None]
    rep_xyz = means[gid].reshape(C, K, 3)
    return jnp.where(first[..., None], rep_xyz, 0.0), first


def _pair_d2(a, b):
    """[C, P, 3] x [C, Q, 3] -> [C, P, Q] squared distances (batched MXU)."""
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    cross = jnp.einsum("cpd,cqd->cpq", a, b, precision=_HI)
    return a2[:, :, None] + b2[:, None, :] - 2.0 * cross


def _icp_level(m_xyz, m_mask, r_xyz, r_mask, T_prior, radius, angle_regularizer,
               max_iter, stopping_delta, trunc_dist=0.3):
    """Batched per-component rigid ICP on [C, P] vs [C, Q] tiles.

    Mirrors register_to_next_frame (preprocessing/registration.py /
    reference registration_utils.py:83-206): bidirectional NN edges,
    per-component centered covariance + Procrustes with the
    angle-regularizer prior on the ACCUMULATED rotation, truncated robust
    mean error, loss-countdown stopping — but each component solves on its
    own tile, so the inner loop is matmul+reduce only.

    Returns (T [C,4,4], l1_err [C], edge_ratio [C]).
    """
    C, P, _ = m_xyz.shape
    Q = r_xyz.shape[1]
    r2 = radius * radius
    inf = jnp.asarray(jnp.inf, m_xyz.dtype)
    n_r = jnp.sum(r_mask, axis=1)

    def solve(xyz, T):
        from ..ops.pallas_tpu import pair_min

        # fused [P, Q] distance + bidirectional min (Pallas on TPU: the
        # distance matrix never leaves VMEM)
        f_d2, f_j, b_d2, b_i = pair_min(xyz, r_xyz, m_mask, r_mask)
        f_ok = m_mask & (f_d2 <= r2)
        b_ok = r_mask & (b_d2 <= r2)

        pm = jnp.concatenate(
            [xyz, jnp.take_along_axis(xyz, b_i[..., None], axis=1)], axis=1
        )  # [C, P+Q, 3]
        pr = jnp.concatenate(
            [jnp.take_along_axis(r_xyz, f_j[..., None], axis=1), r_xyz], axis=1
        )
        ok = jnp.concatenate([f_ok, b_ok], axis=1)
        w = ok.astype(xyz.dtype)
        n = jnp.maximum(jnp.sum(w, axis=1), 1e-6)
        mc = jnp.sum(pm * w[..., None], axis=1) / n[:, None]
        rc = jnp.sum(pr * w[..., None], axis=1) / n[:, None]
        Pc = jnp.where(ok[..., None], pm - mc[:, None, :], 0.0)
        Qc = jnp.where(ok[..., None], pr - rc[:, None, :], 0.0)
        dist = jnp.linalg.norm(Pc - Qc, axis=-1)
        # truncated robust mean (registration_utils.py:44-58)
        mean0 = jnp.sum(dist * w, axis=1) / n
        clamped = jnp.clip(dist, (mean0 - trunc_dist)[:, None], (mean0 + trunc_dist)[:, None])
        l1 = jnp.sum(clamped * w, axis=1) / n
        loss = jnp.sum(w * dist * dist)

        cov = jnp.einsum("ced,cef->cdf", Pc, Qc, precision=_HI) / n[:, None, None]
        reg = T[:, :3, :3] * angle_regularizer
        R = geometry.procrustes_rotation(jnp.swapaxes(cov + reg, -1, -2))
        t = rc - jnp.einsum("cij,cj->ci", R, mc, precision=_HI)
        return R, t, l1, loss, f_ok

    def cond(state):
        _, _, _, _, countdown, it = state
        return (countdown > 0) & (it < max_iter)

    def body(state):
        xyz, T, _, last_loss, countdown, it = state
        R, t, l1, loss, _ = solve(xyz, T)
        xyz = jnp.einsum("cij,cpj->cpi", R, xyz, precision=_HI) + t[:, None, :]
        T = jnp.matmul(geometry.make_rigid(R, t), T, precision=_HI)
        countdown = jnp.where(last_loss - loss < stopping_delta, countdown - 1, 3)
        return xyz, T, l1, loss, countdown, it + 1

    init = (m_xyz, T_prior, jnp.zeros((C,), m_xyz.dtype), jnp.asarray(1e10, m_xyz.dtype), 3, 0)
    xyz, T, l1, _, _, _ = jax.lax.while_loop(cond, body, init)

    # edge-coverage ratio at the final pose (registration_utils.py:189-199)
    from ..ops.pallas_tpu import pair_min as _pm

    f_d2_fin, _, _, _ = _pm(xyz, r_xyz, m_mask, r_mask)
    f_ok = m_mask & (f_d2_fin <= r2)
    deg = jnp.maximum(jnp.sum(m_mask, axis=1), 1e-6)
    ratio = jnp.sum(f_ok, axis=1) / deg
    # components with an empty candidate set register nothing
    empty = n_r < 0.5
    eyeT = jnp.broadcast_to(jnp.eye(4, dtype=T.dtype), T.shape)
    T = jnp.where(empty[:, None, None], eyeT, T)
    return T, jnp.where(empty, 0.0, l1), jnp.where(empty, 0.0, ratio)


def _step_core(consts, carry, track_dir, s, *, interval, levels, max_icp_iter,
               min_move_frame, num_candidates):
    """One walk step: candidate selection + ICP pyramid + velocity
    smoothing + stopping rules + member-point extraction, all per-component
    batched. Mirrors the reference step (cluster_tracking.py:553-727)."""
    (window_xyz, window_valid, window_usable, comp_pmask, comp_ext, ext_mask,
     comp_diameter, dist_comp, comp_valid0, nn_radius, angle_regularizer,
     reg_error_coeff, angle_threshold_deg, sel_margin) = consts
    (cur_pts, last_center, stopped, moving, last_velo, has_last_velo,
     transforms, comp_velos, comp_centers, comp_center_diffs,
     reg_errors, edge_ratios, extract_comp, reach_min, reach_max) = carry

    W, N, _ = window_xyz.shape
    C, P, _ = cur_pts.shape
    Q = num_candidates
    anchor_pos = interval
    pos = anchor_pos + track_dir * s
    in_win = (pos >= 0) & (pos < W)
    pos_c = jnp.clip(pos, 0, W - 1)
    nxt_xyz = window_xyz[pos_c]
    nxt_ok = window_valid[pos_c] & in_win
    nxt_usable = window_usable[pos_c] & in_win
    active = in_win & jnp.any(nxt_ok) & jnp.any(~stopped)

    T_cum = transforms[:, jnp.clip(pos - track_dir, 0, W - 1)]

    # velocity warm start (reference 569-573)
    trans = jnp.where((~stopped & has_last_velo)[:, None], last_velo, 0.0)
    cur_pts = cur_pts + (trans * track_dir * active)[:, None, :]
    T_cum = T_cum.at[:, :3, 3].add(trans * track_dir * active)

    # ---- candidate selection: Q next-frame points per component.
    # CRITICAL: the in-ball subset must be UNBIASED — taking the Q *nearest*
    # points center-biases the sample when the object has more than Q
    # points, and ICP against a center-biased sample pulls the component
    # back toward its current position instead of onto the object. Core
    # points (within the object's own extent) get priority, ties broken by
    # a per-point hash so the subset is an even random sample.
    centers = _masked_center(cur_pts, comp_pmask)
    c2 = jnp.sum(centers * centers, axis=-1)
    n2 = jnp.sum(nxt_xyz * nxt_xyz, axis=-1)
    cross = jnp.matmul(centers, nxt_xyz.T, precision=_HI)
    d2cn = c2[:, None] + n2[None, :] - 2.0 * cross  # [C, N]
    sel_r = comp_diameter * 0.5 + sel_margin
    core_r = comp_diameter * 0.5 + 1.0
    in_ball = nxt_ok[None, :] & (d2cn <= (sel_r * sel_r)[:, None])
    in_core = d2cn <= (core_r * core_r)[:, None]
    pidx = jnp.arange(N, dtype=jnp.uint32)
    rand01 = (pidx * jnp.uint32(2654435761) >> 12).astype(jnp.float32) / jnp.float32(1 << 20)
    score = jnp.where(in_ball, in_core.astype(jnp.float32) * 2.0 + rand01[None, :], -jnp.inf)
    neg_d2, cand_idx = jax.lax.approx_max_k(score, Q)
    cand_sel = jnp.isfinite(neg_d2)
    cand_idx = jnp.clip(cand_idx, 0, N - 1).astype(jnp.int32)
    cand_xyz = nxt_xyz[cand_idx]  # [C, Q, 3] — the step's ONE big gather
    cand_valid = cand_sel & nxt_ok[cand_idx]
    cand_usable = cand_sel & nxt_usable[cand_idx]

    # ---- ICP pyramid (coarse-to-fine; T applied to full-res tile per level)
    l1_err = jnp.zeros((C,), jnp.float32)
    edge_ratio = jnp.zeros((C,), jnp.float32)
    # after the coarse level aligns the tile, the fine levels only need the
    # candidates NEAR the component — trimming [C, Q] to the Q2 nearest
    # (by point-to-moved-tile distance) halves every fine-level pair_min
    # (the walk's dominant device cost) for one extra full-Q pass
    fine_q = int(_os.environ.get("PCSEQ_FINE_CANDIDATES", 256))
    for li, (vx, vy, vz, radius, sdelta) in enumerate(levels):
        vs = jnp.asarray([vx, vy, vz], jnp.float32)
        # cross-component exclusivity (the reference's backward edges go to
        # the GLOBALLY nearest moving point, registration_utils.py:133-138):
        # a candidate point participates only in the component whose moved
        # points are nearest, else overlap regions pull components onto
        # their neighbors. One [C, Q, P] distance + scatter-min per level.
        from ..ops.pallas_tpu import pair_min as _pm

        _, _, mind_cp, _ = _pm(cur_pts, cand_xyz, comp_pmask, cand_usable)  # [C, Q]
        flat_idx = jnp.where(cand_usable, cand_idx, N).reshape(-1)
        flat_d = jnp.where(cand_usable, mind_cp, jnp.inf).reshape(-1)
        best_cp = jax.ops.segment_min(flat_d, flat_idx, num_segments=N + 1)[:N]
        excl = cand_usable & (mind_cp <= best_cp[cand_idx])
        m_xyz, m_mask = _voxel_dedup(cur_pts, comp_pmask, vs)
        r_xyz, r_mask = _voxel_dedup(cand_xyz, excl, vs)
        T0 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (C, 4, 4))
        T_l, l1_l, ratio_l = _icp_level(
            m_xyz, m_mask, r_xyz, r_mask, T0,
            jnp.asarray(radius, jnp.float32), angle_regularizer,
            max_icp_iter, jnp.asarray(sdelta, jnp.float32),
        )
        if li == 0:
            edge_ratio = ratio_l
        if li == len(levels) - 1:
            l1_err = l1_l
        moved = jnp.einsum("cij,cpj->cpi", T_l[:, :3, :3], cur_pts, precision=_HI) \
            + T_l[:, :3, 3][:, None, :]
        cur_pts = jnp.where(active, moved, cur_pts)
        T_cum = jnp.where(active, jnp.matmul(T_l, T_cum, precision=_HI), T_cum)
        if li == 0 and fine_q < cand_xyz.shape[1]:
            inf = jnp.asarray(jnp.inf, jnp.float32)
            _, _, bd0, _ = _pm(cur_pts, cand_xyz, comp_pmask, cand_usable)
            score0 = -jnp.where(cand_usable, bd0, inf)
            neg0, keep_i = jax.lax.top_k(score0, fine_q)
            near = jnp.isfinite(neg0)
            cand_xyz = jnp.take_along_axis(cand_xyz, keep_i[..., None], axis=1)
            cand_idx = jnp.take_along_axis(cand_idx, keep_i, axis=1)
            cand_valid = jnp.take_along_axis(cand_valid, keep_i, axis=1) & near
            cand_usable = jnp.take_along_axis(cand_usable, keep_i, axis=1) & near

    # ---- component centers + velocity (reference 629-642)
    centers = _masked_center(cur_pts, comp_pmask)
    comp_centers = comp_centers.at[:, pos_c].set(
        jnp.where(active, centers, comp_centers[:, pos_c])
    )
    velo = (centers - last_center) * track_dir
    velo = velo.at[:, 2].set(0.0)
    comp_velos = comp_velos.at[:, pos_c].set(jnp.where(active, velo, comp_velos[:, pos_c]))
    seed_anchor = active & (track_dir == -1) & (s == 1)
    comp_velos = comp_velos.at[:, anchor_pos].set(
        jnp.where(seed_anchor, velo, comp_velos[:, anchor_pos])
    )
    diff = (comp_centers[:, pos_c] - comp_centers[:, jnp.clip(pos - track_dir, 0, W - 1)]) * track_dir
    comp_center_diffs = comp_center_diffs.at[:, pos_c].set(
        jnp.where(active, diff, comp_center_diffs[:, pos_c])
    )

    # temporal smoothing over the walked span (reference smooth_velo)
    w_idx = jnp.arange(W)
    lo = jnp.minimum(anchor_pos + track_dir, pos)
    hi = jnp.maximum(anchor_pos + track_dir, pos)
    span = (w_idx >= lo) & (w_idx <= hi)
    if _ABLATE != "nosmooth":
        sm = _smooth_velos(comp_velos, comp_center_diffs, span)
        comp_velos = jnp.where(active, sm, comp_velos)
    delta = comp_velos[:, pos_c] - velo
    velo = comp_velos[:, pos_c]
    cur_pts = cur_pts + (delta * track_dir * active)[:, None, :]
    T_cum = T_cum.at[:, :3, 3].add(delta * track_dir * active)
    last_center_new = _masked_center(cur_pts, comp_pmask)

    transforms = transforms.at[:, pos_c].set(jnp.where(active, T_cum, transforms[:, pos_c]))

    # ---- stopping rules (reference 675-708)
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

    # ---- NN member-point extraction over ALL next-frame points
    # (reference 710-721: each next-frame point joins the component of its
    # nearest moved point within nn_radius). Every point tests its 2
    # nearest component CENTERS (updated post-ICP), then the exact
    # point-to-moved-tile distance decides — O(N * 2 * P), independent of
    # the candidate budget Q.
    if _ABLATE == "noext":
        reg_errors = reg_errors.at[:, pos_c].set(jnp.where(active, l1_err, reg_errors[:, pos_c]))
        edge_ratios = edge_ratios.at[:, pos_c].set(jnp.where(active, edge_ratio, edge_ratios[:, pos_c]))
        return (
            cur_pts, last_center_new, new_stopped, new_moving, velo, jnp.asarray(True),
            transforms, comp_velos, comp_centers, comp_center_diffs,
            reg_errors, edge_ratios, extract_comp, reach_min, reach_max,
        )
    centers_post = last_center_new
    c2p = jnp.sum(centers_post * centers_post, axis=-1)
    d2cn_post = c2p[:, None] + n2[None, :] - 2.0 * jnp.matmul(
        centers_post, nxt_xyz.T, precision=_HI
    )  # [C, N]
    comp_open = ~new_stopped & (jnp.sum(ext_mask, axis=1) > 0)
    d2gate = jnp.where(comp_open[:, None], d2cn_post, jnp.inf)
    C_all = d2gate.shape[0]
    _, near2 = jax.lax.top_k(-d2gate.T, min(2, C_all))  # [N, <=2]
    if C_all < 2:  # single-component window: duplicate the only candidate
        near2 = jnp.concatenate([near2, near2], axis=1)
    near2 = near2.astype(jnp.int32)
    # full-resolution member test: cur_pts == T_cum(anchor pack), so the
    # denser extraction tile moves by the same accumulated transform
    moved_ext = jnp.einsum(
        "cij,cpj->cpi", T_cum[:, :3, :3], comp_ext, precision=_HI
    ) + T_cum[:, :3, 3][:, None, :]
    tiles = moved_ext[near2]  # [N, 2, Pe, 3]
    tmask = ext_mask[near2]  # [N, 2, Pe]
    dd = jnp.sum((tiles - nxt_xyz[:, None, None, :]) ** 2, axis=-1)
    dd = jnp.where(tmask, dd, jnp.inf)
    mind2 = jnp.min(dd, axis=2)  # [N, 2]
    claim2 = (
        (mind2 <= nn_radius * nn_radius)
        & comp_open[near2] & nxt_ok[:, None] & active
    )
    mind2 = jnp.where(claim2, mind2, jnp.inf)
    pick = jnp.argmin(mind2, axis=1)
    any_claim = jnp.any(claim2, axis=1)
    best_comp = jnp.where(
        any_claim, jnp.take_along_axis(near2, pick[:, None], axis=1)[:, 0], -1
    )
    extract_comp = extract_comp.at[pos_c].set(
        jnp.where(any_claim & active, best_comp, extract_comp[pos_c])
    )

    reg_errors = reg_errors.at[:, pos_c].set(jnp.where(active, l1_err, reg_errors[:, pos_c]))
    edge_ratios = edge_ratios.at[:, pos_c].set(jnp.where(active, edge_ratio, edge_ratios[:, pos_c]))

    return (
        cur_pts, last_center_new, new_stopped, new_moving, velo, jnp.asarray(True),
        transforms, comp_velos, comp_centers, comp_center_diffs,
        reg_errors, edge_ratios, extract_comp, reach_min, reach_max,
    )


batched_step = functools.partial(
    jax.jit,
    static_argnames=("interval", "levels", "max_icp_iter", "min_move_frame",
                     "num_candidates"),
)(_step_core)


@functools.partial(
    jax.jit,
    static_argnames=("interval", "levels", "max_icp_iter", "min_move_frame",
                     "num_candidates"),
)
def walk_direction(consts, carry, track_dir, frame_nonempty, *, interval,
                   levels, max_icp_iter, min_move_frame, num_candidates):
    """One direction of the walk as a SINGLE device program.

    The per-step dispatch (16 separate jit programs per tracked frame) paid
    a measured ~15-20 ms of launch overhead each through the tunneled
    runtime, and — because no host read happens mid-walk — steps after
    every component stopped still executed as masked no-ops. A
    lax.while_loop over the step index keeps one program per direction AND
    exits the moment all components are stopped or the walk falls off the
    populated window (the reference's `break`, cluster_tracking.py:553).
    """
    anchor_pos = interval
    W = consts[0].shape[0]

    def cond(st):
        carry, s = st
        stopped = carry[2]
        pos = anchor_pos + track_dir * s
        in_win = (pos >= 0) & (pos < W)
        pos_c = jnp.clip(pos, 0, W - 1)
        return (
            (s <= interval) & in_win & frame_nonempty[pos_c]
            & jnp.any(~stopped)
        )

    def body(st):
        carry, s = st
        carry = _step_core(
            consts, carry, track_dir, s,
            interval=interval, levels=levels, max_icp_iter=max_icp_iter,
            min_move_frame=min_move_frame, num_candidates=num_candidates,
        )
        return (carry, s + 1)

    carry, _ = jax.lax.while_loop(
        cond, body, (carry, jnp.asarray(1, jnp.int32)))
    return carry


_GLOBAL_KEYS = ("transforms", "comp_velos", "comp_centers", "comp_center_diffs",
                "reg_errors", "edge_ratios", "extract_comp", "reach_min", "reach_max")


@jax.jit
def _count_claims(extract_comp):
    return jnp.sum((extract_comp >= 0).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact_walk_claims(extract_comp, cap):
    """Compact the dense [W, N] claim table to (flat positions, int16
    component ids): claims are sparse (foreground points near walked
    components), so shipping only the claiming slots cuts the walk's
    dominant D2H through the ~20 MB/s tunnel. Positions are ascending
    (cumsum order), so the host slices per-frame runs with searchsorted.
    On cap overflow the caller falls back to the dense table."""
    flat = extract_comp.reshape(-1)
    ok = flat >= 0
    rank = jnp.cumsum(ok.astype(jnp.int32)) - 1
    idx = jnp.where(ok, jnp.minimum(rank, cap - 1), cap)
    pos = jnp.full(cap + 1, -1, jnp.int32).at[idx].set(
        jnp.arange(flat.shape[0], dtype=jnp.int32))[:cap]
    val = jnp.zeros(cap + 1, jnp.int16).at[idx].set(
        flat.astype(jnp.int16))[:cap]
    return pos, val


def track_window_batched_dispatch(
    window_xyz, window_valid, window_stationary, comp_xyz, comp_pmask,
    comp_valid0, comp_diameter, comp_deg,
    interval, levels, num_candidates,
    nn_radius, angle_regularizer, reg_error_coeff, angle_threshold_deg,
    min_move_frame, max_icp_iter=80, sel_margin=6.0,
    comp_ext=None, ext_mask=None, frame_nonempty=None,
):
    """Dispatch the walk (both directions) WITHOUT reading anything back.

    Returns the dict of device arrays (D2H copies already started) for
    track_window_batched_drain — the dispatch/drain split lets the caller
    software-pipeline tracked frames: while the device crunches frame i's
    walk, the host assembles frame i-1's results and dispatches its trace
    extraction, so tunnel latency and host prep hide behind device compute.

    window_*: [W, N(,3)] frame tables with anchor at slot ``interval``;
    comp_xyz/comp_pmask: [C, P(,3)] packed anchor points per component.
    """
    W = 2 * interval + 1
    C = comp_xyz.shape[0]
    N = window_xyz.shape[1]
    anchor_pos = interval

    dist_comp = np.zeros((C,), np.float32)
    for lo, hi, v in ((0, 10, 1.0), (10, 40, 0.5), (40, 100, 0.3), (100, 200, 0.2), (200, 400, 0.1)):
        dist_comp[(comp_deg >= lo) & (comp_deg < hi)] = v

    if comp_ext is None:
        comp_ext, ext_mask = comp_xyz, comp_pmask
    consts = (
        jnp.asarray(window_xyz), jnp.asarray(window_valid),
        jnp.asarray(window_valid & ~window_stationary),
        jnp.asarray(comp_pmask), jnp.asarray(comp_ext), jnp.asarray(ext_mask),
        jnp.asarray(comp_diameter),
        jnp.asarray(dist_comp), jnp.asarray(comp_valid0),
        jnp.asarray(nn_radius, jnp.float32),
        jnp.asarray(angle_regularizer, jnp.float32),
        jnp.asarray(reg_error_coeff, jnp.float32),
        jnp.asarray(angle_threshold_deg, jnp.float32),
        jnp.asarray(sel_margin, jnp.float32),
    )
    comp_valid0 = jnp.asarray(comp_valid0)
    comp_xyz = jnp.asarray(comp_xyz)
    center0 = _masked_center(comp_xyz, jnp.asarray(comp_pmask))

    g = dict(
        transforms=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (C, W, 4, 4)),
        comp_velos=jnp.zeros((C, W, 3), jnp.float32),
        comp_centers=jnp.zeros((C, W, 3), jnp.float32).at[:, anchor_pos].set(center0),
        comp_center_diffs=jnp.zeros((C, W, 3), jnp.float32),
        reg_errors=jnp.zeros((C, W), jnp.float32),
        edge_ratios=jnp.zeros((C, W), jnp.float32),
        extract_comp=jnp.full((W, N), -1, jnp.int32),
        reach_min=jnp.full((C,), anchor_pos, jnp.int32),
        reach_max=jnp.full((C,), anchor_pos, jnp.int32),
    )
    if frame_nonempty is None:
        frame_nonempty = np.asarray(window_valid).any(axis=1)

    moving_final = jnp.ones((C,), bool) & comp_valid0
    for track_dir in (-1, 1):
        moving = jnp.ones((C,), bool) & comp_valid0
        has_lv = jnp.asarray(track_dir == 1) & jnp.any(g["comp_velos"][:, anchor_pos] != 0)
        carry = (
            comp_xyz, center0, ~comp_valid0, moving,
            g["comp_velos"][:, anchor_pos], has_lv,
            g["transforms"], g["comp_velos"], g["comp_centers"], g["comp_center_diffs"],
            g["reg_errors"], g["edge_ratios"], g["extract_comp"], g["reach_min"], g["reach_max"],
        )
        # one device program per direction (walk_direction): no mid-walk
        # host read, one launch overhead instead of `interval`, and the
        # while_loop exits the moment every component is stopped or the
        # walk falls off the populated window — steps that the old
        # per-step dispatch executed as masked no-ops now cost nothing.
        _t0 = __import__("time").time()
        carry = walk_direction(
            consts, carry, jnp.asarray(track_dir),
            jnp.asarray(np.asarray(frame_nonempty, bool)),
            interval=interval, levels=levels, max_icp_iter=max_icp_iter,
            min_move_frame=min_move_frame, num_candidates=num_candidates,
        )
        _tick("walk_dispatch", _t0)
        # AND across directions (host walk: moving_total &= moving per
        # direction, cluster_tracking.py:929) — each direction's min-move
        # gate must be able to veto independently
        moving_final = moving_final & carry[3]
        for i, k in enumerate(_GLOBAL_KEYS):
            g[k] = carry[6 + i]

    valid_final = comp_valid0 & (
        (g["reach_max"] >= anchor_pos + min_move_frame)
        | (g["reach_min"] <= anchor_pos - min_move_frame)
    )
    g["moving"] = moving_final
    g["valid_final"] = valid_final
    # lean wire format: only what the caller consumes crosses the tunnel.
    # The [W, N] claim table is compacted HERE, at dispatch time with a
    # FIXED cap (claims cover only foreground points near walked
    # components — a cnt-dependent cap would both sync mid-pipeline and
    # mint a compile variant per bucket): pos/val/cnt ship async with the
    # rest of the walk outputs, and the drain falls back to the dense
    # int16 table only on cap overflow.
    assert C < 32767, "int16 extract_comp wire overflow"
    ec = g.pop("extract_comp")
    # pre-cast the dense int16 fallback copy NOW (device-side, async, no
    # transfer) so a rare cap overflow at drain time pays only the D2H,
    # not a cold cast dispatch on top of it
    g["_extract_comp_dev"] = ec.astype(jnp.int16)
    g["claim_cnt"] = _count_claims(ec)
    cap = 2 * N
    pos, val = _compact_walk_claims(ec, cap)
    g["_claims_pos"], g["_claims_val"] = pos, val
    g["_claims_cap"] = cap
    for k in ("comp_velos", "comp_centers", "comp_center_diffs"):
        g.pop(k)
    # ONE latency for the whole drain: start every D2H copy, then collect
    # (per-array np.asarray would pay the tunnel round-trip 12x)
    for k, v in g.items():
        if k in ("_extract_comp_dev", "_claims_cap"):
            continue
        try:
            v.copy_to_host_async()
        except AttributeError:
            pass
    return g


def track_window_batched_drain(g):
    """Block on the walk outputs started by track_window_batched_dispatch.

    ``extract_comp`` comes back either dense ([W, N] int16 ndarray) or as
    ``("sparse", pos, val, (W, N))`` with ascending flat positions."""
    _t0 = __import__("time").time()
    ec = g.pop("_extract_comp_dev")
    cap = g.pop("_claims_cap")
    pos = g.pop("_claims_pos", None)
    val = g.pop("_claims_val", None)
    out = {k: np.asarray(v) for k, v in g.items()}
    W, N = ec.shape
    cnt = int(out.pop("claim_cnt"))
    import os as _o

    if _o.environ.get("PCSEQ_PROF"):
        PROF["claims_max"] = max(PROF.get("claims_max", 0), cnt)
    if pos is not None and cnt <= cap:
        out["extract_comp"] = (
            "sparse", np.asarray(pos)[:cnt], np.asarray(val)[:cnt], (W, N))
    else:  # cap overflow: dense fallback (int16 copy pre-cast at dispatch)
        out["extract_comp"] = np.asarray(ec)
    _tick("walk_drain", _t0)
    return out


def densify_claims(ec):
    """Sparse claim wire -> dense [W, N] int16 table (tests / host callers
    that want random access)."""
    if not isinstance(ec, tuple):
        return ec
    _, pos, val, (W, N) = ec
    dense = np.full(W * N, -1, np.int16)
    dense[pos] = val
    return dense.reshape(W, N)


def track_window_batched(*args, **kwargs):
    """Dispatch + drain in one call (tests / non-pipelined callers)."""
    return track_window_batched_drain(
        track_window_batched_dispatch(*args, **kwargs))
