"""Cluster tracking: coarse-to-fine per-component ICP walks across frames.

TPU-native rewrite of ClusterTracking
(/root/reference/pcdet/models/registration/preprocessors/cluster_tracking.py):
for every TRACK_INTERVAL-th frame, every proposed component is tracked
+-TRACK_INTERVAL frames in both directions through a 3-level voxel/radius
pyramid of batched Procrustes ICP solves, with velocity estimation +
temporal smoothing and per-component stopping rules. Member points are
re-extracted from the full-resolution cloud via a nearest-neighbor graph and
scored against GT boxes.

Architecture: the frame walk and stopping logic live on host (tiny [C]-sized
numpy arrays, mirrors the reference's checkpointing semantics); everything
O(points) — grid sampling, neighbor search, ICP, velocity smoothing — is a
jitted kernel over capacity-padded tables.
"""

from __future__ import annotations

import functools
import os

_ANGLE_VELO_EXEMPT = float(os.environ.get("PCSEQ_ANGLE_VELO_EXEMPT", 0.05))
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import boxes as box_ops
from ..ops import grid_utils, hash_graph, segment_ops
from ..utils import telemetry
from ..utils.edict import EDict
from ..utils.padding import bucket_size, pad_rows
from .registration import register_to_next_frame


# ---------------------------------------------------------------------------
# jitted pieces
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("C",))
def _comp_stats_kernel(flat, comp, n, C):
    """Per-component point count, centroid, and diameter (2x max radius
    from the centroid) over the resident [n_pad, 4] sequence table — the
    reference's per-component python loop (cluster_tracking.py:89-121)
    as three segment reductions. Host numpy (bincount x4 + norm +
    np.maximum.at over ~9M points) costs ~3 s/sequence; this is two
    passes over HBM."""
    n_pad = flat.shape[0]
    m = (jnp.arange(n_pad, dtype=jnp.int32) < n) & (comp >= 0)
    seg = jnp.where(m, comp, C)
    xyz = flat[:, 1:4]
    cnt = segment_ops.segment_count(seg, C + 1)[:C].astype(jnp.float32)
    ssum = jax.ops.segment_sum(
        jnp.where(m[:, None], xyz, 0.0), seg, num_segments=C + 1)[:C]
    ctr = ssum / jnp.maximum(cnt[:, None], 1.0)
    # one residual-refinement pass: accumulating (xyz - ctr0) instead of xyz
    # removes the f32 cancellation that made multi-million-point centroids
    # drift vs the host float64 bincount path (diameter crosses the 12.5 m
    # stationary threshold identically on both paths)
    res = jax.ops.segment_sum(
        jnp.where(m[:, None], xyz - ctr[jnp.clip(comp, 0, C - 1)], 0.0),
        seg, num_segments=C + 1)[:C]
    ctr = ctr + res / jnp.maximum(cnt[:, None], 1.0)
    r = jnp.linalg.norm(xyz - ctr[jnp.clip(comp, 0, C - 1)], axis=-1)
    diam = 2.0 * jax.ops.segment_max(
        jnp.where(m, r, -1.0), seg, num_segments=C + 1)[:C]
    return cnt, ctr, jnp.maximum(diam, 0.0)


@functools.partial(jax.jit, static_argnames=())
def _sample_frame_kernel(fxyz, comp, stationary, valid, voxel_size):
    """Grid-subsample one frame: mean position, mean>0.5 stationary flag,
    MEDIAN component id per voxel (reference sample_frame,
    cluster_tracking.py:39-51)."""
    n = fxyz.shape[0]
    coords = grid_utils.voxel_coords(fxyz, voxel_size)
    coords = jnp.where(valid[:, None], coords, jnp.int32(2 ** 24))
    inverse, num_voxels, _ = grid_utils.unique_rows(coords)
    mean_xyz = segment_ops.segment_mean(jnp.where(valid[:, None], fxyz, 0.0), inverse, n)
    stat = segment_ops.segment_mean(
        jnp.where(valid, stationary.astype(fxyz.dtype), 0.0), inverse, n
    ) > 0.5
    med_comp = segment_ops.segment_median(
        jnp.where(valid, comp, jnp.int32(-1)), inverse, n
    )
    occupancy = segment_ops.segment_count(jnp.where(valid, inverse, n), n + 1)[:n]
    vvalid = occupancy > 0.5
    return mean_xyz, med_comp, stat, vvalid


@functools.partial(jax.jit, static_argnames=("num_components",))
def _component_stats(xyz, comp, valid, num_components):
    """Per-component degree, center, diameter (reference
    component_diameter/component_center, cluster_tracking.py:89-121)."""
    C = num_components
    cs = jnp.where(valid & (comp >= 0), comp, C)
    deg = segment_ops.segment_count(cs, C + 1)[:C]
    center = segment_ops.segment_mean(xyz, cs, C + 1)[:C]
    d = jnp.linalg.norm(xyz - center[jnp.clip(cs, 0, C - 1)], axis=-1)
    d = jnp.where(valid & (comp >= 0), d, -jnp.inf)
    diam = segment_ops.segment_max_or(d, cs, C + 1, 0.0)[:C]
    return deg, center, jnp.maximum(diam, 0.0) * 2.0


@functools.partial(jax.jit, static_argnames=("window",))
def _smooth_velo_kernel(velos, diffs, active, window, weight0=1.0, weight=10.0, num_itr=300, stopping=1e-3):
    """Velocity smoothing: L2 fit to center diffs + L1 temporal smoothness,
    AdamW-in-jit with MultiStep decay and early-stop countdown (reference
    smooth_velo, cluster_tracking.py:162-199).

    velos/diffs: [C, window, 3]; active: [window] bool (frames in the
    optimized span). Only xy participates (reference [..., :2]).
    """
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
        v, o, it, last, cd = s
        return (cd > 0) & (it < num_itr)

    def body(s):
        v, o, it, last, cd = s
        loss, g = grad_fn(v)
        upd, o = opt.update(g, o, v)
        v = optax.apply_updates(v, upd)
        cd = jnp.where(last - loss < stopping, cd - 1, 3)
        return v, o, it + 1, loss, cd

    v0 = velos
    state = (v0, opt.init(v0), 0, jnp.asarray(1e10, velos.dtype), 3)
    v, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    # frames outside the active span keep their original values
    return jnp.where(active[None, :, None], v, velos)


@jax.jit
def _box_assign(pts, boxes, bvalid):
    """Per-point owning box (first containing box id, -1 outside all) —
    reference assigns by membership test order (cluster_tracking.py:382-
    401); returned as one [N] int32 to keep the device->host transfer
    small."""
    bp = box_ops.points_in_boxes(pts, boxes) & bvalid[:, None]
    return jnp.where(jnp.any(bp, axis=0), jnp.argmax(bp, axis=0), -1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("F", "X", "Y", "W", "Bq"))
def _window_claim_pallas(refs, rvalid, ref_comp, q, qv, radius, F, X, Y,
                         W=2048, Bq=256):
    """One sorted-grid scan claims EVERY frame of a tracked window: refs
    are the window's raw extracted points [E, 4] (frame, x, y, z) and
    queries the full-res frame points with their frame id — the kernel's
    per-frame cell key makes the per-frame NN exact, with no per-component
    tiles and no Pe subsample (reference NN extraction,
    cluster_tracking.py:342-360).

    The z-band test (matched z within (-0.05, 0.5) of the query, reference
    353-356) folds in ON DEVICE, and the result ships as ONE int16 vector —
    the tunneled D2H link (~50 MB/s) makes every transferred byte part of
    the steady-state frame cost.

    Returns (component per query [-1 none/z-rejected] int16, num_truncated)."""
    from ..ops import pallas_scan

    idx, _, mask, ntrunc = pallas_scan.radius_neighbors_sorted(
        refs, q, radius, 1, F=F, X=X, Y=Y,
        ref_valid=rvalid, query_valid=qv, W=W, Bq=Bq,
    )
    i0 = jnp.clip(idx[:, 0], 0, refs.shape[0] - 1)
    ok = mask[:, 0]
    zdiff = refs[i0, 3] - q[:, 3]
    ok &= (zdiff < 0.5) & (zdiff > -0.05)
    comp = jnp.where(ok, ref_comp[i0], -1).astype(jnp.int16)
    return comp, ntrunc


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact_claims(comp, gt, cap):
    """Ship only the CLAIMING rows over the tunnel: the window claim is
    sparse (most full-res points match no extracted point), so instead of
    the dense [Fw, n_cap] int16 claim+gt tables (~15 MB per tracked frame
    at reference scale) the wire carries (pos, comp, gt) for the claimed
    rows; the per-box counts the IoU union needs from UNCLAIMED rows ship
    as the tiny m1cnt table from _box_assign_batch2.

    comp/gt: [M] int16 flat over the window (row-major [Fw, n_cap]).
    Returns (pos [cap] int32 flat positions (-1 pads), comp [cap] i16,
    gt [cap] i16, count — claims beyond ``cap`` are dropped and count
    tells the caller to fall back)."""
    M = comp.shape[0]
    sel = comp >= 0
    key = 1 - sel.astype(jnp.int32)
    iota = jnp.arange(M, dtype=jnp.int32)
    _, perm = jax.lax.sort((key, iota), num_keys=2)
    pos = perm[:cap]
    count = jnp.sum(sel.astype(jnp.int32))
    take_ok = jnp.arange(cap, dtype=jnp.int32) < count
    pos = jnp.where(take_ok, pos, -1)
    safe = jnp.clip(pos, 0, M - 1)
    return pos, comp[safe], gt[safe], count


@jax.jit
def _box_assign_batch2(pts, boxes, bvalid):
    """Per-frame box assignment (int16) + per-frame per-box point counts
    (the m1cnt of the box-IoU union, reference cluster_tracking.py:
    382-414) in one dispatch."""

    def one(pp, bb, vv):
        gid = _box_assign(pp, bb, vv)
        B = bb.shape[0]
        cnt = jax.ops.segment_sum(
            (gid >= 0).astype(jnp.int32), jnp.where(gid >= 0, gid, B),
            num_segments=B + 1,
        )[:B]
        return gid.astype(jnp.int16), cnt

    return jax.vmap(one)(pts, boxes, bvalid)


@functools.partial(jax.jit, static_argnames=())
def _claim_points_kernel(query_xyz, query_valid, tile_xyz, tile_mask, radius):
    """Assign each query point to the component of its nearest tile point
    within ``radius`` (the trace-extraction NN, reference
    cluster_tracking.py:342-360) — gate by the 2 nearest component centers
    (one [C, N] matmul + top-k), then exact distances against the
    component's [Pe] tile. O(N * 2 * Pe), no hash grid, MXU-friendly.

    Returns (comp [N] int32 (-1 none), src_z [N] — z of the matched tile
    point, for the host-side z-band filter)."""
    hi = jax.lax.Precision.HIGHEST
    C, Pe, _ = tile_xyz.shape
    N = query_xyz.shape[0]
    w = tile_mask.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    centers = jnp.sum(tile_xyz * w[..., None], axis=1) / cnt[:, None]
    nonempty = jnp.sum(tile_mask, axis=1) > 0

    c2 = jnp.sum(centers * centers, axis=-1)
    n2 = jnp.sum(query_xyz * query_xyz, axis=-1)
    d2cn = c2[:, None] + n2[None, :] - 2.0 * jnp.matmul(centers, query_xyz.T, precision=hi)
    d2cn = jnp.where(nonempty[:, None], d2cn, jnp.inf)
    _, near2 = jax.lax.top_k(-d2cn.T, 2)  # [N, 2]
    near2 = near2.astype(jnp.int32)
    tiles = tile_xyz[near2]  # [N, 2, Pe, 3]
    tmask = tile_mask[near2]
    dd = jnp.sum((tiles - query_xyz[:, None, None, :]) ** 2, axis=-1)
    dd = jnp.where(tmask, dd, jnp.inf)
    mind = jnp.min(dd, axis=2)  # [N, 2]
    argp = jnp.argmin(dd, axis=2)  # [N, 2]
    ok = (mind <= radius * radius) & nonempty[near2] & query_valid[:, None]
    mind = jnp.where(ok, mind, jnp.inf)
    pick = jnp.argmin(mind, axis=1)
    any_ok = jnp.any(ok, axis=1)
    comp = jnp.where(any_ok, jnp.take_along_axis(near2, pick[:, None], 1)[:, 0], -1)
    pbest = jnp.take_along_axis(argp, pick[:, None], 1)[:, 0]
    zsel = jnp.take_along_axis(
        jnp.take_along_axis(tiles[..., 2], pick[:, None, None], 1)[:, 0],
        pbest[:, None], 1,
    )[:, 0]
    return comp, zsel


@functools.partial(jax.jit, static_argnames=("cell_cap",))
def _nn_match(ref_xyz, ref_valid, query_xyz, query_valid, radius,
              cell_cap=hash_graph.DEFAULT_CELL_CAP):
    """Nearest ref point within radius for each query (k=1 NN_GRAPH)."""
    nr = ref_xyz.shape[0]
    nq = query_xyz.shape[0]
    ref_f = jnp.concatenate([jnp.zeros((nr, 1), ref_xyz.dtype), ref_xyz], axis=1)
    q_f = jnp.concatenate([jnp.zeros((nq, 1), query_xyz.dtype), query_xyz], axis=1)
    grid = hash_graph.build_hash_grid(ref_f, radius, ref_valid)
    idx, d2, mask = hash_graph.radius_neighbors(grid, q_f, radius, 1, query_valid=query_valid, cell_cap=cell_cap)
    return idx[:, 0], mask[:, 0]


def dist_compensate(comp_deg):
    """Registration-error slack for small components (reference
    cluster_tracking.py:80-87)."""
    thresholds = [0, 10, 40, 100, 200, 400, 10 ** 7]
    comp_dist = [1.0, 0.5, 0.3, 0.2, 0.1, 0.0]
    out = np.zeros_like(comp_deg, dtype=np.float32)
    for i in range(1, len(thresholds)):
        m = (comp_deg >= thresholds[i - 1]) & (comp_deg < thresholds[i])
        out[m] = comp_dist[i - 1]
    return out


class ClusterTracking:
    def __init__(self, model_cfg, runtime_cfg=None):
        self.model_cfg = EDict(model_cfg)
        reg_cfg = self.model_cfg["REGISTRATION"]
        self.stopping_delta = [float(s) for s in reg_cfg["STOPPING_DELTA"]]
        self.radius_list = [float(r) for r in reg_cfg["GRAPH"]["RADIUS"]]
        self.voxel_size_list = [list(map(float, v)) for v in reg_cfg["VOXEL_SIZE"]]
        self.angle_regularizer = float(self.model_cfg.get("ANGLE_REGULARIZER", 10))
        nn_cfg = self.model_cfg["NN_GRAPH"]
        self.nn_radius = float(nn_cfg["RADIUS"])

        params = self.model_cfg.get("TRACKING_PARAMS", {})
        self.reg_error_coeff = float(params.get("REGISTRATION_ERROR_COEFFICIENT", 0.13))
        self.track_interval = int(params.get("TRACK_INTERVAL", 10))
        self.angle_threshold = float(params.get("ANGLE_THRESHOLD", 45))
        self.min_move_frame = int(params.get("MIN_MOVE_FRAME", 6))
        self.component_keys = list(self.model_cfg["COMPONENT_KEYS"])
        self.max_icp_iter = int(self.model_cfg.get("MAX_ICP_ITER", 80))
        self.device_walk = bool(self.model_cfg.get("DEVICE_WALK", True))

    # ------------------------------------------------------------------
    def track_frame(self, seq_points, frame, seq_boxes, seq_index=None):
        """Walk-mode dispatch. Default is the component-bucketed batched
        walk (tracking_batched.py): per-component [C, P] tiles whose ICP
        pyramid is batched MXU distance matrices — no gathers in the inner
        loop, so it scales to full Waymo frames. WALK_MODE selects the
        legacy paths ('device' = [W, N]-table compiled step, 'host' =
        reference-shaped per-kernel walk)."""
        mode = str(self.model_cfg.get("WALK_MODE", "batched"))
        if not self.device_walk or mode == "host":
            return self.track_frame_host(seq_points, frame, seq_boxes)
        if mode in ("stepped", "full", "device"):
            num_components = int(frame.component.max()) + 1 if len(frame.component) else 0
            n_cap = bucket_size(max(len(frame.xyz), 1))
            c_cap = bucket_size(max(num_components, 1), base=64)
            budget = int(self.model_cfg.get("STEP_COMPILE_BUDGET", 1 << 21))
            if n_cap * c_cap > budget:
                return self.track_frame_host(seq_points, frame, seq_boxes)
            return self.track_frame_device(seq_points, frame, seq_boxes, seq_index)
        return self.track_frame_batched(seq_points, frame, seq_boxes, seq_index)

    def track_frame_batched(self, seq_points, frame, seq_boxes, seq_index=None):
        """Component-bucketed walk, dispatch + finish in one call."""
        h = self.track_frame_batched_dispatch(seq_points, frame, seq_boxes, seq_index)
        if h is None:
            return None
        return self.track_frame_batched_finish(h, seq_points)

    def track_frame_batched_dispatch(self, seq_points, frame, seq_boxes, seq_index=None):
        """Component-bucketed walk (preprocessing/tracking_batched.py):
        packs each component's anchor points into a [C, P] tile, builds the
        [W, N] frame window and DISPATCHES the batched walk — no host sync.
        Returns the handle consumed by track_frame_batched_finish (the
        dispatch/finish split pipelines tracked frames: the device runs this
        frame's walk while the host finishes the previous frame)."""
        from .tracking_batched import pack_components, track_window_batched_dispatch

        num_components = int(frame.component.max()) + 1 if len(frame.component) else 0
        if num_components == 0:
            return None
        import time as _time
        _tprep = _time.time()
        frame_id = int(frame.frame[0])
        frames_arr = seq_points.frame
        W = 2 * self.track_interval + 1

        frame_rows = []
        max_n = len(frame.xyz)
        for w in range(W):
            fid = frame_id - self.track_interval + w
            if seq_index is not None:
                rows = seq_index.rows(fid)
            else:
                rows = np.nonzero(frames_arr == fid)[0]
            frame_rows.append(rows)
            max_n = max(max_n, len(rows))
        anchor_slot = self.track_interval
        na = len(frame.xyz)
        ds = getattr(self, "_ds", None)
        if ds is not None and getattr(self, "_stat_tab", None) is not None:
            # window tables sliced from the resident sequence table: per
            # tracked frame this replaces a [W, n_cap] host pack + H2D
            # (~18 MB/frame at reference scale) with one device gather.
            # The anchor slot needs no override: its table rows ARE
            # frame.xyz (same sequence rows, same order).
            tab, tval, n_cap = ds.frame_table()
            fids = np.arange(frame_id - self.track_interval,
                             frame_id + self.track_interval + 1)
            in_rng = (fids >= 0) & (fids < ds.num_frames)
            sel = jnp.asarray(np.clip(fids, 0, ds.num_frames - 1).astype(np.int32))
            window_valid = tval[sel] & jnp.asarray(in_rng)[:, None]
            window_xyz = jnp.where(
                window_valid[..., None], tab[sel][..., 1:4], 1e8)
            window_stat = self._stat_tab[sel] & window_valid
        else:
            n_cap = bucket_size(max_n)
            window_xyz = np.full((W, n_cap, 3), 1e8, np.float32)
            window_valid = np.zeros((W, n_cap), bool)
            window_stat = np.zeros((W, n_cap), bool)
            for w, rows in enumerate(frame_rows):
                n = len(rows)
                window_xyz[w, :n] = seq_points.xyz[rows]
                window_valid[w, :n] = True
                window_stat[w, :n] = seq_points.stationary[rows]
            window_xyz[anchor_slot] = 1e8
            window_valid[anchor_slot] = False
            window_stat[anchor_slot] = False
            window_xyz[anchor_slot, :na] = frame.xyz
            window_valid[anchor_slot, :na] = True
            window_stat[anchor_slot, :na] = frame.stationary

        C = bucket_size(num_components, base=64)
        deg = np.bincount(frame.component, minlength=C).astype(np.float32)[:C]
        ctr = np.zeros((C, 3), np.float32)
        for d in range(3):
            ctr[:, d] = np.bincount(frame.component, weights=frame.xyz[:, d], minlength=C)[:C]
        ctr[deg > 0] /= deg[deg > 0, None]
        rr = np.linalg.norm(frame.xyz - ctr[frame.component], axis=-1)
        diam = np.zeros(C, np.float32)
        np.maximum.at(diam, frame.component, rr)
        diam *= 2
        comp_valid0 = (deg > 0.5) & (diam < 12.5)

        P = int(self.model_cfg.get("TRACK_POINTS_PER_COMPONENT", 256))
        P_ext = int(self.model_cfg.get("TRACK_EXTRACT_POINTS", 512))
        Q = min(int(self.model_cfg.get("TRACK_NUM_CANDIDATES", 512)), n_cap)
        if ds is not None and getattr(self, "_stat_tab", None) is not None:
            # tiles packed ON DEVICE from the anchor slot of the resident
            # window (upload = one [n_cap] int32 comp-id vector instead of
            # two [C, P(,3)] tiles, ~19 MB/frame at reference scale)
            from .tracking_batched import pack_components_device

            comp_p = np.full(n_cap, -1, np.int32)
            comp_p[:na] = frame.component
            comp_d = jnp.asarray(comp_p)
            a_xyz = window_xyz[anchor_slot]
            a_valid = window_valid[anchor_slot]
            a_stat = window_stat[anchor_slot]
            comp_xyz, comp_pmask = pack_components_device(
                a_xyz, comp_d, a_valid & ~a_stat, C, P)
            comp_ext, ext_mask = pack_components_device(
                a_xyz, comp_d, a_valid, C, P_ext)
        else:
            comp_xyz, comp_pmask = pack_components(
                frame.xyz.astype(np.float32), frame.component,
                ~frame.stationary, C, P,
            )
            # denser tile for member-point extraction (all anchor points
            # incl. stationary-flagged ones, like the host walk's NN source)
            comp_ext, ext_mask = pack_components(
                frame.xyz.astype(np.float32), frame.component,
                np.ones(len(frame.xyz), bool), C, P_ext,
            )

        levels = tuple(
            (float(v[0]), float(v[1]), float(v[2]), float(r), float(sd))
            for v, r, sd in zip(self.voxel_size_list, self.radius_list, self.stopping_delta)
        )
        if os.environ.get("PCSEQ_PROF"):
            from .tracking_batched import PROF as _PROF
            _PROF["walk_prep"] = _PROF.get("walk_prep", 0.0) + (_time.time() - _tprep)
        g = track_window_batched_dispatch(
            window_xyz, window_valid, window_stat, comp_xyz, comp_pmask,
            comp_valid0, diam, deg,
            frame_nonempty=np.asarray([len(r) > 0 for r in frame_rows]),
            interval=self.track_interval, levels=levels, num_candidates=Q,
            nn_radius=self.nn_radius, angle_regularizer=self.angle_regularizer,
            reg_error_coeff=self.reg_error_coeff,
            angle_threshold_deg=self.angle_threshold,
            min_move_frame=self.min_move_frame, max_icp_iter=self.max_icp_iter,
            sel_margin=float(self.model_cfg.get("SELECTION_MARGIN", max(self.radius_list) + 4.0)),
            comp_ext=comp_ext, ext_mask=ext_mask,
        )
        return EDict(
            g=g, frame=frame, frame_id=frame_id, frame_rows=frame_rows,
            num_components=num_components, anchor_slot=anchor_slot,
        )

    def track_frame_batched_finish(self, h, seq_points):
        """Drain the walk outputs and assemble the extracted-points EDict
        (the host half of track_frame_batched)."""
        from .tracking_batched import track_window_batched_drain

        out = track_window_batched_drain(h.g)
        import time as _time
        _tasm = _time.time()
        frame, frame_id = h.frame, h.frame_id
        frame_rows, anchor_slot = h.frame_rows, h.anchor_slot
        num_components = h.num_components
        valid_final = out["valid_final"][:num_components]
        moving = out["moving"][:num_components]

        # assemble extracted points: anchor members + per-frame claims
        ex_xyzf, ex_comp, ex_seg, ex_orig = [], [], [], []
        keep_anchor = valid_final[frame.component]
        ex_xyzf.append(np.concatenate(
            [np.full((keep_anchor.sum(), 1), frame_id, np.float32), frame.xyz[keep_anchor]], axis=1))
        ex_comp.append(frame.component[keep_anchor])
        ex_seg.append(frame.segmentation_label[keep_anchor])
        ex_orig.append(frame.original_indices[keep_anchor])

        ecomp = out["extract_comp"]
        sparse_claims = isinstance(ecomp, tuple)
        if sparse_claims:
            _, cl_pos, cl_val, (_W_tab, N_tab) = ecomp
            fi = cl_pos // N_tab
            cl_row = cl_pos % N_tab
            # positions ascend, so per-frame runs slice by searchsorted
            fbounds = np.searchsorted(fi, np.arange(len(frame_rows) + 1))
        for w, rows in enumerate(frame_rows):
            if w == anchor_slot or len(rows) == 0:
                continue
            if sparse_claims:
                s0, s1 = fbounds[w], fbounds[w + 1]
                rr, vv = cl_row[s0:s1], cl_val[s0:s1]
                in_rng = rr < len(rows)
                comp = np.full(len(rows), -1, np.int64)
                comp[rr[in_rng]] = vv[in_rng]
            else:
                comp = ecomp[w, : len(rows)]
            ok = (comp >= 0) & (comp < num_components)
            ok &= valid_final[np.clip(comp, 0, num_components - 1)]
            if not ok.any():
                continue
            fid = frame_id - self.track_interval + w
            sel = np.nonzero(ok)[0]
            ex_xyzf.append(np.concatenate(
                [np.full((len(sel), 1), fid, np.float32), seq_points.xyz[rows[sel]]], axis=1))
            ex_comp.append(comp[sel])
            ex_seg.append(seq_points.segmentation_label[rows[sel]])
            ex_orig.append(rows[sel])

        extracted = EDict(
            fxyz=np.concatenate(ex_xyzf, axis=0),
            component=np.concatenate(ex_comp, axis=0),
            segmentation_label=np.concatenate(ex_seg, axis=0),
            original_indices=np.concatenate(ex_orig, axis=0),
        )
        extracted.moving = (
            moving[extracted.component] if len(extracted.component) else np.zeros(0, bool)
        )
        extracted.transforms = out["transforms"][:num_components]
        extracted.reg_errors = out["reg_errors"][:num_components]
        extracted.comp_edge_ratios = out["edge_ratios"][:num_components]
        if os.environ.get("PCSEQ_PROF"):
            from .tracking_batched import PROF as _PROF
            _PROF["walk_assemble"] = _PROF.get("walk_assemble", 0.0) + (
                _time.time() - _tasm)
        return extracted

    def track_frame_device(self, seq_points, frame, seq_boxes, seq_index=None):
        """One-dispatch tracking walk (preprocessing/tracking_device.py):
        builds the [W, N] frame window, runs the compiled walk, converts the
        outputs to the extracted-points format of the host walk."""
        from .tracking_device import track_window, track_window_stepped

        num_components = int(frame.component.max()) + 1 if len(frame.component) else 0
        if num_components == 0:
            return None
        frame_id = int(frame.frame[0])
        frames_arr = seq_points.frame
        W = 2 * self.track_interval + 1

        # window point tables (anchor at center slot = interval)
        frame_rows = []
        max_n = len(frame.xyz)
        for w in range(W):
            fid = frame_id - self.track_interval + w
            if seq_index is not None:
                rows = seq_index.rows(fid)
            else:
                rows = np.nonzero(frames_arr == fid)[0]
            frame_rows.append(rows)
            max_n = max(max_n, len(rows))
        n_cap = bucket_size(max_n)
        window_xyz = np.zeros((W, n_cap, 3), np.float32)
        window_valid = np.zeros((W, n_cap), bool)
        for w, rows in enumerate(frame_rows):
            n = len(rows)
            window_xyz[w, :n] = seq_points.xyz[rows]
            window_xyz[w, n:] = 1e8
            window_valid[w, :n] = True
        # anchor slot uses the (component-bearing) frame table
        anchor_slot = self.track_interval
        na = len(frame.xyz)
        window_xyz[anchor_slot] = 1e8
        window_xyz[anchor_slot, :na] = frame.xyz
        window_valid[anchor_slot] = False
        window_valid[anchor_slot, :na] = True
        anchor_comp = np.full(n_cap, -1, np.int32)
        anchor_comp[:na] = frame.component
        anchor_stat = np.zeros(n_cap, bool)
        anchor_stat[:na] = frame.stationary

        C = bucket_size(num_components, base=64)
        deg = np.bincount(frame.component, minlength=C).astype(np.float32)[:C]
        ctr = np.zeros((C, 3), np.float32)
        for d in range(3):
            ctr[:, d] = np.bincount(frame.component, weights=frame.xyz[:, d], minlength=C)[:C]
        ctr[deg > 0] /= deg[deg > 0, None]
        rr = np.linalg.norm(frame.xyz - ctr[frame.component], axis=-1)
        diam = np.zeros(C, np.float32)
        np.maximum.at(diam, frame.component, rr)
        diam *= 2
        comp_valid0 = (deg > 0.5) & (diam < 12.5)

        levels = tuple(
            (float(v[0]), float(v[1]), float(v[2]), float(r), float(sd))
            for v, r, sd in zip(self.voxel_size_list, self.radius_list, self.stopping_delta)
        )
        walk_mode = str(self.model_cfg.get("WALK_MODE", "stepped"))
        walk_fn = track_window if walk_mode == "full" else track_window_stepped
        out = walk_fn(
            jnp.asarray(window_xyz), jnp.asarray(window_valid),
            jnp.asarray(anchor_comp), jnp.asarray(anchor_stat),
            jnp.asarray(comp_valid0), jnp.asarray(diam), jnp.asarray(deg),
            num_components=C, interval=self.track_interval, levels=levels,
            nn_radius=jnp.asarray(self.nn_radius, jnp.float32),
            angle_regularizer=jnp.asarray(self.angle_regularizer, jnp.float32),
            reg_error_coeff=jnp.asarray(self.reg_error_coeff, jnp.float32),
            angle_threshold_deg=jnp.asarray(self.angle_threshold, jnp.float32),
            min_move_frame=self.min_move_frame,
            max_icp_iter=self.max_icp_iter,
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        valid_final = out["valid_final"][:num_components]
        moving = out["moving"][:num_components]

        # assemble extracted points: anchor members + per-frame NN extraction
        ex_xyzf, ex_comp, ex_seg, ex_orig = [], [], [], []
        keep_anchor = valid_final[frame.component]
        ex_xyzf.append(np.concatenate(
            [np.full((keep_anchor.sum(), 1), frame_id, np.float32), frame.xyz[keep_anchor]], axis=1))
        ex_comp.append(frame.component[keep_anchor])
        ex_seg.append(frame.segmentation_label[keep_anchor])
        ex_orig.append(frame.original_indices[keep_anchor])

        for w, rows in enumerate(frame_rows):
            if w == anchor_slot or len(rows) == 0:
                continue
            src = out["extract_src"][w, : len(rows)]
            ok = src >= 0
            if not ok.any():
                continue
            comp = anchor_comp[np.clip(src, 0, n_cap - 1)]
            ok &= (comp >= 0) & valid_final[np.clip(comp, 0, num_components - 1)]
            fid = frame_id - self.track_interval + w
            sel = np.nonzero(ok)[0]
            ex_xyzf.append(np.concatenate(
                [np.full((len(sel), 1), fid, np.float32), seq_points.xyz[rows[sel]]], axis=1))
            ex_comp.append(comp[sel])
            ex_seg.append(seq_points.segmentation_label[rows[sel]])
            ex_orig.append(rows[sel])

        extracted = EDict(
            fxyz=np.concatenate(ex_xyzf, axis=0),
            component=np.concatenate(ex_comp, axis=0),
            segmentation_label=np.concatenate(ex_seg, axis=0),
            original_indices=np.concatenate(ex_orig, axis=0),
        )
        extracted.moving = (
            moving[extracted.component] if len(extracted.component) else np.zeros(0, bool)
        )
        extracted.transforms = out["transforms"][:num_components]
        extracted.reg_errors = out["reg_errors"][:num_components]
        extracted.comp_edge_ratios = out["edge_ratios"][:num_components]
        return extracted

    # ------------------------------------------------------------------
    def _sample_frame(self, frame, voxel_size):
        """Host wrapper: pad, run kernel, compact. ``frame``: EDict with
        xyz [n,3], component [n], stationary [n]."""
        n = frame.xyz.shape[0]
        cap = bucket_size(n)
        fxyz = np.concatenate([np.zeros((n, 1), np.float32), frame.xyz.astype(np.float32)], axis=1)
        fxyz_p, valid = pad_rows(fxyz, cap, fill=1e8)
        comp_p, _ = pad_rows(frame.component.astype(np.int32), cap, fill=-1)
        stat_p, _ = pad_rows(frame.stationary.astype(np.float32), cap)
        mean_xyz, med_comp, stat, vvalid = _sample_frame_kernel(
            jnp.asarray(fxyz_p), jnp.asarray(comp_p), jnp.asarray(stat_p), jnp.asarray(valid),
            jnp.asarray(voxel_size, dtype=jnp.float32),
        )
        vvalid = np.asarray(vvalid)
        return EDict(
            xyz=np.asarray(mean_xyz)[vvalid][:, 1:4],
            component=np.asarray(med_comp)[vvalid],
            stationary=np.asarray(stat)[vvalid],
        )

    _prof = {}

    @classmethod
    def _tick(cls, key, t0):
        import time as _t

        cls._prof[key] = cls._prof.get(key, 0.0) + (_t.time() - t0)
        return _t.time()

    def _register_level(self, moving, ref, num_components, level):
        """One pyramid level: grid-sample both sides, run jitted ICP."""
        import time as _t

        t0 = _t.time()
        sub_m = self._sample_frame(moving, self.voxel_size_list[level])
        sub_r = self._sample_frame(ref, self.voxel_size_list[level])
        t0 = self._tick("sample", t0)
        # exclude stationary points on both sides (reference filters
        # non-stationary before registration, registration_utils.py:120-121)
        m_keep = ~sub_m.stationary & (sub_m.component >= 0)
        r_keep = ~sub_r.stationary
        mx = sub_m.xyz[m_keep]
        mc = sub_m.component[m_keep]
        rx = sub_r.xyz[r_keep]
        cap_m = bucket_size(max(len(mx), 1))
        cap_r = bucket_size(max(len(rx), 1))
        mx_p, m_valid = pad_rows(mx.astype(np.float32), cap_m, fill=1e8)
        mc_p, _ = pad_rows(mc.astype(np.int32), cap_m, fill=-1)
        rx_p, r_valid = pad_rows(rx.astype(np.float32), cap_r, fill=1e8)
        C = bucket_size(num_components, base=64)
        if str(self.model_cfg["REGISTRATION"].get("SOLVER", "ICP")) in ("GD", "GDSolver"):
            from .solver_utils import gd_register_components

            T, l1, ratio = gd_register_components(
                jnp.asarray(mx_p), jnp.asarray(mc_p), jnp.asarray(m_valid),
                jnp.asarray(rx_p), jnp.asarray(r_valid), C,
                jnp.asarray(self.radius_list[level], jnp.float32),
            )
            out = (
                np.asarray(T)[:num_components],
                np.asarray(l1)[:num_components],
                np.asarray(ratio)[:num_components],
            )
            self._tick("register", t0)
            return out
        T, l1, ratio, _ = register_to_next_frame(
            jnp.asarray(mx_p), jnp.asarray(mc_p), jnp.asarray(m_valid),
            jnp.asarray(rx_p), jnp.asarray(r_valid), C,
            jnp.asarray(self.radius_list[level], jnp.float32),
            angle_regularizer=jnp.asarray(self.angle_regularizer, jnp.float32),
            max_iter=self.max_icp_iter,
            stopping_delta=jnp.asarray(self.stopping_delta[level], jnp.float32),
        )
        out = (
            np.asarray(T)[:num_components],
            np.asarray(l1)[:num_components],
            np.asarray(ratio)[:num_components],
        )
        self._tick("register", t0)
        return out

    # ------------------------------------------------------------------
    def track_frame_host(self, seq_points, frame, seq_boxes):
        """Host-loop walk (reference-shaped; one dispatch per kernel). Kept as
        the readable fallback; the device walk below is the fast path."""
        num_components = int(frame.component.max()) + 1 if len(frame.component) else 0
        if num_components == 0:
            return None
        frame_id = int(frame.frame[0])
        frames_arr = seq_points.frame
        min_frame_id = max(int(frames_arr.min()), frame_id - self.track_interval)
        max_frame_id = min(int(frames_arr.max()), frame_id + self.track_interval)
        W = max_frame_id - min_frame_id + 1

        deg, center0, comp_diameter = map(
            np.asarray,
            _component_stats(
                jnp.asarray(frame.xyz.astype(np.float32)),
                jnp.asarray(frame.component.astype(np.int32)),
                jnp.ones(len(frame.component), bool),
                bucket_size(num_components, base=64),
            ),
        )
        deg = deg[:num_components]
        comp_diameter = comp_diameter[:num_components]
        comp_deg = deg

        transforms = np.tile(np.eye(4, dtype=np.float64), (num_components, W, 1, 1))
        F = max_frame_id + 1
        reg_errors = np.zeros((num_components, F), np.float32)
        comp_edge_ratios = np.zeros((num_components, F), np.float32)
        comp_min_frame_id = np.full(num_components, frame_id)
        comp_max_frame_id = np.full(num_components, frame_id)
        comp_velos = np.zeros((num_components, F, 3), np.float32)
        comp_centers = np.zeros((num_components, F, 3), np.float32)
        comp_centers[:, frame_id] = np.asarray(center0)[:num_components]
        comp_center_diffs = np.zeros((num_components, F, 3), np.float32)

        # filter out huge / empty components (reference filter_components)
        valid_comp_mask = (deg > 0.5) & (comp_diameter < 12.5)
        valid_point_mask = valid_comp_mask[frame.component]

        ex_xyzf = [np.concatenate([np.full((valid_point_mask.sum(), 1), frame_id, np.float32), frame.xyz[valid_point_mask]], axis=1)]
        ex_component = [frame.component[valid_point_mask]]
        ex_seglabel = [frame.segmentation_label[valid_point_mask]]
        ex_orig_idx = [frame.original_indices[valid_point_mask]]

        moving_total = np.ones(num_components, bool)

        for track_dir in (-1, 1):
            next_frame_id = frame_id + track_dir
            stopped = ~valid_comp_mask.copy()
            moving = valid_comp_mask.copy()
            cur = EDict(
                xyz=frame.xyz.copy(),
                component=frame.component,
                stationary=frame.stationary.copy(),
                segmentation_label=frame.segmentation_label,
            )
            last_xyz = cur.xyz.copy()
            last_velo = None
            if track_dir == 1 and frame_id > 0:
                last_velo = comp_velos[:, frame_id].copy()

            while min_frame_id <= next_frame_id <= max_frame_id and (~stopped).any():
                nm = frames_arr == next_frame_id
                if not nm.any():
                    break
                nxt = EDict(
                    xyz=seq_points.xyz[nm],
                    component=seq_points.component[nm],
                    stationary=seq_points.stationary[nm],
                    segmentation_label=seq_points.segmentation_label[nm],
                )
                w = next_frame_id - min_frame_id
                transforms[:, w] = transforms[:, w - track_dir]
                if last_velo is not None:
                    trans = last_velo.copy()
                    trans[stopped] = 0
                    cur.xyz = cur.xyz + trans[cur.component] * track_dir
                    transforms[:, w, :3, 3] += trans.astype(np.float64) * track_dir

                l1_reg_error = np.zeros(num_components, np.float32)
                comp_edge_ratio = np.zeros(num_components, np.float32)
                for lvl in range(len(self.radius_list)):
                    T, l1, ratio, = self._register_level(cur, nxt, num_components, lvl)
                    if lvl == 0:
                        comp_edge_ratio = ratio
                    if lvl == len(self.radius_list) - 1:
                        l1_reg_error = l1
                    R = T[:, :3, :3]
                    t = T[:, :3, 3]
                    cur.xyz = np.einsum("nij,nj->ni", R[cur.component], cur.xyz) + t[cur.component]
                    transforms[:, w] = T.astype(np.float64) @ transforms[:, w]

                # component centers (host numpy: tiny [C] arrays)
                centers = np.zeros((num_components, 3), np.float32)
                cnts = np.bincount(cur.component, minlength=num_components).astype(np.float32)
                for d in range(3):
                    centers[:, d] = np.bincount(cur.component, weights=cur.xyz[:, d], minlength=num_components)
                centers[cnts > 0] /= cnts[cnts > 0, None]
                comp_centers[:, next_frame_id] = centers

                # velocity estimate + smoothing (reference 629-642)
                point_velo = (cur.xyz - last_xyz) * track_dir
                comp_velo = np.zeros((num_components, 3), np.float32)
                for d in range(3):
                    comp_velo[:, d] = np.bincount(cur.component, weights=point_velo[:, d], minlength=num_components)
                comp_velo[cnts > 0] /= cnts[cnts > 0, None]
                comp_velo[:, 2] = 0
                comp_velos[:, next_frame_id] = comp_velo
                comp_center_diffs[:, next_frame_id] = (
                    comp_centers[:, next_frame_id] - comp_centers[:, next_frame_id - track_dir]
                ) * track_dir

                lo, hi = sorted((frame_id + track_dir, next_frame_id))
                span = np.zeros(F, bool)
                span[lo : hi + 1] = True
                # pad to static window (full F window; W static per track call)
                import time as _t

                _ts = _t.time()
                sm = _smooth_velo_kernel(
                    jnp.asarray(comp_velos), jnp.asarray(comp_center_diffs), jnp.asarray(span), F
                )
                comp_velos = np.array(sm)  # np.asarray of a jax array is read-only
                self._tick("smooth", _ts)
                delta_velo = comp_velos[:, next_frame_id] - comp_velo
                comp_velo = comp_velos[:, next_frame_id]
                cur.xyz = cur.xyz + delta_velo[cur.component] * track_dir
                transforms[:, w, :3, 3] += delta_velo.astype(np.float64) * track_dir
                last_xyz = cur.xyz.copy()

                # stopping rules (reference 675-708)
                stopped = stopped | (
                    l1_reg_error > self.reg_error_coeff * comp_diameter * (1 + dist_compensate(comp_deg))
                )
                stopped = stopped | (comp_edge_ratio < 0.5)
                if (next_frame_id - frame_id) * track_dir == self.min_move_frame:
                    moved = np.linalg.norm(comp_centers[:, next_frame_id] - comp_centers[:, frame_id], axis=-1)
                    moving = moving & (moved > 0.08 * comp_diameter)
                if last_velo is not None:
                    dev = np.linalg.norm(comp_velo - last_velo, axis=-1)
                    stopped = stopped | (dev > 0.24 * comp_diameter)
                    prev = comp_velos[:, next_frame_id - track_dir]
                    norm = np.maximum(np.linalg.norm(comp_velo, axis=-1) * np.linalg.norm(prev, axis=-1), 1e-6)
                    ang = np.degrees(np.arccos(np.clip((comp_velo * prev).sum(-1) / norm, -1, 1)))
                    stopped = stopped | (
                        (ang > self.angle_threshold)
                        & (np.linalg.norm(comp_velos[:, next_frame_id, :2], axis=-1)
                           > _ANGLE_VELO_EXEMPT)
                    )

                last_velo = comp_velo
                if next_frame_id == frame_id - 1:
                    comp_velos[:, frame_id] = comp_velo
                if track_dir == -1:
                    comp_min_frame_id[~stopped] = next_frame_id
                else:
                    comp_max_frame_id[~stopped] = next_frame_id

                # extract member points of the target frame via NN (710-721)
                cap_q = bucket_size(len(nxt.xyz))
                cap_r = bucket_size(len(cur.xyz))
                rx, r_valid = pad_rows(cur.xyz.astype(np.float32), cap_r, fill=1e8)
                qx, q_valid = pad_rows(nxt.xyz.astype(np.float32), cap_q, fill=1e8)
                _tn = __import__("time").time()
                nn_idx, nn_ok = _nn_match(
                    jnp.asarray(rx), jnp.asarray(r_valid), jnp.asarray(qx), jnp.asarray(q_valid),
                    jnp.asarray(self.nn_radius, jnp.float32),
                )
                nn_idx = np.asarray(nn_idx)[: len(nxt.xyz)]
                self._tick("nn_extract", _tn)
                nn_ok = np.asarray(nn_ok)[: len(nxt.xyz)]
                src_comp = np.where(nn_ok, cur.component[np.clip(nn_idx, 0, len(cur.xyz) - 1)], -1)
                keep = nn_ok & (src_comp >= 0) & ~stopped[np.clip(src_comp, 0, num_components - 1)]
                ex_xyzf.append(
                    np.concatenate(
                        [np.full((keep.sum(), 1), next_frame_id, np.float32), nxt.xyz[keep]], axis=1
                    )
                )
                ex_component.append(src_comp[keep])
                ex_seglabel.append(nxt.segmentation_label[keep])
                nxt_orig = np.nonzero(nm)[0]
                ex_orig_idx.append(nxt_orig[keep])

                reg_errors[:, next_frame_id] = l1_reg_error
                comp_edge_ratios[:, next_frame_id] = comp_edge_ratio
                next_frame_id += track_dir

            moving_total = moving_total & moving

        extracted = EDict(
            fxyz=np.concatenate(ex_xyzf, axis=0),
            component=np.concatenate(ex_component, axis=0),
            segmentation_label=np.concatenate(ex_seglabel, axis=0),
            original_indices=np.concatenate(ex_orig_idx, axis=0),
        )
        # final validity: tracked at least min_move_frame in one direction
        valid_comp_mask = valid_comp_mask & (
            (comp_max_frame_id >= frame_id + self.min_move_frame)
            | (comp_min_frame_id <= frame_id - self.min_move_frame)
        )
        keep = valid_comp_mask[extracted.component]
        for k in ["fxyz", "component", "segmentation_label", "original_indices"]:
            extracted[k] = extracted[k][keep]
        extracted.moving = moving_total[extracted.component] if len(extracted.component) else np.zeros(0, bool)
        extracted.transforms = transforms
        extracted.reg_errors = reg_errors
        extracted.comp_edge_ratios = comp_edge_ratios
        return extracted

    # ------------------------------------------------------------------
    def _frame_table(self, all_points):
        """Per-frame padded full-res point table, cached ON DEVICE for the
        sequence: every tracked window re-claims against the same cloud, so
        uploading it once turns the per-window ~35 MB H2D (the tunnel is
        ~50 MB/s) into a device-side row gather.

        Returns (row_of: fid -> row, qx [F, n_cap, 4], qv [F, n_cap],
        n_cap)."""
        key = id(all_points)
        if getattr(self, "_ftab_key", None) == key:
            return self._ftab
        fr = all_points.frame
        uniq = np.unique(fr)
        ds_all = getattr(self, "_ds_all", None)
        if ds_all is not None and ds_all.ok and ds_all.n == len(fr):
            # the ground stage left a device-compacted height>0 table —
            # the per-frame view is an on-device gather, zero H2D
            n_cap = bucket_size(max(int(ds_all.counts.max()), 1))
            if ds_all.num_frames * n_cap * 16 <= 4e9:
                tab, tval, n_cap = ds_all.frame_table(n_cap)
                self._ftab = ({int(f): int(f) for f in uniq}, tab, tval, n_cap)
                self._ftab_key = key
                return self._ftab
        from ..utils.frame_index import FrameIndex

        findex = FrameIndex(fr)
        n_cap = bucket_size(max(int(np.bincount(fr - fr.min()).max()), 1))
        if len(uniq) * n_cap * 16 > 4e9:  # cap device residency at ~4 GB
            return None
        qx = np.full((len(uniq), n_cap, 4), 1e8, np.float32)
        qv = np.zeros((len(uniq), n_cap), bool)
        for i, fid in enumerate(uniq):
            rows = findex.rows(fid)
            nr = len(rows)
            qx[i, :nr, 0] = fid
            qx[i, :nr, 1:4] = all_points.xyz[rows]
            qv[i, :nr] = True
        self._ftab = ({int(f): i for i, f in enumerate(uniq)},
                      jnp.asarray(qx), jnp.asarray(qv), n_cap)
        self._ftab_key = key
        return self._ftab

    def _box_table(self, all_points, seq_boxes):
        """Per-frame box assignment + per-box counts of the FULL-RES cloud,
        computed ONCE per sequence: a frame is re-claimed by ~2 overlapping
        tracked windows, and its box assignment depends only on (frame, its
        boxes) — so the per-window _box_assign_batch2 dispatches were ~2.2x
        redundant device work on the extraction's critical path (reference
        membership test: cluster_tracking.py:382-401). Returns
        EDict(gt [F, n_cap] i16, m1 [F, b_cap] i32, b_cap) or None."""
        ftab = self._frame_table(all_points)
        if ftab is None:
            return None
        key = (self._ftab_key, id(seq_boxes))
        if getattr(self, "_boxtab_key", None) == key:
            return self._boxtab
        row_of, qx_dev, qv_dev, n_cap = ftab
        F = int(qx_dev.shape[0])
        fr = seq_boxes.frame.astype(np.int64)
        max_b = int(np.bincount(fr).max()) if len(fr) else 1
        b_cap = int(bucket_size(max(max_b, 1), base=32))
        boxes_np = np.zeros((F, b_cap, 7), np.float32)
        bval_np = np.zeros((F, b_cap), bool)
        for fid, row in row_of.items():
            b_idx = np.nonzero(fr == fid)[0]
            if len(b_idx):
                boxes_np[row, : len(b_idx)] = seq_boxes.attr[b_idx]
                bval_np[row, : len(b_idx)] = True
        bx = jnp.asarray(boxes_np)
        bv = jnp.asarray(bval_np)
        # chunk the frame axis so the [step, b_cap, n_cap] membership
        # temporaries stay bounded (~2 compiled shapes per sequence)
        step = 32
        gt_parts, m1_parts = [], []
        for i0 in range(0, F, step):
            i1 = min(i0 + step, F)
            g, m1 = _box_assign_batch2(
                qx_dev[i0:i1, :, 1:4], bx[i0:i1], bv[i0:i1])
            gt_parts.append(g)
            m1_parts.append(m1)
        self._boxtab = EDict(
            gt=jnp.concatenate(gt_parts, axis=0),
            m1=jnp.concatenate(m1_parts, axis=0),
            b_cap=b_cap,
        )
        self._boxtab_key = key
        return self._boxtab

    def extract_traces_and_update_boxes(self, all_points, extracted, seq_boxes):
        """Re-extract member points from the full-resolution cloud and update
        per-box best IoU (reference extract_traces_and_update_boxes,
        cluster_tracking.py:287-428). Dispatch + finish in one call."""
        st = self.extract_traces_dispatch(all_points, extracted, seq_boxes)
        return self.extract_traces_finish(st, all_points, seq_boxes)

    def extract_traces_dispatch(self, all_points, extracted, seq_boxes):
        """Pass 1 of the trace extraction: host prep + EVERY device dispatch
        (window claim scan, box assignment, claim compaction) with D2H
        copies started but NOT read — the blocking reads live in
        extract_traces_finish so a pipelined caller can overlap them with
        the next tracked frame's walk."""
        num_components = int(extracted.component.max()) + 1 if len(extracted.component) else 0
        if num_components == 0:
            return EDict(noop=True, extracted=extracted)
        full = EDict(
            fxyz=[], component=[], segmentation_label=[], original_indices=[], moving=[]
        )
        component_hit = np.zeros(num_components, np.int64)
        ex_frames = np.round(extracted.fxyz[:, 0]).astype(int)

        # tile geometry sized to THIS window's occupancy: only components
        # with extracted points get a tile row (dense local remap), and the
        # tile depth is the largest per-(frame, component) point count —
        # the per-frame tile H2D through the tunnel scales with C * Pe, and
        # a sequence-wide [C_total, 1024] tile is ~10x oversized
        active_comps = np.unique(extracted.component)
        comp_to_local = np.full(num_components, -1, np.int64)
        comp_to_local[active_comps] = np.arange(len(active_comps))
        C = bucket_size(len(active_comps), base=64)
        pair_cnt = np.bincount(
            ex_frames * np.int64(num_components) + extracted.component
        )
        Pe_cap = int(self.model_cfg.get("TRACE_TILE_POINTS", 1024))
        Pe = int(bucket_size(int(min(max(pair_cnt.max(), 32), Pe_cap)), base=32))

        # pass 1 — host prep + device dispatch; nothing synchronizes until
        # pass 2 reads
        from .tracking_batched import pack_components
        from ..ops import pallas_scan

        claim_r = self.nn_radius * 1.732
        from ..utils.frame_index import FrameIndex

        ap_index = getattr(self, "_ap_index", None)
        if ap_index is None or getattr(self, "_ap_index_key", None) != id(all_points):
            ap_index = FrameIndex(all_points.frame)
            self._ap_index = ap_index
            self._ap_index_key = id(all_points)
        frames_info = []
        max_ref = max_box = 1
        for fid in np.unique(ex_frames):
            fb = seq_boxes.frame == fid
            rm = ap_index.rows(fid)
            ref_xyz = all_points.xyz[rm]
            if len(ref_xyz) == 0:
                continue
            em = ex_frames == fid
            if not em.any():
                continue
            b_idx = np.nonzero(fb)[0]
            frames_info.append((fid, rm, ref_xyz, extracted.fxyz[em][:, 1:4],
                                extracted.component[em], extracted.moving[em],
                                b_idx))
            max_ref = max(max_ref, len(ref_xyz))
            max_box = max(max_box, len(b_idx))

        pending = []
        if pallas_scan.use_pallas_scan() and frames_info:
            # ---- batched window claim: ONE sorted-grid scan for every
            # frame of the window (frame id rides the cell key), against
            # the RAW extracted points (no per-component tiles, no Pe
            # subsample — each full-res point matches its exact nearest
            # extracted point within radius*sqrt(3), reference 342-360) +
            # ONE vmapped box-assign. Replaces ~2 programs x 17 frames of
            # dispatch latency per tracked window.
            _tp = __import__("time").time()
            Fw = len(frames_info)
            ftab = self._frame_table(all_points)
            if ftab is not None:
                row_of, qx_dev, qv_dev, n_cap = ftab
                rows = jnp.asarray(
                    np.array([row_of[int(fi[0])] for fi in frames_info], np.int32)
                )
                qx_all = qx_dev[rows]  # [Fw, n_cap, 4] device gather, no H2D
                qv_all = qv_dev[rows]
            else:  # sequence too large to keep resident — pack the window
                n_cap = bucket_size(max_ref)
                qx_np = np.full((Fw, n_cap, 4), 1e8, np.float32)
                qv_np = np.zeros((Fw, n_cap), bool)
                for i, (fid, rm, ref_xyz, *_rest) in enumerate(frames_info):
                    nr = len(ref_xyz)
                    qx_np[i, :nr, 0] = fid
                    qx_np[i, :nr, 1:4] = ref_xyz
                    qv_np[i, :nr] = True
                qx_all, qv_all = jnp.asarray(qx_np), jnp.asarray(qv_np)
            boxtab = self._box_table(all_points, seq_boxes) if ftab is not None else None
            if boxtab is None:
                b_cap = bucket_size(max_box, base=32)
                boxes_all = np.zeros((Fw, b_cap, 7), np.float32)
                bval_all = np.zeros((Fw, b_cap), bool)
                for i, (fid, rm, ref_xyz, ex_xyz, ex_comp, ex_mov, b_idx) in enumerate(frames_info):
                    if len(b_idx):
                        boxes_all[i, : len(b_idx)] = seq_boxes.attr[b_idx]
                        bval_all[i, : len(b_idx)] = True
            else:
                b_cap = boxtab.b_cap
            E = len(extracted.fxyz)
            E_cap = bucket_size(E)
            refs, rvalid = pad_rows(extracted.fxyz.astype(np.float32), E_cap, fill=1e8)
            # pass 2 expects LOCAL (active_comps-relative) ids
            ref_comp = np.full(E_cap, -1, np.int32)
            ref_comp[:E] = comp_to_local[extracted.component]
            span = float(
                (extracted.fxyz[:, 1:3].max(0) - extracted.fxyz[:, 1:3].min(0)).max()
            )
            XY = 1 << max(int(np.ceil(span / claim_r)) + 3, 2).bit_length()
            assert len(active_comps) < 32767 and b_cap < 32767, \
                "int16 wire format overflow"
            _tp = self._tick("ex_pack", _tp)
            comp_all, claim_ntrunc = _window_claim_pallas(
                jnp.asarray(refs), jnp.asarray(rvalid), jnp.asarray(ref_comp),
                jnp.asarray(qx_all.reshape(-1, 4)), jnp.asarray(qv_all.reshape(-1)),
                jnp.asarray(claim_r, jnp.float32),
                F=2 * self.track_interval + 1, X=XY, Y=XY,
            )
            if boxtab is not None:
                # per-frame assignments precomputed once per sequence —
                # this window's tables are device row gathers
                gt_all = boxtab.gt[rows]
                m1cnt_all = boxtab.m1[rows]
            else:
                gt_all, m1cnt_all = _box_assign_batch2(
                    jnp.asarray(qx_all[..., 1:4]), jnp.asarray(boxes_all),
                    jnp.asarray(bval_all),
                )
            # claims are sparse: compact them on device and ship only the
            # claiming rows (the dense [Fw, n_cap] tables cost ~15 MB per
            # tracked frame over the ~50 MB/s tunnel)
            claim_cap = min(bucket_size(4 * max(E, 256)), Fw * n_cap)
            pos_c, comp_c, gt_c, cnt_c = _compact_claims(
                comp_all.reshape(-1), gt_all.reshape(-1), claim_cap)
            for v in (pos_c, comp_c, gt_c, cnt_c, m1cnt_all, claim_ntrunc):
                try:
                    v.copy_to_host_async()
                except AttributeError:
                    pass
            self._tick("ex_dispatch", _tp)
            # device handles (incl. the dense tables for the overflow
            # fallback) ride the state; all reads happen in finish
            pallas_state = EDict(
                pos_c=pos_c, comp_c=comp_c, gt_c=gt_c, cnt_c=cnt_c,
                m1cnt_all=m1cnt_all, comp_all=comp_all, gt_all=gt_all,
                claim_cap=claim_cap, Fw=Fw, n_cap=n_cap,
                ntrunc=claim_ntrunc,
            )
            return EDict(
                noop=False, extracted=extracted, pending=None,
                pallas=pallas_state, frames_info=frames_info,
                full=full, component_hit=component_hit,
                active_comps=active_comps, comp_to_local=comp_to_local,
                num_components=num_components,
            )
        else:
            for fid, rm, ref_xyz, ex_xyz, ex_comp, ex_mov, b_idx in frames_info:
                _tp = __import__("time").time()
                # claim full-res points via per-component extracted tiles
                # (radius*sqrt(3), reference 342-360): one [C, N] matmul +
                # a 2-nearest-center tile test
                ex_comp_local = comp_to_local[ex_comp]
                tile, tmask = pack_components(
                    ex_xyz.astype(np.float32), ex_comp_local,
                    np.ones(len(ex_xyz), bool), C, Pe,
                )
                _tp = self._tick("ex_pack", _tp)
                cap_q = bucket_size(len(ref_xyz))
                qx, qv = pad_rows(ref_xyz.astype(np.float32), cap_q, fill=1e8)
                comp_j, zsel = _claim_points_kernel(
                    jnp.asarray(qx), jnp.asarray(qv), jnp.asarray(tile),
                    jnp.asarray(tmask), jnp.asarray(claim_r, jnp.float32),
                )
                ref_gt_dev = None
                if len(b_idx):
                    cap_b = bucket_size(len(b_idx), base=32)
                    boxes_p, bvalid = pad_rows(seq_boxes.attr[b_idx].astype(np.float32), cap_b)
                    ref_gt_dev = _box_assign(
                        jnp.asarray(qx), jnp.asarray(boxes_p), jnp.asarray(bvalid)
                    )
                self._tick("ex_dispatch", _tp)
                pending.append(
                    (fid, rm, ref_xyz, ex_xyz, ex_comp, ex_mov, b_idx, comp_j, zsel, ref_gt_dev)
                )
        return EDict(
            noop=False, extracted=extracted, pending=pending, pallas=None,
            frames_info=frames_info, full=full, component_hit=component_hit,
            active_comps=active_comps, comp_to_local=comp_to_local,
            num_components=num_components,
        )

    def extract_traces_finish(self, st, all_points, seq_boxes):
        """Pass 2 of the trace extraction: drain device results and run the
        host-side filtering, accumulation and box IoU accounting."""
        if st.get("noop"):
            return st.extracted, seq_boxes
        extracted = st.extracted
        full = st.full
        component_hit = st.component_hit
        active_comps = st.active_comps
        comp_to_local = st.comp_to_local
        num_components = st.num_components
        frames_info = st.frames_info
        pending = st.pending
        if pending is None:
            # Pallas window-claim path: resolve sparse-vs-dense now
            ps = st.pallas
            _tp = __import__("time").time()
            telemetry.add("tracking_claim_windows_truncated", int(ps.ntrunc))
            n_claim = int(ps.cnt_c)
            m1cnt_np = np.asarray(ps.m1cnt_all)
            Fw, n_cap, claim_cap = ps.Fw, ps.n_cap, ps.claim_cap
            pending = []
            if n_claim > claim_cap:
                # overflow — fall back to the dense drain (rare; cap is 4x
                # the extracted count)
                telemetry.add("tracking_claim_overflow", 1)
                print(f"Cluster Tracking: claim compaction overflow "
                      f"({n_claim} > {claim_cap}), dense drain")
                comp_np_all = np.asarray(ps.comp_all).reshape(Fw, n_cap)
                gt_np_all = np.asarray(ps.gt_all)
                for i, (fid, rm, ref_xyz, ex_xyz, ex_comp, ex_mov, b_idx) in enumerate(frames_info):
                    pending.append((fid, rm, ref_xyz, ex_xyz, ex_comp, ex_mov, b_idx,
                                    comp_np_all[i], None,
                                    gt_np_all[i] if len(b_idx) else None))
            else:
                pos_np = np.asarray(ps.pos_c)[:n_claim]
                comp_np = np.asarray(ps.comp_c)[:n_claim]
                gt_np = np.asarray(ps.gt_c)[:n_claim]
                fi_np = pos_np // n_cap
                row_np = pos_np % n_cap
                for i, (fid, rm, ref_xyz, ex_xyz, ex_comp, ex_mov, b_idx) in enumerate(frames_info):
                    mi = fi_np == i
                    pending.append((fid, rm, ref_xyz, ex_xyz, ex_comp, ex_mov, b_idx,
                                    ("sparse", row_np[mi], comp_np[mi], gt_np[mi],
                                     m1cnt_np[i]),
                                    None, None))
            self._tick("ex_drain", _tp)
        for fid, rm, ref_xyz, ex_xyz, ex_comp, ex_mov, b_idx, comp_j, zsel, ref_gt_dev in pending:
            n_ref = len(ref_xyz)
            _tp = __import__("time").time()
            sparse_gt = None
            if isinstance(comp_j, tuple) and comp_j[0] == "sparse":
                _, rows_j, comp_vals, gt_vals, m1cnt_j = comp_j
                comp_local_np = np.full(n_ref, -1, np.int64)
                in_rng = rows_j < n_ref
                comp_local_np[rows_j[in_rng]] = comp_vals[in_rng].astype(np.int64)
                sparse_gt = (rows_j[in_rng], gt_vals[in_rng].astype(np.int64), m1cnt_j)
            else:
                comp_local_np = np.asarray(comp_j)[:n_ref].astype(np.int64)
            if zsel is not None:
                zsel = np.asarray(zsel)[:n_ref]
            comp_np = np.where(
                (comp_local_np >= 0) & (comp_local_np < len(active_comps)),
                active_comps[np.clip(comp_local_np, 0, len(active_comps) - 1)], -1,
            )
            _tp = self._tick("ex_claim", _tp)
            ok = (comp_np >= 0) & (comp_np < num_components)

            # component center/diameter in BEV for edge filtering (360-368)
            cc = np.zeros((num_components, 2), np.float32)
            cnt = np.bincount(ex_comp, minlength=num_components).astype(np.float32)
            for d in range(2):
                cc[:, d] = np.bincount(ex_comp, weights=ex_xyz[:, d], minlength=num_components)
            cc[cnt > 0] /= cnt[cnt > 0, None]
            rad = np.linalg.norm(ex_xyz[:, :2] - cc[ex_comp], axis=-1)
            cd = np.zeros(num_components, np.float32)
            np.maximum.at(cd, ex_comp, rad)
            mov_by_comp = np.zeros(num_components, bool)
            mov_by_comp[ex_comp] = ex_mov

            comp_c = np.clip(comp_np, 0, num_components - 1)
            if zsel is not None:  # batched path folds the z test on device
                zdiff = zsel - ref_xyz[:, 2]
                ok &= (zdiff < 0.5) & (zdiff > -0.05)
            dist = np.linalg.norm(ref_xyz[:, :2] - cc[comp_c], axis=-1)
            ok &= dist < cd[comp_c] + 0.05

            _tp = self._tick("ex_centerstats", _tp)
            sel = np.nonzero(ok)[0]
            comp_sel = comp_np[sel]
            fxyz_sel = np.concatenate(
                [np.full((len(sel), 1), fid, np.float32), ref_xyz[sel]], axis=1
            )
            full.fxyz.append(fxyz_sel)
            full.component.append(comp_sel)
            full.segmentation_label.append(all_points.segmentation_label[rm][sel])
            full.original_indices.append(rm[sel])
            full.moving.append(mov_by_comp[comp_sel])

            # ----- box IoU update (382-414), vectorized over components -----
            if (ref_gt_dev is not None or sparse_gt is not None) and len(sel) and len(b_idx):
                Bf = len(b_idx)
                if sparse_gt is not None:
                    rows_j, gt_vals, m1cnt_j = sparse_gt
                    ref_gt = np.full(n_ref, -1, np.int64)
                    ref_gt[rows_j] = gt_vals  # claimed rows only — sel is
                    # a subset of the claimed rows, which is all the inter
                    # counts need; m1cnt comes precounted from device
                    m1cnt = np.asarray(m1cnt_j)[:Bf]
                else:
                    ref_gt = np.asarray(ref_gt_dev)[:n_ref]
                    m1cnt = np.bincount(ref_gt[ref_gt >= 0], minlength=Bf)
                gt_sel = ref_gt[sel]
                pair_ok = gt_sel >= 0
                inter = np.bincount(
                    comp_sel[pair_ok] * Bf + gt_sel[pair_ok],
                    minlength=num_components * Bf,
                ).reshape(num_components, Bf)
                cnt_c = np.bincount(comp_sel, minlength=num_components)
                abox = inter.argmax(1)
                inter_best = inter.max(1)
                has = inter_best > 0
                union = cnt_c + m1cnt[abox] - inter_best
                iou_c = np.where(has, inter_best / (union + 1e-6), 0.0)
                component_hit[: num_components] += (iou_c > 0.7).astype(np.int64)
                np.maximum.at(seq_boxes.best_iou, b_idx[abox[has]], iou_c[has])
            self._tick("ex_boxes", _tp)

        out = EDict(
            fxyz=np.concatenate(full.fxyz, axis=0) if full.fxyz else np.zeros((0, 4), np.float32),
            component=np.concatenate(full.component, axis=0) if full.component else np.zeros(0, np.int64),
            segmentation_label=np.concatenate(full.segmentation_label, axis=0) if full.segmentation_label else np.zeros(0, np.int64),
            original_indices=np.concatenate(full.original_indices, axis=0) if full.original_indices else np.zeros(0, np.int64),
            moving=np.concatenate(full.moving, axis=0) if full.moving else np.zeros(0, bool),
        )
        out.component_hit = component_hit
        out.transforms = extracted.transforms
        return out, seq_boxes

    # ------------------------------------------------------------------
    def format_boxes(self, seq_dict):
        return EDict(
            attr=np.asarray(seq_dict["gt_box_attr"]).reshape(-1, 7),
            cls_label=np.asarray(seq_dict["gt_box_cls_label"]).reshape(-1),
            trace_id=np.asarray(seq_dict["gt_box_track_label"]).reshape(-1),
            frame=np.asarray(seq_dict["gt_box_frame"]).reshape(-1),
            velo=np.asarray(seq_dict["gt_box_velo"]).reshape(-1),
            moving=np.asarray(seq_dict["moving"]).reshape(-1),
        )

    def __call__(self, seq_dict):
        import time as _prep_time
        _tprep0 = _prep_time.time()
        fxyz = np.asarray(seq_dict["point_fxyz"])
        frame = np.asarray(seq_dict["point_sweep"]).reshape(-1).astype(int, copy=False)
        seq_points = EDict(
            xyz=fxyz[:, 1:4].astype(np.float32),
            frame=frame,
            segmentation_label=np.asarray(
                seq_dict.get("segmentation_label", np.zeros(len(frame), np.int64))
            ).reshape(-1),
        )
        # full-resolution, above-ground points for trace extraction
        if "full_point_fxyz" in seq_dict:
            f_fxyz = np.asarray(seq_dict["full_point_fxyz"])
            if "full_point_keep0" in seq_dict:
                # ground ships the height>0 mask as a host bool (1 B/point)
                # so the f32 heights never cross the tunnel in the hot path
                keep = np.asarray(seq_dict["full_point_keep0"]).reshape(-1)
            else:
                f_height = np.asarray(seq_dict["full_point_height"]).reshape(-1)
                keep = f_height > 0.0
            # single-gather row selection (f_fxyz[keep][:, 1:4] copies the
            # full 4-col table THEN slices — 2x the bytes at 35M points)
            rows = np.nonzero(keep)[0]
            all_points = EDict(
                xyz=f_fxyz[rows[:, None], [1, 2, 3]].astype(np.float32, copy=False),
                frame=np.asarray(seq_dict["full_point_sweep"]).reshape(-1)[rows].astype(int, copy=False),
                segmentation_label=np.asarray(
                    seq_dict.get(
                        "full_segmentation_label", np.zeros(len(f_fxyz), np.int64)
                    )
                ).reshape(-1)[rows],
            )
        else:
            all_points = seq_points

        num_frames = int(frame.max()) + 1 if len(frame) else 0
        from ..utils.device_seq import get_device_seq
        from ..utils.frame_index import FrameIndex

        seq_index = FrameIndex(frame)  # O(rows) per-frame lookups
        # shared device-resident sequence table (built by proposal if it
        # ran on the same filtered array; else uploaded once here)
        self._ds = get_device_seq(seq_dict, fxyz, frame)
        self._stat_tab = None
        # height>0 full-res table from the ground stage (extraction claims)
        self._ds_all = seq_dict.get("_dev_seq_all")
        self._ftab_key = None
        self._boxtab_key = None
        sequence_id = str(seq_dict.get("frame_id", "seq"))[:-4] or "seq"
        outfolder = os.path.join(self.model_cfg.DIR, sequence_id) if "DIR" in self.model_cfg else None
        if outfolder:
            outpath = os.path.join(outfolder, "all.pkl")
            if os.path.exists(outpath):
                print(f"{outpath} already exists. skipping...")
                return seq_dict
            os.makedirs(outfolder, exist_ok=True)

        seq_boxes = self.format_boxes(seq_dict)
        if seq_boxes.attr.shape[0] == 0:
            return seq_dict
        seq_boxes.best_iou = np.zeros(seq_boxes.attr.shape[0], np.float32)

        for comp_key in self.component_keys:
            component = np.asarray(seq_dict[f"point_{comp_key}"]).astype(np.int64)
            # stationary = very large components (reference 860-861)
            C_all = int(component.max()) + 1 if len(component) else 0
            cc_diam = np.zeros(C_all, np.float32)
            if C_all and self._ds is not None and len(component) == self._ds.n:
                # device path: two segment passes over the resident table.
                # component must align row-for-row with the resident table
                # (len == self._ds.n); on mismatch fall through to the host
                # path below, which indexes seq_points directly.
                comp_pad = np.full(self._ds.flat.shape[0], -1, np.int32)
                comp_pad[: len(component)] = component
                _, _, diam_d = _comp_stats_kernel(
                    self._ds.flat, jnp.asarray(comp_pad),
                    jnp.asarray(len(component), jnp.int32),
                    bucket_size(C_all, base=1024),
                )
                cc_diam = np.asarray(diam_d)[:C_all]
            elif C_all:
                cnt = np.bincount(component, minlength=C_all).astype(np.float32)
                ctr = np.zeros((C_all, 3), np.float32)
                for d in range(3):
                    ctr[:, d] = np.bincount(component, weights=seq_points.xyz[:, d], minlength=C_all)
                ctr[cnt > 0] /= cnt[cnt > 0, None]
                r = np.linalg.norm(seq_points.xyz - ctr[component], axis=-1)
                np.maximum.at(cc_diam, component, r)
                cc_diam *= 2
            seq_points.component = component
            seq_points.stationary = cc_diam[component] > 12.5 if C_all else np.zeros(len(frame), bool)
            self._stat_tab = (
                self._ds.aux_frame_table(seq_points.stationary)
                if self._ds is not None else None
            )
            if os.environ.get("PCSEQ_PROF"):
                from .tracking_batched import PROF as _PPROF
                _PPROF["call_prep"] = _PPROF.get("call_prep", 0.0) + (
                    _prep_time.time() - _tprep0)

            import time as _time

            use_pipeline = (
                self.device_walk
                and str(self.model_cfg.get("WALK_MODE", "batched")) == "batched"
            )

            def _finish_extract(stB):
                """Complete a tracked frame: drain the extraction, save, and
                print the window coverage (frame order is preserved — stages
                drain in dispatch order)."""
                st, fid, extracted_w = stB
                _t0 = _time.time()
                extracted_f, _ = self.extract_traces_finish(st, all_points, seq_boxes)
                print(f"[Timer] Extract Traces {fid}: {_time.time() - _t0:.2f}s", flush=True)
                if outfolder:
                    with open(os.path.join(outfolder, f"{fid:03d}_{comp_key}.pkl"), "wb") as f:
                        pickle.dump({k: v for k, v in extracted_f.items()}, f)
                sb = (seq_boxes.frame >= fid - self.track_interval) & (
                    seq_boxes.frame <= fid + self.track_interval
                )
                if sb.any():
                    cov = float((seq_boxes.best_iou[sb] > 0.7).mean())
                    print(
                        f"segment [{fid - self.track_interval}, {fid + self.track_interval}]:"
                        f" num_boxes={int(sb.sum())}, coverage={cov:.6f}"
                    )

            # two-deep software pipeline over tracked frames: while the
            # device runs frame i's walk, the host finishes frame i-1's walk
            # (assembly) and dispatches its trace extraction, then finishes
            # frame i-2's extraction — tunnel latency and host prep hide
            # behind device compute (the device queue stays walk_i,
            # claims_{i-1}, walk_{i+1}, ...)
            stageA = None  # (walk handle, frame_id, t_dispatch)
            stageB = None  # (extract state, frame_id, extracted)
            for frame_id in range(0, num_frames, self.track_interval):
                fm = seq_index.rows(frame_id)
                if not len(fm):
                    continue
                fr = EDict(
                    xyz=seq_points.xyz[fm],
                    frame=frame[fm],
                    component=component[fm] - component[fm].min(),
                    stationary=seq_points.stationary[fm],
                    segmentation_label=seq_points.segmentation_label[fm],
                    original_indices=fm,
                )
                if not use_pipeline:
                    _t0 = _time.time()
                    extracted = self.track_frame(seq_points, fr, seq_boxes, seq_index)
                    print(f"[Timer] Tracking Frame {frame_id}: {_time.time() - _t0:.2f}s", flush=True)
                    if extracted is None or len(extracted.fxyz) == 0:
                        continue
                    st = self.extract_traces_dispatch(all_points, extracted, seq_boxes)
                    _finish_extract((st, frame_id, extracted))
                    continue

                _t0 = _time.time()
                h = self.track_frame_batched_dispatch(seq_points, fr, seq_boxes, seq_index)
                nxt = (h, frame_id, _t0) if h is not None else None
                if stageA is not None:
                    hA, fidA, tA = stageA
                    extracted = self.track_frame_batched_finish(hA, seq_points)
                    print(f"[Timer] Tracking Frame {fidA}: {_time.time() - tA:.2f}s", flush=True)
                    if extracted is not None and len(extracted.fxyz):
                        st = self.extract_traces_dispatch(all_points, extracted, seq_boxes)
                        newB = (st, fidA, extracted)
                    else:
                        newB = None
                    if stageB is not None:
                        _finish_extract(stageB)
                    stageB = newB
                stageA = nxt
            # drain the pipeline tail
            if stageA is not None:
                hA, fidA, tA = stageA
                extracted = self.track_frame_batched_finish(hA, seq_points)
                print(f"[Timer] Tracking Frame {fidA}: {_time.time() - tA:.2f}s", flush=True)
                if extracted is not None and len(extracted.fxyz):
                    st = self.extract_traces_dispatch(all_points, extracted, seq_boxes)
                    if stageB is not None:
                        _finish_extract(stageB)
                    stageB = (st, fidA, extracted)
            if stageB is not None:
                _finish_extract(stageB)
                stageB = None

        # reference prints the literal 'NA' when nothing moves (917-919)
        moving_miou = (
            float(seq_boxes.best_iou[seq_boxes.moving.astype(bool)].mean())
            if seq_boxes.moving.astype(bool).any()
            else "NA"
        )
        print(f"All Box mIoU={seq_boxes.best_iou.mean()}")
        print(f"Moving Box mIoU={moving_miou}")
        if os.environ.get("PCSEQ_PROF"):
            from . import tracking_batched as _tb

            print("TRACK_PROF walk",
                  {k: round(v, 2) for k, v in _tb.PROF.items()},
                  "extract", {k: round(v, 2) for k, v in self._prof.items()},
                  flush=True)
            _tb.PROF.clear()
            type(self)._prof = {}
        if outfolder:
            with open(outpath, "wb") as f:
                pickle.dump({k: v for k, v in seq_boxes.items()}, f)
        seq_dict["seq_boxes"] = seq_boxes
        return seq_dict
