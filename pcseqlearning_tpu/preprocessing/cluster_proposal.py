"""Multi-radius connected-component cluster proposal + IoU evaluation.

TPU-native rewrite of the reference ClusterProposal
(/root/reference/pcdet/models/registration/preprocessors/cluster_proposal.py):
per radius, a RadiusGraph over 10-frame chunks feeds on-device connected
components (replacing the reference's GPU->CPU scipy hop at
graph_utils.py:40-53); proposal quality is scored per frame by best point-set
IoU against GT boxes — vectorized with segment ops instead of the reference's
Python loop over components (cluster_proposal.py:237-255).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import boxes as box_ops
from ..ops import connected_components as cc
from ..ops import hash_graph
from ..ops import pallas_scan
from ..utils import telemetry
from ..utils.edict import EDict
from ..utils.padding import bucket_size, pad_rows


@jax.jit
def _comp_wire16(comp):
    """int16 wire copy of a chunk's component labels (-1 pads preserved).

    Per-chunk component counts sit in the low thousands at Waymo scale, so
    the D2H wire — the drain's dominant cost through the ~20 MB/s tunnel —
    halves; the int32 original stays device-resident as the overflow
    fallback (num_components > int16 is detected from the count scalar
    before the labels are consumed)."""
    return comp.astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("k", "cell_cap"))
def _chunk_components(fxyz, valid, radius, k, cell_cap=48):
    """Radius graph + CC over one (padded) frame chunk."""
    n = fxyz.shape[0]
    idx, _, mask = hash_graph.radius_graph(
        fxyz, fxyz, radius, k, ref_valid=valid, query_valid=valid, cell_cap=cell_cap
    )
    labels = cc.connected_components_knn(idx, mask)
    comp, num = cc.compact_labels(labels, node_valid=valid)
    return comp, num


@functools.partial(jax.jit, static_argnames=("c_cap",))
def _evaluate_frame(xyz, pvalid, comp_local, boxes, bvalid, c_cap):
    """Per-frame proposal scoring (vectorized reference 203-263).

    Args:
        xyz: [N, 3] padded frame points; pvalid [N].
        comp_local: [N] dense per-frame component ids (< c_cap), -1 invalid.
        boxes: [B, 7]; bvalid [B].
    Returns:
        box_best_iou [B], gt_box_id [N], pred_box_id [N] (indices into the
        padded frame box array, -1 where unassigned).
    """
    B = boxes.shape[0]
    bp = box_ops.points_in_boxes(xyz, boxes)  # [B, N]
    bp = bp & pvalid[None, :] & bvalid[:, None]
    in_any = jnp.any(bp, axis=0)
    gt_box_id = jnp.where(in_any, jnp.argmax(bp, axis=0), -1).astype(jnp.int32)

    box_size = jax.ops.segment_sum(
        in_any.astype(jnp.float32), jnp.where(in_any, gt_box_id, B), num_segments=B + 1
    )[:B]

    comp_ok = (comp_local >= 0) & (comp_local < c_cap) & pvalid
    comp_safe = jnp.where(comp_ok, comp_local, c_cap)
    comp_size = jax.ops.segment_sum(
        comp_ok.astype(jnp.float32), comp_safe, num_segments=c_cap + 1
    )[:c_cap]

    pair_ok = comp_ok & in_any
    pair_key = jnp.where(pair_ok, comp_safe * B + gt_box_id, c_cap * B)
    pair_count = jax.ops.segment_sum(
        pair_ok.astype(jnp.float32), pair_key, num_segments=c_cap * B + 1
    )[: c_cap * B].reshape(c_cap, B)

    comp2box = jnp.argmax(pair_count, axis=1).astype(jnp.int32)  # [C]
    comp_has_box = jnp.max(pair_count, axis=1) > 0.5
    inter = jnp.take_along_axis(pair_count, comp2box[:, None], axis=1)[:, 0]
    union = comp_size + box_size[comp2box] - inter
    iou = jnp.where(comp_has_box, inter / jnp.maximum(union, 1e-6), 0.0)

    box_best_iou = jax.ops.segment_max(
        jnp.where(comp_has_box, iou, 0.0),
        jnp.where(comp_has_box, comp2box, B),
        num_segments=B + 1,
    )[:B]
    box_best_iou = jnp.maximum(box_best_iou, 0.0)

    pred_box_id = jnp.where(
        comp_ok & comp_has_box[comp_safe.clip(0, c_cap - 1)],
        comp2box[comp_safe.clip(0, c_cap - 1)],
        -1,
    ).astype(jnp.int32)
    return box_best_iou, gt_box_id, pred_box_id


class ClusterProposal:
    """Host orchestration of chunked CC + per-frame evaluation.

    Config parity with the reference (GRAPH.RADIUS list, MAX_NUM_NEIGHBORS,
    COMPONENT_KEYS, DIR)."""

    def __init__(self, model_cfg, runtime_cfg=None):
        self.model_cfg = EDict(model_cfg)
        self.component_keys = list(self.model_cfg["COMPONENT_KEYS"])
        graph_cfg = self.model_cfg["GRAPH"]
        radii = graph_cfg["RADIUS"]
        if not isinstance(radii, (list, tuple)):
            radii = [radii] * len(self.component_keys)
        self.radii = [float(r) for r in radii]
        self.max_num_neighbors = int(graph_cfg.get("MAX_NUM_NEIGHBORS", 32))
        self.chunk_frames = int(self.model_cfg.get("CHUNK_FRAMES", 10))
        self.cell_cap = int(self.model_cfg.get("CELL_CAP", hash_graph.DEFAULT_CELL_CAP))
        # CC only consumes the graph's PARTITION, which is insensitive to
        # K beyond ~16 and to deep cell scans (each point still links to its
        # run prefix, so runs stay internally connected): a (16, 24) scan
        # reproduces the (32, 48) partition to 99.98% on Waymo-scale scenes
        # at ~2x less top-k + gather work per chunk
        self.cc_neighbors = int(self.model_cfg.get("CC_NEIGHBORS", min(self.max_num_neighbors, 16)))
        self.cc_cell_cap = int(self.model_cfg.get(
            "CC_CELL_CAP",
            min(self.cell_cap, int(os.environ.get("PCSEQ_CELL_CAP", 24)))))
        # multi-chip: x-shard each chunk's point table over NUM_SHARDS
        # devices with halo exchange (SURVEY §5 long-context scaling) —
        # the halo-exchange CC in parallel/point_shard.py
        self.num_shards = int(self.model_cfg.get(
            "NUM_SHARDS",
            (runtime_cfg or {}).get("num_shards", 1) if isinstance(runtime_cfg, dict) else 1,
        ))
        self.halo_cap = int(self.model_cfg.get("HALO_CAP", 4096))
        self._mesh = None

    def _shard_mesh(self):
        if self._mesh is None and self.num_shards > 1:
            from ..parallel import make_mesh
            devs = jax.devices()
            if len(devs) >= self.num_shards:
                self._mesh = make_mesh(devices=devs[: self.num_shards],
                                       dp=self.num_shards, mp=1)
            else:
                print(f"Cluster Proposal: NUM_SHARDS={self.num_shards} but only "
                      f"{len(devs)} devices — falling back to single-device")
                self.num_shards = 1
        return self._mesh

    def _propose_chunk_sharded(self, pts, radius):
        """Dispatch one chunk's CC x-sharded over the device mesh with halo
        exchange (parallel/point_shard.sharded_connected_components).

        Returns a pending payload ("sharded", roots, gids, valid, ntrunc)
        or None to fall back single-device (slab thinner than the radius —
        dense region where immediate-ring halos would be incomplete)."""
        from ..parallel.point_shard import (
            shard_points_by_x, sharded_connected_components)

        mesh = self._shard_mesh()
        if mesh is None:
            return None
        try:
            sp, gi, va = shard_points_by_x(
                pts.astype(np.float32), self.num_shards, radius=radius)
        except ValueError as e:
            print(f"Cluster Proposal: sharded CC fallback ({e})")
            return None
        roots, ntrunc = sharded_connected_components(
            jnp.asarray(sp), jnp.asarray(gi), jnp.asarray(va),
            jnp.asarray(radius, jnp.float32), mesh=mesh,
            k=self.cc_neighbors, halo_cap=self.halo_cap,
            cell_cap=self.cc_cell_cap,
        )
        return ("sharded", roots, gi, va, ntrunc)

    # -- proposal ----------------------------------------------------------
    def propose_cluster(self, seq_dict):
        import time as _t
        _t_start = _t.time()
        _prof = {}

        def _tick(key, t0):
            t1 = _t.time()
            _prof[key] = _prof.get(key, 0.0) + (t1 - t0)
            return t1
        fxyz = np.asarray(seq_dict["point_fxyz"])
        frame = np.asarray(seq_dict["point_sweep"]).reshape(-1)
        n = fxyz.shape[0]
        num_frames = int(frame.max()) + 1 if n else 0

        # dispatch every (radius, chunk) program before reading any result
        # back: jax dispatch is async, so the device crunches chunk i+1
        # while the host pads chunk i+2 and drains chunk i
        use_pallas = pallas_scan.use_pallas_scan()
        from ..utils.frame_index import FrameIndex

        findex = FrameIndex(frame)
        # when the sequence is frame-sorted, the whole point table rides
        # ONE device upload and every chunk is an on-device slice of it
        # (utils/device_seq.py) — the per-chunk host pad+H2D path is kept
        # as the fallback for unsorted layouts
        from ..utils.device_seq import get_device_seq

        ds = get_device_seq(seq_dict, fxyz, frame) if self.num_shards <= 1 else None
        pending = []
        # sweep 1 — dispatch the W-independent CC prep (sort + probe
        # bounds + union-window spans) for every (chunk, radius); chunks
        # outer, radii inner so each chunk's padded point table is
        # uploaded/sliced ONCE and shared by every radius
        preps = []
        for f0 in range(0, num_frames, self.chunk_frames):
            m = findex.rows_range(f0, f0 + self.chunk_frames)
            if not len(m):
                continue
            pts = fxyz[m]
            padded_d = valid_d = None
            off = 0
            span = float((pts[:, 1:3].max(0) - pts[:, 1:3].min(0)).max()) \
                if len(pts) else 1.0
            for comp_key, radius in zip(self.component_keys, self.radii):
                if self.num_shards > 1:
                    res = self._propose_chunk_sharded(pts, radius)
                    if res is not None:
                        pending.append((comp_key, m, pts.shape[0], res))
                        continue
                if padded_d is None:
                    if ds is not None:
                        padded_d, valid_d, length, off = ds.chunk(
                            f0, f0 + self.chunk_frames)
                        assert length == pts.shape[0], (length, pts.shape)
                    else:
                        cap = bucket_size(pts.shape[0])
                        padded, valid = pad_rows(pts.astype(np.float32), cap, fill=1e8)
                        padded_d, valid_d = jnp.asarray(padded), jnp.asarray(valid)
                if use_pallas:
                    cells = int(np.ceil(span / radius)) + 3
                    XY = 1 << max(cells - 1, 1).bit_length()  # pow2 bucket
                    state, max_win = pallas_scan.cc_prep(
                        padded_d, valid_d, radius, F=self.chunk_frames,
                        X=XY, Y=XY,
                    )
                    preps.append((comp_key, radius, m, pts.shape[0], off,
                                  padded_d.shape[0], state, max_win))
                else:
                    ntrunc = None
                    comp, num = _chunk_components(
                        padded_d, valid_d, radius,
                        self.cc_neighbors, cell_cap=self.cc_cell_cap,
                    )
                    pending.append((comp_key, m, pts.shape[0],
                                    ("dense", _comp_wire16(comp), comp, num,
                                     ntrunc, off, radius)))
        # sweep 2 — read each chunk's largest union-window span (the only
        # host sync) and dispatch the propagation rounds at the smallest
        # adequate scan window W: easy chunks run at ~1/3 the DMA of the
        # old fixed W=1536 and heavy chunks (which used to truncate
        # 150-290 windows at reference scale) get a full-size window
        _tp = _tick("prep_dispatch", _t_start)
        for pi in range(len(preps)):
            comp_key, radius, m, n_pts, off, cap, state, max_win = preps[pi]
            preps[pi] = None  # drop the prep state's HBM as soon as the
            # rounds consume it (keeping all chunks' sorted tables + probe
            # bounds alive until the drain costs ~1.4 GB x n_radii at
            # reference scale)
            try:
                comp, num, ntrunc = pallas_scan.cc_finish(state, max_win, cap)
            except Exception as e:  # pragma: no cover — TPU-only failure
                # a never-before-compiled ladder-W rung failing Mosaic
                # raises HERE (jit compiles at call time) — redo this
                # chunk with the composed-XLA CC instead of dying
                print(f"Cluster Proposal {comp_key}: Pallas CC dispatch "
                      f"failed ({type(e).__name__}), XLA fallback")
                del state
                cap_f = bucket_size(n_pts)
                padded, valid = pad_rows(
                    fxyz[m].astype(np.float32), cap_f, fill=1e8)
                comp, num = _chunk_components(
                    jnp.asarray(padded), jnp.asarray(valid), radius,
                    self.cc_neighbors, cell_cap=self.cc_cell_cap,
                )
                ntrunc, off = None, 0
            pending.append((comp_key, m, n_pts,
                            ("dense", _comp_wire16(comp), comp, num,
                             ntrunc, off, radius)))

        _tp = _tick("finish_dispatch", _tp)
        # start every chunk's D2H before blocking on any (each blocking
        # read through the tunneled TPU pays a full round-trip latency);
        # dense chunks ship the int16 wire labels — the int32 original
        # (payload[2]) stays on device unless the count overflows int16
        for _, _, _, payload in pending:
            wire = payload[1:2] + payload[3:] if payload[0] == "dense" \
                else payload[1:]
            for v in wire:
                try:
                    v.copy_to_host_async()
                except AttributeError:
                    pass
        components = {k: np.zeros(n, dtype=np.int64) for k in self.component_keys}
        totals = {k: 0 for k in self.component_keys}
        for comp_key, m, n_pts, payload in pending:
            if payload[0] == "sharded":
                _, roots, gi, va, ntrunc = payload
                roots = np.asarray(roots).reshape(-1)
                gi, va = gi.reshape(-1), va.reshape(-1)
                root_by_row = np.empty(n_pts, np.int64)
                root_by_row[gi[va]] = roots[va]
                _, comp_np = np.unique(root_by_row, return_inverse=True)
                num = int(comp_np.max()) + 1 if n_pts else 0
                components[comp_key][m] = comp_np + totals[comp_key]
                totals[comp_key] += num
                n_halo = int(np.asarray(ntrunc).sum())
                telemetry.add("proposal_halo_truncated", n_halo)
                if n_halo > 0:
                    print(f"Cluster Proposal {comp_key}: WARNING "
                          f"{n_halo} halo points truncated "
                          f"at HALO_CAP={self.halo_cap}")
                continue
            _, comp16, comp, num, ntrunc, off, radius = payload
            try:
                if int(np.asarray(num)) <= 32766:
                    comp_np = np.asarray(comp16)
                else:  # int16 wire overflow — read the int32 original
                    comp_np = np.asarray(comp)
            except Exception as e:  # pragma: no cover — TPU-only failure
                # a new Pallas W variant failing Mosaic/the TPU runtime
                # must not kill an unattended run: redo this chunk with
                # the composed-XLA CC (always compiles)
                print(f"Cluster Proposal {comp_key}: Pallas CC failed "
                      f"({type(e).__name__}), XLA fallback for this chunk")
                cap = bucket_size(n_pts)
                padded, valid = pad_rows(
                    fxyz[m].astype(np.float32), cap, fill=1e8)
                comp, num = _chunk_components(
                    jnp.asarray(padded), jnp.asarray(valid), radius,
                    self.cc_neighbors, cell_cap=self.cc_cell_cap,
                )
                comp_np, ntrunc, off = np.asarray(comp), None, 0
            # int64 BEFORE the offset add: accumulated totals overflow the
            # int16 wire dtype
            components[comp_key][m] = (
                comp_np[off: off + n_pts].astype(np.int64) + totals[comp_key])
            totals[comp_key] += int(num)
            if ntrunc is not None and int(ntrunc) > 0:
                telemetry.add("proposal_scan_windows_truncated", int(ntrunc))
                print(f"Cluster Proposal {comp_key}: WARNING "
                      f"{int(ntrunc)} scan windows truncated at the top "
                      f"ladder W={pallas_scan.CC_W_LADDER[-1]}")
        _tp = _tick("drain", _tp)
        for comp_key in self.component_keys:
            seq_dict[f"point_{comp_key}"] = components[comp_key]
            print(f"Cluster Proposal {comp_key}: num_components={totals[comp_key]}")
        if os.environ.get("PCSEQ_PROF"):
            _prof["propose_total"] = round(_t.time() - _t_start, 2)
            print(f"PROPOSE_PROF {{{', '.join(f'{k!r}: {round(v, 2)}' for k, v in _prof.items())}}}",
                  flush=True)
        return seq_dict

    # -- evaluation ---------------------------------------------------------
    def format_boxes(self, seq_dict):
        """Reference cluster_proposal.py:116-140."""
        seq_boxes = EDict(
            attr=np.asarray(seq_dict["gt_box_attr"]).reshape(-1, 7),
            cls_label=np.asarray(seq_dict["gt_box_cls_label"]).reshape(-1),
            trace_id=np.asarray(seq_dict["gt_box_track_label"]).reshape(-1),
            frame=np.asarray(seq_dict["gt_box_frame"]).reshape(-1),
        )
        return seq_boxes

    def evaluate_proposal(self, seq_dict):
        import time as _t
        _prof = {}

        def _tick(key, t0):
            _prof[key] = _prof.get(key, 0.0) + (_t.time() - t0)
            return _t.time()

        fxyz = np.asarray(seq_dict["point_fxyz"])
        frame = np.asarray(seq_dict["point_sweep"]).reshape(-1)
        n = fxyz.shape[0]
        num_frames = int(frame.max()) + 1 if n else 0

        seq_boxes = self.format_boxes(seq_dict)
        num_boxes = seq_boxes.attr.shape[0]
        if num_boxes == 0:
            for key in ["gt_box_id", "gt_trace_id", "pred_trace_id", "pred_box_id"]:
                seq_dict[f"point_{key}"] = np.zeros(n, np.int64) - 1
            return seq_dict

        num_traces = int(seq_boxes.trace_id.max()) + 1
        trace_best = np.zeros(num_traces, np.float32)
        trace_min_frame = np.full(num_traces, 10 ** 9)
        trace_max_frame = np.full(num_traces, -1)
        for t in range(num_traces):
            tm = seq_boxes.trace_id == t
            if tm.any():
                trace_min_frame[t] = seq_boxes.frame[tm].min()
                trace_max_frame[t] = seq_boxes.frame[tm].max()

        results = EDict()
        # frame geometry is identical for every component key: pack + H2D
        # it ONCE (at reference scale the padded [F, p_cap, 3] table is
        # ~660 MB — re-uploading it per key through the ~50 MB/s tunnel was
        # most of evaluate_proposal's wall time)
        _tp = _t.time()
        from ..utils.device_seq import get_device_seq
        from ..utils.frame_index import FrameIndex

        findex = FrameIndex(frame)
        ds = get_device_seq(seq_dict, fxyz, frame)
        frames_geo = []
        p_cap = b_cap = 1
        for fid in range(num_frames):
            rows = findex.rows(fid)
            bm = seq_boxes.frame == fid
            if not len(rows) or not bm.any():
                continue
            b_idx = np.nonzero(bm)[0]
            frames_geo.append((fid, rows, b_idx))
            p_cap = max(p_cap, len(rows))
            b_cap = max(b_cap, len(b_idx))
        p_cap = bucket_size(p_cap)
        b_cap = bucket_size(b_cap, base=32)
        F = len(frames_geo)
        if F:
            if ds is not None:
                # frame geometry gathered from the resident table — no H2D
                tab, tval, p_cap = ds.frame_table()
                sel = jnp.asarray(
                    np.asarray([fg[0] for fg in frames_geo], np.int32))
                pts_d = tab[sel][..., 1:4]
                pv_d = tval[sel]
            box_a = np.zeros((F, b_cap, 7), np.float32)
            bv_a = np.zeros((F, b_cap), bool)
            for i, (fid, rows, b_idx) in enumerate(frames_geo):
                box_a[i, : len(b_idx)] = seq_boxes.attr[b_idx]
                bv_a[i, : len(b_idx)] = True
            if ds is None:
                pts_a = np.full((F, p_cap, 3), 1e8, np.float32)
                pv_a = np.zeros((F, p_cap), bool)
                for i, (fid, rows, b_idx) in enumerate(frames_geo):
                    npx = len(rows)
                    pts_a[i, :npx] = fxyz[rows, 1:4]
                    pv_a[i, :npx] = True
                pts_d, pv_d = jnp.asarray(pts_a), jnp.asarray(pv_a)
            box_d, bv_d = jnp.asarray(box_a), jnp.asarray(bv_a)
        _tp = _tick("geo_pack", _tp)

        for comp_key in self.component_keys:
            component = np.asarray(seq_dict[f"point_{comp_key}"])
            best_iou = np.zeros(num_boxes, np.float32)
            gt_box_id = np.zeros(n, np.int64) - 1
            pred_box_id = np.zeros(n, np.int64) - 1

            _tp = _t.time()
            frames_data = []
            c_cap = 1
            for fid, rows, b_idx in frames_geo:
                comp_f = component[rows]
                uniq, local = np.unique(comp_f, return_inverse=True)
                frames_data.append((rows, local, b_idx))
                c_cap = max(c_cap, len(uniq))
            c_cap = bucket_size(c_cap, base=128)
            if F:
                assert c_cap < 32767, "int16 local component overflow"
                loc_a = np.full((F, p_cap), -1, np.int16)
                for i, (rows, local, b_idx) in enumerate(frames_data):
                    loc_a[i, : len(local)] = local
                _tp = _tick("loc_pack", _tp)
                def _eval16(p, pv, lc, bx, bvv):
                    bb, gid, pid = _evaluate_frame(p, pv, lc, bx, bvv, c_cap=c_cap)
                    # local box ids < b_cap: int16 on the tunneled D2H wire
                    return bb, gid.astype(jnp.int16), pid.astype(jnp.int16)

                bb_a, gid_a, pid_a = jax.vmap(_eval16)(
                    pts_d, pv_d, jnp.asarray(loc_a).astype(jnp.int32),
                    box_d, bv_d)
                for v in (bb_a, gid_a, pid_a):
                    try:
                        v.copy_to_host_async()
                    except AttributeError:
                        pass
                bb_a, gid_a, pid_a = map(np.asarray, (bb_a, gid_a, pid_a))
                _tp = _tick("dispatch_d2h", _tp)
                for i, (rows, local, b_idx) in enumerate(frames_data):
                    bb = bb_a[i][: len(b_idx)]
                    upd = bb > best_iou[b_idx]
                    best_iou[b_idx[upd]] = bb[upd]
                    gid_np = gid_a[i][: len(local)]
                    pid_np = pid_a[i][: len(local)]
                    gt_box_id[rows] = np.where(gid_np >= 0, b_idx[np.clip(gid_np, 0, None)], -1)
                    pred_box_id[rows] = np.where(pid_np >= 0, b_idx[np.clip(pid_np, 0, None)], -1)

            _tp = _tick("drain", _tp)
            for t in range(num_traces):
                tm = seq_boxes.trace_id == t
                if tm.any():
                    trace_best[t] = max(trace_best[t], best_iou[tm].max())

            results[f"best_iou_after_{comp_key}"] = best_iou.copy()
            num_frames_by_trace = trace_max_frame - trace_min_frame + 1
            trace_miou = float(
                (trace_best * num_frames_by_trace).sum() / (num_frames_by_trace.sum() + 1e-6)
            )
            box_miou = float(best_iou.mean())
            print(f"mIoU({comp_key})={box_miou:.6f}, Trace-propagated mIoU({comp_key})={trace_miou:.6f}")

            seq_dict["point_gt_box_id"] = gt_box_id
            seq_dict["point_pred_box_id"] = pred_box_id
            seq_dict["point_gt_trace_id"] = np.where(
                gt_box_id >= 0, seq_boxes.trace_id[np.clip(gt_box_id, 0, None)], -1
            )
            seq_dict["point_pred_trace_id"] = np.where(
                pred_box_id >= 0, seq_boxes.trace_id[np.clip(pred_box_id, 0, None)], -1
            )

        seq_dict["gt_box_best_iou"] = results.get(
            f"best_iou_after_{self.component_keys[-1]}", np.zeros(num_boxes, np.float32)
        )
        seq_dict["gt_trace_best_iou"] = trace_best
        if os.environ.get("PCSEQ_PROF"):
            print("EVAL_PROF", {k: round(v, 2) for k, v in _prof.items()}, flush=True)
        for k, v in results.items():
            seq_dict[k] = v
        return seq_dict

    def __call__(self, seq_dict):
        seq_dict = self.propose_cluster(seq_dict)
        if "gt_box_attr" in seq_dict:
            import time as _t
            _t0 = _t.time()
            seq_dict = self.evaluate_proposal(seq_dict)
            if os.environ.get("PCSEQ_PROF"):
                print(f"PROPOSE_EVAL {{'evaluate': {round(_t.time() - _t0, 2)}}}",
                      flush=True)
        if "DIR" in self.model_cfg:
            os.makedirs(self.model_cfg.DIR, exist_ok=True)
        return seq_dict
