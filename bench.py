"""Benchmark: end-to-end cluster extraction + tracking throughput on a
synthetic Waymo-scale sequence (frames/hour/chip — the north-star metric,
BASELINE.json) plus a CenterPoint train-step benchmark with an MFU figure
(BASELINE configs 4-5). Prints ONE JSON line.

The synthetic scene mirrors the real workload shape: ~90k above-ground
points per frame after 8 cm subsampling, a ground plane, and rigid clusters
— HALF of them moving, half static (below the 0.05 m/frame moving
threshold), so the moving mask, the min-move stopping gate and the
moving-only mIoU are genuinely exercised. The measured path is ground
removal -> multi-radius cluster proposal (radius graph + CC) -> per-
component ICP tracking, i.e. the hot path of BASELINE configs 1-3.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np



def _enable_compilation_cache():
    """Persistent XLA compilation cache — compiles amortize across runs."""
    import jax

    try:
        # out-of-repo default: a `git clean -fdx` between rounds must not
        # wipe ~800 s of accumulated compiles (repo .jax_cache is gitignored
        # but lives inside the tree)
        cache_dir = os.environ.get(
            "PCSEQ_CACHE_DIR",
            os.path.expanduser("~/.cache/pcseqlearning_tpu/jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def make_scene(num_frames=20, points_per_frame=90_000, seed=0,
               moving_fraction=0.5):
    """Mixed moving/static scene: even-indexed clusters move (|v| in
    [0.15, 0.8] m/frame), the rest are static jittered below the
    0.05 m/frame moving threshold — so All vs Moving mIoU diverge and the
    min-move stopping gate (reference cluster_tracking.py:676-691) sees
    both sides."""
    rng = np.random.RandomState(seed)
    frames = []
    n_clusters = 24
    centers = rng.rand(n_clusters, 2) * 120 - 60
    n_moving = int(round(n_clusters * moving_fraction))
    velo = np.zeros((n_clusters, 2))
    # movers: direction uniform, speed well above threshold
    ang = rng.rand(n_moving) * 2 * np.pi
    spd = rng.rand(n_moving) * 0.65 + 0.15
    velo[:n_moving] = np.stack([np.cos(ang), np.sin(ang)], 1) * spd[:, None]
    # static: tiny drift strictly below the 0.05 m/frame gate
    velo[n_moving:] = rng.randn(n_clusters - n_moving, 2) * 0.01
    sizes = rng.rand(n_clusters) * 1.5 + 0.5
    gt_attr, gt_frame, gt_track = [], [], []
    # the ground is a STATIC surface: the same physical cells are observed
    # every frame, so the sequence-level 10cm voxel table dedupes to roughly
    # one frame's worth of ground cells (as on real Waymo ego-static scenes)
    n_ground = int(points_per_frame * 0.65)
    gx_fixed = rng.rand(n_ground, 2) * 150 - 75
    gz_fixed = 0.02 * np.sin(gx_fixed[:, 0] / 10) + rng.randn(n_ground) * 0.02
    ground = np.stack([gx_fixed[:, 0], gx_fixed[:, 1], gz_fixed], axis=1)
    for f in range(num_frames):
        objs = []
        per = (points_per_frame - n_ground) // n_clusters
        for c in range(n_clusters):
            pos = centers[c] + velo[c] * f
            pts = rng.randn(per, 3) * sizes[c] * np.array([1, 1, 0.5])
            pts[:, :2] += pos
            pts[:, 2] += sizes[c] + 0.5
            objs.append(pts)
            gt_attr.append([pos[0], pos[1], sizes[c] + 0.5, 4 * sizes[c], 4 * sizes[c], 2 * sizes[c], 0.0])
            gt_frame.append(f)
            gt_track.append(c)
        xyz = np.concatenate([ground] + objs).astype(np.float32)
        fcol = np.full((len(xyz), 1), f, np.float32)
        frames.append(np.concatenate([fcol, xyz], axis=1))
    gt = dict(
        gt_box_attr=np.asarray(gt_attr, np.float32),
        gt_box_frame=np.asarray(gt_frame, np.int64),
        gt_box_track_label=np.asarray(gt_track, np.int64),
        gt_box_cls_label=np.ones(len(gt_attr), np.int64),
        gt_box_velo=np.linalg.norm(velo, axis=1)[np.asarray(gt_track)].astype(np.float32),
        moving=np.linalg.norm(velo, axis=1)[np.asarray(gt_track)] > 0.05,
    )
    return np.concatenate(frames), gt


def _cell_cap_audit(seq, radii_caps):
    """Points dropped by the hash-grid per-bucket cap at each (radius, cap)
    the XLA-composition neighbor search uses.

    Scope: on the production TPU path these caps are NOT on the hot path —
    proposal CC runs the Pallas sorted-window scan (whole windows, like the
    reference's whole-cell scan) and the tracking walk runs brute
    component-tile distances; the capped hash grid serves the XLA FALLBACK
    paths (CPU tests, host walk, Mosaic-failure fallbacks). CELLCAP_AB.json
    (tools/cellcap_ab.py) measured cap 48 vs 256 end-to-end: identical mIoU
    to 4 decimals on the bench scene."""
    import jax.numpy as jnp

    from pcseqlearning_tpu.ops import hash_graph

    f0 = seq[seq[:, 0] == seq[0, 0]][:, :4].astype(np.float32)
    out = {}
    for name, (radius, cap) in radii_caps.items():
        grid = hash_graph.build_hash_grid(jnp.asarray(f0), radius)
        out[name] = int(hash_graph.cell_cap_overflow(grid, cell_cap=cap))
    return out


# ---------------------------------------------------------------------------
# detector train-step benchmark (BASELINE configs 4-5)
# ---------------------------------------------------------------------------

# dense bf16 peak FLOP/s per chip by device kind (MFU denominator)
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "TPU v6e": 918e12,
}


def _peak_flops(device):
    kind = getattr(device, "device_kind", "")
    for key, v in sorted(_PEAK_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if key.lower() in kind.lower():
            return v
    return None


def bench_detector():
    """CenterPoint (VoxelResBackBone8x) train step at the reference Waymo
    geometry (centerpoint.yaml: PCR +-74.88m, 0.1m voxels -> 1497^2 BEV
    grid; reference workload pcdet/models/backbones_3d/spconv_backbone.py
    + center_head). Reports steps/s, points/s and MFU where MFU uses XLA's
    own per-program FLOP count over the chip's bf16 peak."""
    import jax
    import jax.numpy as jnp
    import optax

    from pcseqlearning_tpu.models.detectors import build_detector
    from pcseqlearning_tpu.parallel.mesh import make_mesh
    from pcseqlearning_tpu.parallel.train_step import (
        init_train_state, make_train_step)
    from pcseqlearning_tpu.utils.edict import EDict

    batch_size = int(os.environ.get("BENCH_DET_BATCH", 2))
    n_points = int(os.environ.get("BENCH_DET_POINTS", 160_000))
    voxel_cap = int(os.environ.get("BENCH_DET_VOXELS", 120_000))
    n_steps = int(os.environ.get("BENCH_DET_STEPS", 8))

    cfg = EDict(
        NAME="CenterPoint",
        POINT_CAP=n_points,
        VOXEL_CAP=voxel_cap,
        VFE=EDict(NAME="DynamicMeanVFE"),
        BACKBONE_3D=EDict(NAME="VoxelResBackBone8x"),
        MAP_TO_BEV=EDict(NAME="HeightCompression", NUM_BEV_FEATURES=256),
        BACKBONE_2D=EDict(NAME="BaseBEVBackbone", LAYER_NUMS=[5, 5],
                          LAYER_STRIDES=[1, 2], NUM_FILTERS=[128, 256],
                          UPSAMPLE_STRIDES=[1, 2],
                          NUM_UPSAMPLE_FILTERS=[256, 256]),
        DENSE_HEAD=EDict(NAME="CenterHead", FEATURE_MAP_STRIDE=8),
    )
    runtime_cfg = dict(
        data_cfg={"POINT_CLOUD_RANGE": [-74.88, -74.88, -2.0, 74.88, 74.88, 4.0],
                  "VOXEL_SIZE": [0.1, 0.1, 0.15]},
        class_names=["Vehicle", "Pedestrian", "Cyclist"],
        voxel_cap=voxel_cap,
    )
    model = build_detector(cfg, runtime_cfg)

    rng = np.random.RandomState(0)
    pts = np.zeros((batch_size, n_points, 4), np.float32)
    pts[..., 1] = rng.rand(batch_size, n_points) * 140 - 70
    pts[..., 2] = rng.rand(batch_size, n_points) * 140 - 70
    pts[..., 3] = rng.rand(batch_size, n_points) * 5 - 1.5
    feats = rng.rand(batch_size, n_points, 1).astype(np.float32)
    valid = np.ones((batch_size, n_points), bool)
    gt = np.zeros((batch_size, 64, 8), np.float32)
    for b in range(batch_size):
        gt[b, :, 0:2] = rng.rand(64, 2) * 120 - 60
        gt[b, :, 2] = 1.0
        gt[b, :, 3:6] = [4.5, 2.0, 1.8]
        gt[b, :, 7] = rng.randint(1, 4, 64)
    batch = dict(points=pts, feats=feats, valid=valid, gt_boxes=gt)

    mesh = make_mesh(jax.devices()[:1], dp=1)
    tx = optax.adam(1e-3)
    state = init_train_state(model, tx, batch)
    train_step = make_train_step(model, tx, mesh, loss_key="center_loss")
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # FLOPs for the MFU numerator: try XLA's HLO cost analysis, fall back
    # to the jaxpr-walking analytic counter (utils/flops.py) which needs no
    # backend support at all — detector_mfu can never be null.
    # NOT compile().cost_analysis(): that builds a second AOT executable,
    # and the tunnel's remote compile helper gets OOM-killed on a program
    # this size.
    flops = None
    try:
        lowered = train_step.lower(state, dev_batch)
        cost = lowered.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception as e:  # pragma: no cover — cost analysis is best-effort
        print(f"# detector: cost_analysis unavailable ({type(e).__name__})", flush=True)
    if not flops:
        from pcseqlearning_tpu.utils.flops import analytic_flops

        flops = float(analytic_flops(
            lambda s, b: train_step(s, b), state, dev_batch))
        print(f"# detector: analytic flops/step = {flops:.3e}", flush=True)

    t0 = time.time()
    state, losses = train_step(state, dev_batch)
    jax.block_until_ready(losses)
    print(f"# detector warmup (compile) step: {time.time() - t0:.1f}s", flush=True)

    # elision-proof timing: fetch the loss scalar to HOST every step. The
    # axon relay was observed to elide re-enqueued step chains once a
    # fetch cycle completed (511-589 'steps/s' with block_until_ready —
    # an impossible MFU > 5); a per-step host read forces real execution
    # and the strictly-decreasing loss verifies training is happening.
    # Median per-step wall (first step excluded: it pays the relay's
    # first-execution queue cost) slightly UNDER-reports throughput by
    # one D2H latency (~65 ms) per step — honest on this link.
    durs, last_loss = [], None
    t_prev = time.time()
    for i in range(n_steps):
        state, losses = train_step(state, dev_batch)
        lv = float(losses["center_loss"])
        now = time.time()
        durs.append(now - t_prev)
        t_prev = now
        last_loss = lv
    durs = sorted(durs[1:]) or durs
    dt = durs[len(durs) // 2]
    steps_per_sec = 1.0 / dt
    peak = _peak_flops(jax.devices()[0])
    mfu = (flops * steps_per_sec / peak) if (flops and peak) else None
    out = {
        "detector": "CenterPoint/VoxelResBackBone8x",
        "detector_train_steps_per_sec": round(steps_per_sec, 3),
        "detector_points_per_sec": round(steps_per_sec * batch_size * n_points, 1),
        "detector_flops_per_step": flops,
        "detector_mfu": round(mfu, 4) if mfu is not None else None,
        "detector_loss": float(losses["center_loss"]),
    }
    print(f"# detector: {out}", flush=True)
    return out


def main():
    _enable_compilation_cache()
    import jax

    # the tunneled backend's first D2H stalls the transfer channel for
    # minutes — absorb it behind the host-only scene build
    from pcseqlearning_tpu.utils.warmup import warm_d2h_async

    warm_d2h_async()

    from pcseqlearning_tpu.preprocessing.ground_removal import GroundPlaneRemover
    from pcseqlearning_tpu.preprocessing.cluster_proposal import ClusterProposal
    from pcseqlearning_tpu.preprocessing.cluster_tracking import ClusterTracking
    from pcseqlearning_tpu.utils import telemetry
    from pcseqlearning_tpu.utils.edict import EDict

    # BENCH_FRAMES / BENCH_POINTS / BENCH_PASSES parameterize the scene up
    # to the reference envelope (210 sweeps x ~170k pts, all_sequence.yaml
    # NUM_SWEEPS/MAX_NUM_POINTS) — FULLSCALE_r04.json records the
    # reference-scale capacity run (tools/fullscale_bench.py). The default
    # measures a 100-frame sequence (VERDICT r2: frames/hr on >=100-frame
    # sequences) at the ~90k-above-ground-points-per-frame density of an
    # 8 cm-subsampled Waymo sweep.
    num_frames = int(os.environ.get("BENCH_FRAMES", 100))
    points_per_frame = int(os.environ.get("BENCH_POINTS", 90_000))
    # 3 passes: the tunneled TPU is shared and identical code swings up to
    # 10x under tenant bursts — best-of-3 makes the reported steady state
    # robust to one noisy pass for ~30 s of extra wall
    num_passes = int(os.environ.get("BENCH_PASSES", 3))
    print(f"# scene: {num_frames} frames x {points_per_frame} pts", flush=True)

    def build_seq(jitter_seed):
        # FRESH input values per timed pass: the tunneled runtime memoizes
        # identical (program, input) executions (observed 500+ fake
        # 'steps/s' on re-enqueued identical detector chains), so timing
        # repeated passes over byte-identical inputs could replay cached
        # results. A 0.1 mm coordinate jitter on the SAME scene defeats
        # the cache while provably keeping every shape bucket (cluster
        # counts, extents, solve-grid level) identical — fully-seeded
        # distinct scenes were tried and minted new compile variants
        # INSIDE the timed passes (168 s single-frame spikes).
        seq, gt = make_scene(num_frames=num_frames,
                             points_per_frame=points_per_frame)
        if jitter_seed:
            jr = np.random.RandomState(1000 + jitter_seed)
            seq = seq.copy()
            seq[:, 1:4] += jr.uniform(-1e-4, 1e-4, (len(seq), 3)).astype(np.float32)
        return seq, {
            "point_fxyz": seq,
            "point_sweep": seq[:, 0].astype(np.int64),
            "point_feat": np.zeros((len(seq), 1), np.float32),
            "frame_id": f"bench_seq_{jitter_seed:03d}",
            **gt,
        }

    seq, seq_dict = build_seq(0)

    remover = GroundPlaneRemover(EDict(
        PILLAR_SIZE=[2, 2], LR=0.01, DECAY_STEPS=[1600], RIGID_WEIGHT=0.5,
        MAX_NUM_ITERS=2000, TRUNCATE_HEIGHT=[0.5], RANSAC=True, JointOpt=True,
        SIGMA2=0.0025, K=8,
    ))
    proposal = ClusterProposal(EDict(
        GRAPH=EDict(TYPE="RadiusGraph", RADIUS=[1.25, 0.75], MAX_NUM_NEIGHBORS=32,
                    SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
        COMPONENT_KEYS=["component_rad1x25", "component_rad0x75"],
    ))
    tracking = ClusterTracking(EDict(
        ANGLE_REGULARIZER=10,
        COMPONENT_KEYS=["component_rad1x25"],
        REGISTRATION=EDict(
            GRAPH=EDict(TYPE="RadiusGraph", RADIUS=[2.5, 1.25, 1.0], MAX_NUM_NEIGHBORS=1,
                        SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
            VOXEL_SIZE=[[0.4, 0.4, 0.6], [0.2, 0.2, 0.3], [0.1, 0.1, 0.15]],
            STOPPING_DELTA=[0.05, 0.05, 0.05],
        ),
        NN_GRAPH=EDict(TYPE="RadiusGraph", RADIUS=0.5, MAX_NUM_NEIGHBORS=1,
                       SORT_BY_DIST=True, RELATIVE_KEY="fxyz"),
        TRACKING_PARAMS=EDict(REGISTRATION_ERROR_COEFFICIENT=0.13, TRACK_INTERVAL=8,
                              ANGLE_THRESHOLD=45, MIN_MOVE_FRAME=6),
        MAX_ICP_ITER=20,
    ))

    # steady-state measurement: the first pass compiles every shape bucket
    # (a real 210-frame sequence reuses one bucket set across its whole
    # length and across sequences); the timed second pass is the production
    # regime. The persistent compilation cache also carries across runs.
    def run_once(d):
        t = time.time()
        out = remover(dict(d))
        print(f"# ground: {time.time() - t:.1f}s", flush=True)
        t = time.time()
        out = proposal(out)
        print(f"# proposal: {time.time() - t:.1f}s", flush=True)
        t = time.time()
        out = tracking(out)
        print(f"# tracking: {time.time() - t:.1f}s", flush=True)
        jax.block_until_ready(jax.numpy.zeros(1))
        return out

    import shutil

    t0 = time.time()
    out = run_once(seq_dict)  # quality record: the canonical seed-0 scene
    print(f"# warmup (compile) pass: {time.time() - t0:.1f}s", flush=True)
    shutil.rmtree(tracking.model_cfg.get("DIR", "/nonexistent"), ignore_errors=True)

    # the tunneled TPU is shared; a single timed pass can absorb another
    # tenant's burst (observed 10x swings on identical code) — take the
    # best of the steady-state passes, each over a DIFFERENT seeded scene
    # (see build_seq: re-running identical inputs could be relay-memoized;
    # memoization returns correct VALUES, so the warmup pass's seed-0
    # quality stays the comparable mIoU series across rounds, while the
    # timed passes get fresh values to keep the clock honest).
    # Truncation telemetry is counted over the timed passes only (warmup
    # duplicates every stage).
    telemetry.reset()
    elapsed = []
    for i in range(num_passes):
        _, d_i = build_seq(i + 1)
        t0 = time.time()
        run_once(d_i)
        elapsed.append(time.time() - t0)
        print(f"# timed pass {i}: {elapsed[-1]:.1f}s", flush=True)
    elapsed_best = min(elapsed)
    counters = telemetry.snapshot()
    for k in ("proposal_scan_windows_truncated", "proposal_halo_truncated",
              "tracking_claim_windows_truncated", "tracking_claim_overflow"):
        counters.setdefault(k, 0)

    # quality: All vs Moving box mIoU straight off the returned seq_boxes
    sb = out["seq_boxes"]
    mov = np.asarray(sb.moving, bool)
    all_miou = float(np.asarray(sb.best_iou).mean())
    moving_miou = float(np.asarray(sb.best_iou)[mov].mean()) if mov.any() else None
    static_miou = float(np.asarray(sb.best_iou)[~mov].mean()) if (~mov).any() else None

    # hash-grid cell-cap audit at the caps the pipeline uses
    from pcseqlearning_tpu.ops import hash_graph as _hg

    cc_cap = min(_hg.DEFAULT_CELL_CAP, int(os.environ.get("PCSEQ_CELL_CAP", 24)))
    cell_audit = _cell_cap_audit(seq, {
        "cell_cap_drops_proposal_cc": (1.25, cc_cap),
        "cell_cap_drops_tracking_nn": (0.5, _hg.DEFAULT_CELL_CAP),
    })

    det = {}
    if os.environ.get("BENCH_DETECTOR", "1") != "0":
        try:
            det = bench_detector()
        except Exception as e:  # pragma: no cover — never kill the round run
            import traceback
            traceback.print_exc()
            det = {"detector_error": f"{type(e).__name__}: {e}"}

    frames_per_hour = num_frames / elapsed_best * 3600.0
    baseline = 10_000.0  # BASELINE.json north star: frames/hr/chip
    # measured truncation quality deltas (tools/cellcap_ab.py artifact):
    # carry the cell-cap and wire-quant mIoU costs in the bench record
    ab = {}
    ab_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "CELLCAP_AB.json")
    if os.path.exists(ab_path):
        try:
            with open(ab_path) as f:
                rec = json.load(f)
            ab = {k: rec[k] for k in
                  ("cellcap_miou_delta", "wire_quant_miou_delta") if k in rec}
        except Exception:
            pass
    print(json.dumps({
        "metric": "extraction_frames_per_hour_per_chip",
        "value": round(frames_per_hour, 1),
        "unit": "frames/hr",
        "vs_baseline": round(frames_per_hour / baseline, 3),
        "all_box_miou": round(all_miou, 4),
        "moving_box_miou": round(moving_miou, 4) if moving_miou is not None else None,
        "static_box_miou": round(static_miou, 4) if static_miou is not None else None,
        "num_moving_gt": int(mov.sum()),
        "num_static_gt": int((~mov).sum()),
        **{k: int(v) for k, v in sorted(counters.items())},
        **cell_audit,
        **ab,
        **det,
    }))


if __name__ == "__main__":
    main()
