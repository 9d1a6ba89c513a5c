"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4:
multi-chip tests runnable on CPU via xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_and_batch_sharding():
    from pcseqlearning_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh(dp=4, mp=2, devices=jax.devices())
    assert mesh.shape == {"dp": 4, "mp": 2}
    batch = {"point_bxyz": jnp.zeros((8, 128, 4)), "meta": 3}
    sharded = shard_batch(mesh, batch)
    assert sharded["point_bxyz"].sharding.spec == jax.sharding.PartitionSpec("dp")


def test_dp_train_step_matches_single_device(rng):
    """The sharded step must produce the same loss/grads as an unsharded
    run — DDP-correctness, which the reference only assumes from torch
    (SURVEY.md §4 'multi-node testing: none')."""
    from pcseqlearning_tpu.models.detectors import build_detector
    from pcseqlearning_tpu.parallel import make_mesh, make_train_step
    from pcseqlearning_tpu.parallel.train_step import init_train_state, _flatten_local
    from pcseqlearning_tpu.runtime.optimization import build_optimizer
    from pcseqlearning_tpu.utils.edict import EDict

    model_cfg = EDict(
        NAME="CenterPoint",
        VFE={"NAME": "DynamicMeanVFE"},
        MAP_TO_BEV={"NAME": "PointPillarScatter"},
        BACKBONE_2D={"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1], "LAYER_STRIDES": [1],
                     "NUM_FILTERS": [16], "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [16]},
        DENSE_HEAD={"NAME": "CenterHead", "FEATURE_MAP_STRIDE": 1},
    )
    runtime_cfg = dict(
        data_cfg={"POINT_CLOUD_RANGE": [-3.2, -3.2, -1.0, 3.2, 3.2, 2.2],
                  "VOXEL_SIZE": [0.4, 0.4, 3.2]},
        class_names=["Vehicle"],
        # headroom for the dp=1 run, whose single shard voxelizes all 8
        # samples into one table — a saturated capacity would truncate
        # points and mask the equivalence being tested
        voxel_cap=4096,
    )
    model = build_detector(model_cfg, runtime_cfg)
    tx, _ = build_optimizer({"OPTIMIZER": "adam", "LR": 1e-3}, 10, 1)

    B, n = 8, 64
    pts = np.zeros((B, n, 4), np.float32)
    pts[:, :, 1:3] = rng.rand(B, n, 2) * 6 - 3
    pts[:, :, 3] = rng.rand(B, n) * 1.5 - 0.5
    gt = np.zeros((B, 2, 8), np.float32)
    gt[:, 0] = [1.0, 1.0, 0.5, 1.5, 1.5, 1.0, 0.3, 1]
    batch = dict(
        points=jnp.asarray(pts), feats=jnp.asarray(rng.rand(B, n, 1).astype(np.float32)),
        valid=jnp.ones((B, n), bool), gt_boxes=jnp.asarray(gt),
    )

    local = {k: v[:1] for k, v in batch.items()}
    state = init_train_state(model, tx, local)

    # single-device (dp=1) reference loss
    mesh1 = make_mesh(devices=jax.devices()[:1], dp=1, mp=1)
    step1 = make_train_step(model, tx, mesh1, loss_key="center_loss")
    _, losses1 = step1(state, batch)

    mesh8 = make_mesh(devices=jax.devices(), dp=8, mp=1)
    step8 = make_train_step(model, tx, mesh8, loss_key="center_loss")
    _, losses8 = step8(state, batch)

    # with cross-replica batch-norm moments (models/layers.bn_cross_replica)
    # and equal per-shard positive counts, the dp=8 step is the same math as
    # dp=1 — only f32 reduction reassociation differs
    for k in losses1:
        a, b = float(losses1[k]), float(losses8[k])
        assert np.isfinite(a) and np.isfinite(b)
        assert abs(a - b) / max(abs(a), 1e-3) < 1e-4, (k, a, b)


def test_graft_entry_and_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.ndim == 4
    ge.dryrun_multichip(8)


def test_sharded_radius_neighbors_matches_single_device(rng):
    """x-sharded halo-exchange radius search over the 8-device CPU mesh
    must reproduce the single-table result (global neighbor id sets)."""
    from pcseqlearning_tpu.ops import hash_graph
    from pcseqlearning_tpu.parallel import make_mesh
    from pcseqlearning_tpu.parallel.point_shard import (
        shard_points_by_x, sharded_radius_neighbors)

    n, k, r = 2000, 8, 0.7
    pts = np.zeros((n, 4), np.float32)
    pts[:, 1:] = rng.rand(n, 3) * np.array([40, 8, 3])
    mesh = make_mesh(devices=jax.devices(), dp=8, mp=1)
    sp, gi, va = shard_points_by_x(pts, 8)
    out_gids, out_d2, out_mask, n_trunc = sharded_radius_neighbors(
        jnp.asarray(sp), jnp.asarray(gi), jnp.asarray(va),
        jnp.asarray(r, jnp.float32), mesh=mesh, k=k,
    )
    assert int(np.asarray(n_trunc).sum()) == 0
    out_gids = np.asarray(out_gids).reshape(-1, k)
    out_mask = np.asarray(out_mask).reshape(-1, k)
    gi_flat = np.asarray(gi).reshape(-1)

    ref_idx, ref_d2, ref_mask = hash_graph.radius_graph(
        jnp.asarray(pts), jnp.asarray(pts), r, k)
    ref_idx, ref_mask = np.asarray(ref_idx), np.asarray(ref_mask)

    # compare per-query neighbor id sets in GLOBAL space
    checked = 0
    for slot in range(0, len(gi_flat), 97):
        q = gi_flat[slot]
        if q < 0:
            continue
        got = set(out_gids[slot][out_mask[slot]].tolist())
        want = set(ref_idx[q][ref_mask[q]].tolist())
        assert got == want, (q, got, want)
        checked += 1
    assert checked > 15


def test_sharded_radius_halo_cap_overflow_reported(rng):
    """When a boundary strip exceeds halo_cap, the per-device truncation
    counter must report the overflow instead of silently dropping
    neighbors (VERDICT r2 weak #8)."""
    from pcseqlearning_tpu.parallel import make_mesh
    from pcseqlearning_tpu.parallel.point_shard import (
        shard_points_by_x, sharded_radius_neighbors)

    # two slabs; pile most points into a dense band just right of the
    # slab boundary so the left strip of device 1 overflows a tiny cap
    n = 1024
    pts = np.zeros((n, 4), np.float32)
    pts[: n // 2, 1] = rng.rand(n // 2) * 10.0          # slab 0: spread
    pts[n // 2:, 1] = 10.5 + rng.rand(n // 2) * 0.3     # slab 1: dense band
    pts[:, 2] = rng.rand(n) * 2
    mesh = make_mesh(devices=jax.devices()[:2], dp=2, mp=1)
    sp, gi, va = shard_points_by_x(pts, 2)
    cap = 32
    _, _, _, n_trunc = sharded_radius_neighbors(
        jnp.asarray(sp), jnp.asarray(gi), jnp.asarray(va),
        jnp.asarray(0.7, jnp.float32), mesh=mesh, k=4, halo_cap=cap,
    )
    n_trunc = np.asarray(n_trunc)
    # device 1's entire dense half sits within radius of its left edge:
    # its left strip is ~512 points against a cap of 32
    assert n_trunc[1] >= (n // 2) - cap - 64
    assert n_trunc.sum() > 0


def test_sharded_connected_components_matches_single_device(rng):
    """Two-level distributed CC over the 8-device mesh must produce the
    SAME partition as single-table CC — including components whose chains
    span several x-slabs (merge transitivity across the ring)."""
    from pcseqlearning_tpu.ops import connected_components as cc
    from pcseqlearning_tpu.ops import hash_graph
    from pcseqlearning_tpu.parallel import make_mesh
    from pcseqlearning_tpu.parallel.point_shard import (
        shard_points_by_x, sharded_connected_components)

    r, k = 0.7, 16
    # scattered clusters + one long x-chain crossing every slab boundary
    blobs = []
    for cx in range(12):
        c = np.array([cx * 6.0, rng.rand() * 8, rng.rand()])
        blobs.append(c + rng.randn(40, 3).astype(np.float32) * 0.15)
    chain = np.stack([
        np.linspace(0, 70, 160),
        np.full(160, 15.0),
        np.zeros(160),
    ], 1).astype(np.float32)  # spacing 0.44 < r: one component end to end
    xyz = np.concatenate(blobs + [chain]).astype(np.float32)
    n = len(xyz)
    pts = np.concatenate([np.zeros((n, 1), np.float32), xyz], 1)

    mesh = make_mesh(devices=jax.devices(), dp=8, mp=1)
    sp, gi, va = shard_points_by_x(pts, 8, radius=r)
    roots, n_trunc = sharded_connected_components(
        jnp.asarray(sp), jnp.asarray(gi), jnp.asarray(va),
        jnp.asarray(r, jnp.float32), mesh=mesh, k=k, halo_cap=256,
    )
    assert int(np.asarray(n_trunc).sum()) == 0
    roots = np.asarray(roots).reshape(-1)
    gi_flat = np.asarray(gi).reshape(-1)
    got = np.full(n, -1, np.int64)
    got[gi_flat[gi_flat >= 0]] = roots[gi_flat >= 0]

    idx, _, mask = hash_graph.radius_graph(jnp.asarray(pts), jnp.asarray(pts), r, k)
    want = np.asarray(cc.connected_components_knn(idx, mask))

    # compare PARTITIONS (roots are representatives, not canonical ids)
    _, got_c = np.unique(got, return_inverse=True)
    _, want_c = np.unique(want, return_inverse=True)
    assert (got_c >= 0).all()
    pairs = set(zip(got_c.tolist(), want_c.tolist()))
    assert len(pairs) == len(set(got_c.tolist())) == len(set(want_c.tolist()))
    # the chain must be ONE component despite crossing ~7 slab boundaries
    chain_ids = np.arange(n - 160, n)
    assert len(set(got_c[chain_ids].tolist())) == 1


def test_cluster_proposal_sharded_matches_unsharded(rng):
    """End-to-end: ClusterProposal with NUM_SHARDS=8 must produce the same
    cluster partition as the single-device path (VERDICT r2 next #3)."""
    from pcseqlearning_tpu.preprocessing.cluster_proposal import ClusterProposal

    n_f, per = 4, 300
    pts = []
    for f in range(n_f):
        for cx in range(10):
            c = np.array([cx * 7.0, (cx % 3) * 5.0, 1.0])
            blob = c + rng.randn(per // 10, 3) * 0.2
            fr = np.full((per // 10, 1), f, np.float32)
            pts.append(np.concatenate([fr, blob.astype(np.float32)], 1))
    fxyz = np.concatenate(pts)
    seq = dict(point_fxyz=fxyz,
               point_sweep=fxyz[:, 0].astype(np.int64))

    cfg = dict(COMPONENT_KEYS=["cluster"], GRAPH=dict(RADIUS=[0.7], MAX_NUM_NEIGHBORS=16),
               CHUNK_FRAMES=2)
    out1 = ClusterProposal(dict(cfg))( dict(seq))["point_cluster"]
    out8 = ClusterProposal(dict(cfg, NUM_SHARDS=8))(dict(seq))["point_cluster"]

    # same partition up to relabeling
    pairs = set(zip(out1.tolist(), out8.tolist()))
    assert len(pairs) == len(set(out1.tolist())) == len(set(out8.tolist()))


def test_merge_results_dist_multirank_order_and_truncation(tmp_path, monkeypatch):
    """Multi-host eval-merge path (VERDICT r3 next #9): simulate 3 ranks
    writing their loader-shard results, verify rank 0 reassembles them in
    rank-strided dataset order and truncates the DistributedSampler padding
    (reference common_utils.py:354-377 semantics)."""
    from jax.experimental import multihost_utils

    from pcseqlearning_tpu.utils import dist_utils

    world = 3
    # dataset of 8 samples, rank-strided: rank r sees indices r, r+3, ...
    # (the eval sampler pads to world size -> rank 2 gets a pad duplicate)
    parts = {0: [0, 3, 6], 1: [1, 4, 7], 2: [2, 5, 7]}
    monkeypatch.setattr(multihost_utils, "sync_global_devices", lambda name: None)

    results = {}
    for rank in range(1, world):
        monkeypatch.setattr(dist_utils, "get_dist_info", lambda r=rank: (r, world))
        results[rank] = dist_utils.merge_results_dist(
            parts[rank], size=8, tmpdir=str(tmp_path))
        assert results[rank] is None  # non-zero ranks return None
    monkeypatch.setattr(dist_utils, "get_dist_info", lambda: (0, world))
    merged = dist_utils.merge_results_dist(parts[0], size=8, tmpdir=str(tmp_path))
    assert merged == [0, 1, 2, 3, 4, 5, 6, 7]


def test_all_gather_arrays_and_average_reduce_single_process():
    """Single-process fast paths of the collectives used by the eval loop."""
    import jax.numpy as jnp

    from pcseqlearning_tpu.utils import dist_utils

    tree = {"a": jnp.arange(4), "b": np.float32(2.5)}
    out = dist_utils.all_gather_arrays(tree)
    assert len(out) == 1
    np.testing.assert_array_equal(np.asarray(out[0]["a"]), np.arange(4))
    assert dist_utils.average_reduce_value(3.25) == 3.25


def test_eval_gather_inside_mesh():
    """In-SPMD eval-stat gather on the 8-device mesh: per-device partial
    sums psum-reduce to the global recall counts (the SPMD replacement for
    the reference's dist.all_reduce of eval meters)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("dp",))
    # 8 shards of per-sample tp counts
    tp = jnp.arange(32, dtype=jnp.float32)

    def gather_stats(x):
        local = jnp.sum(x)
        return jax.lax.psum(local, "dp")

    total = shard_map(gather_stats, mesh=mesh, in_specs=P("dp"), out_specs=P())(tp)
    assert float(total) == float(np.arange(32).sum())
