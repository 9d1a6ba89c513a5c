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
