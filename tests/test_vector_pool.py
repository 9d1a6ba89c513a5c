"""Vector-pool aggregation (PV-RCNN++): local-voxel avg pooling vs a numpy
oracle, and a PVRCNNPlusPlus forward with the vector-pool PFE."""

import numpy as np
import jax
import jax.numpy as jnp


def test_vector_pool_bin_matches_numpy():
    from pcseqlearning_tpu.models.pfe import vector_pool_bin

    rng = np.random.RandomState(0)
    M, K, C = 5, 24, 4
    nx = ny = nz = 3
    d = 1.2
    rel = (rng.rand(M, K, 3) * 3.2 - 1.6).astype(np.float32)  # some outside
    feats = rng.rand(M, K, C).astype(np.float32)
    mask = rng.rand(M, K) > 0.2

    pooled, occ = vector_pool_bin(
        jnp.asarray(rel), jnp.asarray(feats), jnp.asarray(mask), (nx, ny, nz), d
    )
    pooled, occ = np.asarray(pooled), np.asarray(occ)

    V = nx * ny * nz
    cell_size = 2 * d / np.array([nx, ny, nz])
    for m in range(M):
        sums = np.zeros((V, 3 + C))
        cnts = np.zeros(V)
        for k in range(K):
            if not mask[m, k] or np.any(np.abs(rel[m, k]) >= d):
                continue
            cell = np.clip(((rel[m, k] + d) / cell_size).astype(int), 0, [nx - 1, ny - 1, nz - 1])
            v = (cell[0] * ny + cell[1]) * nz + cell[2]
            sums[v] += np.concatenate([rel[m, k], feats[m, k]])
            cnts[v] += 1
        want_occ = cnts > 0
        assert (occ[m] == want_occ).all()
        want = np.where(want_occ[:, None], sums / np.maximum(cnts, 1)[:, None], 0)
        assert np.allclose(pooled[m], want, atol=1e-5), m


def test_pvrcnn_plusplus_forward_uses_vector_pool():
    from pcseqlearning_tpu.models.detectors import build_detector
    from pcseqlearning_tpu.utils.edict import EDict

    model_cfg = EDict(
        NAME="PVRCNNPlusPlus",
        VFE={"NAME": "DynamicMeanVFE"},
        BACKBONE_3D={"NAME": "VoxelBackBone8x"},
        MAP_TO_BEV={"NAME": "HeightCompression"},
        BACKBONE_2D={"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1], "LAYER_STRIDES": [1],
                     "NUM_FILTERS": [32], "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [32]},
        PFE={"NUM_KEYPOINTS": 64},
        DENSE_HEAD={"NAME": "CenterHead", "FEATURE_MAP_STRIDE": 8},
        ROI_HEAD={"NAME": "PVRCNNHead", "NMS_POST_MAXSIZE": 16},
    )
    runtime_cfg = dict(
        data_cfg={"POINT_CLOUD_RANGE": [-6.4, -6.4, -1.0, 6.4, 6.4, 2.2],
                  "VOXEL_SIZE": [0.4, 0.4, 0.2]},
        class_names=["Vehicle"], voxel_cap=1024,
    )
    model = build_detector(model_cfg, runtime_cfg)
    # the PFE must have resolved to vector_pool for a PlusPlus model

    rng = np.random.RandomState(0)
    n = 512
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.randint(0, 2, n)
    pts[:, 1:3] = rng.rand(n, 2) * 12 - 6
    pts[:, 3] = rng.rand(n) * 2.5 - 0.8
    gt = np.zeros((2, 2, 8), np.float32)
    gt[:, 0] = [1.0, 1.0, 0.5, 1.8, 1.8, 1.2, 0.3, 1]
    batch = {"point_bxyz": jnp.asarray(pts),
             "point_feat": jnp.asarray(rng.rand(n, 1).astype(np.float32)),
             "batch_size": 2, "gt_boxes": jnp.asarray(gt)}
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = ["/".join(str(getattr(k, "key", k)) for k in p) for p, _ in flat]
    assert any("vp_" in n_ for n_ in names), "vector pool params missing"
    out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    assert np.isfinite(float(out["losses"]["total_loss"]))
