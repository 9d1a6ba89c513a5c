"""CaDDN (ImageVFE camera path) and PVRCNNPlusPlusCoTrain forwards."""

import numpy as np
import jax
import jax.numpy as jnp


def test_caddn_forward():
    from pcseqlearning_tpu.models.detectors import build_detector
    from pcseqlearning_tpu.utils.edict import EDict

    rng = np.random.RandomState(0)
    model_cfg = EDict(
        NAME="CaDDN",
        VFE={"NAME": "ImageVFE"},
        MAP_TO_BEV={"NAME": "PointPillarScatter"},
        BACKBONE_2D={"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1], "LAYER_STRIDES": [1],
                     "NUM_FILTERS": [16], "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [16]},
        DENSE_HEAD={"NAME": "CenterHead", "FEATURE_MAP_STRIDE": 1},
    )
    runtime_cfg = dict(
        data_cfg={"POINT_CLOUD_RANGE": [-3.2, -3.2, -0.8, 3.2, 3.2, 0.8],
                  "VOXEL_SIZE": [0.4, 0.4, 0.4]},
        class_names=["Vehicle"], voxel_cap=2048,
    )
    model = build_detector(model_cfg, runtime_cfg)
    B = 2
    K = np.broadcast_to(np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]], np.float32), (B, 3, 3))
    T = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4))
    gt = np.zeros((B, 2, 8), np.float32)
    gt[:, 0] = [1.0, 1.0, 0.1, 1.5, 1.5, 0.8, 0.3, 1]
    batch = {
        "images": jnp.asarray(rng.rand(B, 48, 64, 3).astype(np.float32)),
        "calib_K": jnp.asarray(K), "calib_T": jnp.asarray(T),
        "point_bxyz": jnp.zeros((1, 4)),  # unused by the camera path
        "point_feat": jnp.zeros((1, 1)),
        "batch_size": B, "gt_boxes": jnp.asarray(gt),
    }
    v = model.init(jax.random.PRNGKey(0), batch, train=True)
    out, _ = model.apply(v, batch, train=True, mutable=["batch_stats"])
    assert np.isfinite(float(out["losses"]["center_loss"]))


def test_pvrcnn_plusplus_cotrain_forward():
    from pcseqlearning_tpu.models.detectors import build_detector
    from pcseqlearning_tpu.utils.edict import EDict

    rng = np.random.RandomState(0)
    model_cfg = EDict(
        NAME="PVRCNNPlusPlusCoTrain",
        VFE={"NAME": "DynamicMeanVFE"},
        BACKBONE_3D={"NAME": "VoxelBackBone8x"},
        MAP_TO_BEV={"NAME": "HeightCompression"},
        BACKBONE_2D={"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1], "LAYER_STRIDES": [1],
                     "NUM_FILTERS": [16], "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [16]},
        PFE={"NUM_KEYPOINTS": 32},
        DENSE_HEAD={"NAME": "CenterHead", "FEATURE_MAP_STRIDE": 8},
        ROI_HEAD={"NAME": "PVRCNNHead", "NMS_POST_MAXSIZE": 8},
    )
    runtime_cfg = dict(
        data_cfg={"POINT_CLOUD_RANGE": [-6.4, -6.4, -1.0, 6.4, 6.4, 2.2],
                  "VOXEL_SIZE": [0.4, 0.4, 0.2]},
        class_names=["Vehicle"], voxel_cap=1024,
    )
    model = build_detector(model_cfg, runtime_cfg)
    n = 256
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.randint(0, 2, n)
    pts[:, 1:3] = rng.rand(n, 2) * 12 - 6
    pts[:, 3] = rng.rand(n) * 2.5 - 0.8
    gt = np.zeros((2, 2, 8), np.float32)
    gt[:, 0] = [1.0, 1.0, 0.5, 1.8, 1.8, 1.2, 0.3, 1]
    batch = {"point_bxyz": jnp.asarray(pts),
             "point_feat": jnp.asarray(rng.rand(n, 1).astype(np.float32)),
             "batch_size": 2, "gt_boxes": jnp.asarray(gt)}
    v = model.init(jax.random.PRNGKey(0), batch, train=True)
    out, _ = model.apply(v, batch, train=True, mutable=["batch_stats"])
    losses = out["losses"]
    assert "seg_loss" in losses and np.isfinite(float(losses["seg_loss"]))
    assert np.isfinite(float(losses["total_loss"]))
