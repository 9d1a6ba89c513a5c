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


def test_lid_binning_matches_reference_formula():
    """LID discretization must match the reference bin_depths math
    (transform_utils.py:bin_depths mode='LID') including target semantics."""
    from pcseqlearning_tpu.models.vfe import bin_depths_lid

    dmin, dmax, D = 2.0, 46.8, 8
    bin_size = 2 * (dmax - dmin) / (D * (1 + D))
    depths = np.array([2.0, 3.0, 10.0, 46.79, 60.0, 0.0, -1.0], np.float32)
    want = -0.5 + 0.5 * np.sqrt(1 + 8 * (depths - dmin) / bin_size)
    got = np.asarray(bin_depths_lid(jnp.asarray(depths), dmin, dmax, D))
    np.testing.assert_allclose(got[:4], want[:4], atol=1e-4)
    tgt = np.asarray(bin_depths_lid(jnp.asarray(depths), dmin, dmax, D, target=True))
    assert tgt[0] == 0                      # exactly at min depth
    assert tgt[3] == D - 1                  # just inside max depth
    assert tgt[4] == D and tgt[5] == D and tgt[6] == D  # out of range -> overflow


def test_frustum_sampling_matches_materialized_volume(rng=np.random.RandomState(3)):
    """The gather-based trilinear sampler must equal grid-sampling the
    MATERIALIZED frustum volume prob ⊗ feat (reference sampler.py)."""
    from pcseqlearning_tpu.models.vfe import bin_depths_lid, frustum_sample_voxels

    h, w, D, C, H, W = 6, 8, 5, 3, 24, 32
    feat = rng.rand(h, w, C).astype(np.float32)
    prob = rng.rand(h, w, D).astype(np.float32)
    K = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]], np.float32)
    T = np.eye(4, dtype=np.float32)
    centers = np.stack([
        rng.rand(200) * 4 - 2, rng.rand(200) * 3 - 1.5, rng.rand(200) * 40 + 1,
    ], 1).astype(np.float32)  # z = camera depth (identity T)
    dmin, dmax = 2.0, 40.0

    got = np.asarray(frustum_sample_voxels(
        jnp.asarray(feat), jnp.asarray(prob), jnp.asarray(K), jnp.asarray(T),
        jnp.asarray(centers), (H, W), dmin, dmax, D))

    vol = prob[:, :, :, None] * feat[:, :, None, :]  # [h, w, D, C]
    for i in range(0, 200, 11):
        cx, cy, cz = centers[i]
        u = (K[0, 0] * cx + K[0, 2] * cz) / cz * (w / W)
        v = (K[1, 1] * cy + K[1, 2] * cz) / cz * (h / H)
        d = float(np.asarray(bin_depths_lid(jnp.asarray(cz), dmin, dmax, D)))
        if not (0 <= u < w - 1 and 0 <= v < h - 1 and -1 < d < D):
            np.testing.assert_allclose(got[i], 0.0)
            continue
        u0, v0, d0 = int(u), int(v), int(np.floor(d))
        wu, wv, wd = u - u0, v - v0, d - d0
        want = np.zeros(C)
        for dv, wv_ in ((v0, 1 - wv), (v0 + 1, wv)):
            for du, wu_ in ((u0, 1 - wu), (u0 + 1, wu)):
                for dd, wd_ in ((d0, 1 - wd), (d0 + 1, wd)):
                    if 0 <= dd < D:  # zero padding beyond depth range
                        want += wv_ * wu_ * wd_ * vol[dv, du, dd]
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_caddn_depth_loss_trains_and_calib_matters():
    """VERDICT r2 #8 done-criterion: the depth loss trains (gradient
    reaches the depth head) and voxel features vary with calib."""
    from pcseqlearning_tpu.models.vfe import ImageVFE

    rng = np.random.RandomState(0)
    vfe = ImageVFE(voxel_size=[0.4, 0.4, 0.4],
                   point_cloud_range=[0.0, -3.2, -0.8, 6.4, 3.2, 0.8],
                   voxel_cap=2048, depth_bins=8, min_depth=0.5, max_depth=8.0)
    B, H, W = 1, 32, 48
    # standard lidar->cam: x_fwd -> z_depth, -y -> u, -z -> v
    T = np.zeros((B, 4, 4), np.float32)
    T[:, 0, 1] = -1; T[:, 1, 2] = -1; T[:, 2, 0] = 1; T[:, 3, 3] = 1
    pts = np.zeros((64, 4), np.float32)
    pts[:, 1] = rng.rand(64) * 5 + 1      # forward = camera depth
    pts[:, 2:4] = rng.rand(64, 2) * 2 - 1
    K = np.broadcast_to(np.array([[40.0, 0, 24], [0, 40.0, 16], [0, 0, 1]], np.float32), (B, 3, 3))
    batch = {
        "images": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "calib_K": jnp.asarray(K.copy()),
        "calib_T": jnp.asarray(T),
        "point_bxyz": jnp.asarray(pts),
        "gt_boxes2d": jnp.asarray(np.array([[[8.0, 8.0, 30.0, 24.0]]], np.float32)),
        "batch_size": B,
    }
    v = vfe.init(jax.random.PRNGKey(0), batch, train=True)

    def loss_fn(params):
        out, _ = vfe.apply({"params": params, "batch_stats": v["batch_stats"]},
                           dict(batch), train=True, mutable=["batch_stats"])
        return vfe.depth_loss(out)

    loss, grads = jax.value_and_grad(loss_fn)(v["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    gdepth = np.abs(np.asarray(grads["depth"]["kernel"])).sum()
    assert gdepth > 0, "depth head receives no gradient"

    out1, _ = vfe.apply(v, dict(batch), train=False, mutable=["batch_stats"])
    T2 = T.copy()
    T2[:, 2, 3] = 0.8  # shift camera along depth
    out2, _ = vfe.apply(v, dict(batch, calib_T=jnp.asarray(T2)), train=False,
                        mutable=["batch_stats"])
    d = float(np.abs(np.asarray(out1["voxel_features"])
                     - np.asarray(out2["voxel_features"])).max())
    assert d > 1e-5, "voxel features do not vary with calib"


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
