import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcseqlearning_tpu.models.detectors import build_detector
from pcseqlearning_tpu.utils.edict import EDict


def _toy_batch(rng, n_points=512, batch=2):
    pts = np.zeros((n_points, 4), np.float32)
    pts[:, 0] = rng.randint(0, batch, n_points)
    pts[:, 1:3] = rng.rand(n_points, 2) * 6.0 - 3.0
    pts[:, 3] = rng.rand(n_points) * 1.5 - 0.5
    feat = rng.rand(n_points, 1).astype(np.float32)
    gt = np.zeros((batch, 5, 8), np.float32)
    gt[:, 0] = [1.0, 1.0, 0.5, 1.5, 1.5, 1.0, 0.3, 1]
    gt[:, 1] = [-1.0, -1.0, 0.5, 1.0, 1.0, 1.0, -0.3, 2]
    return {
        "point_bxyz": jnp.asarray(pts),
        "point_feat": jnp.asarray(feat),
        "gt_boxes": jnp.asarray(gt),
        "batch_size": batch,
    }


@pytest.fixture(scope="module")
def runtime_cfg():
    return dict(
        data_cfg={"POINT_CLOUD_RANGE": [-3.2, -3.2, -1.0, 3.2, 3.2, 2.2], "VOXEL_SIZE": [0.2, 0.2, 0.2]},
        class_names=["Vehicle", "Pedestrian"],
        voxel_cap=1024,
    )


def _second_cfg():
    return EDict(
        NAME="SECONDNet",
        VFE={"NAME": "DynamicMeanVFE"},
        BACKBONE_3D={"NAME": "VoxelBackBone8x"},
        MAP_TO_BEV={"NAME": "HeightCompression"},
        BACKBONE_2D={"NAME": "BaseBEVBackbone", "LAYER_NUMS": [2, 2], "LAYER_STRIDES": [1, 2],
                     "NUM_FILTERS": [32, 64], "UPSAMPLE_STRIDES": [1, 2], "NUM_UPSAMPLE_FILTERS": [32, 32]},
        DENSE_HEAD={
            "NAME": "AnchorHeadSingle",
            "FEATURE_MAP_STRIDE": 8,
            "ANCHOR_GENERATOR_CONFIG": [
                {"anchor_sizes": [[1.6, 1.6, 1.0]], "anchor_rotations": [0, 1.57],
                 "anchor_bottom_heights": [0.0], "matched_threshold": 0.4, "unmatched_threshold": 0.2},
                {"anchor_sizes": [[0.8, 0.8, 1.0]], "anchor_rotations": [0, 1.57],
                 "anchor_bottom_heights": [0.0], "matched_threshold": 0.3, "unmatched_threshold": 0.15},
            ],
        },
    )


def _centerpoint_cfg():
    return EDict(
        NAME="CenterPoint",
        VFE={"NAME": "DynamicMeanVFE"},
        BACKBONE_3D={"NAME": "VoxelBackBone8x"},
        MAP_TO_BEV={"NAME": "HeightCompression"},
        BACKBONE_2D={"NAME": "BaseBEVBackbone", "LAYER_NUMS": [2, 2], "LAYER_STRIDES": [1, 2],
                     "NUM_FILTERS": [32, 64], "UPSAMPLE_STRIDES": [1, 2], "NUM_UPSAMPLE_FILTERS": [32, 32]},
        DENSE_HEAD={"NAME": "CenterHead", "FEATURE_MAP_STRIDE": 8},
    )


def test_second_forward_and_loss(rng, runtime_cfg):
    model = build_detector(_second_cfg(), runtime_cfg)
    batch = _toy_batch(rng)
    init_arrs = {k: v for k, v in batch.items() if k != "batch_size"}
    variables = jax.jit(
        lambda key, a: model.init(key, {**a, "batch_size": 2}, train=True)
    )(jax.random.PRNGKey(0), init_arrs)

    arrs = {k: v for k, v in batch.items() if k != "batch_size"}

    @jax.jit
    def fwd_and_grad(params, batch_stats, arrs):
        def loss_fn(p):
            o = model.apply(
                {"params": p, "batch_stats": batch_stats}, {**arrs, "batch_size": 2},
                train=True, mutable=["batch_stats"],
            )[0]
            return o["losses"]["rpn_loss"], o["losses"]

        (loss, losses), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, losses, g

    loss, losses, g = fwd_and_grad(variables["params"], variables["batch_stats"], arrs)
    assert np.isfinite(float(loss))
    assert float(loss) > 0
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_centerpoint_forward_and_loss(rng, runtime_cfg):
    model = build_detector(_centerpoint_cfg(), runtime_cfg)
    batch = _toy_batch(rng)
    init_arrs = {k: v for k, v in batch.items() if k != "batch_size"}
    variables = jax.jit(
        lambda key, a: model.init(key, {**a, "batch_size": 2}, train=True)
    )(jax.random.PRNGKey(0), init_arrs)

    arrs = {k: v for k, v in batch.items() if k != "batch_size"}

    @jax.jit
    def fwd_train(v, arrs):
        out = model.apply(v, {**arrs, "batch_size": 2}, train=True, mutable=["batch_stats"])[0]
        return out["losses"]

    losses = fwd_train(variables, arrs)
    assert np.isfinite(float(losses["center_loss"]))

    @jax.jit
    def fwd_eval(v, arrs):
        out = model.apply(v, {**arrs, "batch_size": 2}, train=False, mutable=False)
        return out["center_preds"]["hm"]

    hm = fwd_eval(variables, arrs)
    assert hm.shape[-1] == 2


def test_pvrcnn_two_stage(rng, runtime_cfg):
    cfg = _second_cfg()
    cfg.NAME = "PVRCNN"
    cfg.PFE = {"NAME": "VoxelSetAbstraction", "NUM_KEYPOINTS": 64}
    cfg.ROI_HEAD = {"NAME": "PVRCNNHead", "GRID_SIZE": 3, "NMS_POST_MAXSIZE": 16}
    model = build_detector(cfg, runtime_cfg)
    batch = _toy_batch(rng)
    init_arrs = {k: v for k, v in batch.items() if k != "batch_size"}
    variables = jax.jit(
        lambda key, a: model.init(key, {**a, "batch_size": 2}, train=True)
    )(jax.random.PRNGKey(0), init_arrs)

    @jax.jit
    def fwd(v, arrs):
        out = model.apply(v, {**arrs, "batch_size": 2}, train=True, mutable=["batch_stats"])[0]
        return out["losses"]

    losses = fwd(variables, init_arrs)
    for k in ("rpn_loss", "rcnn_loss_cls", "rcnn_loss_reg", "total_loss"):
        assert k in losses and np.isfinite(float(losses[k])), k


def test_secondnet_iou(rng, runtime_cfg):
    cfg = _second_cfg()
    cfg.NAME = "SECONDNetIoU"
    model = build_detector(cfg, runtime_cfg)
    batch = _toy_batch(rng)
    init_arrs = {k: v for k, v in batch.items() if k != "batch_size"}
    variables = jax.jit(
        lambda key, a: model.init(key, {**a, "batch_size": 2}, train=True)
    )(jax.random.PRNGKey(0), init_arrs)

    @jax.jit
    def fwd(v, arrs):
        out = model.apply(v, {**arrs, "batch_size": 2}, train=True, mutable=["batch_stats"])[0]
        return out["losses"], out["iou_preds"]

    losses, iou_preds = fwd(variables, init_arrs)
    assert "rpn_loss_iou" in losses and np.isfinite(float(losses["rpn_loss_iou"]))
    assert iou_preds.ndim == 4


def test_predict_method_all_head_types(rng):
    """model.apply(..., method='predict') must decode normalized
    per-sample predictions for centerpoint, anchor, and two-stage heads
    (the tools/test.py eval path)."""
    import jax
    import jax.numpy as jnp
    from pcseqlearning_tpu.models.detectors import build_detector
    from pcseqlearning_tpu.utils.edict import EDict

    runtime_cfg = dict(
        data_cfg={"POINT_CLOUD_RANGE": [-6.4, -6.4, -1.0, 6.4, 6.4, 2.2],
                  "VOXEL_SIZE": [0.4, 0.4, 0.2]},
        class_names=["Vehicle"], voxel_cap=1024,
    )
    n = 256
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.randint(0, 2, n)
    pts[:, 1:3] = rng.rand(n, 2) * 12 - 6
    pts[:, 3] = rng.rand(n) * 2.5 - 0.8
    batch = {"point_bxyz": jnp.asarray(pts),
             "point_feat": jnp.asarray(rng.rand(n, 1).astype(np.float32)),
             "batch_size": 2,
             "gt_boxes": jnp.zeros((2, 1, 8))}

    cfgs = [
        EDict(NAME="CenterPoint", VFE={"NAME": "DynamicMeanVFE"},
              BACKBONE_3D={"NAME": "VoxelBackBone8x"},
              MAP_TO_BEV={"NAME": "HeightCompression"},
              BACKBONE_2D={"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1], "LAYER_STRIDES": [1],
                           "NUM_FILTERS": [16], "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [16]},
              DENSE_HEAD={"NAME": "CenterHead", "FEATURE_MAP_STRIDE": 8}),
        EDict(NAME="SECONDNet", VFE={"NAME": "DynamicMeanVFE"},
              BACKBONE_3D={"NAME": "VoxelBackBone8x"},
              MAP_TO_BEV={"NAME": "HeightCompression"},
              BACKBONE_2D={"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1], "LAYER_STRIDES": [1],
                           "NUM_FILTERS": [16], "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [16]},
              DENSE_HEAD={"NAME": "AnchorHeadSingle", "FEATURE_MAP_STRIDE": 8,
                          "ANCHOR_GENERATOR_CONFIG": [
                              {"anchor_sizes": [[4.2, 2.0, 1.6]], "anchor_rotations": [0, 1.57],
                               "anchor_bottom_heights": [0.0],
                               "matched_threshold": 0.55, "unmatched_threshold": 0.4}]}),
    ]
    for cfg in cfgs:
        model = build_detector(cfg, runtime_cfg)
        v = model.init(jax.random.PRNGKey(0), dict(batch), train=False)
        out, boxes, scores, labels, valid = model.apply(v, dict(batch), method="predict")
        assert boxes.shape[0] == 2 and boxes.shape[-1] == 7
        assert scores.shape == boxes.shape[:2] == labels.shape == valid.shape
        assert np.isfinite(np.asarray(boxes)).all()
