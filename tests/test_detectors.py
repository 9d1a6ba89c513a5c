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
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    out = model.apply(variables, batch, train=True, mutable=["batch_stats"])[0]
    losses = out["losses"]
    assert np.isfinite(float(losses["rpn_loss"]))
    assert float(losses["rpn_loss"]) > 0
    # grads flow
    def loss_fn(params):
        o = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"],
        )[0]
        return o["losses"]["rpn_loss"]

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_centerpoint_forward_and_loss(rng, runtime_cfg):
    model = build_detector(_centerpoint_cfg(), runtime_cfg)
    batch = _toy_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    out = model.apply(variables, batch, train=True, mutable=["batch_stats"])[0]
    losses = out["losses"]
    assert np.isfinite(float(losses["center_loss"]))
    # eval path decodes boxes
    out_eval = model.apply(variables, batch, train=False, mutable=False)
    preds = out_eval["center_preds"]
    assert preds["hm"].shape[-1] == 2
