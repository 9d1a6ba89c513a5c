import jax.numpy as jnp
import numpy as np

from pcseqlearning_tpu.models import graph_utils as gu
from pcseqlearning_tpu.models.model_nms_utils import class_agnostic_nms, multi_classes_nms
from pcseqlearning_tpu.ops.primitives import primitive_fitting


def test_radius_graph_registry(rng):
    g = gu.build_graph({"TYPE": "RadiusGraph", "RADIUS": 0.5, "MAX_NUM_NEIGHBORS": 8,
                        "SORT_BY_DIST": True, "RELATIVE_KEY": "fxyz"})
    pts = rng.rand(100, 4).astype(np.float32)
    pts[:, 0] = 0
    d = {"fxyz": jnp.asarray(pts)}
    e_ref, e_query, w, mask = g(d, d)
    assert w is None
    e_ref, mask = np.asarray(e_ref), np.asarray(mask)
    # every valid edge within radius
    for r, q in zip(e_ref[mask], np.asarray(e_query)[mask]):
        assert np.linalg.norm(pts[r] - pts[q]) <= 0.5 + 1e-4


def test_knn_graph_registry(rng):
    g = gu.build_graph({"TYPE": "KNNGraphV2", "NUM_NEIGHBORS": 4, "RELATIVE_KEY": "bxyz"})
    pts = rng.rand(50, 4).astype(np.float32)
    pts[:, 0] = 0
    d = {"bxyz": jnp.asarray(pts)}
    e_ref, e_query, w, mask = g(d, d)
    assert np.asarray(mask).sum() == 50 * 4
    assert np.isfinite(np.asarray(w)[np.asarray(mask)]).all()


def test_connected_components_registry(rng):
    e_src = jnp.asarray(np.array([0, 1, 3], np.int32))
    e_dst = jnp.asarray(np.array([1, 2, 4], np.int32))
    num, comp = gu.connected_components(e_src, e_dst, 6)
    comp = np.asarray(comp)
    assert int(num) == 3  # {0,1,2}, {3,4}, {5}
    assert comp[0] == comp[1] == comp[2]
    assert comp[3] == comp[4] != comp[0]


def test_class_agnostic_nms():
    boxes = jnp.asarray(np.array([
        [0, 0, 0, 2, 2, 2, 0], [0.1, 0, 0, 2, 2, 2, 0], [8, 8, 0, 2, 2, 2, 0],
    ], np.float32))
    scores = jnp.asarray(np.array([0.9, 0.85, 0.3], np.float32))
    s, b, v = class_agnostic_nms(scores, boxes, {"NMS_THRESH": 0.5, "NMS_POST_MAXSIZE": 3},
                                 score_thresh=0.2)
    v = np.asarray(v)
    assert v.sum() == 2  # one of the overlapping pair suppressed


def test_multi_class_nms():
    boxes = jnp.asarray(np.array([[0, 0, 0, 2, 2, 2, 0], [8, 8, 0, 2, 2, 2, 0]], np.float32))
    cls_scores = jnp.asarray(np.array([[0.9, 0.1], [0.2, 0.8]], np.float32))
    s, l, b, v = multi_classes_nms(cls_scores, boxes, {"NMS_THRESH": 0.5, "NMS_POST_MAXSIZE": 2},
                                   score_thresh=0.5)
    l, v = np.asarray(l), np.asarray(v)
    assert set(l[v].tolist()) == {1, 2}


def test_primitive_fitting_plane(rng):
    # points on a tilted plane + noise: normal must be recovered
    n = 500
    xy = rng.rand(n, 2).astype(np.float32) * 2
    z = 0.3 * xy[:, 0] - 0.2 * xy[:, 1] + rng.randn(n).astype(np.float32) * 0.01
    pts = np.concatenate([np.zeros((n, 1), np.float32), xy, z[:, None]], axis=1)
    out = primitive_fitting(jnp.asarray(pts), jnp.ones(n, bool), [4.0, 4.0, 4.0], 8)
    normals = np.asarray(out["normals"])
    valid = np.asarray(out["valid"])
    true_n = np.array([-0.3, 0.2, 1.0])
    true_n /= np.linalg.norm(true_n)
    got = normals[valid][0]
    assert abs(abs(got @ true_n) - 1) < 1e-2


def test_gd_solver_component_registration():
    import jax.numpy as jnp
    from pcseqlearning_tpu.preprocessing.solver_utils import gd_register_components

    rng = np.random.RandomState(0)
    src = rng.rand(128, 3).astype(np.float32) * 2
    t = np.array([0.3, -0.2, 0.0], np.float32)
    dst = src + t
    T, l1, ratio = gd_register_components(
        jnp.asarray(src), jnp.zeros(128, jnp.int32), jnp.ones(128, bool),
        jnp.asarray(dst), jnp.ones(128, bool), 1, jnp.asarray(1.0, jnp.float32),
        rigid_weight=10.0, num_iters=400, num_rounds=8,
    )
    T = np.asarray(T)[0]
    # the velocity-field solver contracts toward the offset through NN
    # refresh rounds (per-round NN bias on dense random clouds)
    assert np.abs(T[:3, 3] - t).max() < 0.1, T[:3, 3]
    assert np.abs(T[:3, :3] - np.eye(3)).max() < 0.05
