import jax.numpy as jnp
import numpy as np

from pcseqlearning_tpu.ops import roi_pool
from pcseqlearning_tpu.models import roi_heads as rh


def test_roiaware_pool_occupancy(rng):
    # one axis-aligned roi at origin; points in known cells
    rois = jnp.asarray(np.array([[0, 0, 0, 2, 2, 2, 0.0]], np.float32))
    pts = np.array([
        [-0.9, -0.9, -0.9],   # cell (0,0,0) for grid 2
        [0.9, 0.9, 0.9],      # cell (1,1,1)
        [5.0, 5.0, 5.0],      # outside
    ], np.float32)
    feats = np.array([[1.0], [2.0], [3.0]], np.float32)
    pooled, occ = roi_pool.roiaware_pool3d(jnp.asarray(pts), jnp.asarray(feats), rois, grid_size=2)
    occ = np.asarray(occ)[0]
    pooled = np.asarray(pooled)[0]
    assert occ[0, 0, 0] and occ[1, 1, 1]
    assert occ.sum() == 2
    assert pooled[0, 0, 0, 0] == 1.0 and pooled[1, 1, 1, 0] == 2.0


def test_roiaware_pool_rotated(rng):
    # rotated box: point on rotated x-axis must land inside
    th = np.pi / 4
    rois = jnp.asarray(np.array([[0, 0, 0, 4, 1, 2, th]], np.float32))
    p_in = np.array([[np.cos(th) * 1.5, np.sin(th) * 1.5, 0.0]], np.float32)
    p_out = np.array([[1.5, 0.0, 0.0]], np.float32)  # outside the thin rotated box
    for p, expect in [(p_in, True), (p_out, False)]:
        _, occ = roi_pool.roiaware_pool3d(
            jnp.asarray(p), jnp.ones((1, 1), jnp.float32), rois, grid_size=4
        )
        assert bool(np.asarray(occ).any()) == expect


def test_roipoint_pool(rng):
    rois = jnp.asarray(np.array([[0, 0, 0, 2, 2, 2, 0.0], [10, 10, 10, 1, 1, 1, 0.0]], np.float32))
    pts = rng.rand(50, 3).astype(np.float32) * 1.6 - 0.8  # all inside roi 0
    pooled, empty = roi_pool.roipoint_pool3d(
        jnp.asarray(pts), jnp.asarray(np.ones((50, 2), np.float32)), rois, num_sampled=16
    )
    empty = np.asarray(empty)
    assert not empty[0] and empty[1]
    assert np.abs(np.asarray(pooled)[1]).max() == 0.0


def test_roi_grid_points_inside():
    rois = jnp.asarray(np.array([[5, 3, 1, 4, 2, 2, 0.7]], np.float32))
    pts = np.asarray(roi_pool.roi_grid_points(rois, 4))[0]
    # all grid points strictly inside the box
    from pcseqlearning_tpu.ops.boxes import points_in_boxes

    inside = np.asarray(points_in_boxes(jnp.asarray(pts), rois))
    assert inside.all()


def test_proposal_and_target_assignment(rng):
    gt = jnp.asarray(np.array([[0, 0, 0, 4, 2, 1.6, 0.0]], np.float32))
    # candidates: one near-perfect, one shifted, one far
    cands = jnp.asarray(np.array([
        [0.1, 0, 0, 4, 2, 1.6, 0.0],
        [1.5, 0.5, 0, 4, 2, 1.6, 0.3],
        [20, 20, 0, 4, 2, 1.6, 0.0],
    ], np.float32))
    scores = jnp.asarray(np.array([0.9, 0.8, 0.7], np.float32))
    rois, roi_scores, roi_valid = rh.proposal_layer(cands, scores, num_rois=3, nms_thresh=0.55)
    cls_t, reg_t, fg, best, arg = rh.assign_roi_targets(
        rois, roi_valid, gt, jnp.asarray([1]), jnp.asarray([True]),
    )
    cls_t, fg, best = map(np.asarray, (cls_t, fg, best))
    order = np.argsort(-np.asarray(roi_scores))
    assert best.max() > 0.8  # the near-perfect roi
    assert fg[np.argmax(best)]
    # far roi must be background
    far = np.asarray(rois)[:, 0] > 10
    assert not fg[far].any()
    assert (cls_t[far] == 0).all()

    # decode of the reg target must reproduce the GT box
    dec = np.asarray(rh.decode_roi_boxes(rois, reg_t))
    i = int(np.argmax(best))
    np.testing.assert_allclose(dec[i], np.asarray(gt)[0], atol=1e-3)


def test_roi_head_loss_finite(rng):
    r = 8
    cls_p = jnp.asarray(rng.randn(r).astype(np.float32))
    reg_p = jnp.asarray(rng.randn(r, 7).astype(np.float32))
    cls_t = jnp.asarray(rng.rand(r).astype(np.float32))
    reg_t = jnp.asarray(rng.randn(r, 7).astype(np.float32))
    fg = jnp.asarray(rng.rand(r) > 0.5)
    valid = jnp.ones(r, bool)
    cl, rl = rh.roi_head_loss(cls_p, reg_p, cls_t, reg_t, fg, valid)
    assert np.isfinite(float(cl)) and np.isfinite(float(rl))
