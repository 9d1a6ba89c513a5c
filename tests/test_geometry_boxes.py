import jax.numpy as jnp
import numpy as np

from pcseqlearning_tpu.ops import boxes as bx
from pcseqlearning_tpu.ops import geometry as geo
from pcseqlearning_tpu.ops import sampling as smp


def _random_spd(rng, n):
    A = rng.randn(n, 3, 3).astype(np.float32)
    return A @ A.transpose(0, 2, 1)


def test_eigh3x3_vs_numpy(rng):
    A = _random_spd(rng, 64)
    vals, vecs = geo.eigh3x3(jnp.asarray(A))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    ref_vals = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(vals, ref_vals, rtol=1e-3, atol=1e-4)
    # residual check A v = lambda v
    for i in range(64):
        for j in range(3):
            r = A[i] @ vecs[i][:, j] - vals[i, j] * vecs[i][:, j]
            assert np.linalg.norm(r) < 1e-2 * max(np.linalg.norm(A[i]), 1.0)
    # orthonormal
    VtV = vecs.transpose(0, 2, 1) @ vecs
    np.testing.assert_allclose(VtV, np.eye(3)[None].repeat(64, 0), atol=1e-4)


def test_eigh3x3_degenerate():
    # isotropic, planar-degenerate, and rank-1 matrices
    mats = np.stack([
        np.eye(3, dtype=np.float32) * 2.0,
        np.diag([1.0, 1.0, 5.0]).astype(np.float32),
        np.diag([0.0, 0.0, 3.0]).astype(np.float32),
        np.zeros((3, 3), np.float32),
    ])
    vals, vecs = geo.eigh3x3(jnp.asarray(mats))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    ref = np.linalg.eigvalsh(mats)
    np.testing.assert_allclose(vals, ref, atol=1e-5)
    VtV = vecs.transpose(0, 2, 1) @ vecs
    np.testing.assert_allclose(VtV, np.eye(3)[None].repeat(4, 0), atol=1e-5)


def _rand_rotations(rng, n):
    out = []
    for _ in range(n):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        out.append(np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]))
    return np.stack(out).astype(np.float32)


def test_procrustes_recovers_rotation(rng):
    """R_true applied to points; covariance sum p q^T must recover R."""
    Rt = _rand_rotations(rng, 16)
    P = rng.randn(16, 50, 3).astype(np.float32)
    Q = np.einsum("bij,bnj->bni", Rt, P)
    M = np.einsum("bni,bnj->bij", P, Q)  # sum p q^T, like reference H = P Q^T
    R = np.asarray(geo.procrustes_rotation(jnp.asarray(M)))
    # reference solves R = V sign U^T from svd(cov); q = R p means
    # tr(R^T M^T)... verify against numpy SVD directly:
    for i in range(16):
        U, S, VT = np.linalg.svd(M[i])
        V = VT.T
        sign = np.ones(3)
        sign[-1] = np.sign(np.linalg.det(V @ U.T))
        R_ref = V @ np.diag(sign) @ U.T
        np.testing.assert_allclose(R[i].T, R_ref, atol=1e-4)
        np.testing.assert_allclose(R[i].T, Rt[i], atol=1e-4)
        assert abs(np.linalg.det(R[i]) - 1.0) < 1e-4


def test_procrustes_planar(rng):
    """Rank-2 covariance (planar component) must still give a proper rotation."""
    Rt = _rand_rotations(rng, 8)
    P = rng.randn(8, 40, 3).astype(np.float32)
    P[:, :, 2] = 0.0  # planar
    Q = np.einsum("bij,bnj->bni", Rt, P)
    M = np.einsum("bni,bnj->bij", P, Q)
    R = np.asarray(geo.procrustes_rotation(jnp.asarray(M)))
    for i in range(8):
        assert abs(np.linalg.det(R[i]) - 1.0) < 1e-4
        # recovered rotation must map P to Q exactly on the plane
        err = np.abs(np.einsum("ij,nj->ni", R[i].T, P[i]) - Q[i]).max()
        assert err < 1e-2


def test_rigid_helpers():
    R = np.eye(3, dtype=np.float32)
    t = np.array([1.0, 2.0, 3.0], np.float32)
    T = geo.make_rigid(jnp.asarray(R), jnp.asarray(t))
    Ti = geo.rigid_inverse(T)
    np.testing.assert_allclose(np.asarray(T @ Ti), np.eye(4), atol=1e-6)
    p = jnp.asarray(np.array([1.0, 1.0, 1.0], np.float32))
    np.testing.assert_allclose(np.asarray(geo.apply_rigid(T, p)), [2, 3, 4], atol=1e-6)


def test_points_in_boxes_vs_oracle(rng):
    boxes = np.array([
        [0, 0, 0, 2, 1, 1, 0.0],
        [5, 5, 0, 4, 2, 2, np.pi / 4],
    ], np.float32)
    pts = (rng.rand(500, 3).astype(np.float32) - 0.5) * 16
    got = np.asarray(bx.points_in_boxes(jnp.asarray(pts), jnp.asarray(boxes)))
    for j, b in enumerate(boxes):
        d = pts - b[:3]
        c, s = np.cos(-b[6]), np.sin(-b[6])
        lx = d[:, 0] * c - d[:, 1] * s
        ly = d[:, 0] * s + d[:, 1] * c
        ref = (np.abs(d[:, 2]) <= b[5] / 2) & (np.abs(lx) < b[3] / 2 + 1e-2) & (np.abs(ly) < b[4] / 2 + 1e-2)
        np.testing.assert_array_equal(got[j], ref)


def test_bev_iou_axis_aligned():
    a = jnp.asarray(np.array([[0, 0, 0, 2, 2, 2, 0]], np.float32))
    b = jnp.asarray(np.array([[1, 0, 0, 2, 2, 2, 0]], np.float32))
    iou = float(np.asarray(bx.boxes_iou_bev(a, b))[0, 0])
    # overlap 1x2=2, union 4+4-2=6
    assert abs(iou - 2.0 / 6.0) < 1e-4


def test_bev_iou_rotated_oracle(rng):
    try:
        from shapely.geometry import Polygon  # optional oracle
    except ImportError:
        Polygon = None
    boxes_a = np.zeros((10, 7), np.float32)
    boxes_b = np.zeros((10, 7), np.float32)
    boxes_a[:, 0:2] = rng.rand(10, 2) * 2
    boxes_b[:, 0:2] = rng.rand(10, 2) * 2
    boxes_a[:, 3:5] = rng.rand(10, 2) * 2 + 0.5
    boxes_b[:, 3:5] = rng.rand(10, 2) * 2 + 0.5
    boxes_a[:, 5] = boxes_b[:, 5] = 1
    boxes_a[:, 6] = rng.rand(10) * np.pi
    boxes_b[:, 6] = rng.rand(10) * np.pi
    ov = np.asarray(bx.boxes_overlap_bev(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    corners_a = np.asarray(bx._bev_corners(jnp.asarray(boxes_a)))
    corners_b = np.asarray(bx._bev_corners(jnp.asarray(boxes_b)))
    if Polygon is not None:
        for i in range(10):
            for j in range(10):
                ref = Polygon(corners_a[i]).intersection(Polygon(corners_b[j])).area
                assert abs(ov[i, j] - ref) < 1e-3, (i, j)
    else:
        # self-overlap sanity: full area
        ov_self = np.asarray(bx.boxes_overlap_bev(jnp.asarray(boxes_a), jnp.asarray(boxes_a)))
        np.testing.assert_allclose(np.diag(ov_self), boxes_a[:, 3] * boxes_a[:, 4], rtol=1e-4)


def test_nms_suppresses_overlaps():
    boxes = np.array([
        [0, 0, 0, 2, 2, 2, 0],
        [0.1, 0, 0, 2, 2, 2, 0],   # heavy overlap with box 0
        [10, 10, 0, 2, 2, 2, 0.3],
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = np.asarray(bx.nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    assert keep.tolist() == [True, False, True]


def test_fps_spread(rng):
    pts = rng.rand(256, 3).astype(np.float32)
    idx = np.asarray(smp.farthest_point_sample(jnp.asarray(pts), 16))
    assert len(set(idx.tolist())) == 16
    # FPS picks should be farther apart than random picks on average
    d_fps = np.linalg.norm(pts[idx][:, None] - pts[idx][None], axis=-1)
    d_rand = np.linalg.norm(pts[:16][:, None] - pts[:16][None], axis=-1)
    assert np.sort(d_fps[d_fps > 0]).min() > np.sort(d_rand[d_rand > 0]).min()


def test_knn_bruteforce(rng):
    ref = rng.rand(100, 3).astype(np.float32)
    q = rng.rand(40, 3).astype(np.float32)
    idx, d2 = smp.knn_bruteforce(jnp.asarray(ref), jnp.asarray(q), 5)
    idx = np.asarray(idx)
    for i in range(40):
        ref_order = np.argsort(((q[i] - ref) ** 2).sum(-1))[:5]
        assert set(idx[i].tolist()) == set(ref_order.tolist())
