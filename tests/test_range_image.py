"""Range-image -> point-cloud math (VERDICT r3 item 8).

Oracle: points are PLACED analytically on exact pixel centers of a
synthetic range image (known inclination rows, known azimuth columns,
known extrinsic), so the extraction must recover them to float64
round-off. Mirrors what the reference delegates to
waymo_open_dataset.utils.range_image_utils
(/root/reference/pcdet/datasets/waymo/waymo_utils.py:104-162).
"""

import numpy as np
import pytest

from pcseqlearning_tpu.datasets.range_image import (
    compute_inclination, extract_points, range_image_to_cartesian)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _make_range_image(H, W, extrinsic, inclination, entries):
    """entries: list of (row, col, range). Returns ri plus the expected
    vehicle-frame xyz computed INDEPENDENTLY (forward spherical model)."""
    ri = np.zeros((H, W), np.float64)
    want = []
    entries = sorted(entries)  # row-major, matching boolean-mask extraction
    ex = np.asarray(extrinsic, np.float64)
    az_corr = np.arctan2(ex[1, 0], ex[0, 0])
    incl_rows = np.asarray(inclination)[::-1]
    for r_, c_, rng in entries:
        ri[r_, c_] = rng
        az = np.pi - 2 * np.pi * (c_ + 0.5) / W - az_corr
        incl = incl_rows[r_]
        p = np.array([
            rng * np.cos(incl) * np.cos(az),
            rng * np.cos(incl) * np.sin(az),
            rng * np.sin(incl),
        ])
        want.append(ex[:3, :3] @ p + ex[:3, 3])
    return ri, np.asarray(want)


def test_identity_extrinsic_roundtrip():
    H, W = 8, 32
    incl = compute_inclination((-0.4, 0.2), H)
    ex = np.eye(4)
    entries = [(0, 0, 10.0), (3, 7, 25.0), (7, 31, 4.0), (4, 16, 75.0)]
    ri, want = _make_range_image(H, W, ex, incl, entries)
    got = range_image_to_cartesian(ri, ex, incl)
    pts = got[ri > 0]
    # rows iterate in order; entries are row-major sorted already
    np.testing.assert_allclose(pts, want, atol=1e-9)


def test_extrinsic_rotation_translation():
    """A yawed + translated sensor: azimuth correction must cancel the yaw
    so the same physical point is recovered in the vehicle frame."""
    H, W = 4, 64
    incl = compute_inclination((-0.3, 0.1), H)
    ex = np.eye(4)
    ex[:3, :3] = _rot_z(0.7) @ _rot_z(-0.1)  # pure yaw
    ex[:3, 3] = [1.2, -0.4, 2.1]
    entries = [(1, 5, 12.0), (2, 40, 33.0)]
    ri, want = _make_range_image(H, W, ex, incl, entries)
    got = range_image_to_cartesian(ri, ex, incl)
    np.testing.assert_allclose(got[ri > 0], want, atol=1e-9)


def test_top_row_is_max_inclination():
    """Waymo layout: row 0 of the range image is the HIGHEST beam."""
    H, W = 4, 16
    incl = compute_inclination((-0.5, 0.5), H)
    ri = np.zeros((H, W))
    ri[0, 8] = 10.0  # top row
    xyz = range_image_to_cartesian(ri, np.eye(4), incl)
    assert xyz[0, 8, 2] > 0  # max inclination -> above horizon
    ri2 = np.zeros((H, W))
    ri2[H - 1, 8] = 10.0  # bottom row
    xyz2 = range_image_to_cartesian(ri2, np.eye(4), incl)
    assert xyz2[H - 1, 8, 2] < 0


def test_azimuth_sweep_direction():
    """Column 0 is azimuth ~ +pi (behind, +y side as az decreases);
    the sweep runs +pi -> -pi left-to-right."""
    H, W = 2, 360
    incl = compute_inclination((-0.1, 0.1), H)
    ri = np.ones((H, W))
    xyz = range_image_to_cartesian(ri, np.eye(4), incl)
    az = np.arctan2(xyz[0, :, 1], xyz[0, :, 0])
    # strictly decreasing over the first half-turn (no wraparound there)
    assert np.all(np.diff(az[: W // 2]) < 0)
    mid = xyz[0, W // 2, :]  # azimuth just below 0 -> +x axis
    assert mid[0] > 0.99 and abs(mid[1]) < 0.02


def test_extract_points_polar_features_and_mask():
    H, W = 6, 24
    incl = compute_inclination((-0.3, 0.0), H)
    t = np.zeros((H, W, 4), np.float32)
    t[2, 3] = [15.0, 0.7, 0.2, 99.0]  # range, intensity, elongation, extra
    t[5, 20] = [8.0, 0.1, 0.05, 0.0]
    t[1, 1, 0] = -1.0  # invalid (range <= 0) must be dropped
    out = extract_points(t, np.eye(4), incl)
    assert out.shape == (2, 6)
    np.testing.assert_allclose(out[:, 0], [15.0, 8.0], atol=1e-6)
    np.testing.assert_allclose(out[:, 1], [0.7, 0.1], atol=1e-6)
    np.testing.assert_allclose(out[:, 2], [0.2, 0.05], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out[:, 3:6], axis=1),
                               [15.0, 8.0], rtol=1e-6)


def test_range_equals_norm_under_extrinsic_rotation_only():
    """Pure-rotation extrinsic preserves |xyz| == range for every pixel."""
    H, W = 16, 128
    incl = compute_inclination((-0.31, 0.06), H)
    rng = np.random.RandomState(0)
    ri = rng.rand(H, W) * 70 + 1
    ex = np.eye(4)
    ex[:3, :3] = _rot_z(1.3)
    xyz = range_image_to_cartesian(ri, ex, incl)
    np.testing.assert_allclose(np.linalg.norm(xyz, axis=-1), ri, rtol=1e-12)
