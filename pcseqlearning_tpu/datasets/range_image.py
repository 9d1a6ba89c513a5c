"""Native range-image -> point-cloud math for Waymo extraction.

The reference delegates this to `waymo_open_dataset.utils.range_image_utils`
(`/root/reference/pcdet/datasets/waymo/waymo_utils.py:104-162` calls
frame_utils.convert_range_image_to_point_cloud). The spherical-projection
math itself needs neither TF nor the waymo package, so it lives here as
plain numpy and is oracle-tested by an exact analytic round trip
(tests/test_range_image.py); tools/create_waymo_infos.py uses it whenever
`waymo_open_dataset.utils` is unavailable, shrinking the extraction
dependency to proto parsing only.

Conventions (Waymo Open Dataset spec):
- range image rows sweep inclination TOP row = MAX inclination (beams are
  listed bottom-to-top in the calibration, so the row axis is the reversed
  beam list);
- columns sweep azimuth from +pi (col 0) to -pi (last col), pixel centers
  at azimuth = pi - (2*pi) * (col + 0.5) / W, corrected by the extrinsic
  yaw so that column azimuth is measured in the VEHICLE frame;
- a pixel (r, row, col) maps to sensor-frame cartesian
  x = r*cos(incl)*cos(az), y = r*cos(incl)*sin(az), z = r*sin(incl),
  then through the sensor extrinsic into the vehicle frame;
- pixels with range <= 0 are invalid.
"""

from __future__ import annotations

import numpy as np


def compute_inclination(inclination_range, height):
    """Uniform beam inclinations for lidars without per-beam calibration.

    Mirrors range_image_utils.compute_inclination: pixel centers of
    `height` uniform rows spanning [min, max], returned bottom-to-top
    (ascending), i.e. in BEAM order, not row order.
    """
    lo, hi = float(inclination_range[0]), float(inclination_range[1])
    return lo + (hi - lo) * (np.arange(height, dtype=np.float64) + 0.5) / height


def range_image_to_cartesian(range_image, extrinsic, inclination):
    """[H, W] ranges -> [H, W, 3] vehicle-frame xyz.

    range_image: [H, W] float ranges (<=0 marks empty pixels — caller masks).
    extrinsic: [4, 4] sensor-to-vehicle transform.
    inclination: [H] beam inclinations in BEAM order (ascending,
        bottom-to-top); rows of the range image are the reverse.
    """
    ri = np.asarray(range_image, np.float64)
    H, W = ri.shape
    incl = np.asarray(inclination, np.float64)[::-1]  # row order: top = max
    ex = np.asarray(extrinsic, np.float64)

    # azimuth per column, corrected so 0 rad is the vehicle +x axis:
    # the sensor's mounting yaw rotates the sweep start
    az_correction = np.arctan2(ex[1, 0], ex[0, 0])
    ratios = (np.arange(W, dtype=np.float64) + 0.5) / W
    azimuth = (1.0 - 2.0 * ratios) * np.pi - az_correction  # [W]

    cos_az, sin_az = np.cos(azimuth)[None, :], np.sin(azimuth)[None, :]
    cos_incl, sin_incl = np.cos(incl)[:, None], np.sin(incl)[:, None]
    x = ri * cos_incl * cos_az
    y = ri * cos_incl * sin_az
    z = ri * sin_incl
    pts = np.stack([x, y, z], axis=-1)  # sensor frame
    return pts @ ex[:3, :3].T + ex[:3, 3]


def extract_points(range_image_tensor, extrinsic, inclination=None,
                   inclination_range=(-0.31, 0.06)):
    """Full extraction for one lidar return.

    range_image_tensor: [H, W, C>=3] with channels (range, intensity,
        elongation, ...) — the Waymo wire layout.
    Returns [N, 6]: (range, intensity, elongation, x, y, z) for valid
    pixels, matching frame_utils.convert_range_image_to_point_cloud with
    keep_polar_features=True (minus the per-pixel pose path, which only
    the TOP lidar's rolling-shutter correction uses).
    """
    t = np.asarray(range_image_tensor, np.float64)
    H, W = t.shape[:2]
    if inclination is None:
        inclination = compute_inclination(inclination_range, H)
    xyz = range_image_to_cartesian(t[..., 0], extrinsic, inclination)
    mask = t[..., 0] > 0
    out = np.concatenate([t[..., :3][mask], xyz[mask]], axis=-1)
    return out.astype(np.float32)
