"""Box coders (reference /root/reference/pcdet/utils/box_coder_utils.py).

ResidualCoder: anchors + residuals <-> boxes with log-size encoding and
diagonal-normalized center offsets (the SECOND/PointPillars coding).
"""

from __future__ import annotations

import jax.numpy as jnp


class ResidualCoder:
    def __init__(self, code_size=7, encode_angle_by_sincos=False):
        self.code_size = code_size + (1 if encode_angle_by_sincos else 0)
        self.encode_angle_by_sincos = encode_angle_by_sincos

    def encode(self, boxes, anchors):
        """boxes, anchors: [..., 7+] -> residuals [..., code_size]."""
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(boxes[..., :7], 7, axis=-1)
        dxa = jnp.maximum(dxa, 1e-5)
        dya = jnp.maximum(dya, 1e-5)
        dza = jnp.maximum(dza, 1e-5)
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt = (xg - xa) / diag
        yt = (yg - ya) / diag
        zt = (zg - za) / dza
        dxt = jnp.log(jnp.maximum(dxg, 1e-5) / dxa)
        dyt = jnp.log(jnp.maximum(dyg, 1e-5) / dya)
        dzt = jnp.log(jnp.maximum(dzg, 1e-5) / dza)
        if self.encode_angle_by_sincos:
            rt = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rt = [rg - ra]
        extras = [boxes[..., 7 + i : 8 + i] for i in range(boxes.shape[-1] - 7)]
        return jnp.concatenate([xt, yt, zt, dxt, dyt, dzt, *rt, *extras], axis=-1)

    def decode(self, residuals, anchors):
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        if self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt, cost, sint = jnp.split(residuals[..., :8], 8, axis=-1)
        else:
            xt, yt, zt, dxt, dyt, dzt, rt = jnp.split(residuals[..., :7], 7, axis=-1)
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        extras = [residuals[..., self.code_size + i : self.code_size + i + 1] for i in range(0)]
        return jnp.concatenate([xg, yg, zg, dxg, dyg, dzg, rg, *extras], axis=-1)


class PointResidualCoder:
    """Point-relative box coding (reference box_coder_utils.PointResidualCoder):
    centers offset from the POINT, normalized by the class mean-size
    diagonal; log sizes vs the class mean size; angle as (cos, sin).

    mean_sizes: [num_classes, 3] (dx, dy, dz) per 1-based class id.
    """

    def __init__(self, mean_sizes=((3.9, 1.6, 1.56), (0.8, 0.6, 1.73), (1.76, 0.6, 1.73))):
        self.mean_sizes = jnp.asarray(mean_sizes, jnp.float32)
        self.code_size = 8

    def encode(self, gt_boxes, points, gt_classes):
        """gt_boxes [..., 7], points [..., 3], gt_classes [...] (1-based)."""
        m = self.mean_sizes[jnp.clip(gt_classes - 1, 0, self.mean_sizes.shape[0] - 1)]
        dxa, dya, dza = m[..., 0], m[..., 1], m[..., 2]
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt = (gt_boxes[..., 0] - points[..., 0]) / diag
        yt = (gt_boxes[..., 1] - points[..., 1]) / diag
        zt = (gt_boxes[..., 2] - points[..., 2]) / dza
        dxt = jnp.log(jnp.maximum(gt_boxes[..., 3], 1e-5) / dxa)
        dyt = jnp.log(jnp.maximum(gt_boxes[..., 4], 1e-5) / dya)
        dzt = jnp.log(jnp.maximum(gt_boxes[..., 5], 1e-5) / dza)
        return jnp.stack(
            [xt, yt, zt, dxt, dyt, dzt,
             jnp.cos(gt_boxes[..., 6]), jnp.sin(gt_boxes[..., 6])], axis=-1
        )

    def decode(self, residuals, points, pred_classes):
        m = self.mean_sizes[jnp.clip(pred_classes - 1, 0, self.mean_sizes.shape[0] - 1)]
        dxa, dya, dza = m[..., 0], m[..., 1], m[..., 2]
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = residuals[..., 0] * diag + points[..., 0]
        yg = residuals[..., 1] * diag + points[..., 1]
        zg = residuals[..., 2] * dza + points[..., 2]
        dxg = jnp.exp(residuals[..., 3]) * dxa
        dyg = jnp.exp(residuals[..., 4]) * dya
        dzg = jnp.exp(residuals[..., 5]) * dza
        rg = jnp.arctan2(residuals[..., 7], residuals[..., 6])
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)


BOX_CODERS = {"ResidualCoder": ResidualCoder, "PointResidualCoder": PointResidualCoder}
