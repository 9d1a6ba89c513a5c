"""Config-driven 3D detector model zoo (flax.linen).

Mirrors the reference registry plumbing (/root/reference/pcdet/models/
__init__.py:16-41 and detectors/__init__.py:14-27): ``build_network``
dispatches on MODEL.NAME over detectors and registration drivers.
"""

from __future__ import annotations


def build_network(model_cfg, runtime_cfg=None, dataset=None):
    name = model_cfg["NAME"]
    if name == "SimpleReg":
        from ..preprocessing import SimpleReg

        return SimpleReg(model_cfg, runtime_cfg, dataset)
    from .detectors import build_detector

    return build_detector(model_cfg, runtime_cfg, dataset)
