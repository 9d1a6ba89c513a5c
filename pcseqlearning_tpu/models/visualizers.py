"""Visualizers: headless geometry dumps + optional polyscope/plotly fronts.

Parity with /root/reference/pcdet/models/visualizers/ (PolyScopeVisualizer,
GeometryVisualizer, PlotlyVisualizer): config-driven registration of point
clouds/boxes/curves with scalar & color quantities. The headless
GeometryVisualizer (the one used inside ClusterTracking,
cluster_tracking.py:232) writes compressed geometry dicts; the interactive
fronts import their GUI deps lazily and degrade to the headless path when
unavailable.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from ..utils.edict import EDict


class GeometryVisualizer:
    """Headless: accumulates geometry segments, saves compressed dicts."""

    def __init__(self, model_cfg=None, runtime_cfg=None):
        self.model_cfg = EDict(model_cfg or {})
        self.enabled = bool(self.model_cfg.get("ENABLED", True))
        self.segments = []

    @staticmethod
    def _compress(seg):
        out = {}
        for k, v in seg.items():
            if isinstance(v, dict):
                out[k] = GeometryVisualizer._compress(v)
            elif isinstance(v, np.ndarray):
                out[k] = v.astype(np.float16) if v.dtype == np.float64 else v
            elif hasattr(v, "shape"):  # jax array
                out[k] = np.asarray(v)
            else:
                out[k] = v
        return out

    def register_point_cloud(self, segment):
        if self.enabled:
            self.segments.append(self._compress(dict(segment)))
        return self

    def register_boxes(self, segment):
        if self.enabled:
            self.segments.append(self._compress(dict(segment)))
        return self

    def register_curves(self, segment):
        if self.enabled:
            self.segments.append(self._compress(dict(segment)))
        return self

    def add_scalar_quantity(self, name, values, **kwargs):
        if self.enabled and self.segments:
            self.segments[-1].setdefault("scalars", {})[name] = dict(values=np.asarray(values), **kwargs)
        return self

    def save(self, path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(self.segments, f)
        return path

    def clear(self):
        self.segments = []

    def __call__(self, seq_dict):
        """Config-driven dump of keyed arrays (visualizer-as-module path,
        reference detector3d_template.py:73-83)."""
        keys = self.model_cfg.get("POINT_CLOUD_KEYS", ["point_fxyz"])
        for key in keys:
            if key in seq_dict:
                self.register_point_cloud(dict(type="point_cloud", name=key,
                                               xyz=np.asarray(seq_dict[key])[:, -3:]))
        out_dir = self.model_cfg.get("SAVE_DIR", None)
        if out_dir:
            sid = str(seq_dict.get("frame_id", "seq"))
            self.save(os.path.join(out_dir, f"{sid}.geom.pkl"))
            self.clear()
        return seq_dict


class PolyScopeVisualizer(GeometryVisualizer):
    """Interactive polyscope front; degrades to headless when polyscope is
    unavailable (this image has no GUI)."""

    def __init__(self, model_cfg=None, runtime_cfg=None):
        super().__init__(model_cfg, runtime_cfg)
        try:
            import polyscope  # noqa: F401

            self._ps = polyscope
            self._ps.init()
            up = self.model_cfg.get("UP_DIR", "z_up")
            self._ps.set_up_dir(up)
        except Exception:
            self._ps = None

    def register_point_cloud(self, segment):
        super().register_point_cloud(segment)
        if self._ps is not None:
            seg = self.segments[-1]
            pc = self._ps.register_point_cloud(seg.get("name", "pc"), np.asarray(seg["xyz"]))
            for name, q in seg.get("scalars", {}).items():
                pc.add_scalar_quantity(name, np.asarray(q["values"]))
        return self

    def show(self):
        if self._ps is not None:
            self._ps.show()


class PlotlyVisualizer(GeometryVisualizer):
    """Plotly HTML export front."""

    def save_html(self, path):
        try:
            import plotly.graph_objects as go
        except ImportError:
            return self.save(path + ".pkl")
        traces = []
        for seg in self.segments:
            if seg.get("type") == "point_cloud":
                xyz = np.asarray(seg["xyz"])
                traces.append(go.Scatter3d(
                    x=xyz[:, 0], y=xyz[:, 1], z=xyz[:, 2], mode="markers",
                    marker=dict(size=1), name=seg.get("name", "pc"),
                ))
        go.Figure(traces).write_html(path)
        return path


VISUALIZERS = {
    "GeometryVisualizer": GeometryVisualizer,
    "PolyScopeVisualizer": PolyScopeVisualizer,
    "PlotlyVisualizer": PlotlyVisualizer,
}
