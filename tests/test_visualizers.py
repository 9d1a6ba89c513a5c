"""Config-driven visualizer quantity resolution (headless core)."""

import pickle

import numpy as np


def test_geometry_visualizer_config_driven(tmp_path):
    from pcseqlearning_tpu.models.visualizers import GeometryVisualizer
    from pcseqlearning_tpu.utils.edict import EDict

    rng = np.random.RandomState(0)
    vis = GeometryVisualizer(EDict(
        POINT_CLOUD_VIS={"point_fxyz": {"scalars": {"err": "point_err"},
                                        "colors": {"cls": "point_color"}}},
        POINT_CLOUD_SEQUENCE_VIS={"seq_fxyz": {}},
        BOX_VIS={"gt_boxes": {}},
        SAVE_DIR=str(tmp_path),
    ))
    n = 40
    d = {
        "frame_id": "viz_000",
        "point_fxyz": rng.rand(n, 4).astype(np.float32),
        "point_err": rng.rand(n).astype(np.float32),
        "point_color": rng.rand(n, 3).astype(np.float32),
        "seq_fxyz": np.concatenate([np.repeat([0., 1.], 10)[:, None],
                                    rng.rand(20, 3)], 1).astype(np.float32),
        "gt_boxes": np.array([[0, 0, 0, 2, 2, 2, 0.3]], np.float32),
    }
    vis(d)
    files = list(tmp_path.glob("*.geom.pkl"))
    assert files
    segs = pickle.load(open(files[0], "rb"))
    kinds = [s["type"] for s in segs]
    assert "point_cloud" in kinds and "boxes" in kinds
    pc = segs[kinds.index("point_cloud")]
    assert "err" in pc["scalars"] and len(pc["scalars"]["err"]["values"]) == n
    assert "cls" in pc["colors"]
    seq = [s for s in segs if s.get("name") == "seq_fxyz"][0]
    assert "sweep" in seq["scalars"]
    boxes = segs[kinds.index("boxes")]
    assert boxes["corners"].shape == (1, 8, 3)


def test_correspondence_and_trace_channels():
    from pcseqlearning_tpu.models.visualizers import GeometryVisualizer

    vis = GeometryVisualizer()
    src = np.zeros((5, 3), np.float32)
    tgt = np.ones((5, 3), np.float32)
    vis.register_correspondence("corres", src, tgt)
    vis.register_trace("trace", np.arange(12, dtype=np.float32).reshape(4, 3))
    assert vis.segments[0]["edges"].shape == (5, 2)
    assert vis.segments[1]["edges"].shape == (3, 2)


def test_plotly_visualizer_html(tmp_path):
    from pcseqlearning_tpu.models.visualizers import PlotlyVisualizer

    vis = PlotlyVisualizer()
    vis.register_point_cloud(dict(name="pc", xyz=np.random.rand(10, 3)))
    vis.add_scalar_quantity("q", np.random.rand(10))
    vis.register_boxes(dict(name="b", boxes=np.array([[0, 0, 0, 1, 1, 1, 0]], np.float32)))
    out = vis.save_html(str(tmp_path / "viz.html"))
    import os
    assert os.path.exists(out)
