"""Visualizer subsystem: render backend, widgets, HTTP server.

Reference counterpart: viz/renderer.py + viz/*_widget.py + gui_utils/* (the
EG3D desktop browser).  Headless here — tiny resolutions so the whole suite
runs on the CPU mesh.
"""

import json
import urllib.request

import numpy as np
import pytest

from sherf_tpu.viz import VizRenderer, sample_cross_section
from sherf_tpu.viz.widgets import (ConditioningPoseWidget, LayerWidget,
                                   PerformanceWidget, PickleWidget,
                                   PoseWidget, RenderDepthSampleWidget,
                                   RenderTypeWidget, ZoomWidget)

RES = 24
DEPTH = 6


@pytest.fixture(scope="module")
def viz():
    return VizRenderer()


@pytest.mark.heavy
def test_render_rgb(viz):
    res = viz.render(resolution=RES, depth_resolution=DEPTH)
    assert "error" not in res or res["error"] is None, res.get("error")
    assert res["image"].shape == (RES, RES, 3)
    assert res["image"].dtype == np.uint8
    assert res["render_time"] > 0


@pytest.mark.heavy
def test_render_types_and_camera(viz):
    imgs = {}
    for rt in ("depth", "acc", "normals"):
        res = viz.render(resolution=RES, depth_resolution=DEPTH,
                         render_type=rt, yaw=1.0, pitch=0.3, radius=2.5)
        assert "error" not in res or res["error"] is None, res.get("error")
        assert res["image"].shape == (RES, RES, 3)
        imgs[rt] = res["image"]
    # different render types produce different images
    assert not np.array_equal(imgs["depth"], imgs["acc"])


@pytest.mark.heavy
def test_render_crosssection(viz):
    res = viz.render(resolution=16, depth_resolution=DEPTH,
                     render_type="crosssection")
    assert "error" not in res or res["error"] is None, res.get("error")
    assert res["image"].shape == (16, 16, 3)


@pytest.mark.heavy
def test_layer_capture(viz):
    res = viz.render(resolution=RES, depth_resolution=DEPTH, list_layers=True)
    assert res.get("error") is None, res.get("error")
    names = [l["name"] for l in res["layers"]]
    assert len(names) > 5
    # pick a real intermediate and render it as a heatmap
    res2 = viz.render(resolution=RES, depth_resolution=DEPTH,
                      layer_name=names[0])
    assert res2.get("error") is None, res2.get("error")
    assert res2["image"].shape[2] == 3
    # unknown layer reports an error instead of raising
    res3 = viz.render(resolution=RES, depth_resolution=DEPTH,
                      layer_name="no/such/layer")
    assert "no such layer" in (res3.get("error") or "")


def test_render_error_is_captured(viz):
    res = viz.render(resolution=RES, depth_resolution=DEPTH,
                     ckpt="/nonexistent/snapshot.pkl")
    assert res.get("error")  # traceback string, no exception escapes


@pytest.mark.heavy
def test_cross_section_matches_reference_contract(viz):
    """sample_cross_section mirrors crosssection_utils.py:13-23: a (res,res)
    sigma slab on an axis-aligned plane, linspace +w/2 -> -w/2 on the first
    axis."""
    model, _ = viz._get_model(DEPTH, False)
    base, _ = viz._get_scene(0, 16, 0.25)
    variables = viz._get_variables(None, model, base)
    sl = sample_cross_section(model, variables, base, viz._get_smpl(),
                              resolution=8, w=1.0, axis=1)
    assert sl.shape == (8, 8)
    assert np.isfinite(sl).all()


def test_widgets_state_machine():
    pose = PoseWidget()
    pose.drag(100, 50)
    assert pose.yaw == pytest.approx(1.0)
    pose.update({"pitch": 9.0})
    assert pose.pitch == pytest.approx(1.4)  # clamped

    zoom = ZoomWidget()
    zoom.update({"radius": 0.01, "fov": 300})
    assert zoom.radius == 0.5 and zoom.fov == 120.0

    rt = RenderTypeWidget()
    rt.update({"render_type": "bogus"})
    assert rt.render_type == "rgb"

    ds = RenderDepthSampleWidget()
    ds.update({"depth_resolution": 1000, "resolution": 1})
    assert ds.depth_resolution == 128 and ds.resolution == 16

    cond = ConditioningPoseWidget()
    cond.update({"seed": 3, "pose_scale": 5.0})
    assert cond.args() == {"seed": 3, "pose_scale": 1.0}

    pk = PickleWidget()
    pk.update({"ckpt": "a.pkl"})
    pk.update({"ckpt": "b.pkl"})
    pk.update({"ckpt": "a.pkl"})
    assert pk.state()["recents"] == ["b.pkl", "a.pkl"]
    pk.update({"ckpt": ""})
    assert pk.args()["ckpt"] is None

    lw = LayerWidget()
    lw.observe({"layers": [{"name": "x", "shape": [1], "dtype": "f32"}]})
    assert lw.state()["layers"][0]["name"] == "x"

    perf = PerformanceWidget()
    perf.observe({"render_time": 0.1})
    perf.observe({"render_time": 0.2})
    st = perf.state()
    assert st["frames"] == 2 and 0.1 < st["render_time_ema"] < 0.2
    assert st["fps"] == pytest.approx(1.0 / st["render_time_ema"])


@pytest.mark.heavy
def test_http_server(tmp_path):
    from sherf_tpu.viz.server import VisualizerApp, serve

    app = VisualizerApp(resolution=16, depth_resolution=4)
    app.capture.out_dir = str(tmp_path)
    server = serve(app, port=0)  # ephemeral port
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        page = urllib.request.urlopen(base + "/").read().decode()
        assert "sherf_tpu visualizer" in page

        png = urllib.request.urlopen(base + "/api/frame.png").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        req = urllib.request.Request(
            base + "/api/update", method="POST",
            data=json.dumps({"yaw": 0.7, "render_type": "depth"}).encode())
        assert urllib.request.urlopen(req).status == 200

        state = json.loads(
            urllib.request.urlopen(base + "/api/state").read())
        assert state["pose"]["yaw"] == pytest.approx(0.7)
        assert state["rtype"]["render_type"] == "depth"
        assert state["error"] is None
        assert state["perf"]["frames"] >= 1

        cap = urllib.request.Request(base + "/api/capture", method="POST")
        path = json.loads(urllib.request.urlopen(cap).read())["path"]
        assert path.startswith(str(tmp_path))
    finally:
        server.shutdown()
