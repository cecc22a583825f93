"""Interactive visualizer (TPU-native equivalent of reference viz/* +
gui_utils/*).

The reference ships an EG3D imgui/OpenGL desktop browser
(gui_utils/glfw_window.py, viz/renderer.py:125).  On a TPU VM there is no
display, so the rebuild keeps the same architecture — a stateful render
backend driven by widget state dicts — but serves it over HTTP to any
browser (ssh -L tunnel friendly):

- ``viz.renderer.VizRenderer``  — the render state machine
  (reference viz/renderer.py:125-440): model/checkpoint cache, jit cache,
  render-arg dict in, image+perf+error dict out, layer capture.
- ``viz.widgets``               — headless widget state (camera orbit, zoom,
  conditioning pose, render type, depth samples, truncation/noise, pickle,
  layer list, performance, capture) mirroring viz/*_widget.py.
- ``viz.server``                — stdlib HTTP app + single-page UI
  (replaces gui_utils/{glfw_window,imgui_window,gl_utils}).
- CLI: ``python -m sherf_tpu.cli.visualizer``.
"""

from sherf_tpu.viz.renderer import VizRenderer, sample_cross_section
from sherf_tpu.viz.widgets import (CaptureWidget, ConditioningPoseWidget,
                                   LayerWidget, PerformanceWidget,
                                   PickleWidget, PoseWidget,
                                   RenderDepthSampleWidget, RenderTypeWidget,
                                   TruncNoiseWidget, ZoomWidget)

__all__ = [
    "VizRenderer", "sample_cross_section",
    "PoseWidget", "ZoomWidget", "ConditioningPoseWidget", "RenderTypeWidget",
    "RenderDepthSampleWidget", "TruncNoiseWidget", "PickleWidget",
    "LayerWidget", "PerformanceWidget", "CaptureWidget",
]
