"""Interactive visualizer entry point (the reference has no SHERF-adapted
``visualizer.py`` — its EG3D viz/* stack is GL/imgui desktop code; SURVEY
§2.2 marks the port headless-optional).  This serves the web UI from
sherf_tpu/viz/server.py:

    python -m sherf_tpu.cli.visualizer --port 8123 [--ckpt snapshot.pkl]

then ``ssh -L 8123:localhost:8123 <tpu-vm>`` and open http://localhost:8123.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--port", type=int, default=8123)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--ckpt", default=None,
                   help="reference .pkl snapshot or orbax checkpoint dir")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--depth", type=int, default=24)
    p.add_argument("--smpl_model", default=None)
    a = p.parse_args(argv)

    from sherf_tpu.viz.server import VisualizerApp, serve

    app = VisualizerApp(smpl_path=a.smpl_model, ckpt=a.ckpt,
                        resolution=a.size, depth_resolution=a.depth)
    server = serve(app, port=a.port, host=a.host)
    print(f"visualizer at http://{a.host}:{a.port}  (ctrl-c to stop)")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
