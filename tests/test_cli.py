"""Smoke tests for the CLI entry points at tiny settings (CPU).

These are the reference's user-facing tools (train.py, gen_videos.py,
gen_samples.py, calc_metrics.py, render_hfz.py — SURVEY §3); each must run
end-to-end from argv to files on disk with no assets present.
"""

import os

import numpy as np
import pytest


@pytest.mark.heavy
def test_render_demo_writes_png(tmp_path):
    from sherf_tpu.cli.render_demo import main

    out = str(tmp_path / "demo.png")
    main(["--out", out, "--size", "16", "--depth", "4"])
    import imageio.v2 as imageio

    img = imageio.imread(out)
    assert img.shape == (16, 48, 3)  # rgb | depth | acc panel


@pytest.mark.heavy
def test_gen_videos_orbit(tmp_path):
    from sherf_tpu.cli.gen_videos import main

    out = str(tmp_path / "orbit.gif")
    main(["--out", out, "--frames", "2", "--size", "16", "--depth", "4"])
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_debug_project_writes_png(tmp_path):
    from sherf_tpu.cli.debug_project import main

    out = str(tmp_path / "proj.png")
    main(["--out", out])
    import imageio.v2 as imageio

    assert imageio.imread(out).ndim == 3
