"""Visualization export: PLY artifacts + PNG overview."""

import os

import numpy as np


def test_viz_export(tmp_path):
    from liorf_tpu.mapping.viz import export_ply, render_overview
    from test_e2e_synthetic import run_pipeline

    _, pipe = run_pipeline(n_frames=10)
    out = str(tmp_path / "viz")
    arts = export_ply(pipe, out)
    assert os.path.exists(arts["trajectory"])
    assert os.path.exists(arts["map"])
    with open(arts["map"]) as f:
        head = f.read(200)
    assert "element vertex" in head

    png = render_overview(pipe, str(tmp_path / "ov.png"))
    assert os.path.getsize(png) > 10_000


def test_cli_viz(tmp_path):
    from liorf_tpu import cli

    out = str(tmp_path / "o")
    cli.main(
        ["run", "--dataset", "synthetic", "--frames", "8", "--out", out, "--viz"]
    )
    assert os.path.exists(os.path.join(out, "trajectory.ply"))
    assert os.path.exists(os.path.join(out, "map.ply"))
    assert os.path.exists(os.path.join(out, "overview.png"))
