"""Smoke tests for the explainer animation (vis_manim.py equivalent)."""

import os

import numpy as np

from mbd_tpu.cli import vis_explainer


def test_demo_traj_shapes_and_block():
    t = vis_explainer.demo_traj(1.0)
    assert t.shape == (vis_explainer.NPTS, 2)
    grown = vis_explainer.R0 * vis_explainer.RSCALE
    tb = vis_explainer.demo_traj(1.0, r_block=grown)
    # blocked segment sits on the grown obstacle boundary (would collide)
    d = np.linalg.norm(tb, axis=1)
    assert d.min() < grown + 1e-6


def test_model_traj_respects_constraint():
    grown = vis_explainer.R0 * vis_explainer.RSCALE
    t = vis_explainer._model_traj(1.0, grown)
    assert np.all(np.linalg.norm(t, axis=1) >= grown - 1e-6)


def test_noising_path_endpoints():
    rng = np.random.default_rng(0)
    clean = vis_explainer.demo_traj(1.0)
    path = vis_explainer.noising_path(clean, 10, rng)
    assert len(path) == 11
    np.testing.assert_allclose(path[-1], clean)  # last frame is clean
    assert np.abs(path[0]).max() <= 1.9          # noise is clipped


def test_static_render(tmp_path):
    out = vis_explainer.main(
        ["--static", "--steps", "4", "--out", str(tmp_path / "e.png")])
    assert os.path.getsize(out) > 10_000


def test_gif_render(tmp_path):
    out = vis_explainer.main(
        ["--steps", "3", "--fps", "5", "--out", str(tmp_path / "e.gif")])
    assert os.path.getsize(out) > 10_000
