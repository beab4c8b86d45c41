"""Visualization helpers write valid PNGs for all three benchmarks."""

import numpy as np

from diffphycon_tpu.utils import viz


def _is_png(path):
    with open(path, "rb") as fh:
        return fh.read(8) == b"\x89PNG\r\n\x1a\n"


def test_save_field_png_and_sequence(tmp_path):
    field = np.random.default_rng(0).normal(size=(16, 16))
    p = viz.save_field_png(field, str(tmp_path / "f.png"), title="x")
    assert _is_png(p)

    data = np.random.default_rng(1).normal(size=(2, 3, 8, 8, 1))
    paths = viz.save_field_sequence(data, str(tmp_path), "Density",
                                    batches=[1])
    assert len(paths) == 3
    assert paths[0].endswith("Density_batch0001_0000.png")
    assert all(_is_png(p) for p in paths)


def test_plot_burgers_control(tmp_path):
    rng = np.random.default_rng(2)
    u = rng.normal(size=(2, 11, 128))
    f = rng.normal(size=(2, 10, 128))
    p = viz.plot_burgers_control(u, f, str(tmp_path / "b.png"),
                                 u_target=u[:, -1])
    assert _is_png(p)


def test_plot_smoke_frames(tmp_path):
    traj = np.random.default_rng(3).random((1, 32, 16, 16, 6))
    p = viz.plot_smoke_frames(traj, str(tmp_path / "s.png"), num_frames=4)
    assert _is_png(p)


def test_plot_jellyfish_and_curves(tmp_path):
    th = np.linspace(0, 1, 40)[None]
    bd = np.zeros((1, 16, 16, 3))
    p = viz.plot_jellyfish_result(th, str(tmp_path / "j.png"),
                                  J_list=[3.0, 2.0, 1.5], boundary=bd)
    assert _is_png(p)
    p2 = viz.plot_metric_curves({"loss": [1.0, 0.5, 0.25]},
                                str(tmp_path / "c.png"), logy=True)
    assert _is_png(p2)
