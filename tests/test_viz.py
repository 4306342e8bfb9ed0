import numpy as np

from terastructure_tpu.viz import main as viz_main, sort_by_dominant


def test_sort_by_dominant():
    theta = np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]])
    order = sort_by_dominant(theta)
    assert list(order) == [0, 2, 1]


def test_viz_cli_from_run_dir(tmp_path, rng):
    theta = rng.dirichlet(np.ones(3), size=40)
    from terastructure_tpu.io.export import _write_matrix
    _write_matrix(str(tmp_path / "theta.txt"), theta)
    out = str(tmp_path / "plot.png")
    viz_main([str(tmp_path), "-o", out])
    assert (tmp_path / "plot.png").stat().st_size > 1000


def test_cli_plot_subcommand(tmp_path, rng):
    from terastructure_tpu.cli import main as cli_main
    from terastructure_tpu.io.export import _write_matrix

    theta = rng.dirichlet(np.ones(2), size=20)
    _write_matrix(str(tmp_path / "theta.txt"), theta)
    out = str(tmp_path / "p.png")
    cli_main(["plot", str(tmp_path), "-o", out])
    assert (tmp_path / "p.png").exists()
