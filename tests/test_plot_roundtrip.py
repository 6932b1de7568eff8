"""plot.py round-trips stored outputs through each solver's dovis,
including the spherical-geometry branch; plus the runparams sphinx-table
generator (reference runparams.py:276)."""

import os

import matplotlib
import pytest

matplotlib.use("Agg")

from pyro2_tpu.pyro_sim import Pyro


def _run_and_write(solver, problem, tmp_path, inputs):
    p = Pyro(solver)
    p.initialize_problem(problem, inputs_dict=inputs)
    p.single_step()
    out = str(tmp_path / "plotme")
    p.sim.write(out)
    return out + ".h5"


def test_plot_roundtrip_cartesian(tmp_path):
    from pyro2_tpu.plot import makeplot
    h5 = _run_and_write("advection", "tophat", tmp_path, {
        "mesh.nx": 16, "mesh.ny": 16, "driver.tmax": 0.05})
    png = str(tmp_path / "out.png")
    makeplot(h5, png)
    assert os.path.getsize(png) > 0


def test_plot_roundtrip_spherical(tmp_path):
    """The spherical dovis branch (r-theta -> x-z projection) must
    round-trip from a stored file (reads grid coord_type + solver dovis
    through io_pyro.read)."""
    from pyro2_tpu.plot import makeplot
    h5 = _run_and_write("compressible", "test", tmp_path, {
        "mesh.grid_type": "SphericalPolar",
        "mesh.nx": 8, "mesh.ny": 8,
        "mesh.xmin": 1.0, "mesh.xmax": 2.0,
        "mesh.ymin": 0.3, "mesh.ymax": 1.3,
        "mesh.xlboundary": "outflow", "mesh.xrboundary": "outflow",
        "compressible.riemann": "CGF",
        "driver.tmax": 1.e-5})
    png = str(tmp_path / "out_sph.png")
    makeplot(h5, png)
    assert os.path.getsize(png) > 0


def test_sphinx_tables(tmp_path):
    p = Pyro("compressible")
    out = str(tmp_path / "params-sphinx.inc")
    p.rp.print_sphinx_tables(out)
    text = open(out).read()
    # one table per section, with grid-table rows carrying the comments
    assert "* section: ``[driver]``" in text
    assert "* section: ``[compressible]``" in text
    assert "``cfl``" in text
    assert text.count("+=") >= 5
