"""Execute the docs/examples scripts (the executable-documentation tier).

The reference runs its notebooks under --nbval in CI
(/root/reference/.github/workflows/pytest.yml:40); here the same content
lives as plain scripts with built-in assertions, executed by this test.
"""

import importlib.util
import os
import sys

import matplotlib
import pytest

matplotlib.use("Agg")

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "docs", "examples")


def _run(name, *args):
    path = os.path.join(EXAMPLES, name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name[:-3]] = mod
    spec.loader.exec_module(mod)
    mod.main(*args)


def test_mesh_basics(capsys):
    _run("01_mesh_basics.py")
    assert "01_mesh_basics: ok" in capsys.readouterr().out


def test_multigrid_constant(tmp_path, capsys):
    _run("02_multigrid_constant.py", str(tmp_path))
    assert "02_multigrid_constant: ok" in capsys.readouterr().out
    assert (tmp_path / "multigrid_constant.png").exists()


def test_multigrid_variable_coeff(tmp_path, capsys):
    _run("03_multigrid_variable_coeff.py", str(tmp_path))
    assert "03_multigrid_variable_coeff: ok" in capsys.readouterr().out


def test_multigrid_general(tmp_path, capsys):
    _run("04_multigrid_general.py", str(tmp_path))
    assert "04_multigrid_general: ok" in capsys.readouterr().out


def test_custom_problem(tmp_path, capsys):
    _run("05_custom_problem.py", str(tmp_path))
    assert "05_custom_problem: ok" in capsys.readouterr().out
    assert (tmp_path / "custom_problem.png").exists()


def test_spherical_mesh(tmp_path, capsys):
    _run("06_spherical_mesh.py", str(tmp_path))
    assert "06_spherical_mesh: ok" in capsys.readouterr().out


def test_face_centered(capsys):
    _run("07_face_centered.py")
    assert "07_face_centered: ok" in capsys.readouterr().out


def test_docs_site_builds(tmp_path, monkeypatch):
    """The static docs site builder must produce the guide pages and the
    notebook gallery (the reference ships a sphinx site; this env builds
    with stdlib markdown + nbconvert)."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "build_site", os.path.join(os.path.dirname(__file__), "..",
                                   "docs", "build_site.py"))
    mod = importlib.util.module_from_spec(spec)
    monkeypatch.setattr(mod, "__name__", "build_site", raising=False)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "OUT", str(tmp_path))
    mod.main()
    built = os.listdir(tmp_path)
    for want in ("index.html", "design.html", "survey.html",
                 "notebooks.html"):
        assert want in built, built
    with open(os.path.join(tmp_path, "index.html")) as fh:
        idx = fh.read()
    assert "pyro2_tpu" in idx and "<table>" in idx
