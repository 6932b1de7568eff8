"""Unit tests for the util services layer.

Mirrors the reference's util/tests/test_runparams.py (fixture-ini parsing,
type sniffing, override semantics) plus compare/timers coverage.
"""

import jax.numpy as jnp
import pytest

from pyro2_tpu.util import compare, profile_pyro
from pyro2_tpu.util.runparams import RuntimeParameters, is_float, is_int


@pytest.fixture
def ini(tmp_path):
    f = tmp_path / "test.ini"
    f.write_text(
        "[driver]\n"
        "tmax = 1.0   ; maximum time\n"
        "max_steps = 100\n"
        "\n"
        "[mesh]\n"
        "nx = 8\n"
        "xlboundary = periodic ; left BC\n"
    )
    return str(f)


class TestRuntimeParameters:
    def test_type_sniffing(self, ini):
        rp = RuntimeParameters()
        rp.load_params(ini)
        assert rp.get_param("driver.tmax") == 1.0
        assert isinstance(rp.get_param("driver.tmax"), float)
        assert rp.get_param("driver.max_steps") == 100
        assert isinstance(rp.get_param("driver.max_steps"), int)
        assert rp.get_param("mesh.xlboundary") == "periodic"

    def test_is_int_is_float(self):
        assert is_int("3") and not is_int("3.5") and not is_int("abc")
        assert is_float("3.5") and is_float("3") and not is_float("abc")

    def test_override_layering(self, ini, tmp_path):
        over = tmp_path / "inputs.over"
        over.write_text("[driver]\ntmax = 2.5\n")
        rp = RuntimeParameters()
        rp.load_params(ini)
        rp.load_params(str(over), no_new=True)
        assert rp.get_param("driver.tmax") == 2.5
        assert rp.get_param("mesh.nx") == 8  # untouched

    def test_no_new_refuses_unknown(self, ini):
        rp = RuntimeParameters()
        rp.load_params(ini)
        with pytest.raises(KeyError):
            rp.set_param("driver.bogus_key", 1, no_new=True)
        rp.set_param("driver.bogus_key", 1, no_new=False)
        assert rp.get_param("driver.bogus_key") == 1

    def test_used_params_tracked(self, ini):
        rp = RuntimeParameters()
        rp.load_params(ini)
        rp.get_param("driver.tmax")
        assert "driver.tmax" in rp.used_params
        assert "mesh.nx" not in rp.used_params

    def test_paramfile_roundtrip(self, ini, tmp_path, monkeypatch):
        rp = RuntimeParameters()
        rp.load_params(ini)
        monkeypatch.chdir(tmp_path)
        rp.print_paramfile("inputs.auto")
        rp2 = RuntimeParameters()
        rp2.load_params(str(tmp_path / "inputs.auto"))
        assert rp2.get_param("driver.tmax") == rp.get_param("driver.tmax")
        assert rp2.get_param("mesh.xlboundary") == "periodic"


class TestCompare:
    def _make_data(self, val=1.0):
        from pyro2_tpu.mesh import boundary, grid, patch
        g = grid.Cartesian2d(8, 8, ng=2)
        d = patch.CellCenterData2d(g)
        bc = boundary.BC()
        d.register_var("a", bc)
        d.create()
        d.set_var("a", jnp.full((g.qx, g.qy), val))
        return d

    def test_identical(self):
        d1, d2 = self._make_data(), self._make_data()
        assert compare.compare(d1, d2) == 0

    def test_differs(self):
        d1, d2 = self._make_data(1.0), self._make_data(1.0 + 1e-6)
        assert compare.compare(d1, d2, rtol=1.e-12) != 0
        assert compare.compare(d1, d2, rtol=1.e-3) == 0


class TestTimers:
    def test_nesting_and_report(self, capsys):
        tc = profile_pyro.TimerCollection()
        a = tc.timer("main")
        a.begin()
        b = tc.timer("inner")
        b.begin()
        b.end()
        a.end()
        tc.report()
        out = capsys.readouterr().out
        assert "main" in out and "inner" in out
        # inner is nested -> indented further than main
        main_line = [ln for ln in out.splitlines() if "main" in ln][0]
        inner_line = [ln for ln in out.splitlines() if "inner" in ln][0]
        assert len(inner_line) - len(inner_line.lstrip()) > \
               len(main_line) - len(main_line.lstrip())
