"""Mesh-layer tests: grid geometry, stencil views, ghost fill, restrict/
prolong.  Semantics ported from the reference's mesh/tests (test_patch.py,
test_array_indexer.py) -- values checked against the same analytic answers.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pyro2_tpu.mesh.boundary as bnd
from pyro2_tpu.mesh import patch
from pyro2_tpu.mesh.grid import Cartesian2d, Grid2d, SphericalPolar
from pyro2_tpu.mesh.indexer import ai, fill_ghost


class TestGrid2d:
    def setup_method(self):
        self.g = Grid2d(4, 6, ng=2, ymax=1.5)

    def test_dx_dy(self):
        assert self.g.dx == 0.25
        assert self.g.dy == 0.25

    def test_grid_coords(self):
        assert_close = np.testing.assert_allclose
        assert_close(self.g.x[self.g.ilo:self.g.ihi + 1],
                     np.array([0.125, 0.375, 0.625, 0.875]))
        assert_close(self.g.y[self.g.jlo:self.g.jhi + 1],
                     np.array([0.125, 0.375, 0.625, 0.875, 1.125, 1.375]))

    def test_grid_2d_coords(self):
        assert np.min(self.g.x2d) == np.min(self.g.x)
        assert np.max(self.g.y2d) == np.max(self.g.y)

    def test_scratch(self):
        q = self.g.scratch_array()
        assert q.shape == (self.g.qx, self.g.qy)
        q3 = self.g.scratch_array(nvar=3)
        assert q3.shape == (3, self.g.qx, self.g.qy)

    def test_coarse_fine(self):
        c = self.g.coarse_like(2)
        assert c.nx == 2 and c.ny == 3
        f = self.g.fine_like(2)
        assert f.nx == 8 and f.ny == 12

    def test_eq_hash(self):
        g2 = Grid2d(4, 6, ng=2, ymax=1.5)
        assert self.g == g2
        assert hash(self.g) == hash(g2)
        assert self.g != Grid2d(4, 6, ng=2)


class TestIndexer:
    def setup_method(self):
        self.g = Grid2d(4, 4, ng=2)
        a = np.arange(self.g.qx * self.g.qy,
                      dtype=np.float64).reshape(self.g.qx, self.g.qy)
        self.a = jnp.asarray(a)
        self.v = ai(self.a, self.g)

    def test_v(self):
        assert self.v.v().shape == (4, 4)
        np.testing.assert_array_equal(self.v.v(),
                                      self.a[2:6, 2:6])

    def test_ip_jp(self):
        np.testing.assert_array_equal(self.v.ip(1), self.a[3:7, 2:6])
        np.testing.assert_array_equal(self.v.jp(-1), self.a[2:6, 1:5])
        np.testing.assert_array_equal(self.v.ip_jp(1, 1), self.a[3:7, 3:7])

    def test_buf(self):
        assert self.v.v(buf=1).shape == (6, 6)
        assert self.v.v(buf=2).shape == (8, 8)

    def test_stride(self):
        assert self.v.v(s=2).shape == (2, 2)
        np.testing.assert_array_equal(self.v.v(s=2), self.a[2:6:2, 2:6:2])

    def test_lap(self):
        # Laplacian of x^2 + y^2 is 4 (on interior, away from ghosts)
        g = Grid2d(8, 8, ng=1)
        f = jnp.asarray(g.x2d ** 2 + g.y2d ** 2)
        lap = ai(f, g).lap()
        np.testing.assert_allclose(np.asarray(lap), 4.0)

    def test_norm(self):
        g = Grid2d(8, 8, ng=1)
        ones = jnp.ones((g.qx, g.qy))
        # sqrt(dx*dy*sum(1)) = sqrt(1/64 * 64) = 1
        assert abs(float(ai(ones, g).norm()) - 1.0) < 1e-14


class TestFillGhost:
    """Ghost-fill matches the reference's per-BC formulas."""

    def setup_method(self):
        self.g = Grid2d(4, 4, ng=2)

    def _interior(self):
        a = np.zeros((self.g.qx, self.g.qy))
        vals = np.arange(16, dtype=np.float64).reshape(4, 4) + 1.0
        a[2:6, 2:6] = vals
        return jnp.asarray(a)

    def test_periodic(self):
        bc = bnd.BC(xlb="periodic", xrb="periodic",
                    ylb="periodic", yrb="periodic")
        a = fill_ghost(self._interior(), self.g, bc)
        a = np.asarray(a)
        # low-x ghosts wrap the high-x interior
        np.testing.assert_array_equal(a[0:2, 2:6], a[4:6, 2:6])
        np.testing.assert_array_equal(a[6:8, 2:6], a[2:4, 2:6])
        # corners filled consistently (x then y ordering)
        np.testing.assert_array_equal(a[0:2, 0:2], a[4:6, 4:6])

    def test_outflow(self):
        bc = bnd.BC()  # all outflow
        a = np.asarray(fill_ghost(self._interior(), self.g, bc))
        np.testing.assert_array_equal(a[0, 2:6], a[2, 2:6])
        np.testing.assert_array_equal(a[1, 2:6], a[2, 2:6])
        np.testing.assert_array_equal(a[7, 2:6], a[5, 2:6])

    def test_reflect_even_odd(self):
        bc_e = bnd.BC(xlb="reflect-even", xrb="reflect-even")
        a = np.asarray(fill_ghost(self._interior(), self.g, bc_e))
        np.testing.assert_array_equal(a[1, 2:6], a[2, 2:6])
        np.testing.assert_array_equal(a[0, 2:6], a[3, 2:6])
        np.testing.assert_array_equal(a[6, 2:6], a[5, 2:6])
        np.testing.assert_array_equal(a[7, 2:6], a[4, 2:6])

        bc_o = bnd.BC(xlb="reflect", xrb="reflect", odd_reflect_dir="x")
        b = np.asarray(fill_ghost(self._interior(), self.g, bc_o))
        np.testing.assert_array_equal(b[1, 2:6], -b[2, 2:6])
        np.testing.assert_array_equal(b[0, 2:6], -b[3, 2:6])

    def test_dirichlet_inhomogeneous(self):
        g = Grid2d(4, 4, ng=1)
        bc = bnd.BC(xlb="dirichlet", xl_func=lambda y: 0 * y + 5.0, grid=g)
        a = np.zeros((g.qx, g.qy))
        a[1:5, 1:5] = 1.0
        out = np.asarray(fill_ghost(jnp.asarray(a), g, bc))
        # ghost = 2*val - interior
        np.testing.assert_allclose(out[0, 1:5], 2 * 5.0 - 1.0)

    def test_neumann_inhomogeneous(self):
        g = Grid2d(4, 4, ng=1)
        bc = bnd.BC(xlb="neumann", xl_func=lambda y: 0 * y + 2.0, grid=g)
        a = np.ones((g.qx, g.qy))
        out = np.asarray(fill_ghost(jnp.asarray(a), g, bc))
        # ghost = interior - dx*value
        np.testing.assert_allclose(out[0, 1:5], 1.0 - g.dx * 2.0)


class TestCellCenterData2d:
    def setup_method(self):
        self.g = Grid2d(8, 8, ng=2)
        self.d = patch.CellCenterData2d(self.g)
        bc = bnd.BC()
        self.d.register_var("a", bc)
        self.d.register_var("b", bc)
        self.d.create()

    def test_register_get_set(self):
        assert self.d.nvar == 2
        assert self.d.names == ["a", "b"]
        self.d.set_var("a", jnp.full((self.g.qx, self.g.qy), 2.0))
        assert float(self.d.get_var("a")[0, 0]) == 2.0
        assert float(self.d.get_var("b")[0, 0]) == 0.0
        assert self.d.min("a") == 2.0 and self.d.max("a") == 2.0

    def test_aux(self):
        self.d.set_aux("gamma", 1.4)
        assert self.d.get_aux("gamma") == 1.4
        assert self.d.get_aux("nope") is None

    def test_clone(self):
        self.d.set_var("a", jnp.full((self.g.qx, self.g.qy), 3.0))
        c = patch.cell_center_data_clone(self.d)
        assert c.names == self.d.names
        np.testing.assert_array_equal(np.asarray(c.data),
                                      np.asarray(self.d.data))

    def test_restrict_prolong_consistency(self):
        # prolong then restrict is the identity on the coarse data
        g = Grid2d(8, 8, ng=2)
        d = patch.CellCenterData2d(g)
        d.register_var("a", bnd.BC())
        d.create()
        d.set_var("a", jnp.asarray(np.cos(2 * np.pi * g.x2d) *
                                   np.sin(2 * np.pi * g.y2d)))
        fgrid = g.fine_like(2)
        fine = d.prolong("a")
        coarse_again = patch.restrict_array(fine, fgrid, g, 2)
        av = ai(d.get_var("a"), g)
        cv = ai(coarse_again, g)
        np.testing.assert_allclose(np.asarray(cv.v()), np.asarray(av.v()),
                                   rtol=1e-13)

    def test_restrict_conservation(self):
        g = Grid2d(8, 8, ng=2)
        d = patch.CellCenterData2d(g)
        d.register_var("a", bnd.BC())
        d.create()
        rng = np.random.default_rng(42)
        full = np.zeros((g.qx, g.qy))
        full[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1] = rng.normal(size=(8, 8))
        d.set_var("a", jnp.asarray(full))
        cg = g.coarse_like(2)
        c = d.restrict("a")
        fine_sum = np.sum(full) * g.dx * g.dy
        coarse_sum = float(jnp.sum(ai(c, cg).v())) * cg.dx * cg.dy
        assert abs(fine_sum - coarse_sum) < 1e-12


class TestSphericalPolar:
    def test_geometry_factors(self):
        g = SphericalPolar(8, 8, ng=2, xmin=0.5, xmax=1.0,
                           ymin=0.2, ymax=np.pi - 0.2)
        # dlogAx = 2/r
        np.testing.assert_allclose(g.dlogAx, 2.0 / g.x2d)
        # volumes sum to the spherical shell volume within the theta band
        interior_V = g.V[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1]
        exact = (2 * np.pi / 3) * (1.0 ** 3 - 0.5 ** 3) * \
            (np.cos(0.2) - np.cos(np.pi - 0.2))
        np.testing.assert_allclose(np.sum(interior_V), abs(exact), rtol=1e-12)

    def test_cartesian_factors(self):
        g = Cartesian2d(4, 4, ng=1)
        np.testing.assert_allclose(g.V, g.dx * g.dy)
        np.testing.assert_allclose(g.Ax, g.dy)


class TestIO:
    def test_write_read_roundtrip(self, tmp_path):
        import pyro2_tpu.util.io_pyro as io
        g = Grid2d(8, 16, xmax=1.0, ymax=2.0)
        d = patch.CellCenterData2d(g)
        d.register_var("a", bnd.BC())
        d.create()
        d.set_aux("k", 2.5)
        d.set_var("a", jnp.asarray(
            np.exp(-(g.x2d - 0.5) ** 2 - (g.y2d - 1.0) ** 2)))
        fn = str(tmp_path / "mesh_test")
        d.write(fn)

        d2 = io.read(fn)
        assert d2.grid == g
        assert d2.get_aux("k") == 2.5
        np.testing.assert_allclose(
            np.asarray(ai(d2.get_var("a"), g).v()),
            np.asarray(ai(d.get_var("a"), g).v()))
