"""Multigrid tests against analytic elliptic solutions.

Oracles come from the reference's example/regression scripts:
* constant-coefficient Poisson Dirichlet (A Multigrid Tutorial p.64 problem):
  truncation errors 4.07e-4 / 1.02e-4 / 2.57e-5 at 16/32/64^2
  (multigrid/tests/mg_convergence.txt);
* variable-coefficient Poisson (mg_test_vc_dirichlet.py);
* general-form inhomogeneous problem (mg_test_general_inhomogeneous.py);
* EdgeCoeffs exact averaging (multigrid/tests/test_multigrid_comps.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pyro2_tpu.mesh.boundary as bnd
from pyro2_tpu.mesh import patch
from pyro2_tpu.mesh.grid import Grid2d
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.multigrid import MG
from pyro2_tpu.multigrid.edge_coeffs import EdgeCoeffs
from pyro2_tpu.multigrid.general_MG import GeneralMG2d
from pyro2_tpu.multigrid.variable_coeff_MG import VarCoeffCCMG2d


def _l2(e, g):
    return float(np.sqrt(g.dx * g.dy *
                         np.sum(np.asarray(ai(e, g).v()) ** 2)))


class TestEdgeCoeffs:
    def test_uniform_eta(self):
        g = Grid2d(8, 8, ng=1)
        eta = jnp.full((g.qx, g.qy), 3.0)
        e = EdgeCoeffs(g, eta)
        # interior edge values = eta/dx^2
        np.testing.assert_allclose(
            np.asarray(e.x[g.ilo:g.ihi + 2, g.jlo:g.jhi + 1]),
            3.0 / g.dx ** 2)
        # restriction preserves a constant coefficient
        ec = e.restrict()
        cg = g.coarse_like(2)
        np.testing.assert_allclose(
            np.asarray(ec.x[cg.ilo:cg.ihi + 2, cg.jlo:cg.jhi + 1]),
            3.0 / cg.dx ** 2)

    def test_linear_eta_exact(self):
        # eta = x: edge value at i-1/2 should be average of neighbors = x_l
        g = Grid2d(8, 8, ng=1)
        eta = jnp.asarray(g.x2d)
        e = EdgeCoeffs(g, eta)
        expected = g.xl2d[g.ilo:g.ihi + 2, g.jlo:g.jhi + 1] / g.dx ** 2
        np.testing.assert_allclose(
            np.asarray(e.x[g.ilo:g.ihi + 2, g.jlo:g.jhi + 1]), expected,
            rtol=1e-13)


class TestPoissonDirichlet:
    """u_xx + u_yy = f with u = (x^2-x^4)(y^4-y^2) exact."""

    @staticmethod
    def _solve(N):
        def true(x, y):
            return (x ** 2 - x ** 4) * (y ** 4 - y ** 2)

        def f(x, y):
            return -2.0 * ((1.0 - 6.0 * x ** 2) * y ** 2 * (1.0 - y ** 2) +
                           (1.0 - 6.0 * y ** 2) * x ** 2 * (1.0 - x ** 2))

        a = MG.CellCenterMG2d(N, N, verbose=0,
                              xl_BC_type="dirichlet", yl_BC_type="dirichlet",
                              xr_BC_type="dirichlet", yr_BC_type="dirichlet")
        a.init_zeros()
        a.init_RHS(jnp.asarray(f(a.x2d, a.y2d)))
        a.solve(rtol=1.e-11)

        v = a.get_solution()
        e = v - jnp.asarray(true(a.x2d, a.y2d))
        return _l2(e, a.soln_grid), a

    def test_truncation_error_16(self):
        err, a = self._solve(16)
        assert abs(err - 4.07e-4) / 4.07e-4 < 0.03, err
        assert a.num_cycles < 15
        assert a.residual_error < 1.e-11

    def test_truncation_error_32(self):
        err, _ = self._solve(32)
        assert abs(err - 1.02e-4) / 1.02e-4 < 0.03, err

    def test_truncation_error_64(self):
        err, _ = self._solve(64)
        assert abs(err - 2.57e-5) / 2.57e-5 < 0.03, err


class TestPoissonPeriodicNeumann:
    def test_neumann_periodic_mix(self):
        # u = cos(2 pi x) * y(1-y)-ish problem: instead verify that a pure
        # periodic Poisson solve reproduces a sinusoid
        N = 32

        def true(x, y):
            return np.sin(2 * np.pi * x) * np.sin(2 * np.pi * y)

        def f(x, y):
            return -8 * np.pi ** 2 * true(x, y)

        a = MG.CellCenterMG2d(N, N, verbose=0,
                              xl_BC_type="periodic", xr_BC_type="periodic",
                              yl_BC_type="periodic", yr_BC_type="periodic")
        a.init_zeros()
        a.init_RHS(jnp.asarray(f(a.x2d, a.y2d)))
        a.solve(rtol=1.e-11)
        v = np.asarray(a.get_solution())
        # periodic solutions have a free constant: compare demeaned fields
        g = a.soln_grid
        vi = v[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1]
        ti = true(a.x2d, a.y2d)[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1]
        err = (vi - vi.mean()) - (ti - ti.mean())
        l2 = np.sqrt(g.dx * g.dy * np.sum(err ** 2))
        assert l2 < 5e-3, l2


class TestVarCoeff:
    def test_vc_dirichlet(self):
        N = 32

        def true(x, y):
            return np.sin(2.0 * np.pi * x) * np.sin(2.0 * np.pi * y)

        def alpha(x, y):
            return 2.0 + np.cos(2.0 * np.pi * x) * np.cos(2.0 * np.pi * y)

        def f(x, y):
            return (-16.0 * np.pi ** 2 *
                    (np.cos(2 * np.pi * x) * np.cos(2 * np.pi * y) + 1) *
                    np.sin(2 * np.pi * x) * np.sin(2 * np.pi * y))

        g = Grid2d(N, N, ng=1)
        bc_c = bnd.BC(xlb="neumann", xrb="neumann",
                      ylb="neumann", yrb="neumann")
        c = jnp.asarray(alpha(g.x2d, g.y2d))

        a = VarCoeffCCMG2d(N, N,
                           xl_BC_type="dirichlet", yl_BC_type="dirichlet",
                           xr_BC_type="dirichlet", yr_BC_type="dirichlet",
                           coeffs=c, coeffs_bc=bc_c, verbose=0)
        a.init_zeros()
        a.init_RHS(jnp.asarray(f(a.x2d, a.y2d)))
        a.solve(rtol=1.e-11)

        v = a.get_solution()
        err = _l2(v - jnp.asarray(true(a.x2d, a.y2d)), a.soln_grid)
        # 2nd-order truncation error at 32^2 for this problem is ~1e-2
        assert err < 2.5e-2, err
        assert a.residual_error < 1.e-11


class TestGeneralMG:
    def test_general_inhomogeneous(self):
        N = 32

        def true(x, y):
            return np.cos(np.pi * x / 2.0) * np.cos(np.pi * y / 2.0)

        def f(x, y):
            return (-0.5 * np.pi * (x + 1.0) * np.sin(np.pi * y / 2.0) *
                    np.cos(np.pi * x / 2.0) -
                    0.5 * np.pi * (y + 1.0) * np.sin(np.pi * x / 2.0) *
                    np.cos(np.pi * y / 2.0) +
                    (-np.pi ** 2 * (x * y + 1.0) / 2.0 + 10.0) *
                    np.cos(np.pi * x / 2.0) * np.cos(np.pi * y / 2.0))

        g = Grid2d(N, N, ng=1)
        d = patch.CellCenterData2d(g)
        bc_c = bnd.BC(xlb="neumann", xrb="neumann",
                      ylb="neumann", yrb="neumann")
        for name in ["alpha", "beta", "gamma_x", "gamma_y"]:
            d.register_var(name, bc_c)
        d.create()
        d.set_var("alpha", jnp.full((g.qx, g.qy), 10.0))
        d.set_var("beta", jnp.asarray(g.x2d * g.y2d + 1.0))
        d.set_var("gamma_x", jnp.ones((g.qx, g.qy)))
        d.set_var("gamma_y", jnp.ones((g.qx, g.qy)))

        a = GeneralMG2d(N, N,
                        xl_BC_type="dirichlet", yl_BC_type="dirichlet",
                        xr_BC_type="dirichlet", yr_BC_type="dirichlet",
                        xl_BC=lambda y: np.cos(np.pi * y / 2.0),
                        yl_BC=lambda x: np.cos(np.pi * x / 2.0),
                        coeffs=d, verbose=0)
        a.init_zeros()
        a.init_RHS(jnp.asarray(f(a.x2d, a.y2d)))
        a.solve(rtol=1.e-11)

        v = a.get_solution()
        err = _l2(v - jnp.asarray(true(a.x2d, a.y2d)), a.soln_grid)
        assert err < 5e-3, err
        assert a.residual_error < 1.e-11


class TestFusedPallasCycle:
    """The fused Pallas V-cycle (multigrid/pallas_mg.py) must reproduce the
    jnp V-cycle.  Runs in Pallas interpret mode (f64 on the CPU test
    backend) where the two agree to roundoff."""

    def _cycle_pair(self, bct):
        from pyro2_tpu.multigrid import pallas_mg
        MG._CYCLE_CACHE.clear()
        mg = MG.CellCenterMG2d(32, 32,
                               xl_BC_type=bct[0], xr_BC_type=bct[1],
                               yl_BC_type=bct[2], yr_BC_type=bct[3],
                               alpha=0.7, beta=-1.3, verbose=0)
        g = mg.soln_grid
        f = jnp.asarray(np.sin(2 * np.pi * g.x2d) *
                        np.cos(4 * np.pi * g.y2d) + 0.3 * g.x2d)
        v0 = jnp.zeros((g.qx, g.qy), f.dtype)
        fused = pallas_mg.build_fused_cycle(mg, interpret=True)
        jnp_cycle = MG.CellCenterMG2d._build_cycle.__wrapped__(mg) \
            if hasattr(MG.CellCenterMG2d._build_cycle, "__wrapped__") \
            else None
        # build the jnp path directly (bypassing the TPU dispatch logic)
        nlev = mg.nlevels - 1

        def one_cycle(v, ff, params):
            v = mg._v_cycle(nlev, v, ff, params)
            r = mg._residual(nlev, v, ff, params)
            return v, r, ai(r, g).norm()

        p = mg._params()
        vf, rf, nf = fused(v0, f, p)
        vj, rj, nj = one_cycle(v0, f, p)
        return (np.asarray(vf), np.asarray(rf), float(nf),
                np.asarray(vj), np.asarray(rj), float(nj))

    def test_dirichlet_parity(self):
        vf, rf, nf, vj, rj, nj = self._cycle_pair(["dirichlet"] * 4)
        assert np.max(np.abs(vf - vj)) < 1e-13 * max(1, np.abs(vj).max())
        assert abs(nf - nj) < 1e-12 * max(1.0, nj)

    def test_periodic_neumann_parity(self):
        vf, rf, nf, vj, rj, nj = self._cycle_pair(
            ["periodic", "periodic", "neumann", "neumann"])
        assert np.max(np.abs(vf - vj)) < 1e-13 * max(1, np.abs(vj).max())

    def test_peeled_level_parity(self):
        """Force level peeling (CORE_MAX below the fine grid) so the
        DOWN/UP kernel path is exercised."""
        from pyro2_tpu.multigrid import pallas_mg
        saved = pallas_mg.CORE_MAX
        pallas_mg.CORE_MAX = 8
        try:
            vf, rf, nf, vj, rj, nj = self._cycle_pair(["dirichlet"] * 4)
        finally:
            pallas_mg.CORE_MAX = saved
        assert np.max(np.abs(vf - vj)) < 1e-13 * max(1, np.abs(vj).max())
        assert abs(nf - nj) < 1e-12 * max(1.0, nj)

    @pytest.mark.slow
    @pytest.mark.parametrize("bct", [
        ["dirichlet", "dirichlet", "dirichlet", "dirichlet"],
        # lane (y) periodic is allowed at banded levels; only ROW
        # periodic needs wrap halos
        ["neumann", "neumann", "periodic", "periodic"],
    ])
    def test_banded_level_parity(self, bct):
        """Force row-banding (WHOLE_MAX/BAND_ROWS below the fine grid) so
        the deep-halo banded DOWN/UP kernels (the >512^2 path) are
        exercised with multiple bands and clamped edge windows.
        nsmooth=2 keeps the halo depth below the test's band size
        (BAND_ROWS=16: the aligned geometry needs 16 | T)."""
        from pyro2_tpu.multigrid import pallas_mg
        saved = (pallas_mg.CORE_MAX, pallas_mg.WHOLE_MAX,
                 pallas_mg.BAND_ROWS)
        pallas_mg.CORE_MAX = 8
        pallas_mg.WHOLE_MAX = 16
        pallas_mg.BAND_ROWS = 16
        try:
            MG._CYCLE_CACHE.clear()
            mg = MG.CellCenterMG2d(64, 64,
                                   xl_BC_type=bct[0], xr_BC_type=bct[1],
                                   yl_BC_type=bct[2], yr_BC_type=bct[3],
                                   alpha=0.7, beta=-1.3, nsmooth=2,
                                   verbose=0)
            g = mg.soln_grid
            f = jnp.asarray(np.sin(2 * np.pi * g.x2d) *
                            np.cos(4 * np.pi * g.y2d) + 0.3 * g.x2d)
            v0 = jnp.zeros((g.qx, g.qy), f.dtype)
            fused = pallas_mg.build_fused_cycle(mg, interpret=True)
            nlev = mg.nlevels - 1

            def one_cycle(v, ff, params):
                v = mg._v_cycle(nlev, v, ff, params)
                r = mg._residual(nlev, v, ff, params)
                return v, r, ai(r, g).norm()

            p = mg._params()
            vf, rf, nf = fused(v0, f, p)
            vj, rj, nj = one_cycle(v0, f, p)
        finally:
            (pallas_mg.CORE_MAX, pallas_mg.WHOLE_MAX,
             pallas_mg.BAND_ROWS) = saved
        vf, vj = np.asarray(vf), np.asarray(vj)
        assert np.max(np.abs(vf - vj)) < 1e-13 * max(1, np.abs(vj).max())
        assert abs(float(nf) - float(nj)) < 1e-12 * max(1.0, float(nj))

    def test_banded_rejects_periodic_rows(self):
        """Row-periodic BCs cannot band (wrap halos): Ineligible, so the
        jnp path takes over."""
        from pyro2_tpu.multigrid import pallas_mg
        saved = (pallas_mg.CORE_MAX, pallas_mg.WHOLE_MAX,
                 pallas_mg.BAND_ROWS)
        pallas_mg.CORE_MAX = 8
        pallas_mg.WHOLE_MAX = 16
        pallas_mg.BAND_ROWS = 16
        try:
            MG._CYCLE_CACHE.clear()
            mg = MG.CellCenterMG2d(32, 32,
                                   xl_BC_type="periodic",
                                   xr_BC_type="periodic",
                                   yl_BC_type="periodic",
                                   yr_BC_type="periodic", verbose=0)
            import pytest as _pytest
            with _pytest.raises(pallas_mg.Ineligible):
                pallas_mg.build_fused_cycle(mg, interpret=True)
        finally:
            (pallas_mg.CORE_MAX, pallas_mg.WHOLE_MAX,
             pallas_mg.BAND_ROWS) = saved

    def test_full_solve_interpret(self):
        """End-to-end solve through the fused path (interpret mode)."""
        from pyro2_tpu.multigrid import pallas_mg
        MG._CYCLE_CACHE.clear()
        MG._FORCE_PALLAS_INTERPRET = True
        try:
            N = 64
            mg = MG.CellCenterMG2d(N, N, verbose=0, alpha=0.0, beta=-1.0)
            g = mg.soln_grid
            f = -2.0 * ((1.0 - 6.0 * g.x2d ** 2) * g.y2d ** 2 *
                        (1.0 - g.y2d ** 2) +
                        (1.0 - 6.0 * g.y2d ** 2) * g.x2d ** 2 *
                        (1.0 - g.x2d ** 2))
            true = (g.x2d ** 2 - g.x2d ** 4) * (g.y2d ** 4 - g.y2d ** 2)
            mg.init_zeros()
            mg.init_RHS(jnp.asarray(f))
            mg.solve(rtol=1e-11)
            err = _l2(jnp.asarray(mg.get_solution()) - jnp.asarray(true), g)
            # mg_convergence.txt: 2.57e-5 at 64^2
            assert err < 3.0e-5, err
            assert mg.residual_error < 1e-11
        finally:
            MG._FORCE_PALLAS_INTERPRET = False
            MG._CYCLE_CACHE.clear()


class TestFusedGeneralCycle:
    """The fused coefficient-operator V-cycle (multigrid/pallas_gen_mg.py)
    must reproduce the jnp cycles of VarCoeffCCMG2d / GeneralMG2d.
    Interpret mode, f64 -> roundoff agreement."""

    def _vc_mg(self, N=32):
        g = Grid2d(N, N, ng=1)
        bc_c = bnd.BC(xlb="neumann", xrb="neumann",
                      ylb="neumann", yrb="neumann")
        c = jnp.asarray(2.0 + np.cos(2 * np.pi * g.x2d) *
                        np.cos(2 * np.pi * g.y2d))
        return VarCoeffCCMG2d(N, N, coeffs=c, coeffs_bc=bc_c, verbose=0)

    def _general_mg(self, N=32):
        g = Grid2d(N, N, ng=1)
        d = patch.CellCenterData2d(g)
        bc_c = bnd.BC(xlb="neumann", xrb="neumann",
                      ylb="neumann", yrb="neumann")
        for name in ["alpha", "beta", "gamma_x", "gamma_y"]:
            d.register_var(name, bc_c)
        d.create()
        d.set_var("alpha", jnp.full((g.qx, g.qy), 10.0))
        d.set_var("beta", jnp.asarray(g.x2d * g.y2d + 1.0))
        d.set_var("gamma_x", jnp.ones((g.qx, g.qy)))
        d.set_var("gamma_y", jnp.ones((g.qx, g.qy)))
        return GeneralMG2d(N, N, coeffs=d, verbose=0)

    def _pair(self, mg):
        from pyro2_tpu.multigrid import pallas_gen_mg
        MG._CYCLE_CACHE.clear()
        g = mg.soln_grid
        f = jnp.asarray(np.sin(2 * np.pi * g.x2d) *
                        np.cos(4 * np.pi * g.y2d) + 0.3 * g.x2d)
        v0 = jnp.zeros((g.qx, g.qy), f.dtype)
        fused = pallas_gen_mg.build_fused_cycle_general(mg, interpret=True)
        nlev = mg.nlevels - 1

        def one_cycle(v, ff, params):
            v = mg._v_cycle(nlev, v, ff, params)
            r = mg._residual(nlev, v, ff, params)
            return v, r, ai(r, g).norm()

        p = mg._params()
        vf, rf, nf = fused(v0, f, p)
        vj, rj, nj = one_cycle(v0, f, p)
        return (np.asarray(vf), float(nf), np.asarray(vj), float(nj))

    def test_vc_parity(self):
        vf, nf, vj, nj = self._pair(self._vc_mg())
        assert np.max(np.abs(vf - vj)) < 1e-13 * max(1, np.abs(vj).max())
        assert abs(nf - nj) < 1e-12 * max(1.0, nj)

    def test_general_parity(self):
        vf, nf, vj, nj = self._pair(self._general_mg())
        assert np.max(np.abs(vf - vj)) < 1e-13 * max(1, np.abs(vj).max())
        assert abs(nf - nj) < 1e-12 * max(1.0, nj)

    def test_vc_peeled_parity(self):
        """Force level peeling so the coefficient DOWN/UP kernels run."""
        from pyro2_tpu.multigrid import pallas_mg
        saved = pallas_mg.CORE_MAX
        pallas_mg.CORE_MAX = 8
        try:
            vf, nf, vj, nj = self._pair(self._vc_mg())
        finally:
            pallas_mg.CORE_MAX = saved
        assert np.max(np.abs(vf - vj)) < 1e-13 * max(1, np.abs(vj).max())
        assert abs(nf - nj) < 1e-12 * max(1.0, nj)

    def test_general_peeled_parity(self):
        from pyro2_tpu.multigrid import pallas_mg
        saved = pallas_mg.CORE_MAX
        pallas_mg.CORE_MAX = 8
        try:
            vf, nf, vj, nj = self._pair(self._general_mg())
        finally:
            pallas_mg.CORE_MAX = saved
        assert np.max(np.abs(vf - vj)) < 1e-13 * max(1, np.abs(vj).max())

    def test_inhomogeneous_ineligible(self):
        """Inhomogeneous general BCs stay on the jnp path."""
        from pyro2_tpu.multigrid import pallas_gen_mg
        N = 16
        g = Grid2d(N, N, ng=1)
        d = patch.CellCenterData2d(g)
        bc_c = bnd.BC(xlb="neumann", xrb="neumann",
                      ylb="neumann", yrb="neumann")
        for name in ["alpha", "beta", "gamma_x", "gamma_y"]:
            d.register_var(name, bc_c)
        d.create()
        d.set_var("beta", jnp.ones((g.qx, g.qy)))
        mg = GeneralMG2d(N, N, coeffs=d,
                         xl_BC=lambda y: np.cos(np.pi * y / 2.0),
                         verbose=0)
        import pytest as _pytest
        with _pytest.raises(pallas_gen_mg.Ineligible):
            pallas_gen_mg.build_fused_cycle_general(mg, interpret=True)

    @pytest.mark.slow
    def test_vc_banded_level_parity(self):
        """Force row-banding so the coefficient banded DOWN/UP kernels
        (the >512^2 tier with per-band plane DMA) are exercised."""
        from pyro2_tpu.multigrid import pallas_gen_mg, pallas_mg
        saved = (pallas_mg.CORE_MAX, pallas_mg.WHOLE_MAX,
                 pallas_mg.BAND_ROWS)
        pallas_mg.CORE_MAX = 8
        pallas_mg.WHOLE_MAX = 16
        pallas_mg.BAND_ROWS = 16
        try:
            MG._CYCLE_CACHE.clear()
            N = 64
            g = Grid2d(N, N, ng=1)
            bc_c = bnd.BC(xlb="neumann", xrb="neumann",
                          ylb="neumann", yrb="neumann")
            c = jnp.asarray(2.0 + np.cos(2 * np.pi * g.x2d) *
                            np.cos(2 * np.pi * g.y2d))
            mg = VarCoeffCCMG2d(N, N, coeffs=c, coeffs_bc=bc_c,
                                nsmooth=2, verbose=0)
            gg = mg.soln_grid
            f = jnp.asarray(np.sin(2 * np.pi * gg.x2d) *
                            np.cos(4 * np.pi * gg.y2d) + 0.3 * gg.x2d)
            v0 = jnp.zeros((gg.qx, gg.qy), f.dtype)
            fused = pallas_gen_mg.build_fused_cycle_general(
                mg, interpret=True)
            nlev = mg.nlevels - 1

            def one_cycle(v, ff, params):
                v = mg._v_cycle(nlev, v, ff, params)
                r = mg._residual(nlev, v, ff, params)
                return v, r, ai(r, gg).norm()

            p = mg._params()
            vf, rf, nf = fused(v0, f, p)
            vj, rj, nj = one_cycle(v0, f, p)
        finally:
            (pallas_mg.CORE_MAX, pallas_mg.WHOLE_MAX,
             pallas_mg.BAND_ROWS) = saved
        vf, vj = np.asarray(vf), np.asarray(vj)
        assert np.max(np.abs(vf - vj)) < 1e-13 * max(1, np.abs(vj).max())
        assert abs(float(nf) - float(nj)) < 1e-12 * max(1.0, float(nj))

    def test_vc_full_solve_interpret(self):
        """End-to-end vc solve auto-routed through the fused path: same
        analytic problem as TestVarCoeff, forced onto the kernels."""
        MG._CYCLE_CACHE.clear()
        MG._FORCE_PALLAS_INTERPRET = True
        try:
            N = 32

            def true_fn(x, y):
                return np.sin(2.0 * np.pi * x) * np.sin(2.0 * np.pi * y)

            def eta(x, y):
                return 2.0 + np.cos(2.0 * np.pi * x) * \
                    np.cos(2.0 * np.pi * y)

            def frhs(x, y):
                return (-16.0 * np.pi ** 2 *
                        (np.cos(2 * np.pi * x) * np.cos(2 * np.pi * y)
                         + 1) *
                        np.sin(2 * np.pi * x) * np.sin(2 * np.pi * y))

            g = Grid2d(N, N, ng=1)
            bc_c = bnd.BC(xlb="neumann", xrb="neumann",
                          ylb="neumann", yrb="neumann")
            c = jnp.asarray(eta(g.x2d, g.y2d))
            a = VarCoeffCCMG2d(N, N, coeffs=c, coeffs_bc=bc_c, verbose=0)
            a.init_zeros()
            a.init_RHS(jnp.asarray(frhs(a.x2d, a.y2d)))
            a.solve(rtol=1.e-11)
            v = a.get_solution()
            err = _l2(v - jnp.asarray(true_fn(a.x2d, a.y2d)), a.soln_grid)
            assert err < 2.5e-2, err
            assert a.residual_error < 1.e-11
        finally:
            MG._FORCE_PALLAS_INTERPRET = False
            MG._CYCLE_CACHE.clear()


class TestMGExamples:
    """The reference's multigrid/examples/ scripts double as regression
    tests (reference test.py:136-157); run the newly-added ones at small N."""

    def test_general_constant(self):
        from pyro2_tpu.multigrid.examples.mg_test_general_constant import \
            test_general_poisson_constant
        assert test_general_poisson_constant(32) < 1.5e-4

    def test_general_beta_only(self):
        from pyro2_tpu.multigrid.examples.mg_test_general_beta_only import \
            test_general_poisson_beta_only
        assert test_general_poisson_beta_only(32) < 2.0e-3

    def test_general_alphabeta_only(self):
        from pyro2_tpu.multigrid.examples.mg_test_general_alphabeta_only \
            import test_general_poisson_alphabeta_only
        assert test_general_poisson_alphabeta_only(32) < 2.0e-3

    def test_general_dirichlet_all_terms(self):
        from pyro2_tpu.multigrid.examples.mg_test_general_dirichlet import \
            test_general_poisson_dirichlet
        assert test_general_poisson_dirichlet(32) < 2.0e-3

    def test_vc_constant(self):
        from pyro2_tpu.multigrid.examples.mg_test_vc_constant import \
            test_vc_poisson_constant
        assert test_vc_poisson_constant(32) < 1.5e-4

    def test_project_periodic(self):
        """Each approximate projection shrinks the divergence."""
        from pyro2_tpu.multigrid.examples.project_periodic import doit
        import os
        import tempfile
        cwd = os.getcwd()
        with tempfile.TemporaryDirectory() as d:
            os.chdir(d)
            try:
                dn = doit(32, 32, nproj=2)
            finally:
                os.chdir(cwd)
        assert dn[1] < 0.2 * dn[0], dn


class TestIterativeRefinement:
    """Double-f32 iterative refinement (multigrid/refine.py): the f32
    solve's residual stall must be pushed >=1e4x deeper, recovering the
    f64-solve answer (CPU twin of the hardware test in
    test_precision_tpu.py)."""

    def test_f32_deep_tolerance(self):
        import jax.numpy as jnp
        import numpy as np
        from pyro2_tpu.multigrid import MG
        from pyro2_tpu.multigrid.refine import solve_ir

        N = 128
        mg = MG.CellCenterMG2d(N, N, verbose=0)
        g = mg.soln_grid
        x, y = np.asarray(g.x2d), np.asarray(g.y2d)
        f32 = jnp.asarray(
            -2.0 * ((1.0 - 6.0 * x ** 2) * y ** 2 * (1.0 - y ** 2) +
                    (1.0 - 6.0 * y ** 2) * x ** 2 * (1.0 - x ** 2)),
            jnp.float32)
        # force the whole hierarchy to f32 (conftest enables x64)
        mg.v = [v.astype(jnp.float32) for v in mg.v]
        mg.f = [v.astype(jnp.float32) for v in mg.f]
        mg.init_zeros()
        mg.init_RHS(f32)
        mg.solve(rtol=1e-10)
        res_direct = mg.residual_error
        assert res_direct > 1e-6      # the documented f32 stall

        mg.init_zeros()
        mg.init_RHS(f32)
        res, n_ref = solve_ir(mg, rtol=1e-10)
        assert res < 1e-4 * res_direct, (res, res_direct)
        assert res < 3e-9, res

        # solution error reaches the f64-solve truncation level
        mg64 = MG.CellCenterMG2d(N, N, verbose=0)
        mg64.init_zeros()
        mg64.init_RHS(jnp.asarray(f32, jnp.float64))
        mg64.solve(rtol=1e-11)
        v32 = np.asarray(mg.get_solution(), np.float64) + \
            np.asarray(mg.v_lo, np.float64)
        v64 = np.asarray(mg64.get_solution())
        d = np.abs(v32 - v64)[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1].max()
        assert d < 1e-8, d

    def test_two_sum_two_prod_exact(self):
        import jax.numpy as jnp
        import numpy as np
        from pyro2_tpu.multigrid.refine import two_prod, two_sum

        rng = np.random.default_rng(7)
        a = jnp.asarray(rng.normal(size=128).astype(np.float32))
        b = jnp.asarray((rng.normal(size=128) * 1e-6).astype(np.float32))
        s, e = two_sum(a, b)
        exact = (np.asarray(a, np.float64) + np.asarray(b, np.float64))
        got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
        np.testing.assert_array_equal(got, exact)

        p, pe = two_prod(a, b)
        exactp = np.asarray(a, np.float64) * np.asarray(b, np.float64)
        gotp = np.asarray(p, np.float64) + np.asarray(pe, np.float64)
        # TwoProd is exact in f32: hi+lo equals the f64 product of the
        # f32 inputs (which is itself exact: 24+24 bits < 53)
        np.testing.assert_array_equal(gotp, exactp)
