"""Direct trajectory parity against the reference implementation.

The reference's numba kernels run as plain Python via the numba stub
(slow, so tiny grids / few steps).  These are the strongest oracles we
have: same ICs, same dt sequence, same solution to fp roundoff.
"""

import numpy as np
import pytest

from pyro2_tpu import Pyro
from pyro2_tpu.mesh.indexer import ai
from tests.test_high_order import _install_ref


def _run_pair(solver, problem, cfg, variables):
    _install_ref()
    from pyro.pyro_sim import Pyro as RefPyro

    rp_ = RefPyro(solver)
    rp_.initialize_problem(problem, inputs_dict=dict(cfg))
    rp_.run_sim()

    p = Pyro(solver)
    p.initialize_problem(problem, inputs_dict=dict(cfg))
    p.run_sim()

    assert p.sim.n == rp_.sim.n, (p.sim.n, rp_.sim.n)
    g = p.get_grid()
    out = {}
    for var in variables:
        mine = np.asarray(ai(p.get_var(var), g).v())
        ref = np.asarray(rp_.get_var(var).v())
        out[var] = (mine, ref)
    return out


class TestCompressibleParity:
    @pytest.mark.parametrize("riemann", ["HLLC", "CGF"])
    def test_sod_small(self, riemann):
        cfg = {"mesh.nx": 16, "mesh.ny": 8,
               "mesh.xmax": 1.0, "mesh.ymax": 0.5,
               "mesh.xlboundary": "outflow", "mesh.xrboundary": "outflow",
               "driver.tmax": 0.2, "driver.max_steps": 3,
               "compressible.limiter": 1,
               "compressible.riemann": riemann}
        out = _run_pair("compressible", "sod", cfg,
                        ["density", "energy", "x-momentum"])
        for var, (mine, ref) in out.items():
            np.testing.assert_allclose(mine, ref, rtol=1e-12, atol=1e-13,
                                       err_msg=var)

    def test_kh_gravityless(self):
        cfg = {"mesh.nx": 16, "mesh.ny": 16,
               "driver.tmax": 0.1, "driver.max_steps": 3}
        out = _run_pair("compressible", "kh", cfg,
                        ["density", "x-momentum", "y-momentum", "energy"])
        for var, (mine, ref) in out.items():
            np.testing.assert_allclose(mine, ref, rtol=1e-12, atol=1e-13,
                                       err_msg=var)


class TestSWEParity:
    @pytest.mark.parametrize("riemann", ["Roe", "HLLC"])
    def test_dam_small(self, riemann):
        cfg = {"mesh.nx": 16, "mesh.ny": 8,
               "mesh.xmax": 1.0, "mesh.ymax": 0.5,
               "mesh.xlboundary": "outflow", "mesh.xrboundary": "outflow",
               "driver.tmax": 0.3, "driver.max_steps": 3,
               "swe.limiter": 1, "swe.riemann": riemann}
        out = _run_pair("swe", "dam", cfg,
                        ["height", "x-momentum", "fuel"])
        for var, (mine, ref) in out.items():
            np.testing.assert_allclose(mine, ref, rtol=1e-12, atol=1e-13,
                                       err_msg=var)


class TestSphericalParity:
    def test_spherical_advect(self):
        """Spherical-geometry compressible advect: geometry factors,
        dlogA tracing sources, pressure-gradient updates."""
        cfg = {"mesh.nx": 16, "mesh.ny": 16,
               "mesh.grid_type": "SphericalPolar",
               "mesh.xmin": 0.5, "mesh.xmax": 1.0,
               "mesh.ymin": 0.7853981633974483,   # pi/4
               "mesh.ymax": 2.356194490192345,    # 3 pi/4
               "mesh.xlboundary": "outflow", "mesh.xrboundary": "outflow",
               "mesh.ylboundary": "outflow", "mesh.yrboundary": "outflow",
               "compressible.riemann": "CGF",
               "driver.tmax": 0.05, "driver.max_steps": 3}
        out = _run_pair("compressible", "advect", cfg,
                        ["density", "x-momentum", "y-momentum", "energy"])
        for var, (mine, ref) in out.items():
            np.testing.assert_allclose(mine, ref, rtol=1e-11, atol=1e-12,
                                       err_msg=var)


class TestLongHorizonParity:
    """Longer-horizon trajectory parity (>= 10 steps) across six solver
    families at loose tolerance -- dt sequences are data-dependent, so
    fp drift compounds per step; rtol 1e-8 is far below any
    discretization-level disagreement (VERDICT r2 item 10)."""

    def test_sod_full_horizon(self):
        """Full Sod tube to t = 0.2 (reference oracle
        compressible/tests/sod_x_0076.h5's configuration, narrower)."""
        cfg = {"mesh.nx": 32, "mesh.ny": 8,
               "mesh.xmax": 1.0, "mesh.ymax": 0.25,
               "mesh.xlboundary": "outflow", "mesh.xrboundary": "outflow",
               "driver.tmax": 0.2}
        out = _run_pair("compressible", "sod", cfg,
                        ["density", "energy", "x-momentum"])
        for var, (mine, ref) in out.items():
            np.testing.assert_allclose(mine, ref, rtol=1e-8, atol=1e-9,
                                       err_msg=var)

    def test_dam_horizon(self):
        cfg = {"mesh.nx": 32, "mesh.ny": 8,
               "mesh.xmax": 1.0, "mesh.ymax": 0.25,
               "mesh.xlboundary": "outflow", "mesh.xrboundary": "outflow",
               "driver.tmax": 0.3}
        out = _run_pair("swe", "dam", cfg, ["height", "x-momentum"])
        for var, (mine, ref) in out.items():
            np.testing.assert_allclose(mine, ref, rtol=1e-8, atol=1e-9,
                                       err_msg=var)

    def test_advection_smooth_period(self):
        """One full advection period (the tests' exactness oracle)."""
        cfg = {"mesh.nx": 16, "mesh.ny": 16, "driver.tmax": 1.0}
        out = _run_pair("advection", "smooth", cfg, ["density"])
        for var, (mine, ref) in out.items():
            np.testing.assert_allclose(mine, ref, rtol=1e-10, atol=1e-12,
                                       err_msg=var)

    def test_diffusion_gaussian_horizon(self):
        cfg = {"mesh.nx": 16, "mesh.ny": 16, "driver.tmax": 0.005,
               "driver.max_steps": 20}
        out = _run_pair("diffusion", "gaussian", cfg, ["phi"])
        for var, (mine, ref) in out.items():
            np.testing.assert_allclose(mine, ref, rtol=1e-9, atol=1e-11,
                                       err_msg=var)

    def test_incompressible_shear_horizon(self):
        """Shear layer, >= 10 steps incl. MAC + final projections."""
        cfg = {"mesh.nx": 16, "mesh.ny": 16, "driver.max_steps": 12,
               "driver.tmax": 10.0}
        out = _run_pair("incompressible", "shear", cfg,
                        ["x-velocity", "y-velocity"])
        for var, (mine, ref) in out.items():
            np.testing.assert_allclose(mine, ref, rtol=1e-8, atol=1e-10,
                                       err_msg=var)

    def test_burgers_horizon(self):
        cfg = {"mesh.nx": 16, "mesh.ny": 16, "driver.max_steps": 12,
               "driver.tmax": 10.0}
        out = _run_pair("burgers", "test", cfg,
                        ["x-velocity", "y-velocity"])
        for var, (mine, ref) in out.items():
            np.testing.assert_allclose(mine, ref, rtol=1e-8, atol=1e-10,
                                       err_msg=var)

    def test_lm_atm_bubble_horizon(self):
        """10 steps of the lm_atm bubble: base state, vc-MG projections,
        numba-stubbed interface kernels on the reference side."""
        cfg = {"mesh.nx": 16, "mesh.ny": 16, "mesh.xmax": 1.0,
               "mesh.ymax": 1.0, "driver.max_steps": 10,
               "driver.tmax": 10.0,
               "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
               "mesh.ylboundary": "reflect", "mesh.yrboundary": "outflow"}
        out = _run_pair("lm_atm", "bubble", cfg,
                        ["density", "x-velocity", "y-velocity"])
        for var, (mine, ref) in out.items():
            np.testing.assert_allclose(mine, ref, rtol=1e-8, atol=1e-10,
                                       err_msg=var)
