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
