"""End-to-end advection tests through the Pyro API.

Oracles: uniform-state exactness (reference pyro/tests/test_pyro.py:39-61)
and the smooth-problem L2 convergence table
(reference advection/tests/advection_convergence.txt: errors 3.35e-2 /
1.12e-2 / 3.27e-3 / 9.21e-4 at nx=16/32/64/128, ~2nd order).
"""

import numpy as np
import pytest

from pyro2_tpu import Pyro
from pyro2_tpu.mesh.indexer import ai


class TestAdvectionExactness:
    """A uniform field must be preserved exactly by linear advection."""

    def test_uniform_preserved(self):
        p = Pyro("advection")
        p.initialize_problem("test", inputs_dict={
            "mesh.nx": 8, "mesh.ny": 8,
            "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
            "mesh.ylboundary": "periodic", "mesh.yrboundary": "periodic",
            "driver.tmax": 0.2,
        })
        p.run_sim()
        dens = np.asarray(ai(p.get_var("density"), p.get_grid()).v())
        np.testing.assert_allclose(dens, 1.0, rtol=1e-13)
        assert p.sim.n > 0


def _smooth_error(nx):
    """Advect the smooth Gaussian for one period and return the L2 error."""
    p = Pyro("advection")
    p.initialize_problem("smooth", inputs_dict={
        "mesh.nx": nx, "mesh.ny": nx,
        "driver.tmax": 1.0,
    })
    g = p.get_grid()
    exact = np.asarray(p.get_var("density"))
    p.run_sim()
    final = np.asarray(p.get_var("density"))
    err = ai(final - exact, g)
    return float(np.sqrt(g.dx * g.dy * np.sum(np.asarray(err.v()) ** 2)))


class TestAdvectionConvergence:
    def test_smooth_convergence(self):
        # reference recorded errors (advection_convergence.txt): the scheme
        # should land within ~5% of these and show ~2nd-order decay
        e16 = _smooth_error(16)
        e32 = _smooth_error(32)
        assert abs(e16 - 3.35e-2) / 3.35e-2 < 0.05, e16
        assert abs(e32 - 1.12e-2) / 1.12e-2 < 0.05, e32
        rate = np.log2(e16 / e32)
        assert rate > 1.4

    @pytest.mark.slow
    def test_smooth_convergence_high_res(self):
        e64 = _smooth_error(64)
        assert abs(e64 - 3.27e-3) / 3.27e-3 < 0.05, e64
