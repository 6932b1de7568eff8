"""Diffusion solver tests.

Oracle: the Gaussian diffusion problem has an analytic solution
(reference analysis/gauss_diffusion_compare.py); with C-N + MG the solved
profile must track it to truncation error.
"""

import numpy as np

from pyro2_tpu import Pyro
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.solvers.diffusion.problems.gaussian import phi_analytic


class TestDiffusion:
    def test_uniform_preserved(self):
        p = Pyro("diffusion")
        p.initialize_problem("test", inputs_dict={
            "mesh.nx": 16, "mesh.ny": 16,
            "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
            "mesh.ylboundary": "periodic", "mesh.yrboundary": "periodic",
            "driver.tmax": 0.01, "driver.max_steps": 4,
        })
        p.run_sim()
        phi = np.asarray(ai(p.get_var("phi"), p.get_grid()).v())
        np.testing.assert_allclose(phi, 1.0, rtol=1e-9)

    def test_gaussian_vs_analytic(self):
        p = Pyro("diffusion")
        p.initialize_problem("gaussian", inputs_dict={
            "mesh.nx": 64, "mesh.ny": 64,
            "driver.tmax": 0.005,
            "gaussian.t_0": 0.0005,
        })
        p.run_sim()

        g = p.get_grid()
        d = p.sim.cc_data
        k = d.get_aux("k")
        t_0 = d.get_aux("t_0")
        phi_0 = d.get_aux("phi_0")
        phi_max = d.get_aux("phi_max")

        xctr = 0.5 * (g.xmin + g.xmax)
        yctr = 0.5 * (g.ymin + g.ymax)
        dist = np.sqrt((g.x2d - xctr) ** 2 + (g.y2d - yctr) ** 2)
        exact = phi_analytic(dist, d.t, t_0, k, phi_0, phi_max)

        num = np.asarray(ai(p.get_var("phi"), g).v())
        ex = exact[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1]
        l2 = np.sqrt(g.dx * g.dy * np.sum((num - ex) ** 2))
        assert l2 < 2e-3, l2
