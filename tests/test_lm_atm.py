"""Low-Mach solver test: full-trajectory parity against the reference
implementation (run as plain Python via the numba stub)."""

import numpy as np

from pyro2_tpu import Pyro
from pyro2_tpu.mesh.indexer import ai
from tests.test_high_order import _install_ref


class TestLMAtmParity:
    def test_bubble_matches_reference(self):
        _install_ref()
        from pyro.pyro_sim import Pyro as RefPyro

        cfg = {"mesh.nx": 16, "mesh.ny": 16,
               "driver.tmax": 0.5, "driver.max_steps": 2}

        rp_ = RefPyro("lm_atm")
        rp_.initialize_problem("bubble", inputs_dict=dict(cfg))
        rp_.run_sim()

        p = Pyro("lm_atm")
        p.initialize_problem("bubble", inputs_dict=dict(cfg))
        p.run_sim()

        g = p.get_grid()
        for var in ["density", "x-velocity", "y-velocity"]:
            mine = np.asarray(ai(p.get_var(var), g).v())
            ref = np.asarray(rp_.get_var(var).v())
            np.testing.assert_allclose(mine, ref, atol=1e-13, rtol=0)
