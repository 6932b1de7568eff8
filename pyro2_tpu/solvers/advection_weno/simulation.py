"""WENO advection Simulation (reference: pyro/advection_weno/
simulation.py): the RK driver with WENO fluxes."""

from pyro2_tpu.solvers import advection_rk
from pyro2_tpu.solvers.advection_weno import fluxes as flx


class Simulation(advection_rk.Simulation):

    @property
    def flux_fn(self):
        return flx.fluxes
