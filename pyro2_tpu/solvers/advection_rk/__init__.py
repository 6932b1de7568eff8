"""Method-of-lines linear advection with RK time integration
(reference: pyro/advection_rk/)."""

from pyro2_tpu.solvers.advection_rk.simulation import Simulation
