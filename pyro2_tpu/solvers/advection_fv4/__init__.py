"""4th-order finite-volume advection (reference: pyro/advection_fv4/)."""

from pyro2_tpu.solvers.advection_fv4.simulation import Simulation
