"""2nd-order unsplit CTU linear advection (reference: pyro/advection/)."""

from pyro2_tpu.solvers.advection.simulation import Simulation
