"""Method-of-lines compressible solver (reference: pyro/compressible_rk/)."""

from pyro2_tpu.solvers.compressible_rk.simulation import Simulation
