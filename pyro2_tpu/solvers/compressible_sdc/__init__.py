"""4th-order compressible solver with SDC time integration
(reference: pyro/compressible_sdc/)."""

from pyro2_tpu.solvers.compressible_sdc.simulation import Simulation
