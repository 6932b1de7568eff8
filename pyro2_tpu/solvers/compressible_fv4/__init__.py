"""4th-order (McCorquodale & Colella) compressible solver
(reference: pyro/compressible_fv4/)."""

from pyro2_tpu.solvers.compressible_fv4.simulation import Simulation
