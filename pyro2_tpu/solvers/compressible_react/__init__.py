"""Strang-split reacting compressible flow scaffold
(reference: pyro/compressible_react/)."""

from pyro2_tpu.solvers.compressible_react.simulation import Simulation
