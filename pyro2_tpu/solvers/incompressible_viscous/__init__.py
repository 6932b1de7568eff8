"""Viscous incompressible flow (reference: pyro/incompressible_viscous/)."""

from pyro2_tpu.solvers.incompressible_viscous.simulation import Simulation
