"""Inviscid Burgers solver: CTU velocity self-advection (reference:
pyro/burgers/)."""

from pyro2_tpu.solvers.burgers.simulation import Simulation
