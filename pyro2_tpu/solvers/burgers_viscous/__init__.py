"""Viscous Burgers: CTU advection + Crank-Nicolson diffusion via MG
(reference: pyro/burgers_viscous/)."""

from pyro2_tpu.solvers.burgers_viscous.simulation import Simulation
