"""Implicit (Crank-Nicolson) diffusion via multigrid (reference:
pyro/diffusion/)."""

from pyro2_tpu.solvers.diffusion.simulation import Simulation
