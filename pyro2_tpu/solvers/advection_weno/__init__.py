"""WENO method-of-lines advection (reference: pyro/advection_weno/)."""

from pyro2_tpu.solvers.advection_weno.simulation import Simulation
