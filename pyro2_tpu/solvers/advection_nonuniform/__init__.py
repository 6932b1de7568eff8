"""Advection with a spatially varying velocity field
(reference: pyro/advection_nonuniform/)."""

from pyro2_tpu.solvers.advection_nonuniform.simulation import Simulation
