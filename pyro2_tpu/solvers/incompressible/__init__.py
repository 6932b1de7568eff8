"""Incompressible flow via an approximate projection method
(reference: pyro/incompressible/)."""

from pyro2_tpu.solvers.incompressible.simulation import Simulation
