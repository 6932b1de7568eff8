"""Low-Mach-number atmospheric solver (reference: pyro/lm_atm/)."""

from pyro2_tpu.solvers.lm_atm.simulation import Simulation
