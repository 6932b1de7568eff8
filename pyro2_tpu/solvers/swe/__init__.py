"""Shallow water equations CTU solver (reference: pyro/swe/)."""

from pyro2_tpu.solvers.swe.simulation import (Simulation, Variables,
                                              cons_to_prim, prim_to_cons)
