"""Compressible Euler CTU solver (reference: pyro/compressible/)."""

from pyro2_tpu.solvers.compressible.simulation import (
    Simulation, Variables, cons_to_prim, get_external_sources,
    get_sponge_factor, prim_to_cons)
