#!/usr/bin/env python3
"""General-form MG with all three terms active, Dirichlet BCs.

alpha = 1, beta = 2 + cos(2 pi x) cos(2 pi y),
gamma = (sin(2 pi x), sin(2 pi y)); exact phi = sin(2 pi x) sin(2 pi y)
(reference: pyro/multigrid/examples/mg_test_general_dirichlet.py)."""

import jax.numpy as jnp
import numpy as np

import pyro2_tpu.mesh.boundary as bnd
from pyro2_tpu.mesh import patch
from pyro2_tpu.mesh.grid import Grid2d
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.multigrid.general_MG import GeneralMG2d


def true(x, y):
    return np.sin(2.0 * np.pi * x) * np.sin(2.0 * np.pi * y)


def beta(x, y):
    return 2.0 + np.cos(2.0 * np.pi * x) * np.cos(2.0 * np.pi * y)


def f(x, y):
    return ((-16.0 * np.pi ** 2 * np.cos(2 * np.pi * x) *
             np.cos(2 * np.pi * y) +
             2.0 * np.pi * np.cos(2 * np.pi * x) +
             2.0 * np.pi * np.cos(2 * np.pi * y) -
             16.0 * np.pi ** 2 + 1.0) *
            np.sin(2 * np.pi * x) * np.sin(2 * np.pi * y))


def test_general_poisson_dirichlet(N, *, verbose=0, rtol=1.e-11):
    """Solve at resolution N; returns the L2 error vs the true solution."""
    g = Grid2d(N, N, ng=1)
    d = patch.CellCenterData2d(g)
    bc_c = bnd.BC(xlb="neumann", xrb="neumann",
                  ylb="neumann", yrb="neumann")
    for name in ["alpha", "beta", "gamma_x", "gamma_y"]:
        d.register_var(name, bc_c)
    d.create()
    d.set_var("alpha", jnp.ones((g.qx, g.qy)))
    d.set_var("beta", jnp.asarray(beta(g.x2d, g.y2d)))
    d.set_var("gamma_x", jnp.asarray(np.sin(2.0 * np.pi * g.x2d)))
    d.set_var("gamma_y", jnp.asarray(np.sin(2.0 * np.pi * g.y2d)))

    a = GeneralMG2d(N, N,
                    xl_BC_type="dirichlet", yl_BC_type="dirichlet",
                    xr_BC_type="dirichlet", yr_BC_type="dirichlet",
                    coeffs=d, verbose=verbose)
    a.init_zeros()
    a.init_RHS(jnp.asarray(f(a.x2d, a.y2d)))
    a.solve(rtol=rtol)

    v = a.get_solution()
    e = v - jnp.asarray(true(a.x2d, a.y2d))
    enorm = float(np.sqrt(a.dx * a.dy *
                          np.sum(np.asarray(ai(e, a.soln_grid).v()) ** 2)))
    print(f"N = {N}: L2 error from true solution = {enorm:g} "
          f"(cycles = {a.num_cycles})")
    return enorm


if __name__ == "__main__":
    for n in (16, 32, 64, 128):
        test_general_poisson_dirichlet(n)
