#!/usr/bin/env python3
"""General-form MG with constant coefficients reducing to plain Poisson.

alpha = 0, beta = 1, gamma = (0, 0), so alpha phi + div(beta grad phi) +
gamma.grad(phi) = f is just laplacian(phi) = f; exact
phi = (x**2 - x**4)(y**4 - y**2)
(reference: pyro/multigrid/examples/mg_test_general_constant.py)."""

import jax.numpy as jnp
import numpy as np

import pyro2_tpu.mesh.boundary as bnd
from pyro2_tpu.mesh import patch
from pyro2_tpu.mesh.grid import Grid2d
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.multigrid.general_MG import GeneralMG2d


def true(x, y):
    return (x ** 2 - x ** 4) * (y ** 4 - y ** 2)


def f(x, y):
    return -2.0 * ((1.0 - 6.0 * x ** 2) * y ** 2 * (1.0 - y ** 2) +
                   (1.0 - 6.0 * y ** 2) * x ** 2 * (1.0 - x ** 2))


def test_general_poisson_constant(N, *, verbose=0, rtol=1.e-11):
    """Solve at resolution N; returns the L2 error vs the true solution."""
    g = Grid2d(N, N, ng=1)
    d = patch.CellCenterData2d(g)
    bc_c = bnd.BC(xlb="neumann", xrb="neumann",
                  ylb="neumann", yrb="neumann")
    for name in ["alpha", "beta", "gamma_x", "gamma_y"]:
        d.register_var(name, bc_c)
    d.create()
    d.set_var("alpha", jnp.zeros((g.qx, g.qy)))
    d.set_var("beta", jnp.ones((g.qx, g.qy)))
    d.set_var("gamma_x", jnp.zeros((g.qx, g.qy)))
    d.set_var("gamma_y", jnp.zeros((g.qx, g.qy)))

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
        test_general_poisson_constant(n)
