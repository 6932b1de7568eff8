#!/usr/bin/env python3
"""Constant-coefficient Poisson with Dirichlet BCs.

Solves u_xx + u_yy = -2[(1-6x^2)y^2(1-y^2) + (1-6y^2)x^2(1-x^2)], u=0 on
the boundary; exact u = (x^2-x^4)(y^4-y^2) (A Multigrid Tutorial, p.64;
reference: pyro/multigrid/examples/mg_test_simple.py)."""

import jax.numpy as jnp
import numpy as np

from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.multigrid import MG


def true(x, y):
    return (x ** 2 - x ** 4) * (y ** 4 - y ** 2)


def f(x, y):
    return -2.0 * ((1.0 - 6.0 * x ** 2) * y ** 2 * (1.0 - y ** 2) +
                   (1.0 - 6.0 * y ** 2) * x ** 2 * (1.0 - x ** 2))


def test_poisson_dirichlet(N, *, verbose=0, rtol=1.e-11):
    """Solve at resolution N; returns the L2 error vs the true solution."""
    a = MG.CellCenterMG2d(N, N,
                          xl_BC_type="dirichlet", yl_BC_type="dirichlet",
                          xr_BC_type="dirichlet", yr_BC_type="dirichlet",
                          verbose=verbose)
    a.init_zeros()
    a.init_RHS(jnp.asarray(f(a.x2d, a.y2d)))
    a.solve(rtol=rtol)

    v = a.get_solution()
    e = v - jnp.asarray(true(a.x2d, a.y2d))
    enorm = float(np.sqrt(a.dx * a.dy *
                          np.sum(np.asarray(ai(e, a.soln_grid).v()) ** 2)))
    print(f"N = {N}: L2 error from true solution = {enorm:g} "
          f"(cycles = {a.num_cycles}, residual = {a.residual_error:g})")
    return enorm


if __name__ == "__main__":
    for n in (16, 32, 64, 128, 256):
        test_poisson_dirichlet(n)
