#!/usr/bin/env python3
"""General linear elliptic equation with inhomogeneous boundary conditions.

Executable-documentation port of the reference's
multigrid/multigrid-general-linear.ipynb: solve the full form

    alpha phi + div( beta grad phi ) + gamma . grad phi = f

with alpha = 10, beta = xy + 1, gamma = (1, 1) and exact solution
phi = cos(pi x/2) cos(pi y/2).  phi is nonzero on the x-lo and y-lo
boundaries, so those edges carry inhomogeneous Dirichlet value
*functions* (evaluated on the boundary at construction).

Run:  python docs/examples/04_multigrid_general.py [out_dir]
"""

import os
import sys

import jax.numpy as jnp
import numpy as np

import pyro2_tpu.mesh.boundary as bnd
from pyro2_tpu.mesh import patch
from pyro2_tpu.mesh.grid import Grid2d
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.multigrid.examples.mg_test_general_inhomogeneous import f, true
from pyro2_tpu.multigrid.general_MG import GeneralMG2d


def main(out_dir=None):
    N = 128

    # -- setting up the coefficient fields --------------------------------
    # alpha, beta (cell-centered; edge-averaged internally), gamma vector
    g = Grid2d(N, N, ng=1)
    d = patch.CellCenterData2d(g)
    bc_c = bnd.BC(xlb="neumann", xrb="neumann",
                  ylb="neumann", yrb="neumann")
    for name in ["alpha", "beta", "gamma_x", "gamma_y"]:
        d.register_var(name, bc_c)
    d.create()
    d.set_var("alpha", jnp.full((g.qx, g.qy), 10.0))
    d.set_var("beta", jnp.asarray(g.x2d * g.y2d + 1.0))
    d.set_var("gamma_x", jnp.ones((g.qx, g.qy)))
    d.set_var("gamma_y", jnp.ones((g.qx, g.qy)))

    # -- the solver with inhomogeneous Dirichlet BC functions --------------
    mg = GeneralMG2d(N, N,
                     xl_BC_type="dirichlet", xr_BC_type="dirichlet",
                     yl_BC_type="dirichlet", yr_BC_type="dirichlet",
                     xl_BC=lambda y: np.cos(np.pi * y / 2.0),
                     yl_BC=lambda x: np.cos(np.pi * x / 2.0),
                     coeffs=d, verbose=1)
    mg.init_zeros()
    mg.init_RHS(jnp.asarray(f(mg.x2d, mg.y2d)))

    # -- solving the system -------------------------------------------------
    mg.solve(rtol=1.e-10)
    print(f"\ncycles = {mg.num_cycles}, relative residual = "
          f"{mg.residual_error:.3e}")

    # -- checking the result --------------------------------------------------
    v = mg.get_solution()
    e = np.asarray(ai(v - jnp.asarray(true(mg.x2d, mg.y2d)),
                      mg.soln_grid).v())
    enorm = float(np.sqrt(mg.dx * mg.dy * np.sum(e ** 2)))
    print(f"L2 error vs true solution = {enorm:.3e}")
    assert enorm < 5.0e-5

    if out_dir is not None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(5, 4))
        img = ax.imshow(np.asarray(ai(v, mg.soln_grid).v()).T,
                        origin="lower", extent=(0, 1, 0, 1))
        fig.colorbar(img, ax=ax, shrink=0.8)
        ax.set_title(r"$\phi$ (inhomogeneous Dirichlet)")
        fig.tight_layout()
        out = os.path.join(out_dir, "multigrid_general.png")
        fig.savefig(out, dpi=100)
        print(f"wrote {out}")

    print("04_multigrid_general: ok")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
