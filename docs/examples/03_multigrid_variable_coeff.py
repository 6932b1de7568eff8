#!/usr/bin/env python3
"""Variable-coefficient Poisson:  div( eta grad phi ) = f.

Executable-documentation port of the reference's
multigrid/multigrid-variable-coeff.ipynb: solve with

    eta(x,y)  = 2 + cos(2 pi x) cos(2 pi y)      (periodic BCs)
    phi_true  = sin(2 pi x) sin(2 pi y)

The coefficient field is averaged to edges and restricted once down the
level hierarchy at construction; the smoother and residual use the
edge coefficients (see multigrid/variable_coeff_MG.py, mirroring
/root/reference/pyro/multigrid/variable_coeff_MG.py:24-213).

With periodic BCs the solution is defined up to a constant, so the
comparison demeans both fields.

Run:  python docs/examples/03_multigrid_variable_coeff.py [out_dir]
"""

import os
import sys

import jax.numpy as jnp
import numpy as np

import pyro2_tpu.mesh.boundary as bnd
from pyro2_tpu.mesh.grid import Grid2d
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.multigrid.examples.mg_test_vc_dirichlet import alpha, f, true
from pyro2_tpu.multigrid.variable_coeff_MG import VarCoeffCCMG2d


def main(out_dir=None):
    N = 128

    # -- setting up the solver ------------------------------------------
    # the RHS of a periodic Poisson problem must integrate to ~0
    g = Grid2d(N, N, ng=1)
    rhs = f(g.x2d, g.y2d)
    print(f"rhs sum: {np.sum(rhs[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1]):.6e}")

    bc_c = bnd.BC(xlb="periodic", xrb="periodic",
                  ylb="periodic", yrb="periodic")
    mg = VarCoeffCCMG2d(N, N,
                        xl_BC_type="periodic", xr_BC_type="periodic",
                        yl_BC_type="periodic", yr_BC_type="periodic",
                        coeffs=jnp.asarray(alpha(g.x2d, g.y2d)),
                        coeffs_bc=bc_c, verbose=1)
    mg.init_zeros()
    mg.init_RHS(jnp.asarray(f(mg.x2d, mg.y2d)))

    # -- solving the system ----------------------------------------------
    mg.solve(rtol=1.e-11)
    print(f"\ncycles = {mg.num_cycles}, relative residual = "
          f"{mg.residual_error:.3e}")

    # -- comparing to the exact solution ----------------------------------
    v = np.asarray(ai(mg.get_solution(), mg.soln_grid).v())
    t = true(mg.x2d, mg.y2d)[mg.ilo:mg.ihi + 1, mg.jlo:mg.jhi + 1]
    e = (v - v.mean()) - (t - t.mean())
    enorm = float(np.sqrt(mg.dx * mg.dy * np.sum(e ** 2)))
    print(f"(demeaned) L2 error vs true solution = {enorm:.3e}")
    assert enorm < 2.0e-4   # 2nd-order truncation error at 128^2

    if out_dir is not None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(9, 4))
        img = axes[0].imshow(v.T, origin="lower", extent=(0, 1, 0, 1))
        fig.colorbar(img, ax=axes[0], shrink=0.8)
        axes[0].set_title(r"$\phi$")
        img = axes[1].imshow(e.T, origin="lower", extent=(0, 1, 0, 1))
        fig.colorbar(img, ax=axes[1], shrink=0.8)
        axes[1].set_title("error vs exact")
        fig.tight_layout()
        out = os.path.join(out_dir, "multigrid_variable_coeff.png")
        fig.savefig(out, dpi=100)
        print(f"wrote {out}")

    print("03_multigrid_variable_coeff: ok")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
