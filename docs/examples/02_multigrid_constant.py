#!/usr/bin/env python3
"""Constant-coefficient Poisson with multigrid.

Executable-documentation port of the reference's
multigrid/multigrid-constant-coefficients.ipynb: solve

    u_xx + u_yy = -2[(1-6x^2) y^2 (1-y^2) + (1-6y^2) x^2 (1-x^2)]

on the unit square with homogeneous Dirichlet BCs; the exact solution is
u = (x^2 - x^4)(y^4 - y^2) (Briggs, "A Multigrid Tutorial", p.64).

On a TPU backend the whole V-cycle runs as (at most a few) fused Pallas
kernels keeping the level hierarchy in VMEM; on CPU it is one jitted XLA
program per cycle.  Either way `solve()` below is identical.

Run:  python docs/examples/02_multigrid_constant.py [out_dir]
"""

import os
import sys

import numpy as np

from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.multigrid import MG


def true(x, y):
    return (x ** 2 - x ** 4) * (y ** 4 - y ** 2)


def f(x, y):
    return -2.0 * ((1.0 - 6.0 * x ** 2) * y ** 2 * (1.0 - y ** 2) +
                   (1.0 - 6.0 * y ** 2) * x ** 2 * (1.0 - x ** 2))


def main(out_dir=None):
    nx = ny = 256

    # -- setting up the solver -------------------------------------------
    # the operator is (alpha - beta L) phi = f; alpha=0, beta=-1 gives
    # the plain Poisson equation L phi = f
    mg = MG.CellCenterMG2d(nx, ny,
                           xl_BC_type="dirichlet", xr_BC_type="dirichlet",
                           yl_BC_type="dirichlet", yr_BC_type="dirichlet",
                           alpha=0.0, beta=-1.0, verbose=1)
    mg.init_zeros()
    mg.init_RHS(f(mg.x2d, mg.y2d))

    # -- performing the solve --------------------------------------------
    mg.solve(rtol=1.e-11)
    print(f"\ncycles = {mg.num_cycles}, relative residual = "
          f"{mg.residual_error:.3e}")

    # -- checking against the exact solution ------------------------------
    phi = mg.get_solution()
    e = np.asarray(ai(phi - true(mg.x2d, mg.y2d), mg.soln_grid).v())
    enorm = float(np.sqrt(mg.dx * mg.dy * np.sum(e ** 2)))
    print(f"L2 error vs true solution = {enorm:.3e}")
    # reference truncation error at 256^2 is 1.60e-6
    # (/root/reference/pyro/multigrid/tests/mg_convergence.txt)
    assert enorm < 2.0e-6

    # -- the solution gradient --------------------------------------------
    gx, gy = mg.get_solution_gradient()

    # -- plotting ----------------------------------------------------------
    if out_dir is not None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        for ax, (name, arr) in zip(axes, [
                (r"$\phi$", phi), (r"$\partial\phi/\partial x$", gx),
                (r"$\partial\phi/\partial y$", gy)]):
            img = ax.imshow(np.asarray(ai(arr, mg.soln_grid).v()).T,
                            origin="lower", extent=(0, 1, 0, 1))
            fig.colorbar(img, ax=ax, shrink=0.8)
            ax.set_title(name)
        fig.tight_layout()
        out = os.path.join(out_dir, "multigrid_constant.png")
        fig.savefig(out, dpi=100)
        print(f"wrote {out}")

    print("02_multigrid_constant: ok")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
