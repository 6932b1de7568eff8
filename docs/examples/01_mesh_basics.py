#!/usr/bin/env python3
"""Mesh examples: grids, boundary conditions, the stencil-view algebra.

Executable-documentation port of the reference's mesh/mesh-examples.ipynb
(run under --nbval in its CI).  Same tour, our API: state is an immutable
jnp array managed by CellCenterData2d; stencil views come from the `ai`
wrapper instead of an ndarray subclass.

Run:  python docs/examples/01_mesh_basics.py
"""

import numpy as np

import pyro2_tpu.mesh.boundary as bnd
from pyro2_tpu.mesh.grid import Grid2d
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.mesh.patch import CellCenterData2d


def main():
    rng = np.random.default_rng(100)

    # -- set up a grid with variables ----------------------------------
    g = Grid2d(4, 6, ng=2)
    print(g)

    bc = bnd.BC(xlb="periodic", xrb="periodic",
                ylb="reflect", yrb="outflow")
    print(bc)

    d = CellCenterData2d(g)
    d.register_var("a", bc)
    d.create()

    # -- working with the data ------------------------------------------
    # fill the interior with random data (functional update: build the
    # full (qx, qy) array, then set it)
    a0 = np.zeros((g.qx, g.qy))
    a0[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1] = rng.random((g.nx, g.ny))
    d.set_var("a", a0)
    d.pretty_print("a", fmt="%7.3g")

    d.fill_BC("a")
    print("\nafter fill_BC (periodic x, reflect y-lo, outflow y-hi):")
    d.pretty_print("a", fmt="%7.3g")

    av = ai(d.get_var("a"), g)
    print(f"\nnorm  = {av.norm():.6g}")
    print(f"min/max = {d.min('a'):.6g} {d.max('a'):.6g}")

    # -- the `ai` stencil-view algebra ----------------------------------
    # a.v() is the interior window; ip/jp are shifted windows.  All are
    # static slices of the same padded array -- no copies, no rolls.
    d.set_var("a", np.arange(g.qx * g.qy, dtype=float).reshape(g.qx, g.qy))
    av = d.get_ai("a")
    print("\ninterior view v():")
    print(np.asarray(av.v()))
    print("\nshifted view ip(-1, buf=1):")
    print(np.asarray(av.ip(-1, buf=1)))

    # -- differencing ----------------------------------------------------
    g8 = Grid2d(8, 8, ng=2, xmax=2.0 * np.pi, ymax=2.0 * np.pi)
    d8 = CellCenterData2d(g8)
    d8.register_var("a", bnd.BC(xlb="periodic", xrb="periodic",
                                ylb="periodic", yrb="periodic"))
    d8.create()
    d8.set_var("a", np.sin(np.asarray(g8.x2d)))
    d8.fill_BC("a")

    a8 = d8.get_ai("a")
    # centered difference da/dx on the interior: one expression, compiles
    # to aligned elementwise ops
    b = (a8.ip(1) - a8.ip(-1)) / (2.0 * g8.dx)
    err = np.max(np.abs(np.asarray(b) -
                        np.cos(np.asarray(g8.x2d)[g8.ilo:g8.ihi + 1,
                                                  g8.jlo:g8.jhi + 1])))
    print(f"\ncentered-difference d(sin x)/dx max error at 8^2: {err:.4f}")
    assert err < 0.3   # 2nd-order at nx=8

    # -- coarsening and prolonging ---------------------------------------
    c = d8.restrict("a")
    f = d8.prolong("a")
    print(f"\nrestrict: {d8.get_var('a').shape} -> {c.shape}")
    print(f"prolong : {d8.get_var('a').shape} -> {f.shape}")

    # restriction of the prolonged field recovers the original exactly
    # (the prolongation is conservative)
    from pyro2_tpu.mesh.patch import restrict_array
    rt = restrict_array(f, g8.fine_like(2), g8)
    rt_err = np.max(np.abs(np.asarray(rt[g8.ilo:g8.ihi + 1,
                                         g8.jlo:g8.jhi + 1]) -
                           np.asarray(a8.v())))
    print(f"restrict(prolong(a)) round-trip max error: {rt_err:.2e}")
    assert rt_err < 1.e-12

    print("\n01_mesh_basics: ok")


if __name__ == "__main__":
    main()
