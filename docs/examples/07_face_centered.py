#!/usr/bin/env python3
"""Face-centered data: MAC-style staggered fields.

Executable-documentation port of the reference's
mesh/face-centered-data-examples.ipynb: a `FaceCenterData2d` variable
lives on cell faces, one extra point in its direction `idir`; the
stencil views come from `aifc` (the face-centered twin of `ai`).

Run:  python docs/examples/07_face_centered.py
"""

import numpy as np

import pyro2_tpu.mesh.boundary as bnd
from pyro2_tpu.mesh.grid import Grid2d
from pyro2_tpu.mesh.patch import FaceCenterData2d


def main():
    rng = np.random.default_rng(100)

    g = Grid2d(4, 6, ng=2)
    print(g)

    bc = bnd.BC(xlb="periodic", xrb="periodic",
                ylb="periodic", yrb="periodic")

    # data centered on x-faces: one extra point in x
    d = FaceCenterData2d(g, 1)
    d.register_var("a", bc)
    d.create()
    print(f"storage shape: {d.data.shape}  (cell-centered would be "
          f"{(1, g.qx, g.qy)})")

    a0 = np.zeros((g.qx + 1, g.qy))
    a0[g.ilo:g.ihi + 2, g.jlo:g.jhi + 1] = rng.random((g.nx + 1, g.ny))
    # nodal in x: the ilo face and the ihi+1 face are the same physical
    # face under periodicity, so give them the same value (as the
    # reference notebook does before filling)
    a0[g.ihi + 1, :] = a0[g.ilo, :]
    d.set_var("a", a0)
    d.fill_BC("a")

    av = d.get_ai("a")
    # the ghost faces now wrap: the face just left of the domain is the
    # last interior face
    ghost = np.asarray(d.get_var("a"))[g.ilo - 1, g.jlo:g.jhi + 1]
    wrap = np.asarray(d.get_var("a"))[g.ihi, g.jlo:g.jhi + 1]
    print(f"ghost face == wrapped interior face: "
          f"{np.allclose(ghost, wrap)}")
    assert np.allclose(ghost, wrap)

    print(f"norm = {av.norm():.6g}")
    print(f"min/max = {d.min('a'):.6g} {d.max('a'):.6g}")

    # shifted views: ip(1) on a face-centered field is the "right face of
    # this cell" window
    print(f"v()  shape: {av.v().shape}")
    print(f"ip(1) shape: {av.ip(1).shape}")

    print("07_face_centered: ok")


if __name__ == "__main__":
    main()
