#!/usr/bin/env python3
"""The spherical-polar grid: geometry factors and coordinate mapping.

Executable-documentation port of the reference's mesh/spherical-mesh.ipynb:
construct a 2-D r-theta `SphericalPolar` grid (azimuthal symmetry), look
at the cell volumes and face areas, and map the grid to the x-z plane.

Geometry factors (reference patch.py:242-305):
    Ax = | -2 pi r^2 d(cos theta) |       (radial faces)
    Ay = | pi sin(theta) d(r^2) |         (theta faces)
    V  = | -2/3 pi d(r^3) d(cos theta) |
    dlogAx = 2/r,  dlogAy = cot(theta)/r

Run:  python docs/examples/06_spherical_mesh.py [out_dir]
"""

import os
import sys

import numpy as np

from pyro2_tpu.mesh.grid import SphericalPolar


def main(out_dir=None):
    g = SphericalPolar(4, 8, xmin=1.0, xmax=2.0, ymin=0.0, ymax=np.pi,
                       ng=2)
    print(g)

    V = np.asarray(g.V)
    print("\ncell volumes (interior):")
    print(V[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1])

    # the volumes integrate to the spherical shell 4/3 pi (r2^3 - r1^3)
    vtot = V[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1].sum()
    vexact = 4.0 / 3.0 * np.pi * (2.0 ** 3 - 1.0 ** 3)
    print(f"\nsum of cell volumes = {vtot:.8f}")
    print(f"4/3 pi (r2^3-r1^3)  = {vexact:.8f}")
    assert abs(vtot - vexact) / vexact < 1.e-12

    # map to the x-z plane for plotting
    r = np.asarray(g.x2d)[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1]
    theta = np.asarray(g.y2d)[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1]
    x = r * np.sin(theta)
    z = r * np.cos(theta)

    if out_dir is not None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(4, 6))
        ax.scatter(x, z, c=V[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1], s=80)
        ax.set_xlabel("x")
        ax.set_ylabel("z")
        ax.set_title("cell centers colored by volume")
        ax.set_aspect("equal")
        fig.tight_layout()
        out = os.path.join(out_dir, "spherical_mesh.png")
        fig.savefig(out, dpi=100)
        print(f"wrote {out}")

    print("06_spherical_mesh: ok")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
