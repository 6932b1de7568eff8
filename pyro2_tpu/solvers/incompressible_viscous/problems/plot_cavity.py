#!/usr/bin/env python3
"""Plot velocity magnitude + streamlines for a lid-driven cavity output
(reference: pyro/incompressible_viscous/problems/plot_cavity.py).

usage: python -m pyro2_tpu.solvers.incompressible_viscous.problems.plot_cavity \
           plotfile [-o out.png] [-R reynolds] [-d streamline_density]
"""

import argparse

import numpy as np

import pyro2_tpu.util.io_pyro as io


def makeplot(plotfile_name, outfile, reynolds=None, streamline_density=2.0):
    """Plot the velocity magnitude and streamlines of a cavity run."""
    import matplotlib.pyplot as plt

    sim = io.read(plotfile_name)
    myg = sim.cc_data.grid
    x = np.asarray(myg.x[myg.ilo:myg.ihi + 1])
    y = np.asarray(myg.y[myg.jlo:myg.jhi + 1])
    sl = (slice(myg.ilo, myg.ihi + 1), slice(myg.jlo, myg.jhi + 1))
    u = np.asarray(sim.cc_data.get_var("x-velocity"))[sl]
    v = np.asarray(sim.cc_data.get_var("y-velocity"))[sl]
    magvel = np.sqrt(u ** 2 + v ** 2)

    fig, ax = plt.subplots(figsize=(6, 5.5))
    img = ax.imshow(magvel.T, origin="lower", cmap="viridis",
                    extent=[myg.xmin, myg.xmax, myg.ymin, myg.ymax])
    # streamplot wants (ny, nx) arrays indexed [y, x]
    ax.streamplot(x, y, u.T, v.T, color="white", linewidth=0.7,
                  density=streamline_density)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    title = "Lid-driven cavity"
    if reynolds is not None:
        title += f", Re = {reynolds:g}"
    title += f", t = {sim.cc_data.t:.3g}"
    ax.set_title(title)
    fig.colorbar(img, ax=ax, label="|U|")
    fig.tight_layout()
    fig.savefig(outfile, dpi=150)
    print(f"wrote {outfile}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("plotfile", help="cavity output file (.h5)")
    p.add_argument("-o", dest="outfile", default="cavity.png",
                   help="output image name")
    p.add_argument("-R", dest="reynolds", type=float, default=None,
                   help="Reynolds number (title annotation only)")
    p.add_argument("-d", dest="density", type=float, default=2.0,
                   help="streamline density")
    args = p.parse_args()
    makeplot(args.plotfile, args.outfile, args.reynolds, args.density)


if __name__ == "__main__":
    main()
