#!/usr/bin/env python3
"""Render a tiny borderless thumbnail (128x128 px) of one variable from an
output file (reference: pyro/analysis/plot_thumbnail.py).

usage: python -m pyro2_tpu.analysis.plot_thumbnail file variable [out.png]
"""

import sys

import numpy as np

import pyro2_tpu.util.io_pyro as io

usage = __doc__


def makeplot(myd, variable, outfile="plot.png"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    var = np.asarray(myd.get_var(variable))
    g = myd.grid

    plt.figure(num=1, figsize=(1.28, 1.28), dpi=100, facecolor="w")
    plt.imshow(var[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1].T,
               interpolation="nearest", origin="lower",
               extent=[g.xmin, g.xmax, g.ymin, g.ymax])
    plt.axis("off")
    plt.subplots_adjust(bottom=0.0, top=1.0, left=0.0, right=1.0)
    plt.savefig(outfile)
    print(f"wrote {outfile}")


def main():
    if len(sys.argv) not in (3, 4):
        sys.exit(usage)
    sim = io.read(sys.argv[1])
    myd = sim.cc_data if hasattr(sim, "cc_data") else sim
    makeplot(myd, sys.argv[2],
             sys.argv[3] if len(sys.argv) == 4 else "plot.png")


if __name__ == "__main__":
    main()
