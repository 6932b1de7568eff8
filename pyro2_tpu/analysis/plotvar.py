#!/usr/bin/env python3
"""Plot a single variable from an output file to a PNG
(reference: pyro/analysis/plotvar.py)."""

import argparse

import numpy as np

import pyro2_tpu.util.io_pyro as io
from pyro2_tpu.mesh.indexer import ai


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log", action="store_true", help="plot log10 of the var")
    p.add_argument("-o", type=str, default="plot.png", help="output file")
    p.add_argument("plotfile", type=str)
    p.add_argument("variable", type=str)
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sim = io.read(args.plotfile)
    myd = sim.cc_data if hasattr(sim, "cc_data") else sim
    g = myd.grid

    var = np.asarray(ai(myd.get_var(args.variable), g).v())
    if args.log:
        var = np.log10(np.abs(var))

    plt.figure(figsize=(6, 6 * (g.ymax - g.ymin) / (g.xmax - g.xmin)))
    plt.imshow(var.T, interpolation="nearest", origin="lower",
               extent=[g.xmin, g.xmax, g.ymin, g.ymax], cmap="viridis")
    plt.colorbar()
    plt.xlabel("x")
    plt.ylabel("y")
    plt.title(args.variable)
    plt.savefig(args.o, dpi=120, bbox_inches="tight")
    print(f"saved {args.o}")


if __name__ == "__main__":
    main()
