#!/usr/bin/env python3
"""Compact (axis-free) plot of one variable from an output file; the
pseudo-variable "vort" plots the centered-difference vorticity
(reference: pyro/analysis/plotcompact.py).

usage: python -m pyro2_tpu.analysis.plotcompact [-m vmin] [-M vmax] \\
           plotfile variable outfile
"""

import argparse

import numpy as np

import pyro2_tpu.util.io_pyro as io
from pyro2_tpu.mesh.indexer import ai


def makeplot(plotfile, variable, outfile, vmin=None, vmax=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sim = io.read(plotfile)
    myd = sim.cc_data if hasattr(sim, "cc_data") else sim
    g = myd.grid

    if variable == "vort":
        vx = ai(myd.get_var("x-velocity"), g)
        vy = ai(myd.get_var("y-velocity"), g)
        v = (0.5 * (vy.ip(1) - vy.ip(-1)) / g.dx -
             0.5 * (vx.jp(1) - vx.jp(-1)) / g.dy)
        v = np.asarray(v)
    else:
        v = np.asarray(ai(myd.get_var(variable), g).v())

    if vmin is None:
        vmin = v.min()
    if vmax is None:
        vmax = v.max()

    plt.figure(num=1, figsize=(6.5, 6.5), dpi=100, facecolor="w")
    plt.imshow(v.T, interpolation="nearest", origin="lower",
               extent=[g.xmin, g.xmax, g.ymin, g.ymax],
               vmin=vmin, vmax=vmax)
    plt.axis("off")
    plt.subplots_adjust(bottom=0.0, top=1.0, left=0.0, right=1.0)
    plt.savefig(outfile)
    print(f"wrote {outfile}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-m", type=float, default=None, help="vmin")
    p.add_argument("-M", type=float, default=None, help="vmax")
    p.add_argument("plotfile")
    p.add_argument("variable")
    p.add_argument("outfile")
    args = p.parse_args()
    makeplot(args.plotfile, args.variable, args.outfile,
             vmin=args.m, vmax=args.M)


if __name__ == "__main__":
    main()
