#!/usr/bin/env python3
"""Re-plot any output file via its solver's dovis (reference: pyro/plot.py)."""

import argparse
import os

import pyro2_tpu.util.io_pyro as io


def makeplot(plotfile_name, outfile, *, width=None, height=None, dpi=100):
    """Plot the data in a plotfile using the solver's dovis."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sim = io.read(plotfile_name)

    sizes = {}
    if width is not None and height is not None:
        sizes = {"figsize": (width, height)}
    # num=1 + clear: reuse-or-reset (a pre-existing figure 1 in the same
    # process would otherwise warn that its size args are ignored)
    plt.figure(num=1, clear=True, dpi=dpi, **sizes)

    sim.dovis()
    plt.savefig(outfile, bbox_inches="tight", dpi=dpi)
    print(f"saved {outfile}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-o", type=str, default=None, help="output file name")
    p.add_argument("-W", type=float, default=None, help="width (inches)")
    p.add_argument("-H", type=float, default=None, help="height (inches)")
    p.add_argument("--dpi", type=int, default=100)
    p.add_argument("plotfile", type=str)
    args = p.parse_args()

    out = args.o
    if out is None:
        out = os.path.basename(args.plotfile).replace(".h5", "") + ".png"
    makeplot(args.plotfile, out, width=args.W, height=args.H, dpi=args.dpi)


if __name__ == "__main__":
    main()
