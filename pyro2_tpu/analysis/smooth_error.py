#!/usr/bin/env python3
"""Error of a smooth-advection output vs the (periodic-translated) initial
Gaussian (reference: pyro/analysis/smooth_error.py)."""

import sys

import numpy as np

import pyro2_tpu.util.io_pyro as io
from pyro2_tpu.mesh.indexer import ai

usage = """
      usage: python -m pyro2_tpu.analysis.smooth_error file
      (assumes u = v = 1 and an integer number of periods)
"""


def main():
    if len(sys.argv) != 2:
        print(usage)
        sys.exit(2)

    sim = io.read(sys.argv[1])
    myd = sim.cc_data
    g = myd.grid

    xctr = 0.5 * (g.xmin + g.xmax)
    yctr = 0.5 * (g.ymin + g.ymax)
    exact = 1.0 + np.exp(-60.0 * ((g.x2d - xctr) ** 2 +
                                  (g.y2d - yctr) ** 2))

    dens = np.asarray(ai(myd.get_var("density"), g).v())
    e = dens - exact[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1]
    l2 = np.sqrt(g.dx * g.dy * np.sum(e ** 2))
    print(f"{g.nx} {l2}")


if __name__ == "__main__":
    main()
