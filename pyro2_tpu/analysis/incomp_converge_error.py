#!/usr/bin/env python3
"""Error of an incompressible converge-problem output vs the Minion (1996)
analytic traveling solution
(reference: pyro/analysis/incomp_converge_error.py)."""

import math
import sys

import numpy as np

import pyro2_tpu.util.io_pyro as io
from pyro2_tpu.mesh.indexer import ai

usage = """
      usage: python -m pyro2_tpu.analysis.incomp_converge_error file
"""


def main():
    if len(sys.argv) != 2:
        print(usage)
        sys.exit(2)

    sim = io.read(sys.argv[1])
    myd = sim.cc_data
    g = myd.grid
    t = myd.t

    u_exact = (1.0 - 2.0 * np.cos(2.0 * math.pi * (g.x2d - t)) *
               np.sin(2.0 * math.pi * (g.y2d - t)))
    v_exact = (1.0 + 2.0 * np.sin(2.0 * math.pi * (g.x2d - t)) *
               np.cos(2.0 * math.pi * (g.y2d - t)))

    for name, exact in (("x-velocity", u_exact), ("y-velocity", v_exact)):
        num = np.asarray(ai(myd.get_var(name), g).v())
        e = num - exact[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1]
        l2 = np.sqrt(g.dx * g.dy * np.sum(e ** 2))
        print(f"{name}: N = {g.nx}, L2 error = {l2}")


if __name__ == "__main__":
    main()
