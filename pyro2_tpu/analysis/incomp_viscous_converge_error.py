#!/usr/bin/env python3
"""Error of an incompressible_viscous converge-problem output vs the
decaying traveling-wave analytic solution
(reference: pyro/analysis/incomp_viscous_converge_error.py)."""

import math
import sys

import numpy as np

import pyro2_tpu.util.io_pyro as io
from pyro2_tpu.mesh.indexer import ai

usage = """
      usage: python -m pyro2_tpu.analysis.incomp_viscous_converge_error file
"""


def get_errors(filename):
    """Return (u L2 error, v L2 error) vs the analytic solution."""
    sim = io.read(filename)
    myd = sim.cc_data
    g = myd.grid
    t = myd.t
    nu = myd.get_aux("viscosity")

    decay = np.exp(-8.0 * math.pi ** 2 * nu * t)
    u_exact = (1.0 - 2.0 * np.cos(2.0 * math.pi * (g.x2d - t)) *
               np.sin(2.0 * math.pi * (g.y2d - t)) * decay)
    v_exact = (1.0 + 2.0 * np.sin(2.0 * math.pi * (g.x2d - t)) *
               np.cos(2.0 * math.pi * (g.y2d - t)) * decay)

    errors = []
    for name, exact in (("x-velocity", u_exact), ("y-velocity", v_exact)):
        num = np.asarray(ai(myd.get_var(name), g).v())
        e = num - exact[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1]
        errors.append(float(np.sqrt(g.dx * g.dy * np.sum(e ** 2))))
    return tuple(errors)


def main():
    if len(sys.argv) != 2:
        print(usage)
        sys.exit(2)
    eu, ev = get_errors(sys.argv[1])
    print("errors: ", eu, ev)


if __name__ == "__main__":
    main()
