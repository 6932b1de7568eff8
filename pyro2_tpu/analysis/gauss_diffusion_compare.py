#!/usr/bin/env python3
"""Compare Gaussian-diffusion outputs against the self-similar analytic
solution (reference: pyro/analysis/gauss_diffusion_compare.py)."""

import sys

import numpy as np

import pyro2_tpu.util.io_pyro as io
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.solvers.diffusion.problems.gaussian import phi_analytic

usage = """
      usage: python -m pyro2_tpu.analysis.gauss_diffusion_compare file...
"""


def main():
    if len(sys.argv) < 2:
        print(usage)
        sys.exit(2)

    for fname in sys.argv[1:]:
        sim = io.read(fname)
        myd = sim.cc_data
        g = myd.grid

        k = myd.get_aux("k")
        t_0 = myd.get_aux("t_0")
        phi_0 = myd.get_aux("phi_0")
        phi_max = myd.get_aux("phi_max")

        xctr = 0.5 * (g.xmin + g.xmax)
        yctr = 0.5 * (g.ymin + g.ymax)
        dist = np.sqrt((g.x2d - xctr) ** 2 + (g.y2d - yctr) ** 2)
        exact = phi_analytic(dist, myd.t, t_0, k, phi_0, phi_max)

        num = np.asarray(ai(myd.get_var("phi"), g).v())
        e = num - exact[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1]
        l2 = np.sqrt(g.dx * g.dy * np.sum(e ** 2))
        print(f"{fname}: t = {myd.t:.5g}, N = {g.nx}, L2 error = {l2}")


if __name__ == "__main__":
    main()
