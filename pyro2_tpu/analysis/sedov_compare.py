#!/usr/bin/env python3
"""Radially average a Sedov output and (optionally) compare to an exact
cylindrical Sedov profile table (reference: pyro/analysis/sedov_compare.py).

The exact table has columns (r/r_shock, rho/rho_shock, u/u_shock,
p/p_shock); pass one (e.g. the published cylindrical-sedov solution) as the
second argument to difference against it.
"""

import sys

import numpy as np

import pyro2_tpu.util.io_pyro as io
from pyro2_tpu.solvers.compressible import Variables, cons_to_prim

usage = """
      usage: python -m pyro2_tpu.analysis.sedov_compare file [exact_table]
"""


def radial_profile(myd):
    """(r_bin_centers, rho(r), u_r(r), p(r)) by radial binning."""
    g = myd.grid
    ivars = Variables(myd)
    gamma = myd.get_aux("gamma")
    q = np.asarray(cons_to_prim(myd.data, gamma, ivars, g))

    xctr = 0.5 * (g.xmin + g.xmax)
    yctr = 0.5 * (g.ymin + g.ymax)

    sl = (slice(g.ilo, g.ihi + 1), slice(g.jlo, g.jhi + 1))
    x = g.x2d[sl] - xctr
    y = g.y2d[sl] - yctr
    r = np.sqrt(x ** 2 + y ** 2).ravel()

    rho = q[ivars.irho][sl].ravel()
    u = q[ivars.iu][sl].ravel()
    v = q[ivars.iv][sl].ravel()
    p = q[ivars.ip][sl].ravel()
    ur = np.where(r > 0, (u * x.ravel() + v * y.ravel()) /
                  np.where(r > 0, r, 1.0), 0.0)

    nbins = g.nx // 2
    r_max = r.max()
    idx = np.minimum((r / r_max * nbins).astype(int), nbins - 1)
    counts = np.bincount(idx, minlength=nbins)
    counts = np.where(counts == 0, 1, counts)

    def binavg(f):
        return np.bincount(idx, weights=f, minlength=nbins) / counts

    r_bins = (np.arange(nbins) + 0.5) * r_max / nbins
    return r_bins, binavg(rho), binavg(ur), binavg(p)


def main():
    if len(sys.argv) not in (2, 3):
        print(usage)
        sys.exit(2)

    sim = io.read(sys.argv[1])
    r, rho, ur, p = radial_profile(sim.cc_data)

    i_shock = int(np.argmax(rho))
    print(f"shock radius ~ {r[i_shock]:.4f}, peak rho = {rho.max():.4f}, "
          f"peak p = {p.max():.4f}")

    if len(sys.argv) == 3:
        exact = np.loadtxt(sys.argv[2])
        r_s = r[i_shock]
        scaled_r = r / r_s
        rho_e = np.interp(scaled_r, exact[:, 0],
                          exact[:, 1] * rho[i_shock])
        ok = scaled_r <= 1.0
        print(f"mean |rho err| inside shock = "
              f"{np.abs(rho[ok] - rho_e[ok]).mean():.5g}")
    else:
        for rr, dd, uu, pp in zip(r, rho, ur, p):
            print(f"{rr:12.6f} {dd:12.6f} {uu:12.6f} {pp:12.6f}")


if __name__ == "__main__":
    main()
