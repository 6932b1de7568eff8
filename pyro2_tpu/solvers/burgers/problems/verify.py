#!/usr/bin/env python3
"""Verify the shock speed of the inviscid Burgers solver from two
outputs of the ``test`` problem (reference: pyro/burgers/problems/verify.py).

The test problem sets up a diagonal shock with (u, v) = (2, 2) ahead of
(0, 0); the exact shock speed is ``S = |(u,v)|/2 + |(0,0)|/2`` along the
diagonal, i.e. ``sqrt(2^2 + 2^2)/2`` per component pair — the reference
uses ``sqrt(8)`` as the theoretical speed of the |U| front.  We locate the
front (where the diagonal-averaged |U| first drops below 0.9 S) in each
file and report the measured front speed.

usage: python -m pyro2_tpu.solvers.burgers.problems.verify file1 file2
"""

import sys

import numpy as np

import pyro2_tpu.util.io_pyro as io


def _diag_profile(myd):
    """Diagonal-averaged |U| on the half-cell diagonal coordinate grid."""
    myg = myd.grid
    u = np.asarray(myd.get_var("x-velocity"))
    v = np.asarray(myd.get_var("y-velocity"))
    sl = (slice(myg.ilo, myg.ihi + 1), slice(myg.jlo, myg.jhi + 1))
    uv = np.sqrt(u[sl] ** 2 + v[sl] ** 2)

    nx = myg.nx
    averages = []
    for n in range(-(nx - 1), nx):
        averages.append(np.diagonal(np.flipud(uv), n).mean())

    grid = myg.x[myg.ilo:myg.ihi + 1]
    x = [grid[0]]
    for xr in grid[1:]:
        x.append(0.5 * (x[-1] + xr))
        x.append(xr)
    return np.asarray(x), np.asarray(averages)


def _front_position(x, uv, threshold):
    idx = np.flatnonzero(uv < threshold)
    if idx.size == 0:
        raise RuntimeError("no shock front found (|U| never drops below "
                           f"{threshold:g})")
    return x[idx[0]]


def verify(file1, file2):
    s1 = io.read(file1)
    s2 = io.read(file2)
    d1, d2 = s1.cc_data, s2.cc_data

    dt = d2.t - d1.t
    if dt <= 0.0:
        raise RuntimeError("file2 must be a later output than file1")

    shock_speed_theo = np.sqrt(2.0 * 2.0 + 2.0 * 2.0)
    threshold = 0.9 * shock_speed_theo

    x1, uv1 = _diag_profile(d1)
    x2, uv2 = _diag_profile(d2)

    pos1 = _front_position(x1, uv1, threshold)
    pos2 = _front_position(x2, uv2, threshold)

    # the front moves along the diagonal; positions are in the x
    # projection, so the diagonal distance is sqrt(2) * dx_projection
    shock_speed = np.sqrt(2.0) * (pos2 - pos1) / dt

    print(f"front at t={d1.t:g}: x={pos1:g}; t={d2.t:g}: x={pos2:g}")
    print(f"measured shock speed:    {shock_speed:g}")
    print(f"theoretical shock speed: {shock_speed_theo:g}")
    print(f"relative error:          "
          f"{abs(shock_speed - shock_speed_theo) / shock_speed_theo:g}")
    return shock_speed, shock_speed_theo


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    verify(sys.argv[1], sys.argv[2])
