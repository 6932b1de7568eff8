#!/usr/bin/env python3
"""Zone-by-zone comparison of two CellCenterData2d states.

Mirror of /root/reference/pyro/util/compare.py:22-92 -- the regression-test
oracle: grids must match structurally, variable sets must match, and each
variable must agree to rtol over the valid region.
"""

import sys

import numpy as np

from pyro2_tpu.mesh.indexer import ai

usage = """
      usage: python -m pyro2_tpu.util.compare file1 file2 (rtol)
"""

errors = {"gridbad": "grids don't agree",
          "namesbad": "variable lists don't agree",
          "varerr": "one or more variables don't agree"}


def compare(data1, data2, rtol=1.e-12):
    """Compare two CellCenterData2d objects zone by zone."""
    if not data1.grid == data2.grid:
        return "gridbad"

    if not sorted(data1.names) == sorted(data2.names):
        return "namesbad"

    print(" ")
    print("variable comparisons:")

    result = 0
    for name in data1.names:
        d1 = np.asarray(ai(data1.get_var(name), data1.grid).v())
        d2 = np.asarray(ai(data2.get_var(name), data2.grid).v())

        abs_err = np.max(np.abs(d1 - d2))
        if not np.any(d2 == 0):
            rel_err = np.max(np.abs(d1 - d2) / np.abs(d2))
            print(f"{name:20s} absolute error = {abs_err:10.10g}, "
                  f"relative error = {rel_err:10.10g}")
        else:
            print(f"{name:20s} absolute error = {abs_err:10.10g}")

        if not np.allclose(d1, d2, rtol=rtol):
            result = "varerr"

    return result


def main():
    import pyro2_tpu.util.io_pyro as io

    if len(sys.argv) not in (3, 4):
        print(usage)
        sys.exit(2)

    s1 = io.read(sys.argv[1])
    s2 = io.read(sys.argv[2])

    d1 = s1.cc_data if hasattr(s1, "cc_data") else s1
    d2 = s2.cc_data if hasattr(s2, "cc_data") else s2

    rtol = float(sys.argv[3]) if len(sys.argv) == 4 else 1.e-12
    result = compare(d1, d2, rtol)

    if result == 0:
        print("SUCCESS: files agree")
    else:
        print("ERROR: ", errors[result])


if __name__ == "__main__":
    main()
