#!/usr/bin/env python3
"""Richardson convergence: restrict a fine output onto a coarse one and
report the error norms (reference: pyro/analysis/convergence.py)."""

import sys

import numpy as np

import pyro2_tpu.util.io_pyro as io
from pyro2_tpu.mesh.indexer import ai

usage = """
      usage: python -m pyro2_tpu.analysis.convergence fine coarse \\
                 [variable_name=density] [N=2]
"""


def compare(fine, coarse, var_name, N):
    """(inf-norm, L2-norm) of coarse - restrict(fine)."""
    cg = coarse.grid
    var = ai(coarse.get_var(var_name), cg).v()
    var_avg = ai(fine.restrict(var_name, N=N), cg).v()
    e = np.asarray(var) - np.asarray(var_avg)
    l2 = float(np.sqrt(cg.dx * cg.dy * np.sum(e ** 2)))
    return float(np.abs(e).max()), l2


def main():
    if len(sys.argv) > 5 or len(sys.argv) < 3:
        print(usage)
        sys.exit(2)

    var_name = sys.argv[3] if len(sys.argv) > 3 else "density"
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    ff = io.read(sys.argv[1])
    cc = io.read(sys.argv[2])
    result = compare(ff.cc_data, cc.cc_data, var_name, N)
    print(f"inf norm and L2 norm of {var_name}: ", result)


if __name__ == "__main__":
    main()
