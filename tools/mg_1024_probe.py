#!/usr/bin/env python3
"""Probe: does the fused MG V-cycle compile+run at 1024^2 on this TPU?"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.realpath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

import pyro2_tpu.multigrid.pallas_mg as pmg
import pyro2_tpu.mesh.boundary as bnd
from pyro2_tpu.multigrid.MG import CellCenterMG2d

pmg.NX_MAX = 1024

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

mg = CellCenterMG2d(N, N, alpha=0.0, beta=-1.0,
                    xl_BC_type="dirichlet", xr_BC_type="dirichlet",
                    yl_BC_type="dirichlet", yr_BC_type="dirichlet",
                    verbose=0)
g = mg.soln_grid
rhs = jnp.sin(2 * jnp.pi * jnp.asarray(g.x2d)) * \
    jnp.sin(2 * jnp.pi * jnp.asarray(g.y2d))
mg.init_zeros()
mg.init_RHS(rhs)

t0 = time.time()
try:
    fn = pmg.build_fused_cycle(mg)
    print(f"build+compile ok in {time.time()-t0:.1f}s")
except Exception as e:
    print(f"FUSED BUILD FAILED: {type(e).__name__}: {e}")
    sys.exit(1)

v = mg.v[-1]
f = mg.f[-1]
params = mg._params()
v1, r1, rn1 = fn(v, f, params)
jax.block_until_ready(v1)
reps = 10
t0 = time.perf_counter()
for _ in range(reps):
    v1, r1, rn1 = fn(v1, f, params)
jax.block_until_ready(v1)
dt = (time.perf_counter() - t0) / reps
print(f"N={N}: fused V-cycle {dt*1e3:.2f} ms, rnorm after 11 cycles "
      f"{float(rn1):.3e}")
