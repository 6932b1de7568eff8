#!/usr/bin/env python3
"""CPU interpret-mode smoke test of the general padded CTU kernel."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.realpath(__file__)),
                                ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pyro2_tpu import Pyro
from pyro2_tpu.solvers.compressible.pallas_step import \
    make_pallas_ctu_step_padded_general

CASES = [
    ("sod", {"mesh.nx": 64, "mesh.ny": 16}),
    ("rt", {"mesh.nx": 16, "mesh.ny": 48}),
    ("rt", {"mesh.nx": 16, "mesh.ny": 48,
            "mesh.ylboundary": "reflect", "mesh.yrboundary": "reflect",
            "sponge.do_sponge": 1}),
]

for problem, overrides in CASES:
    p = Pyro("compressible")
    p.initialize_problem(problem, inputs_dict={
        "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0,
        "particles.do_particles": 0, **overrides})
    sim = p.sim
    myg = sim.cc_data.grid
    fill_ref = sim.cc_data.fill_bc_stack
    U0 = sim.cc_data.data.astype(jnp.float32)
    sim.cc_data.data = U0
    sim.cc_data.fill_BC_all()
    sim.method_compute_timestep()
    dt = jnp.asarray(sim.dt, jnp.float32)

    step_ref = jax.jit(sim._make_step())
    ng = myg.ng

    to_p, from_p, fill_p, step_p = \
        make_pallas_ctu_step_padded_general(sim, interpret=True)

    U = U0
    P = to_p(U0)
    t = jnp.asarray(0.0, jnp.float32)
    for _ in range(2):
        U = step_ref(fill_ref(U, t=t), t, dt)
        P = step_p(fill_p(P, t), t, dt)
        t = t + dt

    got = from_p(P)
    a = np.asarray(U[:, ng:-ng, ng:-ng])
    b = np.asarray(got[:, ng:-ng, ng:-ng])
    exact = np.array_equal(a, b)
    md = np.max(np.abs(a - b)) if not exact else 0.0
    print(f"{problem} {overrides.get('mesh.ylboundary','(default)')}: "
          f"bitwise={exact} maxdiff={md:.3e}")
    assert exact or md < 1e-6, "kernel mismatch"
print("smoke ok")
