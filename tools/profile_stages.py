#!/usr/bin/env python3
"""Per-stage wall-time + arithmetic accounting for the CTU pipeline.

Times each CTU stage as its own jitted function on the bench configuration
(1024^2 advect, f32) so we can see which stage dominates the fused kernel's
step time, and computes flops/zone + bytes/zone estimates for a roofline
placement.  Stage timings are measured at the jnp/XLA level (stages as
separate kernels); the fused Pallas kernel runs the same arithmetic in one
pass, so the *ratios* locate the hot stage even though the absolute sum
exceeds the fused time.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.realpath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

N = 1024
REPS = 10


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def main():
    import importlib
    import os

    from pyro2_tpu.solvers import compressible
    import pyro2_tpu.solvers.compressible.unsplit_fluxes as flx
    from pyro2_tpu.solvers.compressible import riemann
    from pyro2_tpu.solvers.compressible.simulation import cons_to_prim
    from pyro2_tpu.util.runparams import RuntimeParameters

    home = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                        "..", "pyro2_tpu")
    rp = RuntimeParameters()
    rp.load_params(os.path.join(home, "_defaults"))
    rp.load_params(os.path.join(home, "solvers/compressible/_defaults"))
    for k, v in {"mesh.nx": N, "mesh.ny": N,
                 "mesh.xlboundary": "periodic",
                 "mesh.xrboundary": "periodic",
                 "mesh.ylboundary": "periodic",
                 "mesh.yrboundary": "periodic",
                 "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0}.items():
        rp.set_param(k, v, no_new=False)

    problem = importlib.import_module(
        "pyro2_tpu.solvers.compressible.problems.advect")
    sim = compressible.Simulation("compressible", "advect",
                                  problem.init_data, rp)
    sim.initialize()
    myg = sim.cc_data.grid
    ivars = sim.ivars
    gamma = rp.get_param("eos.gamma")
    tc = sim.tc
    solid = sim.solid
    my_data = sim.cc_data
    my_aux = sim.aux_data

    U0 = sim.cc_data.fill_bc_stack(sim.cc_data.data)
    sim.method_compute_timestep()
    dt = jnp.asarray(sim.dt, U0.dtype)

    # stage 1: interface states (flatten + limit + characteristic tracing)
    @jax.jit
    def s_interface(U, dt):
        return flx.interface_states(U, my_data, rp, ivars, tc, dt)

    # stage 2: transverse flux (2 riemann passes + transverse correction)
    @jax.jit
    def s_transverse(states, dt):
        return flx.apply_transverse_flux(*states, my_data, rp, ivars,
                                         solid, tc, dt)

    # stage 3: final riemann passes (x and y)
    @jax.jit
    def s_riemann(states):
        U_xl, U_xr, U_yl, U_yr = states
        F_x = riemann.riemann_flux(1, U_xl, U_xr, my_data, rp, ivars,
                                   solid.xl, solid.xr, tc)
        F_y = riemann.riemann_flux(2, U_yl, U_yr, my_data, rp, ivars,
                                   solid.yl, solid.yr, tc)
        return F_x, F_y

    # stage 4: artificial viscosity + conservative update
    @jax.jit
    def s_avisc_update(F, U, dt):
        F_x, F_y = F
        q = cons_to_prim(U, gamma, ivars, myg)
        F_x, F_y = flx.apply_artificial_viscosity(F_x, F_y, q, U,
                                                  my_data, rp, ivars)
        from pyro2_tpu.mesh.indexer import ai, aic
        iv_sl = (slice(myg.ilo, myg.ihi + 1), slice(myg.jlo, myg.jhi + 1))
        Fx = ai(F_x, myg)
        Fy = ai(F_y, myg)
        Ax = aic(myg.dy)
        Ay = aic(myg.dx)
        dtdV = dt / jnp.asarray(myg.dx * myg.dy)
        upd = dtdV[None] * (
            Fx.v() * Ax.v()[None] - Fx.ip(1) * Ax.ip(1)[None] +
            Fy.v() * Ay.v()[None] - Fy.jp(1) * Ay.jp(1)[None])
        return U.at[(slice(None),) + iv_sl].add(upd)

    states = s_interface(U0, dt)
    states2 = s_transverse(states, dt)
    F = s_riemann(states2)

    t_if = timed(s_interface, U0, dt)
    t_tr = timed(s_transverse, states, dt)
    t_rm = timed(s_riemann, states2)
    t_av = timed(s_avisc_update, F, U0, dt)

    total = t_if + t_tr + t_rm + t_av
    out = {
        "backend": jax.default_backend(),
        "n": N,
        "stage_ms": {
            "interface_states": t_if * 1e3,
            "transverse_flux(2xRiemann)": t_tr * 1e3,
            "final_riemann(x2)": t_rm * 1e3,
            "avisc+update": t_av * 1e3,
        },
        "stage_frac": {
            "interface_states": t_if / total,
            "transverse_flux(2xRiemann)": t_tr / total,
            "final_riemann(x2)": t_rm / total,
            "avisc+update": t_av / total,
        },
        "sum_ms": total * 1e3,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
