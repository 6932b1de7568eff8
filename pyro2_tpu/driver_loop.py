"""On-device time loop: scan fill -> dt -> step without host round trips.

The reference steps from Python (fill_BC_all -> compute_timestep -> evolve
per step, /root/reference/pyro/pyro_sim.py:241-281), which costs a
host<->device sync every step.  Here the whole loop body -- ghost fill,
CFL dt with the driver's timestep-control ladder (init_tstep_factor /
max_dt_change / fix_dt / tmax clamp, simulation_null.py compute_timestep),
and the solver step -- is ONE jitted `lax.scan` chunk; the host syncs only
at chunk boundaries (for output cadence and the finished check).

Works for any Simulation exposing the jitted-kernel contract
(`_step(U, t, dt)`, `_dt_fn(U)` returning the raw pre-CFL dt, and a pure
`cc_data.fill_bc_stack`); the compressible/advection families qualify.
Runs that hit tmax/max_steps mid-chunk freeze (lax.cond skips the step),
so the dt sequence is identical to the host loop's.
"""

import jax
import jax.numpy as jnp

from pyro2_tpu.util import msg

__all__ = ["make_chunk_runner", "run_sim_fast"]


def dt_control(dt_raw, t, n, dt_old, *, cfl, init_tstep_factor,
               max_dt_change, fix_dt, tmax):
    """The driver.* timestep ladder on traced values.

    Mirrors NullSimulation.compute_timestep (simulation_null.py:155-172;
    reference simulation_null.py:222-244).  Returns (dt, new_dt_old).
    """
    if fix_dt > 0.0:
        dt = jnp.asarray(fix_dt, dt_raw.dtype)
        new_old = dt
    else:
        dt = cfl * dt_raw
        dt = jnp.where(n == 0, init_tstep_factor * dt,
                       jnp.minimum(max_dt_change * dt_old, dt))
        new_old = dt
    dt = jnp.minimum(dt, tmax - t)
    return dt, new_old


def make_chunk_runner(sim, chunk_steps):
    """A jitted carry -> carry function advancing up to chunk_steps steps.

    carry = (U, t, n, dt_old).  Steps freeze once t >= tmax or
    n >= max_steps, so a chunk may safely overrun the end of the run.
    """
    if not (hasattr(sim, "_step") and hasattr(sim, "_dt_fn")):
        raise TypeError(
            f"{type(sim).__name__} does not expose the jitted-kernel "
            "contract (_step/_dt_fn) needed by the on-device loop")
    if getattr(sim, "particles", None) is not None:
        raise NotImplementedError(
            "particles advect on the host; use the standard loop")

    step = sim._step
    dt_fn = sim._dt_fn
    fill = sim.cc_data.fill_bc_stack
    rp = sim.rp
    cfl = rp.get_param("driver.cfl")
    init_f = rp.get_param("driver.init_tstep_factor")
    max_ch = rp.get_param("driver.max_dt_change")
    fix_dt = rp.get_param("driver.fix_dt")
    tmax = sim.tmax
    max_steps = sim.max_steps

    def body(carry, _):
        U, t, n, dt_old = carry
        finished = (t >= tmax) | (n >= max_steps)

        def advance(U, t, n, dt_old):
            U = fill(U, t)
            dt, new_old = dt_control(
                dt_fn(U), t, n, dt_old, cfl=cfl,
                init_tstep_factor=init_f, max_dt_change=max_ch,
                fix_dt=fix_dt, tmax=tmax)
            U = step(U, t, dt)
            return U, t + dt, n + 1, new_old

        carry = jax.lax.cond(finished,
                             lambda U, t, n, d: (U, t, n, d),
                             advance, U, t, n, dt_old)
        return carry, None

    @jax.jit
    def run_chunk(carry):
        carry, _ = jax.lax.scan(body, carry, None, length=chunk_steps)
        return carry

    return run_chunk


def run_sim_fast(pyro, *, chunk_steps=64):
    """Evolve pyro's simulation with the on-device chunked loop.

    Drop-in alternative to Pyro.run_sim for solvers with jitted-kernel
    steps and no particles.  Output/vis happen at chunk boundaries (the
    per-step io.dt_out/n_out cadence coarsens to the chunk size); the
    final state, t, and n match the host loop's to roundoff.
    """
    sim = pyro.sim
    if not pyro.is_initialized:
        msg.fail("ERROR: problem has not been initialized")

    tm_main = pyro.tc.timer("main")
    tm_main.begin()

    do_io = pyro.rp.get_param("io.do_io")
    basename = pyro.rp.get_param("io.basename")
    if do_io:
        sim.write(f"{basename}{sim.n:04d}")

    run_chunk = make_chunk_runner(sim, chunk_steps)
    dtype = sim.cc_data.data.dtype
    carry = (sim.cc_data.data,
             jnp.asarray(sim.cc_data.t, dtype),
             jnp.asarray(sim.n, jnp.int32),
             jnp.asarray(getattr(sim, "dt_old", 1.e33), dtype))

    while not sim.finished():
        carry = jax.block_until_ready(run_chunk(carry))
        U, t, n, dt_old = carry
        sim.cc_data.data = U
        sim.cc_data.t = float(t)
        sim.n = int(n)
        sim.dt_old = float(dt_old)

        if pyro.verbose > 0:
            print(f"{sim.n:5d} {sim.cc_data.t:10.5f}  (chunk of "
                  f"{chunk_steps})")
        if sim.do_output():
            sim.write(f"{basename}{sim.n:04d}")
        if pyro.dovis:
            sim.dovis()

    if do_io or pyro.rp.get_param("io.force_final_output"):
        sim.write(f"{basename}{sim.n:04d}")

    tm_main.end()
    sim.finalize()
    return sim
