"""On-device time loop: scan fill -> dt -> step without host round trips.

The reference steps from Python (fill_BC_all -> compute_timestep -> evolve
per step, /root/reference/pyro/pyro_sim.py:241-281), which costs a
host<->device sync every step.  Here the whole loop body -- ghost fill,
CFL dt with the driver's timestep-control ladder (init_tstep_factor /
max_dt_change / fix_dt / tmax clamp, simulation_null.py compute_timestep),
the solver step, and (when enabled) the vectorized tracer-particle
advance -- is ONE jitted `lax.scan` chunk; the host syncs only at chunk
boundaries (for output/vis and the finished check).

Output cadence is EXACT (reference simulation_null.py:200-212): the scan
freezes at the first step where `do_output` would fire (t crossing a
dt_out multiple, or n hitting an n_out multiple), so the host writes the
same files, at the same steps, with the same contents as the per-step
host loop -- chunks simply end early at output steps.

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


def _particle_velocity_fn(sim):
    """A pure U -> (u2d, v2d) velocity extractor for particle advection,
    per solver family (mirrors what each evolve hands update_particles)."""
    ivars = getattr(sim, "ivars", None)
    if ivars is not None and hasattr(ivars, "ixmom"):
        idens, ixmom, iymom = ivars.idens, ivars.ixmom, ivars.iymom

        def vel(U):
            return U[ixmom] / U[idens], U[iymom] / U[idens]
        return vel
    try:
        u = sim.rp.get_param("advection.u")
        v = sim.rp.get_param("advection.v")
    except KeyError:
        raise NotImplementedError(
            f"{type(sim).__name__} has no pure particle-velocity "
            "extractor; use the standard host loop")
    myg = sim.cc_data.grid

    def vel(_U):
        return (jnp.full((myg.qx, myg.qy), u),
                jnp.full((myg.qx, myg.qy), v))
    return vel


def make_chunk_runner(sim, chunk_steps):
    """A jitted carry -> carry function advancing up to chunk_steps steps.

    carry = (U, t, n, dt_old, pos, active).  Steps freeze once t >= tmax,
    n >= max_steps, or an output is due (so the host can write at exactly
    that step); a chunk may safely overrun any of these boundaries.
    The output-due test takes the host-tracked n_num_out as an argument.
    """
    # solvers whose native _step has a different signature (advection's
    # single-variable step) expose a stack-shaped _contract_step instead
    step = getattr(sim, "_contract_step", None) or getattr(sim, "_step",
                                                           None)
    if step is None or not hasattr(sim, "_dt_fn"):
        raise TypeError(
            f"{type(sim).__name__} does not expose the jitted-kernel "
            "contract (_step/_dt_fn) needed by the on-device loop")

    particles = getattr(sim, "particles", None)
    vel_fn = _particle_velocity_fn(sim) if particles is not None else None

    dt_fn = sim._dt_fn
    fill = sim.cc_data.fill_bc_stack
    rp = sim.rp
    cfl = rp.get_param("driver.cfl")
    init_f = rp.get_param("driver.init_tstep_factor")
    max_ch = rp.get_param("driver.max_dt_change")
    fix_dt = rp.get_param("driver.fix_dt")
    tmax = sim.tmax
    max_steps = sim.max_steps
    dt_out = rp.get_param("io.dt_out")
    n_out = rp.get_param("io.n_out")
    do_io = rp.get_param("io.do_io") == 1

    def body(carry, _):
        U, t, n, dt_old, pos, act, n_num_out, last_out_n = carry
        # do_output's predicate (simulation_null.py:142) evaluated at the
        # post-step (t, n); last_out_n stops the n_out branch from
        # re-freezing at the step the host just wrote
        out_due = do_io & ((t >= (n_num_out + 1) * dt_out) |
                           ((n % n_out == 0) & (n > 0) &
                            (n != last_out_n)))
        frozen = (t >= tmax) | (n >= max_steps) | out_due

        def advance(U, t, n, dt_old, pos, act):
            U = fill(U, t)
            dt, new_old = dt_control(
                dt_fn(U), t, n, dt_old, cfl=cfl,
                init_tstep_factor=init_f, max_dt_change=max_ch,
                fix_dt=fix_dt, tmax=tmax)
            U = step(U, t, dt)
            if particles is not None:
                # after the step, with post-step velocities -- the serial
                # evolve order (compressible/simulation.py:387-391)
                u2d, v2d = vel_fn(U)
                pos, act = particles.advance_pure(pos, act, u2d, v2d, dt)
            return U, t + dt, n + 1, new_old, pos, act

        out = jax.lax.cond(frozen,
                           lambda U, t, n, d, p, a: (U, t, n, d, p, a),
                           advance, U, t, n, dt_old, pos, act)
        return out + (n_num_out, last_out_n), None

    @jax.jit
    def run_chunk(carry):
        carry, _ = jax.lax.scan(body, carry, None, length=chunk_steps)
        return carry

    return run_chunk


def run_sim_fast(pyro, *, chunk_steps=64):
    """Evolve pyro's simulation with the on-device chunked loop.

    Drop-in alternative to Pyro.run_sim for solvers with jitted-kernel
    steps: same dt sequence, same output files (count, step numbers and
    contents -- the scan freezes at output-due steps), particles
    included; the host only syncs at chunk boundaries.
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
    particles = getattr(sim, "particles", None)
    if particles is not None:
        pos0, act0 = particles.positions, particles.active
    else:
        pos0 = jnp.zeros((0, 2), dtype)
        act0 = jnp.zeros((0,), bool)
    carry = (sim.cc_data.data,
             jnp.asarray(sim.cc_data.t, dtype),
             jnp.asarray(sim.n, jnp.int32),
             jnp.asarray(getattr(sim, "dt_old", 1.e33), dtype),
             pos0, act0,
             jnp.asarray(sim.n_num_out, jnp.int32),
             jnp.asarray(-1, jnp.int32))

    while not sim.finished():
        carry = jax.block_until_ready(run_chunk(carry))
        U, t, n, dt_old, pos, act = carry[:6]
        sim.cc_data.data = U
        sim.cc_data.t = float(t)
        sim.n = int(n)
        sim.dt_old = float(dt_old)
        if particles is not None:
            particles.positions, particles.active = pos, act

        if pyro.verbose > 0:
            print(f"{sim.n:5d} {sim.cc_data.t:10.5f}  (chunk of "
                  f"{chunk_steps})")
        if sim.do_output():
            sim.write(f"{basename}{sim.n:04d}")
            carry = carry[:6] + (jnp.asarray(sim.n_num_out, jnp.int32),
                                 jnp.asarray(sim.n, jnp.int32))
        if pyro.dovis:
            sim.dovis()

    if do_io or pyro.rp.get_param("io.force_final_output"):
        sim.write(f"{basename}{sim.n:04d}")

    tm_main.end()
    sim.finalize()
    return sim
