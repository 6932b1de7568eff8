#!/usr/bin/env python3
"""Benchmark: compressible CTU + multigrid on one chip, with roofline truth.

Primary metric: zone-updates/s of the flagship solver (compressible CTU,
HLLC, flattening, artificial viscosity) at 1024^2 in f32, run as the fused
Pallas persistent-padded row-band kernel (one HBM read + one write per
zone per step).  The timed region is a jitted lax.scan of NSTEPS full
steps, so dispatch/tunnel latency is amortized.

Also reported (single JSON line, extra keys):
  * ms_per_step, and an IN-KERNEL stage breakdown (interface states /
    transverse+2xRiemann / final 2xRiemann / avisc+update) measured by
    compiling pipeline *prefixes* of the same fused kernel and
    differencing their step times;
  * a roofline placement: flops/zone + transcendentals/zone from XLA's
    cost analysis of the identical jnp step, achieved flop/s vs an
    assumed VPU peak, and achieved HBM bytes/s (2 x nvar x 4 B/zone for
    the fused kernel) vs an assumed HBM peak -- which resource binds;
  * multigrid: fused V-cycle time and cycles-to-1e-11 for the 512^2
    Poisson problem (BASELINE.json's "MG Poisson V-cycle" metric), plus
    the jnp-cycle time for contrast;
  * the ON-DEVICE driver loop (ghost fill + CFL dt + step, all inside
    one scanned chunk -- what a user's whole run gets, not just the
    kernel).

vs_baseline: the reference (pyro2) publishes no performance numbers
(BASELINE.md); as a like-for-like anchor we time the reference's pure
numpy/CPU linear-advection CTU solver (its only hot loop that runs
without numba) at the same resolution: vs_baseline = ours / reference.
Advection is the CHEAPEST reference solver, so the ratio is conservative.

Hardware peaks are ASSUMPTIONS (documented, not measured): TPU v5e
HBM ~819 GB/s; VPU f32 ~3.9e12 op/s (8x128 lanes x 4 ALUs x ~0.94 GHz).
"""

import importlib
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: the heavy Mosaic/XLA compiles here are
# reused across bench runs (and by the round driver's capture run)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

N = 1024
# enough steps that the single dispatch's host<->device (tunnel) latency
# (~20 ms) is amortized: at 20 steps it inflates ms/step by ~40%
NSTEPS = 100

HBM_PEAK = 819.e9      # bytes/s, TPU v5e (assumed)
VPU_PEAK = 3.9e12      # f32 elementwise op/s, TPU v5e (assumed)

_T0 = time.time()


def _log(m):
    print(f"[bench {time.time() - _T0:7.1f}s] {m}", file=sys.stderr,
          flush=True)


def _make_sim():
    from pyro2_tpu.solvers import compressible
    from pyro2_tpu.util.runparams import RuntimeParameters

    home = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                        "pyro2_tpu")
    rp = RuntimeParameters()
    rp.load_params(os.path.join(home, "_defaults"))
    rp.load_params(os.path.join(home, "solvers/compressible/_defaults"))
    for k, v in {"mesh.nx": N, "mesh.ny": N,
                 "mesh.xlboundary": "periodic",
                 "mesh.xrboundary": "periodic",
                 "mesh.ylboundary": "periodic",
                 "mesh.yrboundary": "periodic",
                 "compressible.small_dens": -1.e30,
                 "driver.verbose": 0, "vis.dovis": 0,
                 "io.do_io": 0}.items():
        rp.set_param(k, v, no_new=False)

    problem = importlib.import_module(
        "pyro2_tpu.solvers.compressible.problems.advect")
    sim = compressible.Simulation("compressible", "advect",
                                  problem.init_data, rp)
    sim.initialize()
    return sim, rp


def _padded(sim, rp, stages=4):
    from pyro2_tpu.solvers.compressible.pallas_step import \
        make_pallas_ctu_step_padded
    myg = sim.cc_data.grid
    return make_pallas_ctu_step_padded(
        N, N, myg.dx, myg.dy, rp.get_param("eos.gamma"),
        rp.params, sim.ivars, tile_rows=128, stages=stages)


def _scan_steps(fill_p, step_p, nsteps):
    def many_steps(P, dt):
        def body(P, _):
            return step_p(fill_p(P), dt), None
        P, _ = jax.lax.scan(body, P, None, length=nsteps)
        return P
    return jax.jit(many_steps)


def _time_best(fn, *args, reps=3):
    best = 1.e30
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_ctu(sim, rp):
    """Fused-kernel zups + ms/step (the primary metric)."""
    _log("building the fused CTU step")
    use_pallas = jax.default_backend() != "cpu"
    if use_pallas:
        try:
            to_padded, from_padded, fill_p, step_p = _padded(sim, rp)
        except Exception as e:
            _log(f"pallas build failed ({e}); falling back to jnp step")
            use_pallas = False

    U0 = sim.cc_data.data
    sim.cc_data.fill_BC_all()
    sim.method_compute_timestep()
    dt = jnp.asarray(sim.dt, jnp.float32)

    if use_pallas:
        many = _scan_steps(fill_p, step_p, NSTEPS)
        P0 = to_padded(U0)
        _log("compiling + warmup")
        jax.block_until_ready(many(P0, dt))
        _log("timing")
        elapsed = _time_best(many, P0, dt)
    else:
        fill = sim.cc_data.fill_bc_stack
        step = sim._make_step()

        def many_steps(U, dt):
            def body(carry, _):
                U, t = carry
                return (step(fill(U), t, dt), t + dt), None
            (U, _), _ = jax.lax.scan(body, (U, jnp.asarray(0.0, U.dtype)),
                                     None, length=NSTEPS)
            return U
        many = jax.jit(many_steps)
        jax.block_until_ready(many(U0, dt))
        elapsed = _time_best(many, U0, dt)

    zups = N * N * NSTEPS / elapsed
    ms_step = 1e3 * elapsed / NSTEPS
    _log(f"{zups:.3e} zones/s ({ms_step:.2f} ms/step)")
    return zups, ms_step, dt, use_pallas


def bench_stages(sim, rp, dt):
    """In-kernel stage times by differencing pipeline-prefix kernels.

    Stage 0 (ghost fill only, no CTU kernel) anchors the baseline so the
    scan-dispatch overhead cancels out of every reported stage time."""
    _log("stage breakdown (pipeline-prefix kernels)")
    reps = 50
    times = {}

    to_padded, _, fill_p, _ = _padded(sim, rp)
    P0 = to_padded(sim.cc_data.data)

    def fill_only(P, dt):
        def body(P, _):
            return fill_p(P), None
        P, _ = jax.lax.scan(body, P, None, length=reps)
        return P
    f_only = jax.jit(fill_only)
    jax.block_until_ready(f_only(P0, dt))
    times[0] = _time_best(f_only, P0, dt) / reps

    for stg in (1, 2, 3, 4):
        to_padded, _, fill_p, step_p = _padded(sim, rp, stages=stg)
        many = _scan_steps(fill_p, step_p, reps)
        jax.block_until_ready(many(P0, dt))
        times[stg] = _time_best(many, P0, dt) / reps
    names = {1: "interface_states", 2: "transverse_flux(2xRiemann)",
             3: "final_riemann(x2)", 4: "avisc+update"}
    out, prev = {}, times[0]
    for stg in (1, 2, 3, 4):
        out[names[stg]] = max(times[stg] - prev, 0.0) * 1e3
        prev = times[stg]
    return out


def bench_roofline(sim, zups):
    """Roofline placement from XLA cost analysis of the identical step."""
    _log("roofline (XLA cost analysis of the jnp step)")
    U0 = sim.cc_data.data
    step = jax.jit(sim._make_step())
    t = jnp.asarray(0.0, U0.dtype)
    dt = jnp.asarray(1e-3, U0.dtype)
    try:
        ca = step.lower(U0, t, dt).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        transc = float(ca.get("transcendentals", 0.0))
    except Exception as e:
        _log(f"cost analysis unavailable: {e}")
        return {}
    fpz = flops / (N * N)
    tpz = transc / (N * N)
    bpz = 2 * sim.ivars.nvar * 4        # fused kernel: 1 read + 1 write, f32
    achieved_flops = fpz * zups
    achieved_bw = bpz * zups
    return {
        "flops_per_zone": fpz,
        "transcendentals_per_zone": tpz,
        "hbm_bytes_per_zone_fused": bpz,
        "achieved_flops": achieved_flops,
        "achieved_hbm_Bps": achieved_bw,
        "vpu_peak_assumed": VPU_PEAK,
        "hbm_peak_assumed": HBM_PEAK,
        "pct_vpu_roofline": 100.0 * achieved_flops / VPU_PEAK,
        "pct_hbm_roofline": 100.0 * achieved_bw / HBM_PEAK,
        "bound_by": ("VPU" if achieved_flops / VPU_PEAK >
                     achieved_bw / HBM_PEAK else "HBM"),
    }


def bench_mg():
    """MG Poisson V-cycle time (fused + jnp) and cycles-to-1e-11 at 512^2."""
    _log("multigrid V-cycle benchmark")
    import numpy as np

    from pyro2_tpu.multigrid import pallas_mg
    from pyro2_tpu.multigrid.MG import CellCenterMG2d

    out = {}
    for nmg in (512, 1024, 2048):
        mg = CellCenterMG2d(nmg, nmg, alpha=0.0, beta=-1.0,
                            xl_BC_type="dirichlet", xr_BC_type="dirichlet",
                            yl_BC_type="dirichlet", yr_BC_type="dirichlet",
                            verbose=0)
        g = mg.soln_grid
        rhs = jnp.sin(2 * jnp.pi * jnp.asarray(np.asarray(g.x2d))) * \
            jnp.sin(2 * jnp.pi * jnp.asarray(np.asarray(g.y2d)))
        mg.init_zeros()
        mg.init_RHS(rhs)

        # fused-cycle time
        fused_ms = None
        if jax.default_backend() != "cpu":
            try:
                fn = pallas_mg.build_fused_cycle(mg)
                v, f, params = mg.v[-1], mg.f[-1], mg._params()
                jax.block_until_ready(fn(v, f, params)[0])

                def ten(v):
                    for _ in range(10):
                        v, r, rn = fn(v, f, params)
                    return v
                ten_j = jax.jit(ten)
                jax.block_until_ready(ten_j(v))
                fused_ms = _time_best(ten_j, v) / 10 * 1e3
                if nmg == 1024:
                    # hardware parity vs the jnp cycle (VERDICT r2 item 2)
                    vj = mg._v_cycle(mg.nlevels - 1, v, f, params)
                    vf = fn(v, f, params)[0]
                    out["mg_fused_vs_jnp_maxdiff_1024"] = float(
                        jnp.max(jnp.abs(vf - vj)))
            except Exception as e:
                _log(f"fused MG unavailable at {nmg}: "
                     f"{type(e).__name__}: {e}")
        out[f"mg_vcycle_fused_ms_{nmg}"] = fused_ms

        if nmg == 512:
            # solve to 1e-11 through the standard driver (uses the fused
            # cycle when eligible): warm (compile) once, then time a
            # fresh solve
            mg.solve(rtol=1.e-11)
            out["mg_cycles_to_1e-11_512"] = mg.num_cycles
            mg.init_zeros()
            mg.init_RHS(rhs)
            t0 = time.perf_counter()
            mg.solve(rtol=1.e-11)
            out["mg_solve_s_512_rtol1e-11"] = time.perf_counter() - t0

            # jnp-cycle contrast (one compile + 3 cycles)
            cyc = mg._build_cycle(force_jnp=True)
            if cyc is not None:
                v, f, params = mg.v[-1], mg.f[-1], mg._params()
                jax.block_until_ready(cyc(v, f, params)[0])
                t0 = time.perf_counter()
                for _ in range(3):
                    v, r, rn = cyc(v, f, params)
                jax.block_until_ready(v)
                out["mg_vcycle_jnp_ms_512"] = \
                    (time.perf_counter() - t0) / 3 * 1e3
    return out


def bench_driver_loop(sim, rp, dt0):
    """End-to-end on-device loop: fill + CFL dt + fused step per step."""
    _log("on-device driver loop (fill + dt + step)")
    from pyro2_tpu.driver_loop import dt_control
    from pyro2_tpu.solvers.compressible.pallas_step import NG, NGX
    from pyro2_tpu.solvers.compressible.simulation import cons_to_prim

    try:
        to_padded, _, fill_p, step_p = _padded(sim, rp)
    except Exception:
        return {}

    myg = sim.cc_data.grid
    ivars = sim.ivars
    gamma = rp.get_param("eos.gamma")
    cfl = rp.get_param("driver.cfl")
    nsteps = 100

    def dt_raw(P):
        U = P[:, NGX:NGX + N, NG:NG + N]
        q = cons_to_prim(U, gamma, ivars, myg)
        cs = jnp.sqrt(gamma * q[ivars.ip] / q[ivars.irho])
        xtmp = myg.dx / (jnp.abs(q[ivars.iu]) + cs)
        ytmp = myg.dy / (jnp.abs(q[ivars.iv]) + cs)
        return jnp.minimum(xtmp.min(), ytmp.min())

    def chunk(P):
        def body(carry, _):
            P, t, n, dt_old = carry
            P = fill_p(P)
            dt, new_old = dt_control(
                dt_raw(P), t, n, dt_old, cfl=cfl,
                init_tstep_factor=rp.get_param("driver.init_tstep_factor"),
                max_dt_change=rp.get_param("driver.max_dt_change"),
                fix_dt=-1.0, tmax=1.e30)
            return (step_p(P, dt), t + dt, n + 1, new_old), None
        z = jnp.asarray(0.0, jnp.float32)
        (P, t, n, _), _ = jax.lax.scan(
            body, (P, z, jnp.asarray(0, jnp.int32), z), None, length=nsteps)
        return P, t, n

    chunk_j = jax.jit(chunk)
    P0 = to_padded(sim.cc_data.data)
    jax.block_until_ready(chunk_j(P0)[0])
    elapsed = _time_best(chunk_j, P0)
    zups = N * N * nsteps / elapsed
    _log(f"driver loop: {zups:.3e} zones/s "
         f"({1e3 * elapsed / nsteps:.2f} ms/step incl. fill+dt)")
    return {"driver_loop_zups": zups,
            "driver_loop_ms_per_step": 1e3 * elapsed / nsteps,
            "driver_loop_nsteps": nsteps}


def bench_gravity_fused():
    """The GENERAL fused kernel on a real gravity problem (rt, hse BCs,
    density floor): proves the fused path engages beyond the periodic
    benchmark configuration and reports its throughput."""
    _log("gravity problem (rt) through the general fused kernel")
    from pyro2_tpu.pyro_sim import Pyro
    from pyro2_tpu.solvers.compressible.pallas_step import \
        make_pallas_ctu_step_padded_general

    nx, ny = 512, 512
    p = Pyro("compressible")
    p.initialize_problem("rt", inputs_dict={
        "mesh.nx": nx, "mesh.ny": ny, "mesh.ymax": 1.0,
        "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0,
        "particles.do_particles": 0})
    sim = p.sim

    to_p, from_p, fill_p, step_p = \
        make_pallas_ctu_step_padded_general(sim)
    sim.cc_data.fill_BC_all()
    sim.method_compute_timestep()
    dt = jnp.asarray(sim.dt, jnp.float32)
    nsteps = 50

    def many(P, dt):
        def body(carry, _):
            P, t = carry
            P = step_p(fill_p(P, t), t, dt)
            return (P, t + dt), None
        (P, _), _ = jax.lax.scan(
            body, (P, jnp.asarray(0.0, jnp.float32)), None, length=nsteps)
        return P
    many_j = jax.jit(many)
    P0 = to_p(sim.cc_data.data.astype(jnp.float32))
    jax.block_until_ready(many_j(P0, dt))
    elapsed = _time_best(many_j, P0, dt)
    zups = nx * ny * nsteps / elapsed
    _log(f"rt fused: {zups:.3e} zones/s")
    return {"fused_gravity_rt_zups_512": zups,
            "fused_gravity_engaged": True}


def bench_reference_advection():
    """Zone-updates/s of the reference's numpy advection CTU at N^2."""
    import types
    if "pyro._version" not in sys.modules:
        m = types.ModuleType("pyro._version")
        m.version = "0"
        sys.modules["pyro._version"] = m
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    try:
        from pyro.pyro_sim import Pyro as RefPyro
    except Exception:
        return None

    p = RefPyro("advection")
    p.initialize_problem("smooth", inputs_dict={
        "mesh.nx": N, "mesh.ny": N, "driver.tmax": 1.0})
    p.sim.cc_data.t = 0.0
    p.sim.compute_timestep()

    nsteps = 3
    t0 = time.perf_counter()
    for _ in range(nsteps):
        p.sim.cc_data.fill_BC_all()
        p.sim.evolve()
    elapsed = time.perf_counter() - t0
    return N * N * nsteps / elapsed


def main():
    sim, rp = _make_sim()
    zups, ms_step, dt, used_pallas = bench_ctu(sim, rp)

    extras = {}
    if used_pallas:
        try:
            extras["stage_ms"] = bench_stages(sim, rp, dt)
        except Exception as e:
            _log(f"stage breakdown failed: {e}")
        try:
            extras.update(bench_driver_loop(sim, rp, dt))
        except Exception as e:
            _log(f"driver-loop bench failed: {e}")
    if used_pallas:
        try:
            extras.update(bench_gravity_fused())
        except Exception as e:
            _log(f"gravity fused bench failed: {type(e).__name__}: {e}")
            extras["fused_gravity_engaged"] = False
    try:
        extras["roofline"] = bench_roofline(sim, zups)
    except Exception as e:
        _log(f"roofline failed: {e}")
    try:
        extras.update(bench_mg())
    except Exception as e:
        _log(f"MG bench failed: {e}")

    ref_zups = None
    try:
        ref_zups = bench_reference_advection()
    except Exception:
        ref_zups = None
    vs_baseline = (zups / ref_zups) if ref_zups else 1.0

    print(json.dumps({
        "metric": "zone-updates/s/chip (compressible CTU 1024^2, f32)",
        "value": zups,
        "unit": "zones/s",
        "vs_baseline": vs_baseline,
        "ms_per_step": ms_step,
        "nsteps": NSTEPS,
        "reference_cpu_advection_zups": ref_zups,
        **extras,
    }))


if __name__ == "__main__":
    main()
