#!/usr/bin/env python3
"""Benchmark: compressible CTU + multigrid on one chip, with roofline truth.

Primary metric: zone-updates/s of the flagship solver (compressible CTU,
HLLC, flattening, artificial viscosity) at 1024^2 in f32, run as the fused
Pallas persistent-padded row-band kernel (one HBM read + one write per
zone per step).

Timing methodology (r04): every steady-state number is a SLOPE over two
scan-chain lengths (e.g. 25- and 100-step jitted scans).  This removes
the fixed per-dispatch cost -- measured ~25 ms on this axon-tunneled
setup, large enough to have inflated r03's 10-chained V-cycle number
16x -- and a host value readback anchors each measurement
(block_until_ready alone can return early through the tunnel).

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


def _make_sim(n=None):
    from pyro2_tpu.solvers import compressible
    from pyro2_tpu.util.runparams import RuntimeParameters

    if n is None:
        n = N
    home = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                        "pyro2_tpu")
    rp = RuntimeParameters()
    rp.load_params(os.path.join(home, "_defaults"))
    rp.load_params(os.path.join(home, "solvers/compressible/_defaults"))
    for k, v in {"mesh.nx": n, "mesh.ny": n,
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
        out = fn(*args)
        # force a host readback: through the axon tunnel,
        # block_until_ready alone can return before execution finishes
        jax.block_until_ready(out)
        leaf = jax.tree.leaves(out)[0]
        _ = float(jnp.asarray(leaf).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def _time_slope(make_chain, n1, n2, *args, reps=3):
    """Per-iteration time via two chain lengths: slope removes the fixed
    dispatch + tunnel-readback cost (~25 ms/dispatch on this axon setup,
    measured 2026-08-21 -- large enough to inflate a 10-chained V-cycle
    measurement 16x).  make_chain(n) -> jitted fn running n iterations.
    """
    t1 = _time_best(make_chain(n1), *args, reps=reps)
    t2 = _time_best(make_chain(n2), *args, reps=reps)
    return max((t2 - t1) / (n2 - n1), 0.0), t1, t2


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
        P0 = to_padded(U0)
        _log("compiling + warmup")
        jax.block_until_ready(_scan_steps(fill_p, step_p, NSTEPS)(P0, dt))
        _log("timing (slope over 25/100-step scans)")
        per, _, _ = _time_slope(
            lambda n: _scan_steps(fill_p, step_p, n), 25, NSTEPS, P0, dt)
    else:
        fill = sim.cc_data.fill_bc_stack
        step = sim._make_step()

        def make_chain(n):
            def many_steps(U, dt):
                def body(carry, _):
                    U, t = carry
                    return (step(fill(U), t, dt), t + dt), None
                (U, _), _ = jax.lax.scan(
                    body, (U, jnp.asarray(0.0, U.dtype)), None, length=n)
                return U
            return jax.jit(many_steps)
        per, _, _ = _time_slope(make_chain, 25, NSTEPS, U0, dt)

    zups = N * N / per
    ms_step = 1e3 * per
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

        def cycle_chain(fn, f, params):
            def make(n):
                def g(v):
                    def body(v, _):
                        return fn(v, f, params)[0], None
                    v, _ = jax.lax.scan(body, v, None, length=n)
                    return v
                return jax.jit(g)
            return make

        # fused-cycle time (scan slope: steady-state cost, dispatch +
        # tunnel readback excluded)
        fused_ms = None
        if jax.default_backend() != "cpu":
            try:
                fn = pallas_mg.build_fused_cycle(mg)
                v, f, params = mg.v[-1], mg.f[-1], mg._params()
                per, _, _ = _time_slope(cycle_chain(fn, f, params),
                                        10, 50, v)
                fused_ms = per * 1e3
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

        if nmg == 512 and jax.default_backend() != "cpu":
            # the coefficient-operator fused cycle (pallas_gen_mg):
            # lm_atm's projection operator, benchmarked directly
            try:
                import pyro2_tpu.mesh.boundary as bnd
                from pyro2_tpu.multigrid import pallas_gen_mg
                from pyro2_tpu.multigrid.variable_coeff_MG import \
                    VarCoeffCCMG2d
                bc_c = bnd.BC(xlb="neumann", xrb="neumann",
                              ylb="neumann", yrb="neumann")
                eta = jnp.asarray(
                    2.0 + np.cos(2 * np.pi * np.asarray(g.x2d)) *
                    np.cos(2 * np.pi * np.asarray(g.y2d)), jnp.float32)
                vmg = VarCoeffCCMG2d(nmg, nmg, coeffs=eta,
                                     coeffs_bc=bc_c, verbose=0)
                vfn = pallas_gen_mg.build_fused_cycle_general(vmg)
                jfn = vmg._build_cycle(force_jnp=True)
                vv, vf_, vp = vmg.v[-1], rhs.astype(jnp.float32), \
                    vmg._params()
                per, _, _ = _time_slope(cycle_chain(vfn, vf_, vp),
                                        10, 50, vv)
                out["mg_vc_cycle_fused_ms_512"] = per * 1e3
                per, _, _ = _time_slope(cycle_chain(jfn, vf_, vp),
                                        10, 50, vv)
                out["mg_vc_cycle_jnp_ms_512"] = per * 1e3
                _log(f"vc cycle 512: fused "
                     f"{out['mg_vc_cycle_fused_ms_512']:.3f} ms vs jnp "
                     f"{out['mg_vc_cycle_jnp_ms_512']:.3f} ms")
            except Exception as e:
                _log(f"vc cycle bench failed: {type(e).__name__}: {e}")

        if nmg == 512:
            # solve to 1e-11 through the standard driver (uses the fused
            # cycle when eligible): warm (compile) once, then time a
            # fresh solve (one dispatch: includes the ~25 ms tunnel cost)
            mg.solve(rtol=1.e-11)
            out["mg_cycles_to_1e-11_512"] = mg.num_cycles
            mg.init_zeros()
            mg.init_RHS(rhs)
            t0 = time.perf_counter()
            mg.solve(rtol=1.e-11)
            out["mg_solve_s_512_rtol1e-11"] = time.perf_counter() - t0

            # deep-tolerance solve via double-f32 iterative refinement
            # (multigrid/refine.py; VERDICT r03 item 7)
            try:
                from pyro2_tpu.multigrid.refine import solve_ir
                mg.init_zeros()
                mg.init_RHS(rhs)
                solve_ir(mg, rtol=1e-9)     # warm/compile
                mg.init_zeros()
                mg.init_RHS(rhs)
                t0 = time.perf_counter()
                res, n_ref = solve_ir(mg, rtol=1e-9)
                out["mg_solve_ir_s_512"] = time.perf_counter() - t0
                out["mg_solve_ir_res_512"] = res
                out["mg_solve_ir_refinements_512"] = n_ref
            except Exception as e:
                _log(f"IR solve failed: {type(e).__name__}: {e}")

            # jnp-cycle contrast (slope)
            cyc = mg._build_cycle(force_jnp=True)
            if cyc is not None:
                v, f, params = mg.v[-1], mg.f[-1], mg._params()
                per, _, _ = _time_slope(cycle_chain(cyc, f, params),
                                        3, 10, v)
                out["mg_vcycle_jnp_ms_512"] = per * 1e3

    # the sharded MG's fused-kernel path on a 1x1 mesh (the real chip):
    # deep-halo masks, gated fills and the replicated-core kernel all
    # engage with no seams -- must track the serial fused cycle
    try:
        import numpy as np
        from jax.sharding import Mesh
        from pyro2_tpu.parallel.sharded_mg import ShardedMG
        mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                     ("x", "y"))
        smg = ShardedMG(512, 512, mesh1, use_pallas=True)
        smg.init_zeros()
        g = smg.soln_grid
        rhs = jnp.sin(2 * jnp.pi * jnp.asarray(np.asarray(g.x2d))) * \
            jnp.sin(2 * jnp.pi * jnp.asarray(np.asarray(g.y2d)))
        smg.init_RHS(rhs[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1]
                     .astype(jnp.float32))
        cyc = smg._build_cycle()
        cp, lp = smg._coarse_params(), smg._local_params()

        def make(n):
            def go(v):
                def body(v, _):
                    return cyc(v, smg.f_int, cp, lp)[0], None
                v, _ = jax.lax.scan(body, v, None, length=n)
                return v
            return jax.jit(go)
        per, _, _ = _time_slope(make, 10, 50, smg.v_int)
        out["mg_vcycle_sharded_fused_1dev_ms_512"] = per * 1e3
    except Exception as e:
        _log(f"sharded fused MG bench failed: {type(e).__name__}: {e}")
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

    def make_chunk(nlen):
        def chunk(P):
            def body(carry, _):
                P, t, n, dt_old = carry
                P = fill_p(P)
                dt, new_old = dt_control(
                    dt_raw(P), t, n, dt_old, cfl=cfl,
                    init_tstep_factor=rp.get_param(
                        "driver.init_tstep_factor"),
                    max_dt_change=rp.get_param("driver.max_dt_change"),
                    fix_dt=-1.0, tmax=1.e30)
                return (step_p(P, dt), t + dt, n + 1, new_old), None
            z = jnp.asarray(0.0, jnp.float32)
            (P, t, n, _), _ = jax.lax.scan(
                body, (P, z, jnp.asarray(0, jnp.int32), z), None,
                length=nlen)
            return P, t, n
        return jax.jit(chunk)

    P0 = to_padded(sim.cc_data.data)
    per, _, _ = _time_slope(make_chunk, 25, nsteps, P0)
    zups = N * N / per
    _log(f"driver loop: {zups:.3e} zones/s "
         f"({1e3 * per:.2f} ms/step incl. fill+dt)")
    return {"driver_loop_zups": zups,
            "driver_loop_ms_per_step": 1e3 * per,
            "driver_loop_nsteps": nsteps}


def bench_gravity_fused():
    """The GENERAL fused kernel on a real gravity problem (rt, hse BCs,
    density floor) WITH same-size comparators (VERDICT r03 item 5): the
    periodic fused kernel at the same 512^2 size, and the rt step's fill
    cost isolated (the hse ghost integration is the suspected gap)."""
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

    def make_many(nlen):
        def many(P, dt):
            def body(carry, _):
                P, t = carry
                P = step_p(fill_p(P, t), t, dt)
                return (P, t + dt), None
            (P, _), _ = jax.lax.scan(
                body, (P, jnp.asarray(0.0, jnp.float32)), None,
                length=nlen)
            return P
        return jax.jit(many)

    def make_fill_only(nlen):
        def many(P, dt):
            def body(carry, _):
                P, t = carry
                return (fill_p(P, t), t + dt), None
            (P, _), _ = jax.lax.scan(
                body, (P, jnp.asarray(0.0, jnp.float32)), None,
                length=nlen)
            return P
        return jax.jit(many)

    P0 = to_p(sim.cc_data.data.astype(jnp.float32))
    per, _, _ = _time_slope(make_many, 12, nsteps, P0, dt)
    fill_per, _, _ = _time_slope(make_fill_only, 12, nsteps, P0, dt)
    zups = nx * ny / per
    _log(f"rt fused: {zups:.3e} zones/s "
         f"(fill/hse share {100 * fill_per / per:.0f}%)")

    # same-size periodic comparator: the plain fused kernel at 512^2
    from pyro2_tpu.solvers.compressible.pallas_step import \
        make_pallas_ctu_step_padded
    # spherical-geometry fused kernel at the same size (geometry planes
    # DMA'd per band; VERDICT r04 item 8's bench number)
    sph_zups = None
    try:
        p2 = Pyro("compressible")
        p2.initialize_problem("advect", inputs_dict={
            "mesh.nx": nx, "mesh.ny": ny,
            "mesh.grid_type": "SphericalPolar",
            "mesh.xmin": 0.5, "mesh.xmax": 1.0,
            "mesh.ymin": 0.7853981633974483,
            "mesh.ymax": 2.356194490192345,
            "mesh.xlboundary": "outflow", "mesh.xrboundary": "outflow",
            "mesh.ylboundary": "outflow", "mesh.yrboundary": "outflow",
            "compressible.riemann": "CGF",
            "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0,
            "particles.do_particles": 0})
        ssim = p2.sim
        to_s, _, fill_s, step_s = \
            make_pallas_ctu_step_padded_general(ssim)
        ssim.cc_data.fill_BC_all()
        ssim.method_compute_timestep()
        dts = jnp.asarray(ssim.dt, jnp.float32)

        def make_sph(nlen):
            def many(P, dt):
                def body(carry, _):
                    P, t = carry
                    P = step_s(fill_s(P, t), t, dt)
                    return (P, t + dt), None
                (P, _), _ = jax.lax.scan(
                    body, (P, jnp.asarray(0.0, jnp.float32)), None,
                    length=nlen)
                return P
            return jax.jit(many)

        Ps = to_s(ssim.cc_data.data.astype(jnp.float32))
        per_s, _, _ = _time_slope(make_sph, 12, nsteps, Ps, dts)
        sph_zups = nx * ny / per_s
        _log(f"spherical fused: {sph_zups:.3e} zones/s")
    except Exception as e:
        _log(f"spherical fused bench failed: {type(e).__name__}: {e}")

    per_p = None
    try:
        sim2, rp512 = _make_sim(512)
        to2, _, fill2, step2 = make_pallas_ctu_step_padded(
            512, 512, sim2.cc_data.grid.dx, sim2.cc_data.grid.dy,
            rp512.get_param("eos.gamma"), rp512.params, sim2.ivars,
            tile_rows=128, stages=4)
        P2 = to2(sim2.cc_data.data)
        per_p, _, _ = _time_slope(
            lambda n: _scan_steps(fill2, step2, n), 12, nsteps, P2, dt)
    except Exception as e:
        _log(f"periodic-512 comparator failed: {e}")
    return {"fused_gravity_rt_zups_512": zups,
            "fused_gravity_engaged": True,
            "spherical_fused_zups_512": sph_zups,
            "rt_fill_ms_per_step": fill_per * 1e3,
            "rt_step_ms": per * 1e3,
            "periodic_fused_zups_512":
                (512 * 512 / per_p) if per_p else None,
            "rt_vs_periodic_512":
                (per_p / per) if per_p else None}


def bench_ensemble():
    """Ensemble (vmap-tier) throughput: N acoustic-pulse problems through
    the batched fused CTU kernel (grid axis = ensemble axis; the Pallas
    ANY-memory DMA path cannot be vmapped).  SURVEY 2.9's batch
    parallelism row -- no reference counterpart."""
    import importlib

    from pyro2_tpu.solvers import compressible
    from pyro2_tpu.solvers.compressible.pallas_step import \
        make_pallas_ctu_ensemble_step
    from pyro2_tpu.util.runparams import RuntimeParameters

    n = 256
    home = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                        "pyro2_tpu")
    rp = RuntimeParameters()
    rp.load_params(os.path.join(home, "_defaults"))
    rp.load_params(os.path.join(home, "solvers/compressible/_defaults"))
    for k, v in {"mesh.nx": n, "mesh.ny": n,
                 "mesh.xlboundary": "periodic",
                 "mesh.xrboundary": "periodic",
                 "mesh.ylboundary": "periodic",
                 "mesh.yrboundary": "periodic",
                 "compressible.small_dens": -1.e30,
                 "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0}.items():
        rp.set_param(k, v, no_new=False)
    problem = importlib.import_module(
        "pyro2_tpu.solvers.compressible.problems.acoustic_pulse")
    for k, v in problem.PROBLEM_PARAMS.items():
        if k not in rp.params:
            rp.set_param(k, v, no_new=False)
    sim = compressible.Simulation("compressible", "acoustic_pulse",
                                  problem.init_data, rp)
    sim.initialize()
    sim.method_compute_timestep()
    U0 = sim.cc_data.data.astype(jnp.float32)
    dt = jnp.asarray(sim.dt, jnp.float32)
    myg = sim.cc_data.grid

    out = {}
    ms1 = None
    for n_ens in (1, 8):
        toe, frome, fille, stepe = make_pallas_ctu_ensemble_step(
            n_ens, n, n, myg.dx, myg.dy, rp.get_param("eos.gamma"),
            rp.params, sim.ivars)
        P0 = toe(jnp.stack([U0] * n_ens))

        def chain(k):
            def many(P):
                def body(P, _):
                    return stepe(fille(P), dt), None
                P, _ = jax.lax.scan(body, P, None, length=k)
                return P
            return jax.jit(many)

        ms = _time_slope(chain, 25, 100, P0)[0] * 1e3
        out[f"ensemble_ms_per_step_n{n_ens}"] = ms
        out[f"ensemble_zups_n{n_ens}"] = n_ens * n * n / ms * 1e3
        if n_ens == 1:
            ms1 = ms
        _log(f"ensemble n={n_ens}: {ms:.3f} ms/step "
             f"({n_ens * n * n / ms * 1e3:.3e} zups aggregate)")
    out["ensemble_efficiency_n8"] = 8 * ms1 / out["ensemble_ms_per_step_n8"]
    return out


def bench_ctu_sizes(sim_small_rp):
    """The fused-CTU zups-vs-size envelope (512^2 .. largest that fits
    HBM), the single-chip anchor for the >HBM scaling story."""
    from pyro2_tpu.solvers.compressible import pallas_step as ps

    out = {}
    for n in (512, 1024, 2048, 4096, 8192):
        try:
            sim, rp = _make_sim(n)
            # VMEM-aware tile: wide grids shrink the band instead of
            # overflowing the 128 MB VMEM (4096^2 at 128-row tiles used
            # 189 MB and failed; 32-row tiles run at 9.0e8 zups)
            to_p, from_p, fill_p, step_p = ps.make_pallas_ctu_step_padded(
                n, n, sim.cc_data.grid.dx, sim.cc_data.grid.dy,
                rp.get_param("eos.gamma"), rp.params, sim.ivars,
                tile_rows=ps._vmem_tile(n, n))
            P0 = to_p(sim.cc_data.data.astype(jnp.float32))
            dt = jnp.asarray(1e-4 * 1024 / n, jnp.float32)

            def chain(k):
                def many(P):
                    def body(P, _):
                        return step_p(fill_p(P), dt), None
                    P, _ = jax.lax.scan(body, P, None, length=k)
                    return P
                return jax.jit(many)

            n1, n2 = (25, 100) if n <= 2048 else (5, 20)
            ms = _time_slope(chain, n1, n2, P0)[0] * 1e3
            out[f"ctu_zups_{n}"] = n * n / ms * 1e3
            _log(f"ctu {n}^2: {ms:.3f} ms/step "
                 f"({n * n / ms * 1e3:.3e} zups)")
            del P0
        except Exception as e:
            out["ctu_max_size_note"] = (
                f"{n}^2 failed ({type(e).__name__}); largest measured "
                "size above is the single-chip envelope")
            _log(f"ctu {n}^2 failed: {type(e).__name__}: {str(e)[:120]}")
            break
    return out


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


def bench_reference_compressible():
    """The reference's own compressible CTU (sod) on this host's CPU.

    numba is not installed in this image, so the reference's @njit
    kernels run as PURE-PYTHON loops -- reported with an explicit label;
    the numba-compiled reference would be materially faster (its docs
    suggest ~10-100x on the hot loops).  Per-zone cost is resolution-
    independent, so one 128^2 step gives the zups estimate."""
    import types
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def njit(*a, **k):
            if len(a) == 1 and callable(a[0]):
                return a[0]
            return lambda fn: fn
        numba.njit = njit
        sys.modules["numba"] = numba
    if "pyro._version" not in sys.modules:
        m = types.ModuleType("pyro._version")
        m.version = "0"
        sys.modules["pyro._version"] = m
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    from pyro.pyro_sim import Pyro as RefPyro

    n = 128
    p = RefPyro("compressible")
    p.initialize_problem("sod", inputs_dict={
        "mesh.nx": n, "mesh.ny": n, "driver.tmax": 1.0})
    p.sim.cc_data.t = 0.0
    p.sim.compute_timestep()
    t0 = time.perf_counter()
    p.sim.cc_data.fill_BC_all()
    p.sim.evolve()
    return n * n / (time.perf_counter() - t0)


def bench_our_cpu_compressible():
    """OUR compressible CTU (identical jnp step) compiled for this
    host's CPU at 256^2 f64 -- the equal-solver, equal-codebase CPU
    anchor for vs_baseline."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sim, rp = _make_sim(256)
        U0 = jax.device_put(sim.cc_data.data, cpu)
        sim.cc_data.fill_BC_all()
        sim.method_compute_timestep()
        dt = jnp.asarray(sim.dt, U0.dtype)
        fill = sim.cc_data.fill_bc_stack
        step = sim._make_step()

        def many(U, dt, nlen):
            def body(carry, _):
                U, t = carry
                return (step(fill(U), t, dt), t + dt), None
            (U, _), _ = jax.lax.scan(
                body, (U, jnp.asarray(0.0, U.dtype)), None, length=nlen)
            return U
        m5 = jax.jit(lambda U, dt: many(U, dt, 5))
        jax.block_until_ready(m5(U0, dt))
        t0 = time.perf_counter()
        jax.block_until_ready(m5(U0, dt))
        elapsed = time.perf_counter() - t0
    return 256 * 256 * 5 / elapsed


def _emit_partial(stage, zups, ms_step, extras):
    """Print a provisional compact JSON line after each major stage.

    The remote-compile tunnel can wedge a stage indefinitely (observed
    twice in the round-5 MG section); if the driver then kills the
    bench, the LAST complete line in its combined-output tail is still
    a parseable record of everything benched so far.  The final
    emission in main() supersedes these."""
    vs_prev = None
    try:
        here = os.path.dirname(os.path.realpath(__file__))
        with open(os.path.join(here, "BENCH_DETAIL.json")) as fh:
            prev = json.load(fh)
        if prev.get("our_cpu_compressible_zups"):
            vs_prev = zups / prev["our_cpu_compressible_zups"]
    except Exception:
        pass
    fams = extras.get("families", {})
    line = {
        "metric": "zone-updates/s/chip (compressible CTU 1024^2, f32)",
        "value": round(zups, 1),
        "unit": "zones/s",
        "vs_baseline": round(vs_prev, 2) if vs_prev else None,
        "ms_per_step": round(ms_step, 4),
        "partial_through": stage,
        "family_zups": {k: v.get("zups", v.get("error", "?"))
                        for k, v in fams.items()} or None,
    }
    s = json.dumps(line)
    if len(s) > 1800:
        line.pop("family_zups", None)
        s = json.dumps(line)
    print(s, flush=True)


def main():
    sim, rp = _make_sim()
    zups, ms_step, dt, used_pallas = bench_ctu(sim, rp)

    extras = {}
    _emit_partial("ctu", zups, ms_step, extras)
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
    _emit_partial("roofline", zups, ms_step, extras)
    try:
        from bench_families import bench_families
        extras["families"] = bench_families(log=_log)
    except Exception as e:
        _log(f"family bench failed: {type(e).__name__}: {e}")
    _emit_partial("families", zups, ms_step, extras)
    try:
        extras.update(bench_ensemble())
    except Exception as e:
        _log(f"ensemble bench failed: {type(e).__name__}: {e}")
    try:
        extras.update(bench_ctu_sizes(rp))
    except Exception as e:
        _log(f"ctu size envelope failed: {type(e).__name__}: {e}")
    _emit_partial("ctu_sizes", zups, ms_step, extras)
    # the MG section runs LAST among the on-chip stages: its 512^2
    # solve/IR compiles are the largest compile requests in the suite
    # and the ones the tunnel has wedged on
    try:
        extras.update(bench_mg())
    except Exception as e:
        _log(f"MG bench failed: {e}")
    _emit_partial("mg", zups, ms_step, extras)

    ref_zups = None
    try:
        _log("reference advection baseline (numpy CPU)")
        ref_zups = bench_reference_advection()
    except Exception:
        ref_zups = None
    our_cpu = None
    try:
        _log("our compressible CTU on this host's CPU (equal solver)")
        our_cpu = bench_our_cpu_compressible()
    except Exception as e:
        _log(f"our-CPU baseline failed: {type(e).__name__}: {e}")
    ref_comp = None
    try:
        _log("reference compressible sod (pure-python loops, no numba)")
        ref_comp = bench_reference_compressible()
    except Exception as e:
        _log(f"reference compressible baseline failed: "
             f"{type(e).__name__}: {e}")

    # headline ratio: equal solver, equal codebase -- this chip vs this
    # host's 2-vCPU jax-CPU build (conservative; the other anchors are
    # reported raw with their caveats)
    vs_baseline = (zups / our_cpu) if our_cpu else 1.0

    detail = {
        "metric": "zone-updates/s/chip (compressible CTU 1024^2, f32)",
        "value": zups,
        "unit": "zones/s",
        "vs_baseline": vs_baseline,
        "vs_baseline_definition":
            "ours-TPU / ours-jax-CPU-f64 (same CTU solver, 2-vCPU host)",
        "ms_per_step": ms_step,
        "nsteps": NSTEPS,
        "our_cpu_compressible_zups": our_cpu,
        "reference_cpu_advection_zups": ref_zups,
        "reference_cpu_compressible_zups_nonumba": ref_comp,
        "reference_compressible_note":
            "numba unavailable in this image: reference @njit kernels "
            "ran as pure-python loops at 128^2 (per-zone cost is "
            "size-independent); the numba-compiled reference would be "
            "materially faster",
        **extras,
    }

    # the full record goes to a file (and stderr); stdout gets ONE
    # compact JSON line small enough to survive the driver's 2000-char
    # stdout tail capture (r04's full dict overflowed it -> parsed:null)
    here = os.path.dirname(os.path.realpath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as fh:
        json.dump(detail, fh, indent=1)
    _log("full record -> BENCH_DETAIL.json")
    _log(json.dumps(detail))

    fams = extras.get("families", {})
    compact = {
        "metric": detail["metric"],
        "value": round(zups, 1),
        "unit": "zones/s",
        "vs_baseline": round(vs_baseline, 2),
        "ms_per_step": round(ms_step, 4),
        "family_zups": {k: v.get("zups", v.get("error", "?"))
                        for k, v in fams.items()},
        "mg_fused_ms_512": detail.get("mg_vcycle_fused_ms_512"),
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(compact)
    if len(line) > 1800:  # stay inside the driver's tail window
        compact.pop("family_zups", None)
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
