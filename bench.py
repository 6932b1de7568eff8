#!/usr/bin/env python3
"""Benchmark: compressible CTU zone-updates/s on one chip.

Runs the flagship solver (compressible CTU, HLLC, flattening, artificial
viscosity) on the 1024^2 smooth-advect problem in f32 on the default JAX
device (the real TPU under the driver).  The timed region is a single jitted
lax.scan of NSTEPS full steps (ghost fill included), so dispatch/tunnel
latency is amortized.

vs_baseline: the reference (pyro2) publishes no performance numbers
(BASELINE.md); as a like-for-like anchor we time the reference's pure
numpy/CPU linear-advection CTU solver (its only hot loop that runs without
numba) at the same resolution and report
    (our compressible zone-updates/s) / (reference advection zone-updates/s).
The reference's own compressible solver (numba) cannot run here and is
algorithmically heavier, so this ratio understates nothing: advection is the
CHEAPEST reference solver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import importlib
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

N = 1024
NSTEPS = 20

_T0 = time.time()


def _log(m):
    print(f"[bench {time.time() - _T0:7.1f}s] {m}", file=sys.stderr,
          flush=True)


def build_step():
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

    fill = sim.cc_data.fill_bc_stack

    # the fused Pallas row-band kernel (bitwise-identical to the jnp step
    # on the interior) is ~1.9x faster on TPU; the persistent padded-layout
    # variant additionally keeps the state in the kernel layout across the
    # whole scan (strip-copy ghost fill, no per-step re-embedding copies).
    # Fall back to the jnp step if Mosaic can't compile on this backend.
    padded = None
    if jax.default_backend() != "cpu":
        try:
            from pyro2_tpu.solvers.compressible.pallas_step import \
                make_pallas_ctu_step_padded
            myg = sim.cc_data.grid
            padded = make_pallas_ctu_step_padded(
                N, N, myg.dx, myg.dy, rp.get_param("eos.gamma"),
                rp.params, sim.ivars, tile_rows=128)
        except Exception:
            padded = None

    if padded is not None:
        to_padded, from_padded, fill_p, step_p = padded

        def many_steps(U, dt):
            P = to_padded(U)

            def body(P, _):
                return step_p(fill_p(P), dt), None
            P, _ = jax.lax.scan(body, P, None, length=NSTEPS)
            return from_padded(fill_p(P))
    else:
        step = sim._make_step()

        def many_steps(U, dt):
            def body(carry, _):
                U, t = carry
                U = fill(U)
                U = step(U, t, dt)
                return (U, t + dt), None

            (U, _), _ = jax.lax.scan(body, (U, jnp.asarray(0.0, U.dtype)),
                                     None, length=NSTEPS)
            return U

    return sim, jax.jit(many_steps)


def bench_ours():
    _log("building the compressible CTU step")
    sim, many_steps = build_step()
    U0 = sim.cc_data.data
    sim.cc_data.fill_BC_all()
    sim.method_compute_timestep()
    dt = jnp.asarray(sim.dt, U0.dtype)

    # warmup/compile
    _log("compiling + warmup")
    out = many_steps(U0, dt)
    jax.block_until_ready(out)

    _log("timing")
    elapsed = min(_timed(many_steps, U0, dt) for _ in range(3))
    zups = N * N * NSTEPS / elapsed
    _log(f"{zups:.3e} zones/s ({1e3 * elapsed / NSTEPS:.2f} ms/step)")
    return zups, elapsed


def _timed(many_steps, U0, dt):
    t0 = time.perf_counter()
    out = many_steps(U0, dt)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


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
    zups, elapsed = bench_ours()

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
        "elapsed_s": elapsed,
        "nsteps": NSTEPS,
        "reference_cpu_advection_zups": ref_zups,
    }))


if __name__ == "__main__":
    main()
