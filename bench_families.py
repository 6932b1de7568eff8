"""Per-solver-family hardware benchmark: ms/step + zone-updates/s rows.

One row per solver family at a standard size -- all 17 reference
solvers are covered (compressible CTU is bench.py's headline;
compressible_react's evolve is the CTU step wrapped in the reference's
no-op burn/diffuse stubs, so its cost IS the compressible row).  Every
row times the production TPU path for that family:

* hyperbolic families (advection, burgers, swe) time the solver's jitted
  step as a scan chain (slope over two chain lengths, like bench.py's
  headline -- removes the fixed dispatch/tunnel cost);
* the method-of-lines tier (compressible_rk / fv4 / sdc) times the fully
  jitted sharded step on a 1x1 mesh (the stage loop in one dispatch);
* elliptic-implicit families (diffusion, incompressible +/- viscous,
  burgers_viscous) time the fully jitted sharded 1x1 step -- RHS + MG
  solve(s) inside a single scanned program; MG solves include the fused
  Pallas V-cycle where eligible;
* lm_atm's evolve is ONE jitted dispatch (traced coefficient
  hierarchies + both projection phases, sharded_lm_atm._full_step), so
  it scan-chains like everything else; its projections run the fused
  Pallas vc V-cycles.

Standard sizes follow the reference's canonical runs
(/root/reference/pyro/test.py:93-113: sod 128, shear 128, lm bubble 128,
dam 128): 256^2 for the cheap hyperbolic families, 128^2 for the
stage-heavy and elliptic ones.
"""

import importlib
import os
import time

import jax
import jax.numpy as jnp

_HOME = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                     "pyro2_tpu")


def _rp_for(solver, n, overrides=None):
    from pyro2_tpu.util.runparams import RuntimeParameters
    rp = RuntimeParameters()
    rp.load_params(os.path.join(_HOME, "_defaults"))
    rp.load_params(os.path.join(_HOME, f"solvers/{solver}/_defaults"))
    base = {"mesh.nx": n, "mesh.ny": n,
            "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0}
    for k, v in {**base, **(overrides or {})}.items():
        rp.set_param(k, v, no_new=False)
    return rp


def _make_serial(solver, problem, n, overrides=None):
    mod = importlib.import_module(f"pyro2_tpu.solvers.{solver}")
    pmod = importlib.import_module(
        f"pyro2_tpu.solvers.{solver}.problems.{problem}")
    rp = _rp_for(solver, n, overrides)
    for k, v in getattr(pmod, "PROBLEM_PARAMS", {}).items():
        if k not in rp.params:
            rp.set_param(k, v, no_new=False)
    sim = mod.Simulation(solver, problem, pmod.init_data, rp)
    sim.initialize()
    return sim, rp


def _time_best(fn, *args, reps=3):
    best = 1.e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree.leaves(out)[0]
        _ = float(jnp.asarray(leaf).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def _slope_ms(make_chain, state, n1=8, n2=32, reps=3):
    """ms per iteration via two scanned chain lengths."""
    t1 = _time_best(make_chain(n1), state, reps=reps)
    t2 = _time_best(make_chain(n2), state, reps=reps)
    return max((t2 - t1) / (n2 - n1), 1.e-9) * 1e3


def _scan_chain(body):
    """chain(n) -> jitted fn(state) running body n times."""
    def make(n):
        def many(state):
            def sbody(c, _):
                return body(c), None
            state2, _ = jax.lax.scan(sbody, state, None, length=n)
            return state2
        return jax.jit(many)
    return make


def _mesh1x1():
    from pyro2_tpu.parallel import make_mesh
    return make_mesh(shape=(1, 1))


# ---------------------------------------------------------------------------
# per-family measurements: each returns (ms_per_step, note)
# ---------------------------------------------------------------------------

def _bench_advection(n):
    sim, _ = _make_serial("advection", "smooth", n)
    sim.method_compute_timestep()
    dt = jnp.asarray(sim.dt, sim.cc_data.data.dtype)
    step = sim._contract_step
    fill = sim.cc_data.fill_bc_stack
    U0 = sim.cc_data.data

    def body(c):
        U, t = c
        return step(fill(U), t, dt), t + dt

    ms = _slope_ms(_scan_chain(body), (U0, jnp.asarray(0.0, U0.dtype)),
                   n1=64, n2=256)
    return ms, "jitted CTU step scan"


def _bench_burgers(n):
    sim, _ = _make_serial("burgers", "test", n)
    sim.method_compute_timestep()
    u = sim.cc_data.get_var("x-velocity")
    v = sim.cc_data.get_var("y-velocity")
    dt = jnp.asarray(sim.dt, u.dtype)
    step = sim._step   # fills its own ghosts

    def body(c):
        return step(c[0], c[1], dt)

    ms = _slope_ms(_scan_chain(body), (u, v), n1=32, n2=128)
    return ms, "jitted CTU step scan"


def _bench_swe(n):
    sim, _ = _make_serial("swe", "dam", n, {
        "mesh.xlboundary": "outflow", "mesh.xrboundary": "outflow",
        "mesh.ylboundary": "outflow", "mesh.yrboundary": "outflow"})
    sim.cc_data.fill_BC_all()
    sim.method_compute_timestep()
    U0 = sim.cc_data.data
    dt = jnp.asarray(0.5 * sim.dt, U0.dtype)
    step = sim._step
    fill = sim.cc_data.fill_bc_stack

    def body(c):
        U, t = c
        return step(fill(U), t, dt), t + dt

    # long chains: the fused swe step is ~0.06 ms at 256^2, below the
    # noise floor of short chains
    ms = _slope_ms(_scan_chain(body), (U0, jnp.asarray(0.0, U0.dtype)),
                   n1=64, n2=256)
    return ms, "fused Pallas CTU band kernel (Roe + entropy fix)"


def _bench_advection_mol(solver, n, problem="smooth"):
    """The advection MOL variants (rk/fv4/weno): the Butcher stage loop
    at the jnp level over the solver's jitted substep, scan-chained."""
    from pyro2_tpu.mesh import integration
    from pyro2_tpu.mesh.indexer import fill_ghost

    sim, rp = _make_serial(solver, problem, n)
    if hasattr(sim, "preevolve"):
        sim.preevolve()
    sim.method_compute_timestep()
    g = sim.cc_data.grid
    bc = sim.cc_data.BCs["density"]
    method = rp.get_param("advection.temporal_method")
    A = integration.a[method]
    B = integration.b[method]
    substep = sim._substep_fn()
    a0 = sim.cc_data.get_var("density")
    dt = jnp.asarray(sim.dt, a0.dtype)
    sl = (slice(g.ilo, g.ihi + 1), slice(g.jlo, g.jhi + 1))

    def body(a):
        ks = []
        for s in range(len(B)):
            stage = a
            for j in range(s):
                if A[s, j] != 0.0:
                    stage = stage.at[sl].add(dt * A[s, j] * ks[j][sl])
            ks.append(substep(fill_ghost(stage, g, bc)))
        for s in range(len(B)):
            if B[s] != 0.0:
                a = a.at[sl].add(dt * B[s] * ks[s][sl])
        return a

    ms = _slope_ms(_scan_chain(body), a0, n1=16, n2=64)
    return ms, f"jnp Butcher stage loop ({method}) over the jitted substep"


def _bench_advection_nonuniform(n):
    from pyro2_tpu.mesh.indexer import fill_ghost

    sim, _ = _make_serial("advection_nonuniform", "slotted", n)
    sim.method_compute_timestep()
    d = sim.cc_data
    g = d.grid
    bc = d.BCs["density"]
    u = d.get_var("x-velocity")
    v = d.get_var("y-velocity")
    shx = d.get_var("x-shift")
    shy = d.get_var("y-shift")
    a0 = d.get_var("density")
    dt = jnp.asarray(sim.dt, a0.dtype)
    step = sim._step

    def body(a):
        return step(fill_ghost(a, g, bc), u, v, shx, shy, dt)

    # very cheap step (~0.02 ms): long chains to clear the tunnel noise
    ms = _slope_ms(_scan_chain(body), a0, n1=128, n2=512)
    return ms, "jitted upwind-shift step scan (rotation field)"


def _mol(cls_name, solver, n):
    from pyro2_tpu.parallel import sharded_mol
    cls = getattr(sharded_mol, cls_name)
    rp = _rp_for(solver, n, {
        "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
        "mesh.ylboundary": "periodic", "mesh.yrboundary": "periodic"})
    sm = cls(rp, _mesh1x1(), problem="advect")
    U0 = sm.init_interior()
    if hasattr(sm, "preevolve_interior"):
        U0 = sm.preevolve_interior(U0)
    dt = jnp.asarray(1.e-4, U0.dtype)

    def body(c):
        U, t = c
        return sm._step(U, t, dt), t + dt

    ms = _slope_ms(_scan_chain(body), (U0, jnp.asarray(0.0, U0.dtype)))
    return ms, "sharded 1x1 jitted stage loop scan"


def _bench_diffusion(n):
    from pyro2_tpu.parallel.sharded_diffusion import ShardedDiffusion
    rp = _rp_for("diffusion", n, {
        "mesh.xlboundary": "neumann", "mesh.xrboundary": "neumann",
        "mesh.ylboundary": "neumann", "mesh.yrboundary": "neumann",
        "diffusion.k": 1.0, "gaussian.t_0": 0.0001,
        "gaussian.phi_max": 2.0, "gaussian.phi_0": 1.0})
    sd = ShardedDiffusion(rp, _mesh1x1(), problem="gaussian")
    dt = float(sd.dt) if hasattr(sd, "dt") and sd.dt else None
    if not dt:
        # C-N diffusion dt = cfl dx^2 / k (diffusion/simulation.py)
        g = sd.smg.soln_grid
        dt = 0.8 * g.dx ** 2 / sd.k
    phi0 = sd.phi_int
    dtype = phi0.dtype
    sd.smg.serial.alpha = 1.0
    sd.smg.serial.beta = 0.5 * dt * sd.k
    solve_fn = sd.smg._build_solve()
    cp = sd.smg._coarse_params()
    lp = sd.smg._local_params()
    g = sd.smg.soln_grid
    rtol = jnp.asarray(1.e-10, dtype)
    dt_j = jnp.asarray(dt, dtype)

    def body(phi):
        rhs = sd._rhs_fn(phi, dt_j)
        sn = jnp.sqrt(g.dx * g.dy * jnp.sum(rhs ** 2))
        v, r, res, rel, nc = solve_fn(jnp.zeros_like(phi), rhs, cp, lp,
                                      rtol, sn.astype(dtype))
        return v

    ms = _slope_ms(_scan_chain(body), phi0, n1=4, n2=16)
    return ms, "C-N RHS + full MG solve per scanned step"


def _incomp(cls_name, solver, n, problem="shear"):
    from pyro2_tpu.parallel import sharded_incompressible as si
    cls = getattr(si, cls_name)
    rp = _rp_for(solver, n, {
        "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
        "mesh.ylboundary": "periodic", "mesh.yrboundary": "periodic",
        "shear.rho_s": 42.0, "shear.delta_s": 0.05})
    sv = cls(rp, _mesh1x1(), problem=problem)
    sv.preevolve()
    sv.method_compute_timestep()
    U0 = sv.U_int
    dt = jnp.asarray(sv.dt, U0.dtype)

    def body(U):
        return sv._step(U, dt)

    ms = _slope_ms(_scan_chain(body), U0, n1=4, n2=16)
    n_solves = "5 (3 projections + 2 C-N velocity)" \
        if "Viscous" in cls_name else "3 (MAC + final + lagged-gradp)"
    return ms, (f"bottleneck: {n_solves} fused-MG solves per step "
                "(each ~6 V-cycles to rtol 1e-10/1e-12); the "
                "advective stages are <20% of step time")


def _bench_burgers_viscous(n):
    from pyro2_tpu.parallel.sharded_burgers_viscous import \
        ShardedBurgersViscous
    rp = _rp_for("burgers_viscous", n, {
        "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
        "mesh.ylboundary": "periodic", "mesh.yrboundary": "periodic"})
    sv = ShardedBurgersViscous(rp, _mesh1x1(), problem="test")
    sv.method_compute_timestep()
    U0 = sv.U_int
    dt = jnp.asarray(sv.dt, U0.dtype)

    def body(U):
        return sv._step(U, dt)

    ms = _slope_ms(_scan_chain(body), U0, n1=4, n2=16)
    return ms, "2 C-N MG solves inside one scanned step"


def _bench_lm_atm(n):
    from pyro2_tpu.parallel.sharded_lm_atm import ShardedLMAtm
    rp = _rp_for("lm_atm", n, {
        "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
        "mesh.ylboundary": "reflect", "mesh.yrboundary": "outflow",
        "bubble.x_pert": 0.5, "bubble.y_pert": 0.35,
        "bubble.r_pert": 0.15, "bubble.scale_height": 1.0})
    sv = ShardedLMAtm(rp, _mesh1x1(), problem="bubble")
    sv.preevolve()
    sv.method_compute_timestep()
    dt = jnp.asarray(sv.dt)
    step = sv._full_step()

    def body(U):
        return step(U, dt)

    ms = _slope_ms(_scan_chain(body), sv.U_int, n1=5, n2=20)
    return ms, ("one-dispatch evolve: traced vc coefficient hierarchies "
                "+ 3 projections (fused Pallas vc V-cycles) per step")


FAMILIES = [
    ("advection", 256, _bench_advection),
    ("advection_nonuniform", 256, _bench_advection_nonuniform),
    ("advection_rk", 256,
     lambda n: _bench_advection_mol("advection_rk", n)),
    ("advection_fv4", 256,
     lambda n: _bench_advection_mol("advection_fv4", n)),
    ("advection_weno", 256,
     lambda n: _bench_advection_mol("advection_weno", n)),
    ("burgers", 256, _bench_burgers),
    ("swe", 256, _bench_swe),
    ("compressible_rk", 256,
     lambda n: _mol("ShardedCompressibleRK", "compressible_rk", n)),
    ("compressible_fv4", 128,
     lambda n: _mol("ShardedCompressibleFV4", "compressible_fv4", n)),
    ("compressible_sdc", 128,
     lambda n: _mol("ShardedCompressibleSDC", "compressible_sdc", n)),
    ("diffusion", 256, _bench_diffusion),
    ("incompressible", 128,
     lambda n: _incomp("ShardedIncompressible", "incompressible", n)),
    ("incompressible_viscous", 128,
     lambda n: _incomp("ShardedIncompressibleViscous",
                       "incompressible_viscous", n)),
    ("burgers_viscous", 128, _bench_burgers_viscous),
    ("lm_atm", 128, _bench_lm_atm),
]


def bench_families(log=print):
    """{family: {n, ms_per_step, zups, note}} for every solver family
    beyond the flagship compressible CTU (bench.py's headline)."""
    out = {}
    for name, n, fn in FAMILIES:
        try:
            t0 = time.time()
            ms, note = fn(n)
            out[name] = {"n": n, "ms_per_step": round(ms, 4),
                         "zups": round(n * n / ms * 1e3, 1),
                         "note": note}
            log(f"family {name:<24s} {n}^2: {ms:8.3f} ms/step "
                f"({n * n / ms * 1e3:.3e} zups)  [{time.time() - t0:.0f}s]")
        except (Exception, SystemExit) as e:
            out[name] = {"n": n, "error": f"{type(e).__name__}: {e}"}
            log(f"family {name} FAILED: {type(e).__name__}: {e}")
    return out


if __name__ == "__main__":
    import functools
    import json
    import sys
    res = bench_families(log=functools.partial(print, file=sys.stderr,
                                               flush=True))
    print(json.dumps(res, indent=1))
