"""On-device validation of the fused Pallas CTU kernel.

These run only when a TPU-class backend is attached (the default test
suite pins jax to CPU where Mosaic cannot compile); run with

    PYRO2_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py -q

The kernel must be BITWISE identical to the jnp reference step on the
interior (same arithmetic, different schedule — see
solvers/compressible/pallas_step.py).
"""

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="Mosaic kernels need a TPU-class backend")


@pytest.mark.parametrize("tile_rows", [32, 128])
def test_ctu_kernel_bitwise_vs_jnp(tile_rows):
    from pyro2_tpu import Pyro
    from pyro2_tpu.solvers.compressible.pallas_step import \
        make_pallas_ctu_step

    N = 256
    p = Pyro("compressible")
    p.initialize_problem("kh", inputs_dict={
        "mesh.nx": N, "mesh.ny": N,
        "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
        "mesh.ylboundary": "periodic", "mesh.yrboundary": "periodic",
        "compressible.small_dens": -1.e30,
        "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0})
    sim, rp = p.sim, p.rp

    myg = sim.cc_data.grid
    fill = sim.cc_data.fill_bc_stack
    U0 = fill(sim.cc_data.data)
    sim.cc_data.fill_BC_all()
    sim.method_compute_timestep()
    dt = jnp.asarray(sim.dt, U0.dtype)

    ref = jax.jit(sim._make_step())(U0, jnp.asarray(0.0, U0.dtype), dt)

    pstep = make_pallas_ctu_step(
        N, N, myg.dx, myg.dy, rp.get_param("eos.gamma"),
        rp.params, sim.ivars, tile_rows=tile_rows)
    got = pstep(U0, dt)

    ng = myg.ng
    assert bool(jnp.all(ref[:, ng:-ng, ng:-ng] == got[:, ng:-ng, ng:-ng]))


def test_ctu_padded_layout_bitwise_vs_jnp():
    """The persistent padded-layout step (strip-copy fill + one kernel)
    must match the jnp step bitwise on the interior, including its own
    periodic ghost fill."""
    from pyro2_tpu import Pyro
    from pyro2_tpu.solvers.compressible.pallas_step import \
        make_pallas_ctu_step_padded

    N = 256
    p = Pyro("compressible")
    p.initialize_problem("kh", inputs_dict={
        "mesh.nx": N, "mesh.ny": N,
        "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
        "mesh.ylboundary": "periodic", "mesh.yrboundary": "periodic",
        "compressible.small_dens": -1.e30,
        "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0})
    sim, rp = p.sim, p.rp

    myg = sim.cc_data.grid
    fill_ref = sim.cc_data.fill_bc_stack
    U0 = sim.cc_data.data.astype(jnp.float32)
    sim.cc_data.fill_BC_all()
    sim.method_compute_timestep()
    dt = jnp.asarray(sim.dt, jnp.float32)

    step_ref = jax.jit(sim._make_step())
    ng = myg.ng

    to_p, from_p, fill_p, step_p = make_pallas_ctu_step_padded(
        N, N, myg.dx, myg.dy, rp.get_param("eos.gamma"),
        rp.params, sim.ivars, tile_rows=128)

    # two full steps (fill + step), so the second step consumes ghosts
    # produced by the padded fill itself
    U = U0
    P = to_p(U0)
    for _ in range(2):
        U = step_ref(fill_ref(U), jnp.asarray(0.0, U.dtype), dt)
        P = step_p(fill_p(P), dt)

    got = from_p(P)
    assert bool(jnp.all(U[:, ng:-ng, ng:-ng] == got[:, ng:-ng, ng:-ng]))


@pytest.mark.parametrize("problem,overrides", [
    # outflow BCs, no sources (the Sod shock tube)
    ("sod", {"mesh.nx": 128, "mesh.ny": 32}),
    # gravity + hse custom BCs + density floor (Rayleigh-Taylor)
    ("rt", {"mesh.nx": 64, "mesh.ny": 192}),
    # gravity + SOLID reflect walls + sponge (exercises the band-gated
    # solid clamps and the implicit damping)
    ("rt", {"mesh.nx": 64, "mesh.ny": 192,
            "mesh.ylboundary": "reflect", "mesh.yrboundary": "reflect",
            "sponge.do_sponge": 1}),
])
def test_ctu_padded_general_bitwise_vs_jnp(problem, overrides):
    """The GENERAL fused kernel (gravity/sponge/floor/solid/custom BCs)
    must match the jnp step bitwise on the interior for real problems."""
    from pyro2_tpu import Pyro
    from pyro2_tpu.solvers.compressible.pallas_step import \
        make_pallas_ctu_step_padded_general

    p = Pyro("compressible")
    p.initialize_problem(problem, inputs_dict={
        "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0,
        "particles.do_particles": 0, **overrides})
    sim = p.sim

    myg = sim.cc_data.grid
    fill_ref = sim.cc_data.fill_bc_stack
    U0 = sim.cc_data.data.astype(jnp.float32)
    sim.cc_data.fill_BC_all()
    sim.method_compute_timestep()
    dt = jnp.asarray(sim.dt, jnp.float32)

    step_ref = jax.jit(sim._make_step())
    ng = myg.ng

    to_p, from_p, fill_p, step_p = \
        make_pallas_ctu_step_padded_general(sim)

    # Drive BOTH paths from the SAME filled state each step and compare
    # the step outputs: the property under test is that the fused KERNEL
    # is bitwise the jnp step.  (Feeding each path its own fill instead
    # is flaky at the ulp level: fill_p runs fill_bc_stack jitted while
    # fill_ref runs it eagerly, XLA's FMA contraction differs between
    # the two compilations of the hse hydrostatic integration, and rt's
    # hydrostatic cancellation amplifies those ulps.)
    P = to_p(U0)
    t = jnp.asarray(0.0, jnp.float32)
    for _ in range(2):
        Pf = fill_p(P, t)
        Uf = from_p(Pf)                      # identical bits to Pf's window
        U = step_ref(Uf, t, dt)
        P = step_p(Pf, t, dt)
        got = from_p(P)
        assert bool(jnp.all(U[:, ng:-ng, ng:-ng] ==
                            got[:, ng:-ng, ng:-ng]))
        # continue the trajectory from the pallas state (already equal
        # on the interior; ghosts are refilled next iteration)
        t = t + dt


def test_ctu_padded_spherical_vs_jnp():
    """The SPHERICAL fused kernel (geometry planes DMA'd per band,
    VERDICT r03 item 8): area/volume-weighted update, dlogA tracing
    sources, geometric momentum sources, non-conservative pressure
    gradients, spherical artificial viscosity.  Must match the jnp step
    on the interior to f32 ulps (FMA contraction may differ between the
    Mosaic kernel and the XLA jnp step)."""
    from pyro2_tpu import Pyro
    from pyro2_tpu.solvers.compressible.pallas_step import \
        make_pallas_ctu_step_padded_general

    p = Pyro("compressible")
    p.initialize_problem("advect", inputs_dict={
        "mesh.nx": 64, "mesh.ny": 64,
        "mesh.grid_type": "SphericalPolar",
        "mesh.xmin": 0.5, "mesh.xmax": 1.0,
        "mesh.ymin": 0.7853981633974483, "mesh.ymax": 2.356194490192345,
        "mesh.xlboundary": "outflow", "mesh.xrboundary": "outflow",
        "mesh.ylboundary": "outflow", "mesh.yrboundary": "outflow",
        "compressible.riemann": "CGF",
        "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0,
        "particles.do_particles": 0})
    sim = p.sim
    myg = sim.cc_data.grid
    ng = myg.ng

    to_p, from_p, fill_p, step_p = \
        make_pallas_ctu_step_padded_general(sim)
    step_ref = jax.jit(sim._make_step())

    sim.cc_data.fill_BC_all()
    U0 = sim.cc_data.data.astype(jnp.float32)
    sim.method_compute_timestep()
    dt = jnp.asarray(sim.dt, jnp.float32)

    P = to_p(U0)
    t = jnp.asarray(0.0, jnp.float32)
    for _ in range(2):
        Pf = fill_p(P, t)
        Uf = from_p(Pf)
        U = step_ref(Uf, t, dt)
        P = step_p(Pf, t, dt)
        got = from_p(P)
        a = U[:, ng:-ng, ng:-ng]
        b = got[:, ng:-ng, ng:-ng]
        scale = float(jnp.max(jnp.abs(a)))
        assert float(jnp.max(jnp.abs(a - b))) < 1e-5 * scale
        t = t + dt


def test_production_step_auto_fused():
    """Simulation.initialize wires evolve through the fused kernel on
    TPU automatically (r04); the wired step must match the jnp step
    bitwise on the interior and preserve ghost zones."""
    from pyro2_tpu import Pyro

    p = Pyro("compressible")
    p.initialize_problem("kh", inputs_dict={
        "mesh.nx": 64, "mesh.ny": 64,
        "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0,
        "particles.do_particles": 0})
    sim = p.sim
    # the wired step IS the fused adapter (qualname pins the builder;
    # the jnp _make_step's inner fn is also named plain "step")
    assert "_make_fused_step" in sim._step.__wrapped__.__qualname__

    sim.cc_data.fill_BC_all()
    U0 = sim.cc_data.data.astype(jnp.float32)
    dt = jnp.asarray(1e-3, jnp.float32)
    U_fused = sim._step(U0, 0.0, dt)
    U_jnp = jax.jit(sim._make_step())(U0, 0.0, dt)
    ng = sim.cc_data.grid.ng
    assert bool(jnp.all(U_fused[:, ng:-ng, ng:-ng] ==
                        U_jnp[:, ng:-ng, ng:-ng]))
    # ghost zones carried through from the pre-step state
    assert bool(jnp.all(U_fused[:, :ng, :] == U0[:, :ng, :]))


@pytest.mark.parametrize("flavor", ["vc", "general"])
def test_fused_coefficient_mg_vs_jnp(flavor):
    """The fused coefficient-operator V-cycle (pallas_gen_mg) matches the
    jnp cycle to f32 roundoff on hardware, for both operator flavors."""
    import numpy as np

    import pyro2_tpu.mesh.boundary as bnd
    from pyro2_tpu.mesh import patch
    from pyro2_tpu.mesh.grid import Grid2d
    from pyro2_tpu.multigrid import pallas_gen_mg
    from pyro2_tpu.multigrid.general_MG import GeneralMG2d
    from pyro2_tpu.multigrid.variable_coeff_MG import VarCoeffCCMG2d

    N = 128
    g = Grid2d(N, N, ng=1)
    bc_c = bnd.BC(xlb="neumann", xrb="neumann",
                  ylb="neumann", yrb="neumann")
    if flavor == "vc":
        c = jnp.asarray(2.0 + np.cos(2 * np.pi * g.x2d) *
                        np.cos(2 * np.pi * g.y2d), jnp.float32)
        mg = VarCoeffCCMG2d(N, N, coeffs=c, coeffs_bc=bc_c, verbose=0)
    else:
        d = patch.CellCenterData2d(g)
        for name in ["alpha", "beta", "gamma_x", "gamma_y"]:
            d.register_var(name, bc_c)
        d.create()
        d.set_var("alpha", jnp.full((g.qx, g.qy), 10.0, jnp.float32))
        d.set_var("beta", jnp.asarray(g.x2d * g.y2d + 1.0, jnp.float32))
        d.set_var("gamma_x", jnp.ones((g.qx, g.qy), jnp.float32))
        d.set_var("gamma_y", jnp.ones((g.qx, g.qy), jnp.float32))
        mg = GeneralMG2d(N, N, coeffs=d, verbose=0)

    fused = pallas_gen_mg.build_fused_cycle_general(mg)
    jnp_cycle = mg._build_cycle(force_jnp=True)
    gg = mg.soln_grid
    f = jnp.asarray(np.sin(2 * np.pi * gg.x2d) *
                    np.cos(4 * np.pi * gg.y2d), jnp.float32)
    v0 = jnp.zeros((gg.qx, gg.qy), jnp.float32)
    p = mg._params()
    vf, _, nf = fused(v0, f, p)
    vj, _, nj = jnp_cycle(v0, f, p)
    scale = float(jnp.max(jnp.abs(vj)))
    assert float(jnp.max(jnp.abs(vf - vj))) < 1e-6 * max(1.0, scale)
    assert abs(float(nf) - float(nj)) < 1e-4 * max(1.0, float(nj))


@pytest.mark.parametrize("problem,overrides", [
    ("dam", {"swe.riemann": "Roe"}),
    ("quad", {"swe.riemann": "HLLC"}),
])
def test_swe_kernel_bitwise_vs_jnp(problem, overrides):
    """The fused swe band kernel (swe/pallas_step.py) must be BITWISE
    the jnp swe step on the interior, for both Riemann solvers."""
    from pyro2_tpu import Pyro
    from pyro2_tpu.solvers.swe.pallas_step import \
        make_pallas_swe_step_padded

    p = Pyro("swe")
    p.initialize_problem(problem, inputs_dict={
        "mesh.nx": 64, "mesh.ny": 64, **overrides,
        "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0})
    sim = p.sim
    sim.cc_data.fill_BC_all()
    U0 = sim.cc_data.data.astype(jnp.float32)
    dt = jnp.asarray(5e-4, jnp.float32)
    to_p, from_p, fill, step_p = make_pallas_swe_step_padded(sim)
    ng = sim.cc_data.grid.ng
    U_fused = from_p(step_p(to_p(U0), 0.0, dt))[:, ng:-ng, ng:-ng]
    U_jnp = jax.jit(sim._make_step())(U0, 0.0, dt)[:, ng:-ng, ng:-ng]
    if problem == "dam":
        # Roe path is bitwise
        assert bool(jnp.all(U_fused == U_jnp))
    else:
        # HLLC: Mosaic contracts an FMA differently from XLA in one
        # branch -- measured <= 1 ulp on 2 of 16384 cells (quad 64^2)
        scale = float(jnp.max(jnp.abs(U_jnp)))
        assert float(jnp.max(jnp.abs(U_fused - U_jnp))) <= 1e-8 * scale


def test_swe_production_step_auto_fused():
    """swe Simulation.initialize wires evolve through the fused kernel
    on TPU; the wired step matches the jnp step bitwise on the interior
    and preserves ghost zones."""
    from pyro2_tpu import Pyro

    p = Pyro("swe")
    p.initialize_problem("dam", inputs_dict={
        "mesh.nx": 64, "mesh.ny": 64,
        "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0})
    sim = p.sim
    assert "_make_fused_step" in sim._step.__wrapped__.__qualname__
    sim.cc_data.fill_BC_all()
    U0 = sim.cc_data.data.astype(jnp.float32)
    dt = jnp.asarray(5e-4, jnp.float32)
    U_fused = sim._step(U0, 0.0, dt)
    U_jnp = jax.jit(sim._make_step())(U0, 0.0, dt)
    ng = sim.cc_data.grid.ng
    assert bool(jnp.all(U_fused[:, ng:-ng, ng:-ng] ==
                        U_jnp[:, ng:-ng, ng:-ng]))
    assert bool(jnp.all(U_fused[:, :ng, :] == U0[:, :ng, :]))


def test_fv4_substep_bitwise_vs_jnp():
    """The fused fv4 band kernel (compressible_fv4/pallas_step.py) must
    match the jnp substep bitwise on the interior, and the production
    _substep_fn must auto-route through it."""
    from pyro2_tpu import Pyro

    p = Pyro("compressible_fv4")
    p.initialize_problem("acoustic_pulse", inputs_dict={
        "mesh.nx": 64, "mesh.ny": 64,
        "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0})
    sim = p.sim
    sim.preevolve()
    sim.cc_data.fill_BC_all()
    U0 = sim.cc_data.data.astype(jnp.float32)
    dt = jnp.asarray(1e-3, jnp.float32)

    fused = sim._substep_fn()     # auto-routed on TPU
    assert "make_pallas_mol_substep" in fused.__wrapped__.__qualname__
    k_f = fused(U0, 0.0, dt)
    k_j = jax.jit(sim._make_substep())(U0, 0.0, dt)
    assert bool(jnp.all(k_f == k_j))

    # a full evolve through the fused substep runs and stays finite
    sim.method_compute_timestep()
    sim.evolve()
    assert bool(jnp.all(jnp.isfinite(sim.cc_data.data)))


def test_rk_substep_vs_jnp():
    """The fused 2nd-order MOL band kernel matches the jnp substep
    (bitwise at this size on hardware; 1-ulp flux-level contraction
    noise allowed) and auto-routes through _substep_fn."""
    from pyro2_tpu import Pyro

    p = Pyro("compressible_rk")
    p.initialize_problem("advect", inputs_dict={
        "mesh.nx": 64, "mesh.ny": 64,
        "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
        "mesh.ylboundary": "periodic", "mesh.yrboundary": "periodic",
        "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0})
    sim = p.sim
    sim.cc_data.fill_BC_all()
    U0 = sim.cc_data.data.astype(jnp.float32)
    dt = jnp.asarray(1e-3, jnp.float32)
    fused = sim._substep_fn()
    assert "make_pallas_mol_substep" in fused.__wrapped__.__qualname__
    k_f = fused(U0, 0.0, dt)
    k_j = jax.jit(sim._make_substep())(U0, 0.0, dt)
    scale = float(jnp.max(jnp.abs(k_j)))
    assert float(jnp.max(jnp.abs(k_f - k_j))) <= 1e-4 * max(1.0, scale)


def test_ensemble_kernel_bitwise_vs_single():
    """The batched fused CTU kernel (ensemble axis = grid axis) must be
    bitwise the single-problem padded kernel, per member."""
    from pyro2_tpu import Pyro
    from pyro2_tpu.solvers.compressible.pallas_step import (
        make_pallas_ctu_ensemble_step, make_pallas_ctu_step_padded)

    N = 64
    p = Pyro("compressible")
    p.initialize_problem("acoustic_pulse", inputs_dict={
        "mesh.nx": N, "mesh.ny": N,
        "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
        "mesh.ylboundary": "periodic", "mesh.yrboundary": "periodic",
        "compressible.small_dens": -1.e30,
        "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0})
    sim, rp = p.sim, p.rp
    myg = sim.cc_data.grid
    sim.cc_data.fill_BC_all()
    U0 = sim.cc_data.data.astype(jnp.float32)
    U1 = jnp.roll(U0, 5, -1)
    dt = jnp.asarray(1e-3, jnp.float32)
    gamma = rp.get_param("eos.gamma")

    to1, from1, fill1, step1 = make_pallas_ctu_step_padded(
        N, N, myg.dx, myg.dy, gamma, rp.params, sim.ivars, tile_rows=32)
    toe, frome, fille, stepe = make_pallas_ctu_ensemble_step(
        2, N, N, myg.dx, myg.dy, gamma, rp.params, sim.ivars,
        tile_rows=32)

    out_e = frome(stepe(fille(toe(jnp.stack([U0, U1]))), dt))
    ng = myg.ng
    for i, U in enumerate((U0, U1)):
        ref = from1(step1(fill1(to1(U)), dt))
        assert bool(jnp.all(out_e[i][:, ng:-ng, ng:-ng] ==
                            ref[:, ng:-ng, ng:-ng]))


def test_lm_interface_kernels_vs_jnp():
    """The fused lm_atm interface-stage kernels (lm_atm/pallas_interface)
    vs the jnp LM_atm_interface stages on-device.  Parity is ulp-level
    (Mosaic vs XLA fma contraction; see tests/test_lm_pallas.py for the
    window-semantics design that makes it exact up to contraction)."""
    import numpy as np

    import pyro2_tpu.solvers.lm_atm.LM_atm_interface as lm_interface
    from pyro2_tpu.mesh.grid import Cartesian2d
    from pyro2_tpu.mesh.indexer import ai
    from pyro2_tpu.solvers.lm_atm import pallas_interface

    g = Cartesian2d(64, 64, ng=4, xmax=1.0, ymax=1.0)
    rng = np.random.default_rng(7)

    def mk(lo=-1.0, hi=1.0):
        return jnp.asarray(rng.uniform(lo, hi, size=(g.qx, g.qy)),
                           jnp.float32)

    u, v = mk(0.2, 1.2), mk(-1.2, -0.2)
    rho = mk(0.5, 1.5)
    lux, lvx, luy, lvy, lrx, lry = [mk() for _ in range(6)]
    gpx, gpy, src = mk(), mk(), mk()
    dt = jnp.float32(0.01)

    class _CC:
        grid = g

    class _Sim:
        cc_data = _CC()

    kern = pallas_interface.make_lm_interface_kernels(
        _Sim(), tile_rows=16)
    mac_args = (u, v, lux, lvx, luy, lvy, gpx, gpy, src)

    um_k, vm_k = kern.mac_vels(dt, *mac_args)
    um_j, vm_j = lm_interface.mac_vels(g, g.dx, g.dy, dt, *mac_args)
    np.testing.assert_allclose(np.asarray(um_k), np.asarray(um_j),
                               rtol=5e-6, atol=5e-6)
    np.testing.assert_allclose(np.asarray(vm_k), np.asarray(vm_j),
                               rtol=5e-6, atol=5e-6)

    inc_k = kern.rho_increment(dt, rho, um_j, vm_j, lrx, lry)
    rho_xint, rho_yint = lm_interface.rho_states(
        g, g.dx, g.dy, dt, rho, um_j, vm_j, lrx, lry)
    rxi, ryi = ai(rho_xint, g), ai(rho_yint, g)
    umi, vmi = ai(um_j, g), ai(vm_j, g)
    inc_j = -dt * (
        (rxi.ip(1) * umi.ip(1) - rxi.v() * umi.v()) / g.dx +
        (ryi.jp(1) * vmi.jp(1) - ryi.v() * vmi.v()) / g.dy)
    np.testing.assert_allclose(np.asarray(inc_k), np.asarray(inc_j),
                               rtol=5e-6, atol=5e-6)

    ax_k, ay_k = kern.advect_terms(dt, *mac_args, um_j, vm_j)
    u_xint, v_xint, u_yint, v_yint = lm_interface.states(
        g, g.dx, g.dy, dt, *mac_args, um_j, vm_j)
    uxi, vxi = ai(u_xint, g), ai(v_xint, g)
    uyi, vyi = ai(u_yint, g), ai(v_yint, g)
    ax_j = (0.5 * (umi.v() + umi.ip(1)) * (uxi.ip(1) - uxi.v()) / g.dx +
            0.5 * (vmi.v() + vmi.jp(1)) * (uyi.jp(1) - uyi.v()) / g.dy)
    ay_j = (0.5 * (umi.v() + umi.ip(1)) * (vxi.ip(1) - vxi.v()) / g.dx +
            0.5 * (vmi.v() + vmi.jp(1)) * (vyi.jp(1) - vyi.v()) / g.dy)
    np.testing.assert_allclose(np.asarray(ax_k), np.asarray(ax_j),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ay_k), np.asarray(ay_j),
                               rtol=2e-4, atol=2e-5)


def test_lm_atm_evolve_auto_routes_kernels():
    """On TPU the lm_atm evolve routes its three interface-stage call
    sites through the fused kernels (simulation._lm_kernels)."""
    import importlib

    from pyro2_tpu.solvers import lm_atm
    from pyro2_tpu.util.runparams import RuntimeParameters

    pm = importlib.import_module(
        "pyro2_tpu.solvers.lm_atm.problems.bubble")
    rp = RuntimeParameters()
    rp.load_params("pyro2_tpu/_defaults")
    rp.load_params("pyro2_tpu/solvers/lm_atm/_defaults")
    for k, val in pm.PROBLEM_PARAMS.items():
        if k not in rp.params:
            rp.set_param(k, val, no_new=False)
    for k, val in {"mesh.nx": 64, "mesh.ny": 64,
                   "bubble.x_pert": 0.5, "bubble.y_pert": 0.35,
                   "bubble.r_pert": 0.15, "bubble.scale_height": 1.0,
                   "driver.verbose": 0, "vis.dovis": 0,
                   "io.do_io": 0}.items():
        rp.set_param(k, val, no_new=False)
    sim = lm_atm.Simulation("lm_atm", "bubble", pm.init_data, rp)
    sim.initialize()
    sim.cc_data.fill_BC_all()
    assert sim._lm_kernels() is not None
    sim.preevolve()
    sim.cc_data.fill_BC_all()
    sim.method_compute_timestep()
    sim.evolve()          # runs through the kernels end-to-end
    assert bool(jnp.isfinite(sim.cc_data.data).all())
