"""Parity for the fused lm_atm interface-stage kernels (interpret mode).

The band kernels (solvers/lm_atm/pallas_interface.py) run the SAME
frame-agnostic LM_atm_interface pipeline as the jnp path; slopes are
passed in (global window semantics) and the window-edge rows/columns
come from jnp edge slabs.  Parity is ulp-level, not bitwise: the
kernel is one fused computation while the reference path is eager, so
fma contraction differs (measured <=2 ulp on O(1) data); where an
upwind selector lands within an ulp of zero the branch can flip, which
is why the stage tests use decisively-signed random fields and the
end-to-end test a physical tolerance.  On-chip twins live in
tests/test_pallas_tpu.py.
"""

import importlib

import jax.numpy as jnp
import numpy as np
import pytest

import pyro2_tpu.solvers.lm_atm.LM_atm_interface as lm_interface
from pyro2_tpu.mesh.grid import Cartesian2d
from pyro2_tpu.mesh.indexer import ai

TOL = dict(rtol=5e-6, atol=5e-6)


class _GridSim:
    """The minimal sim surface LMInterfaceKernels reads (the grid)."""

    class _CC:
        pass

    def __init__(self, g):
        self.cc_data = self._CC()
        self.cc_data.grid = g


@pytest.fixture(scope="module")
def fields():
    """Decisively-signed smooth random fields on a 64x64 grid (so the
    upwind branches are ulp-stable), f32."""
    g = Cartesian2d(64, 64, ng=4, xmax=1.0, ymax=1.0)
    rng = np.random.default_rng(7)

    def mk(lo=-1.0, hi=1.0):
        a = rng.uniform(lo, hi, size=(g.qx, g.qy))
        return jnp.asarray(a, jnp.float32)

    # velocities biased away from zero; slopes/gradp/source generic
    u = mk(0.2, 1.2)
    v = mk(-1.2, -0.2)
    planes = dict(u=u, v=v, lux=mk(), lvx=mk(), luy=mk(), lvy=mk(),
                  gpx=mk(), gpy=mk(), src=mk(), rho=mk(0.5, 1.5),
                  lrx=mk(), lry=mk())
    dt = jnp.float32(0.01)
    return g, planes, dt


def _kern(g, tile_rows):
    from pyro2_tpu.solvers.lm_atm import pallas_interface
    return pallas_interface.make_lm_interface_kernels(
        _GridSim(g), tile_rows=tile_rows, interpret=True)


def _mac_args(p):
    return (p["u"], p["v"], p["lux"], p["lvx"], p["luy"], p["lvy"],
            p["gpx"], p["gpy"], p["src"])


@pytest.mark.parametrize("tile_rows", [16, 64])
def test_mac_vels_parity(fields, tile_rows):
    """Kernel mac_vels == jnp mac_vels on the FULL padded array (band
    interiors + slab window-edge rows/cols + zeros outside the window),
    at multi-tile and single-tile decompositions."""
    g, p, dt = fields
    um_k, vm_k = _kern(g, tile_rows).mac_vels(dt, *_mac_args(p))
    um_j, vm_j = lm_interface.mac_vels(g, g.dx, g.dy, dt, *_mac_args(p))
    np.testing.assert_allclose(np.asarray(um_k), np.asarray(um_j), **TOL)
    np.testing.assert_allclose(np.asarray(vm_k), np.asarray(vm_j), **TOL)
    # the zeros-outside-window layout must match exactly
    assert (np.asarray(um_k) == 0).all() == (np.asarray(um_j) == 0).all()


def test_rho_increment_parity(fields):
    """Kernel rho advection increment == jnp rho_states + divergence."""
    g, p, dt = fields
    um, vm = lm_interface.mac_vels(g, g.dx, g.dy, dt, *_mac_args(p))
    inc_k = _kern(g, 16).rho_increment(dt, p["rho"], um, vm,
                                       p["lrx"], p["lry"])
    rho_xint, rho_yint = lm_interface.rho_states(
        g, g.dx, g.dy, dt, p["rho"], um, vm, p["lrx"], p["lry"])
    rxi, ryi = ai(rho_xint, g), ai(rho_yint, g)
    umi, vmi = ai(um, g), ai(vm, g)
    inc_j = -dt * (
        (rxi.ip(1) * umi.ip(1) - rxi.v() * umi.v()) / g.dx +
        (ryi.jp(1) * vmi.jp(1) - ryi.v() * vmi.v()) / g.dy)
    np.testing.assert_allclose(np.asarray(inc_k), np.asarray(inc_j),
                               **TOL)


def test_advect_terms_parity(fields):
    """Kernel full-states advective terms == jnp states + differences."""
    g, p, dt = fields
    um, vm = lm_interface.mac_vels(g, g.dx, g.dy, dt, *_mac_args(p))
    ax_k, ay_k = _kern(g, 16).advect_terms(dt, *_mac_args(p), um, vm)
    u_xint, v_xint, u_yint, v_yint = lm_interface.states(
        g, g.dx, g.dy, dt, *_mac_args(p), um, vm)
    umi, vmi = ai(um, g), ai(vm, g)
    uxi, vxi = ai(u_xint, g), ai(v_xint, g)
    uyi, vyi = ai(u_yint, g), ai(v_yint, g)
    ax_j = (0.5 * (umi.v() + umi.ip(1)) * (uxi.ip(1) - uxi.v()) / g.dx +
            0.5 * (vmi.v() + vmi.jp(1)) * (uyi.jp(1) - uyi.v()) / g.dy)
    ay_j = (0.5 * (umi.v() + umi.ip(1)) * (vxi.ip(1) - vxi.v()) / g.dx +
            0.5 * (vmi.v() + vmi.jp(1)) * (vyi.jp(1) - vyi.v()) / g.dy)
    # the interface-state differences (uxi.ip(1) - uxi.v()) cancel
    # near-equal O(1) states, amplifying the fused-vs-eager contraction
    # ulps (measured: 1 cell in 4096 at 6e-5 relative), hence the wider
    # tolerance than the other stages
    tol = dict(rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ax_k), np.asarray(ax_j), **tol)
    np.testing.assert_allclose(np.asarray(ay_k), np.asarray(ay_j), **tol)


def test_mac_vels_parity_rectangular():
    """nx != ny (and a different lane-pad ratio) through the band."""
    g = Cartesian2d(96, 32, ng=4, xmax=3.0, ymax=1.0)
    rng = np.random.default_rng(3)

    def mk(lo=-1.0, hi=1.0):
        return jnp.asarray(rng.uniform(lo, hi, size=(g.qx, g.qy)),
                           jnp.float32)

    args = (mk(0.2, 1.2), mk(-1.2, -0.2), mk(), mk(), mk(), mk(),
            mk(), mk(), mk())
    dt = jnp.float32(0.004)
    um_k, vm_k = _kern(g, 32).mac_vels(dt, *args)
    um_j, vm_j = lm_interface.mac_vels(g, g.dx, g.dy, dt, *args)
    np.testing.assert_allclose(np.asarray(um_k), np.asarray(um_j), **TOL)
    np.testing.assert_allclose(np.asarray(vm_k), np.asarray(vm_j), **TOL)


def test_ineligible_small_grid():
    from pyro2_tpu.solvers.lm_atm import pallas_interface
    g = Cartesian2d(16, 16, ng=4, xmax=1.0, ymax=1.0)
    with pytest.raises(pallas_interface.IneligibleStep):
        pallas_interface.make_lm_interface_kernels(_GridSim(g))


@pytest.mark.slow
def test_evolve_kernel_route_matches_jnp(monkeypatch):
    """End-to-end bubble evolve with PYRO2_LM_PALLAS=interpret (all
    three stages through the kernels) vs the plain jnp evolve.  The
    kernel stages run f32 inside a f64 (x64 CPU) evolve, so agreement
    is at the f32 level; near-zero bubble velocities can also flip
    upwind ties, bounded by the local velocity scale."""
    import pyro2_tpu.mesh.patch as patch
    from pyro2_tpu.solvers import lm_atm
    from pyro2_tpu.util.runparams import RuntimeParameters

    pm = importlib.import_module(
        "pyro2_tpu.solvers.lm_atm.problems.bubble")
    rp = RuntimeParameters()
    rp.load_params("pyro2_tpu/_defaults")
    rp.load_params("pyro2_tpu/solvers/lm_atm/_defaults")
    for k, v in pm.PROBLEM_PARAMS.items():
        if k not in rp.params:
            rp.set_param(k, v, no_new=False)
    cfg = {"mesh.nx": 64, "mesh.ny": 64, "mesh.xmax": 1.0,
           "mesh.ymax": 1.0,
           "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
           "mesh.ylboundary": "reflect", "mesh.yrboundary": "outflow",
           "bubble.x_pert": 0.5, "bubble.y_pert": 0.35,
           "bubble.r_pert": 0.15, "bubble.scale_height": 1.0,
           "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0}
    for k, v in cfg.items():
        rp.set_param(k, v, no_new=False)
    sim = lm_atm.Simulation("lm_atm", "bubble", pm.init_data, rp)
    sim.initialize()
    sim.cc_data.fill_BC_all()
    sim.preevolve()
    base = patch.cell_center_data_clone(sim.cc_data)

    if hasattr(sim, "_lm_kern"):   # cached None from preevolve's evolve
        del sim._lm_kern
    monkeypatch.setenv("PYRO2_LM_PALLAS", "interpret")
    sim.cc_data.fill_BC_all()
    sim.method_compute_timestep()
    sim.evolve()
    routed = np.asarray(sim.cc_data.data)
    assert sim._lm_kernels() is not None

    sim.cc_data = base
    del sim._lm_kern
    monkeypatch.setenv("PYRO2_LM_PALLAS", "off")
    sim.cc_data.fill_BC_all()
    sim.method_compute_timestep()
    sim.evolve()
    plain = np.asarray(sim.cc_data.data)

    np.testing.assert_allclose(routed, plain, rtol=2e-4, atol=2e-5)
