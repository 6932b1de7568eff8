"""High-order tier tests.

Oracles: the recorded 4th-order advection table
(reference advection_fv4/tests/fv4.txt: 4.65e-3 / 3.86e-4 / 2.46e-5 at
32/64/128^2), uniform-state exactness for every variant, and bitwise parity
of the 4th-order limiter against the reference kernel (run as plain Python
via a numba stub).
"""

import sys
import types

import numpy as np
import pytest

from pyro2_tpu import Pyro
from pyro2_tpu.mesh.indexer import ai


def _install_ref():
    """Make the reference importable: numba stub + version stub."""
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def njit(*args, **kwargs):
            if len(args) == 1 and callable(args[0]):
                return args[0]
            return lambda fn: fn

        numba.njit = njit
        sys.modules["numba"] = numba
    if "pyro._version" not in sys.modules:
        m = types.ModuleType("pyro._version")
        m.version = "0"
        sys.modules["pyro._version"] = m
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


class TestFourthOrderKernelParity:
    def test_states_bitwise(self):
        _install_ref()
        from pyro.mesh import fourth_order as rf

        from pyro2_tpu.mesh import fourth_order as mf
        from pyro2_tpu.mesh.grid import Grid2d

        rng = np.random.default_rng(7)
        g = Grid2d(16, 12, ng=4)
        a = rng.standard_normal((g.qx, g.qy))
        a += np.sin(4 * np.pi * g.x2d) * np.cos(2 * np.pi * g.y2d) * 3

        for idir in (1, 2):
            ral, rar = rf.states(a.copy(), g.ng, idir)
            mal, mar = mf.states(np.asarray(a), g, idir)
            # XLA fma/reassociation gives ~1e-14 fp noise vs numpy
            np.testing.assert_allclose(np.asarray(mal), ral,
                                       atol=1e-12, rtol=1e-12)
            np.testing.assert_allclose(np.asarray(mar), rar,
                                       atol=1e-12, rtol=1e-12)


class TestVariantsUniform:
    @pytest.mark.parametrize("solver", ["advection_rk", "advection_fv4",
                                        "advection_weno",
                                        "advection_nonuniform"])
    def test_uniform_preserved(self, solver):
        p = Pyro(solver)
        p.initialize_problem("test", inputs_dict={
            "mesh.nx": 8, "mesh.ny": 8,
            "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
            "mesh.ylboundary": "periodic", "mesh.yrboundary": "periodic",
            "driver.tmax": 0.1, "driver.max_steps": 2,
        })
        p.run_sim()
        g = p.get_grid()
        np.testing.assert_allclose(
            np.asarray(ai(p.get_var("density"), g).v()), 1.0, rtol=1e-12)

    @pytest.mark.parametrize("solver", ["compressible_rk",
                                        "compressible_fv4",
                                        "compressible_sdc",
                                        "compressible_react"])
    def test_compressible_uniform(self, solver):
        p = Pyro(solver)
        p.initialize_problem("test", inputs_dict={
            "mesh.nx": 8, "mesh.ny": 8,
            "driver.tmax": 0.05, "driver.max_steps": 2,
        })
        p.run_sim()
        g = p.get_grid()
        np.testing.assert_allclose(
            np.asarray(ai(p.get_var("density"), g).v()), 1.0, rtol=1e-11)


class TestCompressibleFV4Richardson:
    """The reference's flagship 4th-order record: acoustic-pulse
    Richardson rates ~4 (compressible_fv4/tests/convergence.txt:27-33,
    L2 rates 3.97/4.00 at 64-512^2; matches McCorquodale & Colella
    Table 2).  Run at 32/64/128^2 (fix_dt = 0.192*dx as the reference's
    inputs do) and require the density L2 rate to approach 4."""

    @pytest.mark.slow
    def test_acoustic_pulse_richardson_rate(self):
        from pyro2_tpu.analysis.convergence import compare

        sims = {}
        for nx in (32, 64, 128):
            p = Pyro("compressible_fv4")
            p.initialize_problem("acoustic_pulse", inputs_dict={
                "mesh.nx": nx, "mesh.ny": nx,
                "driver.fix_dt": 0.192 / nx, "driver.tmax": 0.24})
            p.run_sim()
            sims[nx] = p.sim.cc_data

        _, e_coarse = compare(sims[64], sims[32], "density", 2)
        _, e_fine = compare(sims[128], sims[64], "density", 2)
        rate = np.log2(e_coarse / e_fine)
        # the reference measures 3.97 for 64->128 vs 128->256; at one
        # level coarser the asymptotic rate is slightly lower
        assert rate > 3.5, f"Richardson rate {rate} (errors " \
            f"{e_coarse:.3e}, {e_fine:.3e})"


class TestFV4Convergence:
    def test_advection_fv4_32(self):
        p = Pyro("advection_fv4")
        p.initialize_problem("smooth", inputs_dict={
            "mesh.nx": 32, "mesh.ny": 32, "driver.tmax": 1.0})
        g = p.get_grid()
        exact = np.asarray(p.get_var("density"))
        p.run_sim()
        final = np.asarray(p.get_var("density"))
        e = np.asarray(ai(final - exact, g).v())
        l2 = np.sqrt(g.dx * g.dy * np.sum(e ** 2))
        # reference records 4.65e-3 at 32^2 (advection_fv4/tests/fv4.txt)
        assert abs(l2 - 4.65e-3) / 4.65e-3 < 0.02, l2

    @pytest.mark.slow
    def test_advection_fv4_rate(self):
        errs = {}
        for nx in (32, 64):
            p = Pyro("advection_fv4")
            p.initialize_problem("smooth", inputs_dict={
                "mesh.nx": nx, "mesh.ny": nx, "driver.tmax": 1.0})
            g = p.get_grid()
            exact = np.asarray(p.get_var("density"))
            p.run_sim()
            final = np.asarray(p.get_var("density"))
            e = np.asarray(ai(final - exact, g).v())
            errs[nx] = np.sqrt(g.dx * g.dy * np.sum(e ** 2))
        rate = np.log2(errs[32] / errs[64])
        assert rate > 3.4, (errs, rate)


class TestBurgersViscous:
    def test_runs_and_decays(self):
        p = Pyro("burgers_viscous")
        p.initialize_problem("converge", inputs_dict={
            "mesh.nx": 16, "mesh.ny": 16,
            "driver.tmax": 0.05, "driver.fix_dt": 0.025,
            "diffusion.eps": 0.05})
        g = p.get_grid()
        u0 = np.asarray(ai(p.get_var("x-velocity"), g).v())
        p.run_sim()
        u1 = np.asarray(ai(p.get_var("x-velocity"), g).v())
        # viscosity damps the velocity perturbation amplitude
        assert (u1 - u1.mean()).std() < (u0 - u0.mean()).std()
        assert np.isfinite(u1).all()


class TestFusedMOLSubsteps:
    """Interpret-mode validation of the fused MOL stage-increment
    kernels (CPU twins of the hardware tests in test_pallas_tpu.py)."""

    @pytest.mark.slow
    def test_fv4_substep_interpret(self):
        import jax
        import jax.numpy as jnp

        from pyro2_tpu import Pyro
        from pyro2_tpu.solvers.compressible_fv4.pallas_step import \
            make_pallas_fv4_substep

        p = Pyro("compressible_fv4")
        p.initialize_problem("acoustic_pulse", inputs_dict={
            "mesh.nx": 32, "mesh.ny": 32,
            "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0})
        sim = p.sim
        sim.preevolve()
        sim.cc_data.fill_BC_all()
        U0 = sim.cc_data.data.astype(jnp.float32)
        dt = jnp.asarray(1e-3, jnp.float32)
        k_f = make_pallas_fv4_substep(sim, interpret=True)(U0, 0.0, dt)
        k_j = jax.jit(sim._make_substep())(U0, 0.0, dt)
        scale = float(jnp.max(jnp.abs(k_j)))
        # interpret mode differs from the jnp build only by XLA fusion
        # clustering (ulp-level); hardware is bitwise
        assert float(jnp.max(jnp.abs(k_f - k_j.astype(jnp.float32)))) \
            <= 1e-5 * max(1.0, scale)

    @pytest.mark.slow
    def test_rk_substep_interpret(self):
        import jax
        import jax.numpy as jnp

        from pyro2_tpu import Pyro
        from pyro2_tpu.solvers.compressible_fv4.pallas_step import \
            make_pallas_rk_substep

        p = Pyro("compressible_rk")
        p.initialize_problem("advect", inputs_dict={
            "mesh.nx": 32, "mesh.ny": 32,
            "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
            "mesh.ylboundary": "periodic", "mesh.yrboundary": "periodic",
            "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0})
        sim = p.sim
        sim.cc_data.fill_BC_all()
        U0 = sim.cc_data.data.astype(jnp.float32)
        dt = jnp.asarray(1e-3, jnp.float32)
        k_f = make_pallas_rk_substep(sim, interpret=True)(U0, 0.0, dt)
        k_j = jax.jit(sim._make_substep())(U0, 0.0, dt)
        scale = float(jnp.max(jnp.abs(k_j)))
        assert float(jnp.max(jnp.abs(k_f - k_j.astype(jnp.float32)))) \
            <= 1e-4 * max(1.0, scale)
