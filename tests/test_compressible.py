"""Compressible solver tests.

Oracles: uniform-state exactness, the exact Sod solution
(reference analysis/sod-exact.out), x/y symmetry of the dimensionally
unsplit scheme, and cons<->prim round-tripping
(reference compressible/tests/test_compressible.py).
"""

import numpy as np
import pytest

from pyro2_tpu import Pyro
from pyro2_tpu.mesh.indexer import ai

SOD_EXACT = "/root/reference/pyro/analysis/sod-exact.out"


class TestConsPrims:
    def test_roundtrip(self):
        import jax.numpy as jnp

        from pyro2_tpu.mesh.grid import Cartesian2d
        from pyro2_tpu.solvers.compressible import simulation as comp

        class IV:
            nvar = 4
            idens, ixmom, iymom, iener = 0, 1, 2, 3
            naux = 0
            irhox = -1
            nq = 4
            irho, iu, iv, ip = 0, 1, 2, 3
            ix = -1

        g = Cartesian2d(8, 8, ng=2)
        rng = np.random.default_rng(0)
        rho = 1.0 + rng.random((g.qx, g.qy))
        u = rng.standard_normal((g.qx, g.qy))
        v = rng.standard_normal((g.qx, g.qy))
        p = 1.0 + rng.random((g.qx, g.qy))
        q = jnp.stack([jnp.asarray(rho), jnp.asarray(u),
                       jnp.asarray(v), jnp.asarray(p)])
        U = comp.prim_to_cons(q, 1.4, IV, g)
        q2 = comp.cons_to_prim(U, 1.4, IV, g)
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q),
                                   rtol=1e-12)


class TestCompressibleRuns:
    def test_uniform_preserved(self):
        p = Pyro("compressible")
        p.initialize_problem("test", inputs_dict={
            "mesh.nx": 8, "mesh.ny": 8,
            "driver.tmax": 0.1, "driver.max_steps": 5,
        })
        p.run_sim()
        g = p.get_grid()
        np.testing.assert_allclose(
            np.asarray(ai(p.get_var("density"), g).v()), 1.0, rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ai(p.get_var("energy"), g).v()), 2.5, rtol=1e-12)

    def _sod(self, direction, riemann="HLLC", nx=128):
        p = Pyro("compressible")
        inputs = {"driver.tmax": 0.2, "compressible.riemann": riemann,
                  "compressible.limiter": 1}
        if direction == "x":
            inputs.update({"mesh.nx": nx, "mesh.ny": 10,
                           "mesh.xmax": 1.0, "mesh.ymax": 0.05,
                           "mesh.xlboundary": "outflow",
                           "mesh.xrboundary": "outflow",
                           "sod.direction": "x"})
        else:
            inputs.update({"mesh.nx": 10, "mesh.ny": nx,
                           "mesh.xmax": 0.05, "mesh.ymax": 1.0,
                           "mesh.ylboundary": "outflow",
                           "mesh.yrboundary": "outflow",
                           "sod.direction": "y"})
        p.initialize_problem("sod", inputs_dict=inputs)
        p.run_sim()
        g = p.get_grid()
        dens = np.asarray(ai(p.get_var("density"), g).v())
        if direction == "x":
            profile = dens[:, 5]
            coord = g.x[g.ilo:g.ihi + 1]
        else:
            profile = dens[5, :]
            coord = g.y[g.jlo:g.jhi + 1]
        return p, profile, coord

    def test_sod_x_vs_exact(self):
        p, dens, x = self._sod("x")
        ex = np.loadtxt(SOD_EXACT, skiprows=1)
        dens_ex = np.interp(x, ex[:, 0], ex[:, 1])
        assert np.abs(dens - dens_ex).mean() < 5e-3
        # the reference golden file for this config is sod_x_0076.h5
        assert p.sim.n == 76

    def test_sod_xy_symmetry(self):
        _, dx, _ = self._sod("x", nx=64)
        _, dy, _ = self._sod("y", nx=64)
        np.testing.assert_allclose(dx, dy, rtol=1e-11)

    @pytest.mark.parametrize("riemann", ["CGF", "HLLC_lm"])
    def test_sod_other_solvers(self, riemann):
        _, dens, x = self._sod("x", riemann=riemann, nx=64)
        ex = np.loadtxt(SOD_EXACT, skiprows=1)
        dens_ex = np.interp(x, ex[:, 0], ex[:, 1])
        assert np.abs(dens - dens_ex).mean() < 1.2e-2


class TestQuadSymmetry:
    def test_quad_diagonal_symmetry(self):
        # quadrant problem with symmetric states 2/4 must stay symmetric
        # under (x,y) swap
        p = Pyro("compressible")
        p.initialize_problem("quad", inputs_dict={
            "mesh.nx": 32, "mesh.ny": 32, "driver.tmax": 0.1,
        })
        p.run_sim()
        g = p.get_grid()
        dens = np.asarray(ai(p.get_var("density"), g).v())
        np.testing.assert_allclose(dens, dens.T, rtol=1e-10)


class TestSphericalFusedKernel:
    """Interpret-mode twin of test_pallas_tpu's spherical kernel test:
    the geometry-plane band kernel must match the jnp step to f32
    interpret ulps on CPU (the identical kernels Mosaic-compile on
    hardware)."""

    def test_spherical_kernel_interpret_vs_jnp(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pyro2_tpu import Pyro
        from pyro2_tpu.solvers.compressible.pallas_step import \
            make_pallas_ctu_step_padded_general

        p = Pyro("compressible")
        p.initialize_problem("advect", inputs_dict={
            "mesh.nx": 32, "mesh.ny": 32,
            "mesh.grid_type": "SphericalPolar",
            "mesh.xmin": 0.5, "mesh.xmax": 1.0,
            "mesh.ymin": 0.7853981633974483,
            "mesh.ymax": 2.356194490192345,
            "mesh.xlboundary": "outflow", "mesh.xrboundary": "outflow",
            "mesh.ylboundary": "outflow", "mesh.yrboundary": "outflow",
            "compressible.riemann": "CGF",
            "driver.verbose": 0, "vis.dovis": 0, "io.do_io": 0,
            "particles.do_particles": 0})
        sim = p.sim
        myg = sim.cc_data.grid
        ng = myg.ng

        to_p, from_p, fill_p, step_p = \
            make_pallas_ctu_step_padded_general(sim, interpret=True)
        step_ref = jax.jit(sim._make_step())

        sim.cc_data.fill_BC_all()
        U0 = sim.cc_data.data.astype(jnp.float32)
        dt = jnp.asarray(1e-3, jnp.float32)
        t = jnp.asarray(0.0, jnp.float32)

        Pf = fill_p(to_p(U0), t)
        U = np.asarray(step_ref(from_p(Pf), t, dt))
        got = np.asarray(from_p(step_p(Pf, t, dt)))
        a = U[:, ng:-ng, ng:-ng]
        b = got[:, ng:-ng, ng:-ng]
        scale = np.abs(a).max()
        assert np.abs(a - b).max() < 1e-5 * scale
