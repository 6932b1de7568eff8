"""Tracer-particle tests (semantics from reference
particles/tests/test_particles.py)."""

import jax.numpy as jnp
import numpy as np

import pyro2_tpu.mesh.boundary as bnd
from pyro2_tpu.mesh import patch
from pyro2_tpu.mesh.grid import Grid2d
from pyro2_tpu.particles.particles import Particles


def _data(nx=16, bc_type="periodic"):
    g = Grid2d(nx, nx, ng=4)
    d = patch.CellCenterData2d(g)
    bc = bnd.BC(xlb=bc_type, xrb=bc_type, ylb=bc_type, yrb=bc_type)
    d.register_var("density", bc)
    d.create()
    return d, bc, g


class TestGenerators:
    def test_grid_generator(self):
        d, bc, g = _data()
        ps = Particles(d, bc, 16, "grid")
        pos = ps.get_positions()
        assert pos.shape == (16, 2)
        assert (pos[:, 0] >= g.xmin).all() and (pos[:, 0] <= g.xmax).all()

    def test_array_generator(self):
        d, bc, g = _data()
        arr = np.array([[0.25, 0.25], [0.5, 0.75]])
        ps = Particles(d, bc, 2, "array", pos_array=arr)
        np.testing.assert_array_equal(ps.get_positions(), arr)
        np.testing.assert_array_equal(ps.get_init_positions(), arr)


class TestAdvection:
    def test_constant_velocity(self):
        """With constant (u, v), particles translate exactly."""
        d, bc, g = _data()
        ps = Particles(d, bc, 4, "grid")
        p0 = ps.get_positions().copy()

        u = jnp.full((g.qx, g.qy), 0.5)
        v = jnp.full((g.qx, g.qy), -0.25)
        dt = 0.1
        ps.update_particles(dt, u, v)
        p1 = ps.get_positions()
        expected = p0 + dt * np.array([0.5, -0.25])
        # wrap periodic
        expected[:, 0] = np.where(expected[:, 0] > g.xmax,
                                  g.xmin + expected[:, 0] - g.xmax,
                                  expected[:, 0])
        np.testing.assert_allclose(p1, expected, rtol=1e-12)

    def test_outflow_deletes(self):
        d, bc, g = _data(bc_type="outflow")
        arr = np.array([[0.95, 0.5], [0.5, 0.5]])
        ps = Particles(d, bc, 2, "array", pos_array=arr)
        u = jnp.full((g.qx, g.qy), 1.0)
        v = jnp.zeros((g.qx, g.qy))
        ps.update_particles(0.1, u, v)   # first particle exits at x > 1
        assert len(ps.get_positions()) == 1

    def test_reflect_bounces(self):
        d, bc, g = _data(bc_type="reflect-even")
        arr = np.array([[0.97, 0.5]])
        ps = Particles(d, bc, 1, "array", pos_array=arr)
        u = jnp.full((g.qx, g.qy), 1.0)
        v = jnp.zeros((g.qx, g.qy))
        ps.update_particles(0.1, u, v)
        pos = ps.get_positions()
        assert len(pos) == 1
        # reflected: 0.97 + 0.1 = 1.07 -> 2*1.0 - 1.07 = 0.93
        np.testing.assert_allclose(pos[0, 0], 0.93, rtol=1e-12)


class TestIO:
    def test_write_particles(self, tmp_path):
        import h5py
        d, bc, g = _data()
        ps = Particles(d, bc, 4, "grid")
        fn = str(tmp_path / "p.h5")
        with h5py.File(fn, "w") as f:
            ps.write_particles(f)
        with h5py.File(fn, "r") as f:
            assert f["particles"]["particle_positions"].shape == (4, 2)
