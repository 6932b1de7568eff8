"""Non-uniform-velocity advection Simulation
(reference: pyro/advection_nonuniform/simulation.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import pyro2_tpu.solvers.advection_nonuniform.advective_fluxes as flx
from pyro2_tpu.mesh import patch
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.simulation_null import NullSimulation, bc_setup, grid_setup


def _shift(velocity):
    """Upwind shift per cell: 0 where vel <= 0, -1 where vel > 0."""
    return np.where(np.asarray(velocity) > 0, -1.0, 0.0)


class Simulation(NullSimulation):

    def initialize(self):
        """Grid (ng=4); velocity, shift-mask, and density variables."""
        my_grid = grid_setup(self.rp, ng=4)
        bc, bc_xodd, bc_yodd = bc_setup(self.rp)

        my_data = patch.CellCenterData2d(my_grid)
        my_data.register_var("x-velocity", bc_xodd)
        my_data.register_var("y-velocity", bc_yodd)
        my_data.register_var("x-shift", bc_xodd)
        my_data.register_var("y-shift", bc_yodd)
        my_data.register_var("density", bc)
        my_data.create()
        self.cc_data = my_data

        if self.rp.get_param("particles.do_particles") == 1:
            from pyro2_tpu.particles import particles
            n_particles = self.rp.get_param("particles.n_particles")
            particle_generator = self.rp.get_param(
                "particles.particle_generator")
            self.particles = particles.Particles(self.cc_data, bc,
                                                 n_particles,
                                                 particle_generator)

        self.problem_func(self.cc_data, self.rp)
        self.cc_data.set_var("x-shift",
                             _shift(self.cc_data.get_var("x-velocity")))
        self.cc_data.set_var("y-shift",
                             _shift(self.cc_data.get_var("y-velocity")))

        self._step = self._build_step()

    def _build_step(self):
        g = self.cc_data.grid
        rp = self.rp

        def step(a, u, v, shx, shy, dt):
            F_x, F_y = flx.unsplit_fluxes(a, u, v, shx, shy, g, rp, dt)
            fx = ai(F_x, g)
            fy = ai(F_y, g)
            av = ai(a, g)
            new_v = (av.v() + dt / g.dx * (fx.v() - fx.ip(1)) +
                     dt / g.dy * (fy.v() - fy.jp(1)))
            return a.at[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1].set(new_v)

        return jax.jit(step)

    def method_compute_timestep(self):
        """CFL from the max velocity magnitudes."""
        cfl = self.rp.get_param("driver.cfl")
        u = self.cc_data.get_var("x-velocity")
        v = self.cc_data.get_var("y-velocity")
        xtmp = self.cc_data.grid.dx / float(jnp.max(jnp.abs(u)))
        ytmp = self.cc_data.grid.dy / float(jnp.max(jnp.abs(v)))
        self.dt = cfl * min(xtmp, ytmp)

    def evolve(self):
        """Advance density through one timestep."""
        d = self.cc_data
        a_new = self._step(d.get_var("density"), d.get_var("x-velocity"),
                           d.get_var("y-velocity"), d.get_var("x-shift"),
                           d.get_var("y-shift"), self.dt)
        d.set_var("density", a_new)

        if self.particles is not None:
            self.particles.update_particles(self.dt,
                                            d.get_var("x-velocity"),
                                            d.get_var("y-velocity"))

        d.t += self.dt
        self.n += 1

    def dovis(self):
        from pyro2_tpu.util import plot_tools
        plot_tools.plot_fields(
            self, [("density", self.cc_data.get_var("density"))],
            title="density")
