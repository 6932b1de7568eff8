"""Linear advection Simulation (reference: pyro/advection/simulation.py).

The per-step math (ghost fill -> CTU fluxes -> conservative update) is one
jitted pure function over the density array; the Simulation object is just
the host-side shell.
"""

import jax
import jax.numpy as jnp

from pyro2_tpu.mesh import patch
from pyro2_tpu.mesh.indexer import ai, fill_ghost
from pyro2_tpu.simulation_null import NullSimulation, bc_setup, grid_setup
from pyro2_tpu.solvers.advection import advective_fluxes as flx


class Simulation(NullSimulation):

    def initialize(self):
        """Grid (ng=4), the single "density" variable, ICs, jitted step."""
        my_grid = grid_setup(self.rp, ng=4)

        my_data = patch.CellCenterData2d(my_grid)
        bc = bc_setup(self.rp)[0]
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
        self._step = self._build_step()
        # jitted-kernel contract for the on-device driver loop
        # (driver_loop.py): stack-shaped step + raw pre-CFL dt
        one = self._step

        def stack_step(U, t, dt):
            return U.at[0].set(one(U[0], dt))

        g = my_grid
        u = self.rp.get_param("advection.u")
        v = self.rp.get_param("advection.v")
        raw = min(g.dx / max(abs(u), self.SMALL),
                  g.dy / max(abs(v), self.SMALL))

        def dt_fn(U):
            return jnp.asarray(raw, U.dtype)

        self._contract_step = stack_step
        self._dt_fn = jax.jit(dt_fn)

    def _build_step(self, fill_ghosts=True):
        """fill_ghosts=False skips the entry ghost fill (the sharded
        wrapper exchanges halos itself, parallel/sharded_hyperbolic.py)."""
        g = self.cc_data.grid
        bc = self.cc_data.BCs["density"]
        u = self.rp.get_param("advection.u")
        v = self.rp.get_param("advection.v")
        limiter = self.rp.get_param("advection.limiter")

        # interior mask for the write-back (iota compare, not a
        # windowed .at[].set: embedding a value derived from `a` back
        # into `a` mis-lowers on XLA:CPU 0.9 when this step is fused
        # into a larger program -- deterministic wrong interior values;
        # the pad+where form is robust and fuses identically on TPU)
        xi = jax.lax.broadcasted_iota(jnp.int32, (g.qx, g.qy), 0)
        yi = jax.lax.broadcasted_iota(jnp.int32, (g.qx, g.qy), 1)
        interior = ((xi >= g.ilo) & (xi <= g.ihi) &
                    (yi >= g.jlo) & (yi <= g.jhi))

        def step(a, dt):
            if fill_ghosts:
                a = fill_ghost(a, g, bc)
            flux_x, flux_y = flx.unsplit_fluxes(a, g, u, v, limiter, dt)
            fx = ai(flux_x, g)
            fy = ai(flux_y, g)
            av = ai(a, g)
            new_v = (av.v() + dt / g.dx * (fx.v() - fx.ip(1))
                     + dt / g.dy * (fy.v() - fy.jp(1)))
            new_full = jnp.pad(new_v, ((g.ng, g.ng), (g.ng, g.ng)))
            return jnp.where(interior, new_full, a)

        return jax.jit(step)

    def method_compute_timestep(self):
        """CFL constraint: dt = cfl * min(dx/|u|, dy/|v|)."""
        cfl = self.rp.get_param("driver.cfl")
        u = self.rp.get_param("advection.u")
        v = self.rp.get_param("advection.v")

        xtmp = self.cc_data.grid.dx / max(abs(u), self.SMALL)
        ytmp = self.cc_data.grid.dy / max(abs(v), self.SMALL)
        self.dt = cfl * min(xtmp, ytmp)

    def evolve(self):
        """Advance density through one timestep."""
        dens = self.cc_data.get_var("density")
        self.cc_data.set_var("density", self._step(dens, self.dt))

        if self.particles is not None:
            myg = self.cc_data.grid
            u = self.rp.get_param("advection.u")
            v = self.rp.get_param("advection.v")
            u2d = jnp.full((myg.qx, myg.qy), u)
            v2d = jnp.full((myg.qx, myg.qy), v)
            self.particles.update_particles(self.dt, u2d, v2d)

        self.cc_data.t += self.dt
        self.n += 1

    def dovis(self):
        from pyro2_tpu.util import plot_tools
        plot_tools.plot_fields(
            self, [("density", self.cc_data.get_var("density"))],
            title="density")
