"""Method-of-lines advection Simulation (reference: pyro/advection_rk/
simulation.py): RK stages over the flux-divergence substep."""

import jax
import jax.numpy as jnp

import pyro2_tpu.solvers.advection_rk.fluxes as flx
from pyro2_tpu.mesh import integration
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.solvers import advection


class Simulation(advection.Simulation):

    def _build_step(self):
        # the CTU step of the parent is unused; stages are driven by evolve
        return None

    def _substep_fn(self):
        g = self.cc_data.grid
        rp = self.rp

        if not hasattr(self, "_substep_jit"):
            def substep(a):
                F_x, F_y = self.flux_fn(a, g, rp)
                fx = ai(F_x, g)
                fy = ai(F_y, g)
                k_v = ((fx.v() - fx.ip(1)) / g.dx +
                       (fy.v() - fy.jp(1)) / g.dy)
                k = jnp.zeros_like(a)
                return k.at[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1].set(k_v)

            self._substep_jit = jax.jit(substep)
        return self._substep_jit

    # the flux routine (overridden by fv4/weno subclasses)
    @property
    def flux_fn(self):
        return flx.fluxes

    def substep(self, myd):
        """The RK increment -div(F) for the stage state myd."""
        return self._substep_fn()(myd.get_var("density"))[None]

    def method_compute_timestep(self):
        """MOL CFL: dt = cfl / (|u|/dx + |v|/dy)."""
        cfl = self.rp.get_param("driver.cfl")
        u = self.rp.get_param("advection.u")
        v = self.rp.get_param("advection.v")
        xtmp = max(abs(u), self.SMALL) / self.cc_data.grid.dx
        ytmp = max(abs(v), self.SMALL) / self.cc_data.grid.dy
        self.dt = cfl / (xtmp + ytmp)

    def evolve(self):
        """Advance via the Butcher-tableau RK integrator."""
        tm_evolve = self.tc.timer("evolve")
        tm_evolve.begin()

        myd = self.cc_data
        method = self.rp.get_param("advection.temporal_method")
        rk = integration.RKIntegrator(myd.t, self.dt, method=method)
        rk.set_start(myd)

        for s in range(rk.nstages()):
            ytmp = rk.get_stage_start(s)
            ytmp.fill_BC_all()
            k = self.substep(ytmp)
            rk.store_increment(s, k)

        rk.compute_final_update()

        if self.particles is not None:
            g = myd.grid
            u = self.rp.get_param("advection.u")
            v = self.rp.get_param("advection.v")
            self.particles.update_particles(
                self.dt, jnp.full((g.qx, g.qy), u), jnp.full((g.qx, g.qy), v))

        myd.t += self.dt
        self.n += 1
        tm_evolve.end()
