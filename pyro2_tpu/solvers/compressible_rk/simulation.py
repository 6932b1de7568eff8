"""Method-of-lines compressible Simulation (reference:
pyro/compressible_rk/simulation.py): RK stages over flux-divergence +
source substeps."""

import jax
import jax.numpy as jnp

import pyro2_tpu.solvers.compressible_rk.fluxes as flx
from pyro2_tpu.mesh import integration
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.solvers import compressible


def build_substep(myg, rp, ivars, solid, tc, problem_source=None):
    """The raw MOL stage-increment closure on an arbitrary grid.

    Standalone (like compressible_fv4.build_substep) so the fused Pallas
    band kernel can instantiate the IDENTICAL pipeline on its band grid;
    scatter-free and full-frame-aware throughout."""
    small_dens = rp.get_param("compressible.small_dens")
    do_sponge = rp.get_param("sponge.do_sponge")

    class _Data:
        grid = myg

    my_data = _Data()

    def substep(U, t, dt):
        from pyro2_tpu.mesh.indexer import embed, embed_into

        # clamp the -1e200 "no floor" sentinel to the dtype's finite
        # range (an f32 cast of -1e200 overflows and warns)
        floor = max(small_dens, float(jnp.finfo(U.dtype).min))
        dens = U[ivars.idens]
        dens_f = embed_into(
            jnp.maximum(ai(dens, myg).v(), floor), myg, dens)
        rows = [U[n] for n in range(ivars.nvar)]
        rows[ivars.idens] = dens_f
        U = jnp.stack(rows)

        S = compressible.get_external_sources(
            t, dt, U, ivars, rp, myg, problem_source=problem_source)

        F_x, F_y = flx.fluxes(U, my_data, rp, ivars, solid, tc)
        Fx = ai(F_x, myg)
        Fy = ai(F_y, myg)
        k_v = ((Fx.v() - Fx.ip(1)) / myg.dx +
               (Fy.v() - Fy.jp(1)) / myg.dy +
               ai(S, myg).v())

        if do_sponge:
            kappa_f = compressible.get_sponge_factor(U, ivars, rp, myg)
            kf = ai(kappa_f, myg).v()
            Uv = ai(U, myg)
            krows = [k_v[n] for n in range(ivars.nvar)]
            krows[ivars.ixmom] = krows[ivars.ixmom] + \
                (-kf * Uv.v()[ivars.ixmom])
            krows[ivars.iymom] = krows[ivars.iymom] + \
                (-kf * Uv.v()[ivars.iymom])
            krows[ivars.iener] = krows[ivars.iener] + (
                -kf * (Uv.v()[ivars.ixmom] ** 2 /
                       Uv.v()[ivars.idens] +
                       Uv.v()[ivars.iymom] ** 2 /
                       Uv.v()[ivars.idens]))
            k_v = jnp.stack(krows)

        return embed(k_v, myg)

    return substep


class Simulation(compressible.Simulation):
    """The MOL compressible hydrodynamics solver."""

    def _make_step(self):
        # CTU step unused; stages are driven by evolve
        return lambda U, t, dt: U

    def _substep_fn(self):
        if not hasattr(self, "_substep_jit"):
            fn = None
            if jax.default_backend() == "tpu":
                # eligible configurations run the stage increment as the
                # fused Pallas band kernel (rk, fv4, and sdc each have
                # one via _make_fused_substep) -- every evolve (host RK
                # loop, SDC sweep) then routes through it
                from pyro2_tpu.solvers.compressible.pallas_step import \
                    IneligibleStep
                try:
                    fn = self._make_fused_substep()
                except IneligibleStep as e:
                    if self.verbose > 0:
                        print(f"fused substep ineligible ({e}); "
                              "using the jnp substep")
                except Exception as e:
                    print(f"WARNING: fused substep build failed "
                          f"({type(e).__name__}: {e}); using the jnp "
                          "substep")
            self._substep_jit = fn or jax.jit(self._make_substep())
        return self._substep_jit

    def _make_fused_substep(self):
        """The fused band-kernel twin of the 2nd-order MOL substep."""
        from pyro2_tpu.solvers.compressible_fv4.pallas_step import \
            make_pallas_rk_substep
        return make_pallas_rk_substep(self)

    def _make_substep(self):
        """The raw (unjitted) stage-increment closure; the sharded MOL
        path traces it inside shard_map with block-gated solid flags."""
        return build_substep(self.cc_data.grid, self.rp, self.ivars,
                             self.solid, self.tc,
                             problem_source=self.problem_source)

    def substep(self, myd):
        """The RK increment for the stage state myd."""
        return self._substep_fn()(myd.data, myd.t, self.dt)

    def _make_dt(self):
        """MOL CFL rule as a pure function of the padded stack (same
        arithmetic as method_compute_timestep / derives.py, so the
        sharded pmin of block minima is bitwise the serial min)."""
        myg = self.cc_data.grid
        gamma = self.rp.get_param("eos.gamma")
        ivars = self.ivars

        def dt_fn(U):
            from pyro2_tpu.solvers.compressible import eos
            dens = U[ivars.idens]
            u = U[ivars.ixmom] / dens
            v = U[ivars.iymom] / dens
            e = (U[ivars.iener] - 0.5 * dens * (u * u + v * v)) / dens
            p = eos.pres(gamma, dens, e)
            cs = jnp.sqrt(gamma * p / dens)
            xtmp = (jnp.abs(u) + cs) / myg.dx
            ytmp = (jnp.abs(v) + cs) / myg.dy
            return jnp.min(1.0 / (xtmp + ytmp))

        return dt_fn

    def method_compute_timestep(self):
        """MOL CFL: dt = cfl * min(1 / ((|u|+cs)/dx + (|v|+cs)/dy))."""
        cfl = self.rp.get_param("driver.cfl")
        u, v, cs = self.cc_data.get_var(["velocity", "soundspeed"])
        g = self.cc_data.grid
        xtmp = (jnp.abs(u) + cs) / g.dx
        ytmp = (jnp.abs(v) + cs) / g.dy
        self.dt = cfl * float(jnp.min(1.0 / (xtmp + ytmp)))

    def evolve(self):
        """Advance via the Butcher-tableau RK integrator."""
        tm_evolve = self.tc.timer("evolve")
        tm_evolve.begin()

        myd = self.cc_data
        method = self.rp.get_param("compressible.temporal_method")
        rk = integration.RKIntegrator(myd.t, self.dt, method=method)
        rk.set_start(myd)

        for s in range(rk.nstages()):
            ytmp = rk.get_stage_start(s)
            ytmp.fill_BC_all()
            k = self.substep(ytmp)
            rk.store_increment(s, k)

        rk.compute_final_update()

        if self.particles is not None:
            self.particles.update_particles(self.dt)

        myd.t += self.dt
        self.n += 1
        tm_evolve.end()
