"""Method-of-lines compressible Simulation (reference:
pyro/compressible_rk/simulation.py): RK stages over flux-divergence +
source substeps."""

import jax
import jax.numpy as jnp

import pyro2_tpu.solvers.compressible_rk.fluxes as flx
from pyro2_tpu.mesh import integration
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.solvers import compressible


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
                # fused Pallas band kernel (fv4/sdc; the rk 2nd-order
                # pipeline has no kernel tier yet) -- every evolve
                # (host RK loop, SDC sweep) then routes through it
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
        from pyro2_tpu.solvers.compressible.pallas_step import \
            IneligibleStep
        raise IneligibleStep(
            "no fused kernel for the 2nd-order MOL substep")

    def _make_substep(self):
        """The raw (unjitted) stage-increment closure; the sharded MOL
        path traces it inside shard_map with block-gated solid flags."""
        myg = self.cc_data.grid
        rp = self.rp
        ivars = self.ivars
        solid = self.solid
        tc = self.tc
        my_data = self.cc_data
        problem_source = self.problem_source
        small_dens = rp.get_param("compressible.small_dens")
        do_sponge = rp.get_param("sponge.do_sponge")
        iv_sl = (slice(None), slice(myg.ilo, myg.ihi + 1),
                 slice(myg.jlo, myg.jhi + 1))

        def substep(U, t, dt):
            # clamp the -1e200 "no floor" sentinel to the dtype's finite
            # range (an f32 cast of -1e200 overflows and warns)
            floor = max(small_dens, float(jnp.finfo(U.dtype).min))
            U = U.at[(ivars.idens,) + iv_sl[1:]].set(
                jnp.maximum(U[(ivars.idens,) + iv_sl[1:]], floor))

            S = compressible.get_external_sources(
                t, dt, U, ivars, rp, myg,
                problem_source=problem_source)

            F_x, F_y = flx.fluxes(U, my_data, rp, ivars, solid, tc)
            Fx = ai(F_x, myg)
            Fy = ai(F_y, myg)
            k_v = ((Fx.v() - Fx.ip(1)) / myg.dx +
                   (Fy.v() - Fy.jp(1)) / myg.dy +
                   S[iv_sl])

            if do_sponge:
                kappa_f = compressible.get_sponge_factor(U, ivars, rp,
                                                         myg)
                kf = ai(kappa_f, myg).v()
                Uv = ai(U, myg)
                k_v = k_v.at[ivars.ixmom].add(-kf * Uv.v()[ivars.ixmom])
                k_v = k_v.at[ivars.iymom].add(-kf * Uv.v()[ivars.iymom])
                k_v = k_v.at[ivars.iener].add(
                    -kf * (Uv.v()[ivars.ixmom] ** 2 /
                           Uv.v()[ivars.idens] +
                           Uv.v()[ivars.iymom] ** 2 /
                           Uv.v()[ivars.idens]))

            k = jnp.zeros_like(U)
            return k.at[iv_sl].set(k_v)

        return substep

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
