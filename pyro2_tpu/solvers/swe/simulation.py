"""Shallow water CTU Simulation (reference: pyro/swe/simulation.py).

Conserved order (height, x-momentum, y-momentum[, hX...]); primitive
(h, u, v[, X...]).  The whole evolve traces into one jitted step.
"""

import jax
import jax.numpy as jnp

import pyro2_tpu.mesh.boundary as bnd
import pyro2_tpu.solvers.swe.unsplit_fluxes as flx
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.simulation_null import NullSimulation, bc_setup, grid_setup
from pyro2_tpu.solvers.swe import derives


class Variables:
    """Integer indices of the conserved and primitive SWE layouts."""

    def __init__(self, myd):
        self.nvar = len(myd.names)

        self.ih = myd.names.index("height")
        self.ixmom = myd.names.index("x-momentum")
        self.iymom = myd.names.index("y-momentum")

        self.naux = self.nvar - 3
        self.ihx = 3 if self.naux > 0 else -1

        self.nq = 3 + self.naux
        self.ih = 0
        self.iu = 1
        self.iv = 2
        self.ix = 3 if self.naux > 0 else -1


def cons_to_prim(U, ivars, myg):
    """(h, hu, hv[, hX]) -> (h, u, v[, X]).

    Row-list rebuild (scatter-free) so the identical code runs inside
    the fused Pallas band kernel (Mosaic cannot lower .at[i].set)."""
    h = U[ivars.ih]
    safe = jnp.where(h != 0.0, h, 1.0)
    rows = [None] * ivars.nq
    rows[ivars.ih] = h
    rows[ivars.iu] = jnp.where(h != 0.0, U[ivars.ixmom] / safe, 0.0)
    rows[ivars.iv] = jnp.where(h != 0.0, U[ivars.iymom] / safe, 0.0)
    for nq_i, nu_i in zip(range(ivars.ix, ivars.ix + ivars.naux),
                          range(ivars.ihx, ivars.ihx + ivars.naux)):
        rows[nq_i] = jnp.where(h != 0.0, U[nu_i] / safe, 0.0)
    return jnp.stack(rows)


def prim_to_cons(q, ivars, myg):
    """(h, u, v[, X]) -> (h, hu, hv[, hX]); scatter-free."""
    rows = [None] * ivars.nvar
    rows[ivars.ih] = q[ivars.ih]
    rows[ivars.ixmom] = q[ivars.iu] * q[ivars.ih]
    rows[ivars.iymom] = q[ivars.iv] * q[ivars.ih]
    for nq_i, nu_i in zip(range(ivars.ix, ivars.ix + ivars.naux),
                          range(ivars.ihx, ivars.ihx + ivars.naux)):
        rows[nu_i] = q[nq_i] * q[ivars.ih]
    return jnp.stack(rows)


class Simulation(NullSimulation):
    """The CTU shallow-water solver."""

    def initialize(self, *, extra_vars=None, ng=4):
        """Grid (ng=4), (height, momenta, fuel) variables, ICs."""
        my_grid = grid_setup(self.rp, ng=ng)
        my_data = self.data_class(my_grid)

        bc, bc_xodd, bc_yodd = bc_setup(self.rp)
        self.solid = bnd.bc_is_solid(bc)

        my_data.register_var("height", bc)
        my_data.register_var("x-momentum", bc_xodd)
        my_data.register_var("y-momentum", bc_yodd)
        my_data.register_var("fuel", bc)
        if extra_vars is not None:
            for v in extra_vars:
                my_data.register_var(v, bc)

        my_data.set_aux("g", self.rp.get_param("swe.grav"))
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

        aux_data = self.data_class(my_grid)
        aux_data.register_var("ymom_src", bc_yodd)
        aux_data.create()
        self.aux_data = aux_data

        self.ivars = Variables(my_data)
        self.cc_data.add_ivars(self.ivars)
        self.cc_data.add_derived(derives.derive_primitives)

        self.problem_func(self.cc_data, self.rp)

        if self.verbose > 0:
            print(my_data)

        self._step = jax.jit(self._make_step())
        self._dt_fn = jax.jit(self._make_dt())

        # on TPU, eligible configurations route evolve through the fused
        # Pallas swe kernel transparently (the compressible auto-routing
        # pattern, simulation.py there); the jnp step stays the
        # reference implementation and the fallback
        if (jax.default_backend() == "tpu" and
                type(self)._make_step is Simulation._make_step):
            from pyro2_tpu.solvers.swe.pallas_step import IneligibleStep
            try:
                self._step = self._make_fused_step()
            except IneligibleStep as e:
                if self.verbose > 0:
                    print(f"fused swe kernel ineligible ({e}); "
                          "using the jnp step")
            except Exception as e:
                print(f"WARNING: fused swe kernel build failed "
                      f"({type(e).__name__}: {e}); using the jnp step")

    def _make_fused_step(self):
        """An evolve-contract step(U, t, dt) backed by the fused Pallas
        row-band kernel: identical interior to the jnp step (bitwise,
        tests/test_pallas_tpu.py), ghost zones carried through unchanged."""
        from pyro2_tpu.solvers.swe.pallas_step import \
            make_pallas_swe_step_padded
        to_p, from_p, _fill_p, step_p = make_pallas_swe_step_padded(self)
        myg = self.cc_data.grid
        ng = myg.ng
        sl = (slice(None), slice(myg.ilo, myg.ihi + 1),
              slice(myg.jlo, myg.jhi + 1))

        @jax.jit
        def step(U, t, dt):
            P = step_p(to_p(U), jnp.asarray(t, jnp.float32),
                       jnp.asarray(dt, jnp.float32))
            U_new = from_p(P)[:, ng:-ng, ng:-ng]
            return U.at[sl].set(U_new.astype(U.dtype))

        return step

    def _make_dt(self):
        myg = self.cc_data.grid
        ivars = self.ivars
        grav = self.rp.get_param("swe.grav")

        def dt_fn(U):
            q = cons_to_prim(U, ivars, myg)
            cs = jnp.sqrt(grav * q[ivars.ih])
            xtmp = ai(myg.dx / (jnp.abs(q[ivars.iu]) + cs), myg).v()
            ytmp = ai(myg.dy / (jnp.abs(q[ivars.iv]) + cs), myg).v()
            return jnp.minimum(xtmp.min(), ytmp.min())

        return dt_fn

    def _make_step(self):
        myg = self.cc_data.grid
        rp = self.rp
        ivars = self.ivars
        solid = self.solid
        tc = self.tc
        my_data = self.cc_data

        iv_sl = (slice(None), slice(myg.ilo, myg.ihi + 1),
                 slice(myg.jlo, myg.jhi + 1))

        def step(U, t, dt):
            # t is unused (no time-dependent sources in SWE) but kept so
            # every solver's jitted step shares the (U, t, dt) contract
            del t
            F_x, F_y = flx.unsplit_fluxes(U, my_data, rp, ivars, solid,
                                          tc, dt)
            dtdx = dt / myg.dx
            dtdy = dt / myg.dy
            Fx = ai(F_x, myg)
            Fy = ai(F_y, myg)
            upd = (dtdx * (Fx.v() - Fx.ip(1)) +
                   dtdy * (Fy.v() - Fy.jp(1)))
            return U.at[iv_sl].add(upd)

        return step

    def method_compute_timestep(self):
        """CFL: dt = cfl * min(dx/(|u|+cs), dy/(|v|+cs))."""
        cfl = self.rp.get_param("driver.cfl")
        self.dt = cfl * float(self._dt_fn(self.cc_data.data))

    def evolve(self):
        """One SWE CTU step (a single jitted call)."""
        tm_evolve = self.tc.timer("evolve")
        tm_evolve.begin()

        U = self._step(self.cc_data.data, self.cc_data.t, self.dt)
        self.cc_data.set_vars(U)

        if self.particles is not None:
            self.particles.update_particles(self.dt)

        self.cc_data.t += self.dt
        self.n += 1
        tm_evolve.end(sync=self.cc_data.data)

    def dovis(self):
        """Runtime visualization: h, |U|, vorticity, fuel fraction."""
        from pyro2_tpu.util import plot_tools

        ivars = Variables(self.cc_data)
        myg = self.cc_data.grid
        q = cons_to_prim(self.cc_data.data, ivars, myg)

        h = q[ivars.ih]
        u = q[ivars.iu]
        v = q[ivars.iv]
        magvel = jnp.sqrt(u ** 2 + v ** 2)

        uv = ai(u, myg)
        vv = ai(v, myg)
        vort = jnp.zeros_like(h).at[
            myg.ilo:myg.ihi + 1, myg.jlo:myg.jhi + 1].set(
            0.5 * (vv.ip(1) - vv.ip(-1)) / myg.dx -
            0.5 * (uv.jp(1) - uv.jp(-1)) / myg.dy)

        fields = [("h", h), ("U", magvel), ("vorticity", vort)]
        if ivars.naux > 0:
            fields.append(("X", q[ivars.ix]))
        plot_tools.plot_fields(self, fields)
