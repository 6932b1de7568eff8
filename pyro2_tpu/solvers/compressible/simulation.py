"""Compressible Euler CTU Simulation and shared state machinery.

Re-design of /root/reference/pyro/compressible/simulation.py: the whole
evolve pipeline (clean state -> tracing -> sources -> transverse -> Riemann
-> artificial viscosity -> conservative update -> predictor-corrector
sources -> sponge) traces into ONE jitted function of (U, t, dt).

Stacks are (nvar, qx, qy); conserved order (density, x-momentum,
y-momentum, energy[, rho X...]), primitive order (rho, u, v, p[, X...]).
"""

import jax
import jax.numpy as jnp

import pyro2_tpu.mesh.boundary as bnd
import pyro2_tpu.solvers.compressible.unsplit_fluxes as flx
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.simulation_null import NullSimulation, bc_setup, grid_setup
from pyro2_tpu.solvers.compressible import BC, derives, eos, riemann
from pyro2_tpu.util import msg


class Variables:
    """Integer indices of the conserved and primitive variable layouts."""

    def __init__(self, myd):
        self.nvar = len(myd.names)

        self.idens = myd.names.index("density")
        self.ixmom = myd.names.index("x-momentum")
        self.iymom = myd.names.index("y-momentum")
        self.iener = myd.names.index("energy")

        # any additional variables are passively advected scalars
        self.naux = self.nvar - 4
        self.irhox = 4 if self.naux > 0 else -1

        self.nq = 4 + self.naux
        self.irho = 0
        self.iu = 1
        self.iv = 2
        self.ip = 3
        self.ix = 4 if self.naux > 0 else -1


def _is_tracer(x):
    return isinstance(x, jax.core.Tracer)


def cons_to_prim(U, gamma, ivars, myg):
    """Conserved stack -> primitive stack (guarding rho == 0 zones)."""
    rho = U[ivars.idens]
    nonzero = rho != 0.0
    safe_rho = jnp.where(nonzero, rho, 1.0)

    u = jnp.where(nonzero, U[ivars.ixmom] / safe_rho, 0.0)
    v = jnp.where(nonzero, U[ivars.iymom] / safe_rho, 0.0)
    e = jnp.where(nonzero,
                  (U[ivars.iener] - 0.5 * rho * (u ** 2 + v ** 2)) /
                  safe_rho, 0.0)

    # state-validity guard (reference simulation.py:71); only outside jit
    if not _is_tracer(U):
        ev = ai(e, myg).v()
        rv = ai(rho, myg).v()
        e_min = float(ev.min())
        rho_min = float(rv.min())
        assert e_min > 0.0 and rho_min > 0.0, \
            f"invalid state, min(rho) = {rho_min}, min(e) = {e_min}"

    rows = [None] * ivars.nq
    rows[ivars.irho] = rho
    rows[ivars.iu] = u
    rows[ivars.iv] = v
    rows[ivars.ip] = eos.pres(gamma, rho, e)
    for nq_i, nu_i in zip(range(ivars.ix, ivars.ix + ivars.naux),
                          range(ivars.irhox, ivars.irhox + ivars.naux)):
        rows[nq_i] = jnp.where(nonzero, U[nu_i] / safe_rho, 0.0)
    return jnp.stack(rows).astype(U.dtype)


def prim_to_cons(q, gamma, ivars, myg):
    """Primitive stack -> conserved stack."""
    rows = [None] * ivars.nvar
    rows[ivars.idens] = q[ivars.irho]
    rows[ivars.ixmom] = q[ivars.iu] * q[ivars.irho]
    rows[ivars.iymom] = q[ivars.iv] * q[ivars.irho]
    rhoe = eos.rhoe(gamma, q[ivars.ip])
    rows[ivars.iener] = rhoe + 0.5 * q[ivars.irho] * \
        (q[ivars.iu] ** 2 + q[ivars.iv] ** 2)
    for nq_i, nu_i in zip(range(ivars.ix, ivars.ix + ivars.naux),
                          range(ivars.irhox, ivars.irhox + ivars.naux)):
        rows[nu_i] = q[nq_i] * q[ivars.irho]
    return jnp.stack(rows).astype(q.dtype)


def get_external_sources(t, dt, U, ivars, rp, myg, *,
                         U_old=None, problem_source=None):
    """External sources: gravity (+ geometric terms in spherical), plus
    any problem heating (reference simulation.py:105-161)."""
    grav = rp.get_param("compressible.grav")
    coord = getattr(myg, "coord_type", 0)

    # build S as a row list + stack (not .at scatters): value-identical,
    # and lowers inside Pallas kernels (Mosaic has no scatter)
    zero = jnp.zeros_like(U[0])
    rows = [zero] * ivars.nvar

    if U_old is None:
        if coord == 1:
            # gravity is radial; geometric centrifugal/Coriolis-like terms
            x2d = jnp.asarray(myg.x2d)
            rows[ivars.ixmom] = (U[ivars.idens] * grav +
                                 U[ivars.iymom] ** 2 /
                                 (U[ivars.idens] * x2d))
            rows[ivars.iener] = U[ivars.ixmom] * grav
            rows[ivars.iymom] = (zero - U[ivars.ixmom] * U[ivars.iymom] /
                                 U[ivars.idens])
        else:
            rows[ivars.iymom] = U[ivars.idens] * grav
            rows[ivars.iener] = U[ivars.iymom] * grav
    else:
        # U ~ U^{n+1} including a full dt*S_old; time-center the energy
        # source with the corrected momentum
        if coord == 1:
            S_xmom = U[ivars.idens] * grav
            S_old_xmom = U_old[ivars.idens] * grav
            xmom_new = U[ivars.ixmom] + 0.5 * dt * (S_xmom - S_old_xmom)
            x2d = jnp.asarray(myg.x2d)
            rows[ivars.ixmom] = (S_xmom + U[ivars.iymom] ** 2 /
                                 (U[ivars.idens] * x2d))
            rows[ivars.iener] = xmom_new * grav
            rows[ivars.iymom] = (zero - U[ivars.ixmom] * U[ivars.iymom] /
                                 U[ivars.idens])
        else:
            S_ymom = U[ivars.idens] * grav
            S_old_ymom = U_old[ivars.idens] * grav
            ymom_new = U[ivars.iymom] + 0.5 * dt * (S_ymom - S_old_ymom)
            rows[ivars.iymom] = S_ymom
            rows[ivars.iener] = ymom_new * grav

    S = jnp.stack(rows)
    if problem_source:
        S = S + problem_source(myg, U, ivars, rp)
    return S


def get_sponge_factor(U, ivars, rp, myg):
    """The sponge damping rate f/tau (reference simulation.py:164-184)."""
    rho = U[ivars.idens]
    rho_begin = rp.get_param("sponge.sponge_rho_begin")
    rho_full = rp.get_param("sponge.sponge_rho_full")
    assert rho_begin > rho_full

    f = jnp.where(rho > rho_begin, 0.0,
                  jnp.where(rho < rho_full, 1.0,
                            0.5 * (1.0 - jnp.cos(jnp.pi * (rho - rho_begin) /
                                                 (rho_full - rho_begin)))))
    tau = rp.get_param("sponge.sponge_timescale")
    return f / tau


class DomainEdges:
    """Domain-edge flags (1 = this grid edge IS the physical domain
    boundary).  Static 1s for a serial run; the sharded path swaps in
    axis_index-gated traced flags (parallel/sharded.py) so avisc window
    masking follows the GLOBAL domain under block partitioning."""

    def __init__(self):
        self.xl = 1
        self.xr = 1
        self.yl = 1
        self.yr = 1


class Simulation(NullSimulation):
    """The CTU compressible hydrodynamics solver."""

    def initialize(self, *, extra_vars=None, ng=4):
        """Grid (ng=4), the 4 conserved vars (+extras), aux source-term
        container, custom BCs, ICs, jitted step."""
        my_grid = grid_setup(self.rp, ng=ng)
        my_data = self.data_class(my_grid)

        try:
            riemann_method = self.rp.get_param("compressible.riemann")
        except KeyError:
            msg.warning("ERROR: Riemann Solver is not set.")
        if getattr(my_grid, "coord_type", 0) == 1 and \
                riemann_method == "HLLC":
            msg.fail("ERROR: HLLC Riemann Solver is not supported "
                     "with SphericalPolar Geometry")

        bnd.define_bc("hse", BC.user, is_solid=False)
        bnd.define_bc("ambient", BC.user, is_solid=False)
        bnd.define_bc("ramp", BC.user, is_solid=False)

        bc, bc_xodd, bc_yodd = bc_setup(self.rp)
        self.solid = bnd.bc_is_solid(bc)
        self.domain_edges = DomainEdges()

        my_data.register_var("density", bc)
        my_data.register_var("energy", bc)
        my_data.register_var("x-momentum", bc_xodd)
        my_data.register_var("y-momentum", bc_yodd)
        if extra_vars is not None:
            for v in extra_vars:
                my_data.register_var(v, bc)

        my_data.set_aux("gamma", self.rp.get_param("eos.gamma"))
        my_data.set_aux("grav", self.rp.get_param("compressible.grav"))

        my_data.create()
        self.cc_data = my_data

        if self.rp.get_param("particles.do_particles") == 1:
            from pyro2_tpu.particles import particles
            self.particles = particles.Particles(self.cc_data, bc, self.rp)

        # source terms needing their own ghost fill
        aux_data = self.data_class(my_grid)
        aux_data.register_var("dens_src", bc)
        aux_data.register_var("xmom_src", bc_xodd)
        aux_data.register_var("ymom_src", bc_yodd)
        aux_data.register_var("E_src", bc)
        aux_data.create()
        aux_data.aux = my_data.aux
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
        # Pallas CTU kernel transparently (~3-5x over the jnp step; the
        # jnp step stays the reference implementation and the fallback).
        # Only for the CTU solver itself: subclasses (rk/fv4/sdc) drive
        # their own stage loops and override _make_step
        if (jax.default_backend() == "tpu" and
                type(self)._make_step is Simulation._make_step):
            from pyro2_tpu.solvers.compressible.pallas_step import \
                IneligibleStep
            try:
                self._step = self._make_fused_step()
            except IneligibleStep as e:
                # expected: this configuration is simply outside the
                # kernel's coverage -- the jnp step is the designed path
                if self.verbose > 0:
                    print(f"fused CTU kernel ineligible ({e}); "
                          "using the jnp step")
            except Exception as e:
                # unexpected (a Mosaic/compile regression, not a config
                # gate): fall back so production keeps running, but always
                # say so -- a silent 3-5x slowdown would mask the bug
                print(f"WARNING: fused CTU kernel build failed "
                      f"({type(e).__name__}: {e}); using the jnp step")

    def _make_fused_step(self):
        """An evolve-contract step(U, t, dt) backed by the fused Pallas
        row-band kernel: identical interior to the jnp step (bitwise,
        tests/test_pallas_tpu.py), ghost zones carried through unchanged
        (the jnp step's stale-ghost semantics, which particle advection
        relies on)."""
        from pyro2_tpu.solvers.compressible.pallas_step import \
            make_pallas_ctu_step_padded_general
        to_p, from_p, _fill_p, step_p = \
            make_pallas_ctu_step_padded_general(self)
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

    # -- jitted kernels -----------------------------------------------------
    def _make_dt(self):
        myg = self.cc_data.grid
        gamma = self.rp.get_param("eos.gamma")
        ivars = self.ivars

        def dt_fn(U):
            q = cons_to_prim(U, gamma, ivars, myg)
            u = q[ivars.iu]
            v = q[ivars.iv]
            cs = jnp.sqrt(gamma * q[ivars.ip] / q[ivars.irho])
            Lx = jnp.asarray(myg.Lx)
            Ly = jnp.asarray(myg.Ly)
            xtmp = ai(Lx / (jnp.abs(u) + cs), myg).v()
            ytmp = ai(Ly / (jnp.abs(v) + cs), myg).v()
            return jnp.minimum(xtmp.min(), ytmp.min())

        return dt_fn

    def _make_step(self):
        myg = self.cc_data.grid
        rp = self.rp
        ivars = self.ivars
        gamma = rp.get_param("eos.gamma")
        solid = self.solid
        edges = self.domain_edges
        tc = self.tc
        problem_source = self.problem_source
        small_dens = rp.get_param("compressible.small_dens")
        do_sponge = rp.get_param("sponge.do_sponge")
        coord = getattr(myg, "coord_type", 0)
        my_data = self.cc_data
        my_aux = self.aux_data

        iv_sl = (slice(myg.ilo, myg.ihi + 1), slice(myg.jlo, myg.jhi + 1))

        def step(U, t, dt):
            # density floor (clean_state).  The reference sentinel default
            # (-1e200) exceeds f32 range; clamp to the state dtype's finfo
            # min so the cast is exact (same semantics, no overflow warn).
            floor = max(small_dens, float(jnp.finfo(U.dtype).min))
            U = U.at[(ivars.idens,) + iv_sl].set(
                jnp.maximum(U[(ivars.idens,) + iv_sl], floor))

            U_xl, U_xr, U_yl, U_yr = flx.interface_states(
                U, my_data, rp, ivars, tc, dt)

            U_xl, U_xr, U_yl, U_yr = flx.apply_source_terms(
                U_xl, U_xr, U_yl, U_yr, U, t, my_data, my_aux, rp, ivars,
                tc, dt, problem_source=problem_source)

            U_xl, U_xr, U_yl, U_yr = flx.apply_transverse_flux(
                U_xl, U_xr, U_yl, U_yr, my_data, rp, ivars, solid, tc, dt)

            if coord == 1:
                F_x, U_x = riemann.riemann_flux(
                    1, U_xl, U_xr, my_data, rp, ivars,
                    solid.xl, solid.xr, tc, return_cons=True)
                F_y, U_y = riemann.riemann_flux(
                    2, U_yl, U_yr, my_data, rp, ivars,
                    solid.yl, solid.yr, tc, return_cons=True)
                qx = cons_to_prim(U_x, gamma, ivars, myg)
                qy = cons_to_prim(U_y, gamma, ivars, myg)
            else:
                F_x = riemann.riemann_flux(1, U_xl, U_xr, my_data, rp,
                                           ivars, solid.xl, solid.xr, tc)
                F_y = riemann.riemann_flux(2, U_yl, U_yr, my_data, rp,
                                           ivars, solid.yl, solid.yr, tc)

            q = cons_to_prim(U, gamma, ivars, myg)
            F_x, F_y = flx.apply_artificial_viscosity(
                F_x, F_y, q, U, my_data, rp, ivars,
                edges=(edges.xl, edges.xr, edges.yl, edges.yr))

            U_old = U

            # conservative area/volume-weighted update
            if coord == 0:
                # uniform Cartesian geometry: scalar stand-ins (bitwise
                # identical, avoids constant arrays in the traced graph)
                from pyro2_tpu.mesh.indexer import aic
                dtdV = dt / jnp.asarray(myg.dx * myg.dy)
                Ax = aic(myg.dy)
                Ay = aic(myg.dx)
            else:
                # geometry planes cast to the state dtype so the scatter
                # below stays same-dtype (f64 planes into an f32 state
                # would trip JAX's unsafe-scatter FutureWarning)
                dtdV = dt / ai(jnp.asarray(myg.V, U.dtype), myg).v()
                Ax = ai(jnp.asarray(myg.Ax, U.dtype), myg)
                Ay = ai(jnp.asarray(myg.Ay, U.dtype), myg)
            Fx = ai(F_x, myg)
            Fy = ai(F_y, myg)
            upd = dtdV[None] * (
                Fx.v() * Ax.v()[None] - Fx.ip(1) * Ax.ip(1)[None] +
                Fy.v() * Ay.v()[None] - Fy.jp(1) * Ay.jp(1)[None])
            # spherical fluxes carry f64 from the geometry planes in the
            # transverse stage; the scatter-add would cast anyway -- make
            # it explicit to keep the FutureWarning out of f32 runs
            U = U.at[(slice(None),) + iv_sl].add(upd.astype(U.dtype))

            if coord == 1:
                # non-conservative pressure gradients (momenta)
                Lx = ai(jnp.asarray(myg.Lx, U.dtype), myg)
                Ly = ai(jnp.asarray(myg.Ly, U.dtype), myg)
                qxp = ai(qx[ivars.ip], myg)
                qyp = ai(qy[ivars.ip], myg)
                U = U.at[(ivars.ixmom,) + iv_sl].add(
                    (-dt * (qxp.ip(1) - qxp.v()) / Lx.v()).astype(U.dtype))
                U = U.at[(ivars.iymom,) + iv_sl].add(
                    (-dt * (qyp.jp(1) - qyp.v()) / Ly.v()).astype(U.dtype))

            # predictor-corrector external sources
            S_old = get_external_sources(t, dt, U_old, ivars, rp, myg,
                                         problem_source=problem_source)
            U = U.at[(slice(None),) + iv_sl].add(
                (dt * S_old[(slice(None),) + iv_sl]).astype(U.dtype))

            S_new = get_external_sources(t, dt, U, ivars, rp, myg,
                                         U_old=U_old,
                                         problem_source=problem_source)
            U = U.at[(slice(None),) + iv_sl].add(
                (0.5 * dt *
                 (S_new - S_old)[(slice(None),) + iv_sl]).astype(U.dtype))

            # implicit sponge damping of the velocity
            if do_sponge:
                kappa_f = get_sponge_factor(U, ivars, rp, myg)
                U_pre = U
                damp = 1.0 + dt * kappa_f
                U = U.at[ivars.ixmom].set(U[ivars.ixmom] / damp)
                U = U.at[ivars.iymom].set(U[ivars.iymom] / damp)
                dke = 0.5 * ((U[ivars.ixmom] ** 2 + U[ivars.iymom] ** 2) -
                             (U_pre[ivars.ixmom] ** 2 +
                              U_pre[ivars.iymom] ** 2)) / U[ivars.idens]
                U = U.at[ivars.iener].add(dke)

            return U

        return step

    # -- host-side driver hooks --------------------------------------------
    def method_compute_timestep(self):
        """CFL: dt = cfl * min(Lx/(|u|+cs), Ly/(|v|+cs))."""
        cfl = self.rp.get_param("driver.cfl")
        self.dt = cfl * float(self._dt_fn(self.cc_data.data))

    def evolve(self):
        """One CTU step (a single jitted call)."""
        tm_evolve = self.tc.timer("evolve")
        tm_evolve.begin()

        U = self._step(self.cc_data.data, self.cc_data.t, self.dt)
        self.cc_data.set_vars(U)

        if self.particles is not None:
            self.particles.update_particles(self.dt)

        self.cc_data.t += self.dt
        self.n += 1
        tm_evolve.end(sync=self.cc_data.data)

    def clean_state(self, U):
        """Enforce the density floor on a stack (API parity helper)."""
        small_dens = self.rp.get_param("compressible.small_dens")
        g = self.cc_data.grid
        sl = (self.ivars.idens, slice(g.ilo, g.ihi + 1),
              slice(g.jlo, g.jhi + 1))
        floor = max(small_dens, float(jnp.finfo(U.dtype).min))
        return U.at[sl].set(jnp.maximum(U[sl], floor))

    def dovis(self):
        """Runtime visualization: rho, |U|, p, e."""
        import matplotlib.pyplot as plt
        import numpy as np

        from pyro2_tpu.util import plot_tools

        ivars = Variables(self.cc_data)
        gamma = self.cc_data.get_aux("gamma")
        myg = self.cc_data.grid
        q = cons_to_prim(self.cc_data.data, gamma, ivars, myg)

        rho = q[ivars.irho]
        u = q[ivars.iu]
        v = q[ivars.iv]
        p = q[ivars.ip]
        e = eos.rhoe(gamma, p) / rho
        magvel = jnp.sqrt(u ** 2 + v ** 2)

        fields = [(r"$\rho$", rho), ("U", magvel), ("p", p), ("e", e)]

        if getattr(myg, "coord_type", 0) == 1:
            # project the r-theta grid to x-z for plotting
            plt.clf()
            x = np.asarray(myg.x2d) * np.sin(np.asarray(myg.y2d))
            y = np.asarray(myg.x2d) * np.cos(np.asarray(myg.y2d))
            _, axes, cbar_title = plot_tools.setup_axes(myg, len(fields))
            for n, (name, f) in enumerate(fields):
                ax = axes[n]
                fv = np.asarray(ai(f, myg).v())
                xv = x[myg.ilo:myg.ihi + 1, myg.jlo:myg.jhi + 1]
                yv = y[myg.ilo:myg.ihi + 1, myg.jlo:myg.jhi + 1]
                img = ax.pcolormesh(xv, yv, fv, shading="nearest",
                                    cmap=self.cm)
                axes.cbar_axes[n].colorbar(img)
                ax.set_title(name)
            plt.figtext(0.05, 0.0125, f"t = {self.cc_data.t:10.5g}")
            plt.pause(0.001)
            plt.draw()
        else:
            plot_tools.plot_fields(self, fields)

    def write_extras(self, f):
        """Record the custom-BC names (restart support)."""
        gb = f.create_group("BC")
        gb.create_dataset("hse", data=False)
        gb.create_dataset("ambient", data=False)
