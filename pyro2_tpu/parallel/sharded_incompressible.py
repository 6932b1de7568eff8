"""SPMD incompressible solver over a block-partitioned device mesh.

The distributed twin of solvers/incompressible (reference:
pyro/incompressible/simulation.py:159-404): one jitted shard_map program
per step runs the hyperbolic stages (limited slopes, MAC velocities,
interface states, advective update) on each device's halo-padded block and
the THREE elliptic solves (MAC projection, final projection, plus the
preevolve initial projection) INLINE via ShardedMG.solve_local -- psum'd
norms, all_gather'ed coarse levels, no global state anywhere:

* ICs are evaluated block-by-block on bitwise-global block grids
  (parallel/blocks.py), so no device ever holds the global grid;
* dt is the serial CFL rule computed from block maxima reduced with
  lax.pmax (bitwise equal to the global max);
* the step returns the (6, bx, by) block interiors; ghost content is
  re-derived by halo exchange at the next step exactly like the serial
  driver's fill_BC_all.

Partition-invariant vs the serial solver to FP roundoff (the MG
convergence norms reduce with psum, which may reassociate the serial sum;
everything else is bitwise).
"""

import importlib

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pyro2_tpu.mesh import reconstruction
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.parallel.blocks import blockwise_init_interior
from pyro2_tpu.parallel.mesh_comm import halo_exchange
from pyro2_tpu.parallel.sharded_mg import (_SUPPORTED_BCS, ShardedMG,
                                            make_sharded_mg)
from pyro2_tpu.solvers.incompressible import incomp_interface

__all__ = ["ShardedIncompressible", "ShardedIncompressibleViscous"]

_POISSON = {"alpha": 0.0, "beta": -1.0}


def _psum2(x):
    return jax.lax.psum(jax.lax.psum(x, "x"), "y")


def _pmax2(x):
    return jax.lax.pmax(jax.lax.pmax(x, "x"), "y")


class ShardedIncompressible:
    """Block-partitioned approximate-projection incompressible flow.

    Holds the (6, nx, ny) global interior (x-velocity, y-velocity,
    phi-MAC, phi, gradp_x, gradp_y) sharded P(None, "x", "y").

    Subclass hooks mirror the serial Simulation's (incompressible/
    simulation.py other_source_term / do_other_update_velocity):
    `_viscous_sources` and `_update_velocity`.
    """

    SMALL = 1.e-12
    _SOLVER = "incompressible"

    def _make_local_sim(self, problem, local_rp):
        from pyro2_tpu.solvers import incompressible
        return incompressible.Simulation(
            "incompressible", problem, lambda d, r: None, local_rp)

    def __init__(self, rp, mesh, *, problem="shear"):
        from pyro2_tpu.util.runparams import RuntimeParameters

        self.rp = rp
        self.mesh = mesh
        self.px = int(mesh.devices.shape[0])
        self.py = int(mesh.devices.shape[1])
        nx = rp.get_param("mesh.nx")
        ny = rp.get_param("mesh.ny")
        if nx % self.px != 0 or ny % self.py != 0:
            raise ValueError("grid must divide evenly over the device mesh")
        self.nx, self.ny = nx, ny
        bx, by = nx // self.px, ny // self.py

        # block-sized contract Simulation: supplies the variable/BC/grid
        # contract (its problem init is a no-op; real ICs are per-block)
        local_rp = RuntimeParameters()
        local_rp.params = dict(rp.params)
        local_rp.param_comments = dict(rp.param_comments)
        local_rp.set_param("mesh.nx", bx)
        local_rp.set_param("mesh.ny", by)
        xmin = rp.get_param("mesh.xmin")
        xmax = rp.get_param("mesh.xmax")
        ymin = rp.get_param("mesh.ymin")
        ymax = rp.get_param("mesh.ymax")
        local_rp.set_param("mesh.xmax",
                           xmin + (xmax - xmin) * bx / nx)
        local_rp.set_param("mesh.ymax",
                           ymin + (ymax - ymin) * by / ny)
        self.local_sim = self._make_local_sim(problem, local_rp)
        self.local_sim.initialize()

        cc = self.local_sim.cc_data
        self.names = list(cc.names)
        self.bcs = [cc.BCs[n] for n in self.names]
        for bc in self.bcs:
            for edge in (bc.xlb, bc.xrb, bc.ylb, bc.yrb):
                if edge not in _SUPPORTED_BCS:
                    raise ValueError(
                        f"BC '{edge}' is not supported by the sharded "
                        "incompressible path")
        self.lg4 = cc.grid                      # ng=4 block grid
        self.iu = self.names.index("x-velocity")
        self.iv = self.names.index("y-velocity")
        self.ipm = self.names.index("phi-MAC")
        self.iph = self.names.index("phi")
        self.igx = self.names.index("gradp_x")
        self.igy = self.names.index("gradp_y")

        phi_bc = cc.BCs["phi"]
        self.smg = make_sharded_mg(
            nx, ny, mesh, xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
            xl_BC_type=phi_bc.xlb, xr_BC_type=phi_bc.xrb,
            yl_BC_type=phi_bc.ylb, yr_BC_type=phi_bc.yrb)
        # the initial projection always uses periodic phi BCs (reference
        # incompressible/simulation.py:91-100)
        self.smg_init = make_sharded_mg(
            nx, ny, mesh, xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
            xl_BC_type="periodic", xr_BC_type="periodic",
            yl_BC_type="periodic", yr_BC_type="periodic")
        self.lg1 = self.smg.local_grids[self.smg.nlevels - 1]

        # block-by-block ICs (never materializes the global padded state)
        problem_mod = importlib.import_module(
            f"pyro2_tpu.solvers.{self._SOLVER}.problems.{problem}")
        for k, v in getattr(problem_mod, "PROBLEM_PARAMS", {}).items():
            if k not in rp.params:
                rp.set_param(k, v, no_new=False)
        self.U_int = blockwise_init_interior(cc, problem_mod.init_data,
                                             rp, mesh)

        self.limiter = rp.get_param("incompressible.limiter")
        self.proj_type = rp.get_param("incompressible.proj_type")
        self.cfl = rp.get_param("driver.cfl")

        self._step = self._build_step()
        self._dt_fn = self._build_dt()
        self._preproj = self._build_preproj()

        self.t = 0.0
        self.n = 0
        self.dt = None

    # ------------------------------------------------------------------
    # shard_map building blocks
    # ------------------------------------------------------------------
    def _fill(self, U):
        """Halo-exchange every variable of the local padded stack (the
        SPMD twin of the driver's fill_BC_all)."""
        return jnp.stack([
            halo_exchange(U[i], self.lg4, self.bcs[i], self.px, self.py)
            for i in range(len(self.names))])

    def _pad(self, U_int):
        ng = self.lg4.ng
        return jnp.pad(U_int, ((0, 0), (ng, ng), (ng, ng)))

    def _solve_poisson(self, smg, v0_blk, f_blk, rtol):
        """Inline sharded Poisson solve (L phi = f); f_blk/(v0_blk) are
        (bx+2, by+2) MG-padded local blocks."""
        g = smg.soln_grid
        f_int = f_blk[1:-1, 1:-1]
        sn = jnp.sqrt(g.dx * g.dy * _psum2(jnp.sum(f_int ** 2)))
        v, r, res, rel, ncyc = smg.solve_local(
            v0_blk, f_blk, _POISSON, {}, rtol, sn)
        return v

    # subclass hooks (serial twins: other_source_term /
    # do_other_update_velocity) -- called INSIDE the shard_map body
    def _viscous_sources(self, u, v):
        return None, None

    def _update_velocity(self, u, v, advect_x_v, advect_y_v,
                         gradp_x, gradp_y, dt, sl):
        """The provisional velocity update (base: advective +
        optional lagged-gradp subtraction)."""
        u = u.at[sl].add(-dt * advect_x_v)
        v = v.at[sl].add(-dt * advect_y_v)
        if self.proj_type == 1:
            u = u - dt * gradp_x
            v = v - dt * gradp_y
        return u, v

    def _build_step(self):
        lg4 = self.lg4
        lg1 = self.lg1
        ng = lg4.ng
        dx, dy = lg4.dx, lg4.dy
        limiter = self.limiter
        proj_type = self.proj_type
        iu, iv = self.iu, self.iv
        igx, igy = self.igx, self.igy
        iph = self.iph
        ipm = self.ipm
        sl = (slice(lg4.ilo, lg4.ihi + 1), slice(lg4.jlo, lg4.jhi + 1))

        def body(U_int, dt):
            U = self._fill(self._pad(U_int))
            u, v = U[iu], U[iv]
            gradp_x, gradp_y = U[igx], U[igy]
            phi = U[iph]

            ldelta_ux = reconstruction.limit(u, lg4, 1, limiter)
            ldelta_vx = reconstruction.limit(v, lg4, 1, limiter)
            ldelta_uy = reconstruction.limit(u, lg4, 2, limiter)
            ldelta_vy = reconstruction.limit(v, lg4, 2, limiter)

            source_x, source_y = self._viscous_sources(u, v)
            u_MAC, v_MAC = incomp_interface.mac_vels(
                lg4, dt, u, v, ldelta_ux, ldelta_vx, ldelta_uy, ldelta_vy,
                gradp_x, gradp_y, source_x, source_y)

            # --- MAC projection (edge-centered divergence RHS) ----------
            um = ai(u_MAC, lg4)
            vm = ai(v_MAC, lg4)
            div_v = ((um.ip(1) - um.v()) / dx + (vm.jp(1) - vm.v()) / dy)
            f_blk = jnp.pad(div_v, 1)
            phiM = self._solve_poisson(self.smg, 0.0 * f_blk, f_blk, 1.e-12)

            # subtract the edge-centered gradient on all domain edges
            # (the serial index math, on the local block)
            pm4 = ai(jnp.pad(phiM, ng - 1), lg4)
            u_MAC = u_MAC.at[lg4.ilo:lg4.ihi + 2,
                             lg4.jlo:lg4.jhi + 1].add(
                -(pm4.v(buf=(0, 1, 0, 0)) -
                  pm4.ip(-1, buf=(0, 1, 0, 0))) / dx)
            v_MAC = v_MAC.at[lg4.ilo:lg4.ihi + 1,
                             lg4.jlo:lg4.jhi + 2].add(
                -(pm4.v(buf=(0, 0, 0, 1)) -
                  pm4.jp(-1, buf=(0, 0, 0, 1))) / dy)

            # --- full interface states + provisional update -------------
            u_xint, v_xint, u_yint, v_yint = incomp_interface.states(
                lg4, dt, u, v, ldelta_ux, ldelta_vx, ldelta_uy, ldelta_vy,
                gradp_x, gradp_y, u_MAC, v_MAC, source_x, source_y)

            um = ai(u_MAC, lg4)
            vm = ai(v_MAC, lg4)
            uxi = ai(u_xint, lg4)
            vxi = ai(v_xint, lg4)
            uyi = ai(u_yint, lg4)
            vyi = ai(v_yint, lg4)

            advect_x_v = (0.5 * (um.v() + um.ip(1)) *
                          (uxi.ip(1) - uxi.v()) / dx +
                          0.5 * (vm.v() + vm.jp(1)) *
                          (uyi.jp(1) - uyi.v()) / dy)
            advect_y_v = (0.5 * (um.v() + um.ip(1)) *
                          (vxi.ip(1) - vxi.v()) / dx +
                          0.5 * (vm.v() + vm.jp(1)) *
                          (vyi.jp(1) - vyi.v()) / dy)

            u, v = self._update_velocity(u, v, advect_x_v, advect_y_v,
                                         gradp_x, gradp_y, dt, sl)

            u = halo_exchange(u, lg4, self.bcs[iu], self.px, self.py)
            v = halo_exchange(v, lg4, self.bcs[iv], self.px, self.py)

            # --- final projection (cell-centered divergence / dt) -------
            uv = ai(u, lg4)
            vv = ai(v, lg4)
            div2 = (0.5 * (uv.ip(1) - uv.ip(-1)) / dx +
                    0.5 * (vv.jp(1) - vv.jp(-1)) / dy) / dt
            f2 = jnp.pad(div2, 1)
            v0 = phi[ng - 1:-(ng - 1), ng - 1:-(ng - 1)]
            phiN = self._solve_poisson(self.smg, v0, f2, 1.e-12)

            pv = ai(phiN, lg1)
            gphi_x = 0.5 * (pv.ip(1) - pv.ip(-1)) / dx
            gphi_y = 0.5 * (pv.jp(1) - pv.jp(-1)) / dy

            u = u.at[sl].add(-dt * gphi_x)
            v = v.at[sl].add(-dt * gphi_y)

            if proj_type == 1:
                gradp_x = gradp_x.at[sl].add(gphi_x)
                gradp_y = gradp_y.at[sl].add(gphi_y)
            else:
                gradp_x = jnp.zeros_like(gradp_x).at[sl].set(gphi_x)
                gradp_y = jnp.zeros_like(gradp_y).at[sl].set(gphi_y)

            U = U.at[iu].set(u).at[iv].set(v)
            U = U.at[ipm].set(jnp.pad(phiM, ng - 1))
            U = U.at[iph].set(jnp.pad(phiN, ng - 1))
            U = U.at[igx].set(gradp_x).at[igy].set(gradp_y)
            return U[:, ng:-ng, ng:-ng]

        spec = P(None, "x", "y")
        body = jax.shard_map(body, mesh=self.mesh,
                             in_specs=(spec, P()), out_specs=spec)
        return jax.jit(body)

    def _build_dt(self):
        lg4 = self.lg4
        iu, iv = self.iu, self.iv
        cfl = self.cfl
        small = self.SMALL
        dx, dy = lg4.dx, lg4.dy

        def body(U_int):
            U = self._fill(self._pad(U_int))
            # serial rule (burgers method_compute_timestep): max over the
            # FULL padded array; block maxima + pmax reproduce it bitwise
            umax = _pmax2(jnp.max(jnp.abs(U[iu])))
            vmax = _pmax2(jnp.max(jnp.abs(U[iv])))
            xtmp = dx / jnp.maximum(umax, small)
            ytmp = dy / jnp.maximum(vmax, small)
            return cfl * jnp.minimum(xtmp, ytmp)

        spec = P(None, "x", "y")
        body = jax.shard_map(body, mesh=self.mesh,
                             in_specs=spec, out_specs=P())
        return jax.jit(body)

    def _build_preproj(self):
        """The preevolve initial projection: make the velocity field
        divergence-free (periodic phi BCs, reference simulation.py:91-118)."""
        lg4 = self.lg4
        lg1 = self.lg1
        ng = lg4.ng
        dx, dy = lg4.dx, lg4.dy
        iu, iv, iph = self.iu, self.iv, self.iph
        sl = (slice(lg4.ilo, lg4.ihi + 1), slice(lg4.jlo, lg4.jhi + 1))

        def body(U_int):
            U = self._fill(self._pad(U_int))
            u, v = U[iu], U[iv]
            uv = ai(u, lg4)
            vv = ai(v, lg4)
            div_v = (0.5 * (uv.ip(1) - uv.ip(-1)) / dx +
                     0.5 * (vv.jp(1) - vv.jp(-1)) / dy)
            f_blk = jnp.pad(div_v, 1)
            phi0 = self._solve_poisson(self.smg_init, 0.0 * f_blk, f_blk,
                                       1.e-10)
            pv = ai(phi0, lg1)
            gx = 0.5 * (pv.ip(1) - pv.ip(-1)) / dx
            gy = 0.5 * (pv.jp(1) - pv.jp(-1)) / dy
            u = u.at[sl].add(-gx)
            v = v.at[sl].add(-gy)
            U = U.at[iu].set(u).at[iv].set(v)
            U = U.at[iph].set(jnp.pad(phi0, ng - 1))
            return U[:, ng:-ng, ng:-ng]

        spec = P(None, "x", "y")
        body = jax.shard_map(body, mesh=self.mesh,
                             in_specs=spec, out_specs=spec)
        return jax.jit(body)

    # ------------------------------------------------------------------
    # host-side driver (mirrors the serial Simulation contract)
    # ------------------------------------------------------------------
    def method_compute_timestep(self):
        self.dt = float(self._dt_fn(self.U_int))

    def preevolve(self):
        """Initial projection + one throwaway evolve to get gradp at
        n-1/2 (reference incompressible/simulation.py:67-157)."""
        self.U_int = self._preproj(self.U_int)
        U_orig = self.U_int
        self.method_compute_timestep()
        U_evolved = self._step(self.U_int, jnp.asarray(self.dt))
        # keep only the lagged pressure gradient from the throwaway step
        self.U_int = U_orig.at[self.igx].set(U_evolved[self.igx]) \
                           .at[self.igy].set(U_evolved[self.igy])

    def evolve(self):
        self.U_int = self._step(self.U_int, jnp.asarray(self.dt))
        self.t += self.dt
        self.n += 1

    def get_var(self, name):
        """The (nx, ny) global interior of one variable (sharded)."""
        return self.U_int[self.names.index(name)]


class ShardedIncompressibleViscous(ShardedIncompressible):
    """Block-partitioned VISCOUS incompressible flow: the projection
    method with viscous sources and the two Crank-Nicolson parabolic
    velocity solves run INLINE through ShardedMG (the distributed twin
    of incompressible_viscous/simulation.py:24-106).

    Standard velocity BCs only (the cavity problem's moving_lid
    extended BC stays on the serial path)."""

    _SOLVER = "incompressible_viscous"

    def _make_local_sim(self, problem, local_rp):
        from pyro2_tpu.solvers import incompressible_viscous
        return incompressible_viscous.Simulation(
            "incompressible_viscous", problem, lambda d, r: None,
            local_rp)

    def __init__(self, rp, mesh, *, problem="shear"):
        super().__init__(rp, mesh, problem=problem)
        self.nu = rp.get_param("incompressible_viscous.viscosity")
        # one C-N Helmholtz solver per velocity component's BC config
        # (alpha/beta arrive traced at solve time: beta = nu dt / 2)
        bcu = self.bcs[self.iu]
        bcv = self.bcs[self.iv]
        xmin = rp.get_param("mesh.xmin")
        xmax = rp.get_param("mesh.xmax")
        ymin = rp.get_param("mesh.ymin")
        ymax = rp.get_param("mesh.ymax")
        self.smg_u = make_sharded_mg(
            self.nx, self.ny, self.mesh, xmin=xmin, xmax=xmax,
            ymin=ymin, ymax=ymax, alpha=1.0, beta=1.0,
            xl_BC_type=bcu.xlb, xr_BC_type=bcu.xrb,
            yl_BC_type=bcu.ylb, yr_BC_type=bcu.yrb)
        self.smg_v = make_sharded_mg(
            self.nx, self.ny, self.mesh, xmin=xmin, xmax=xmax,
            ymin=ymin, ymax=ymax, alpha=1.0, beta=1.0,
            xl_BC_type=bcv.xlb, xr_BC_type=bcv.xrb,
            yl_BC_type=bcv.ylb, yr_BC_type=bcv.yrb)
        # hooks close over smg_u/smg_v: rebuild the jitted programs
        self._step = self._build_step()
        self._dt_fn = self._build_dt()
        self._preproj = self._build_preproj()

    def _global_interior_mask(self, shape_2d, buf):
        """1 where a buf-window cell is GLOBAL-interior (serial viscous
        sources are zero outside the global interior,
        incompressible_viscous/simulation.py:35-37)."""
        lg4 = self.lg4
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        ri = jax.lax.broadcasted_iota(jnp.int32, shape_2d, 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, shape_2d, 1)
        gi = ri - buf + ix * lg4.nx
        gj = ci - buf + iy * lg4.ny
        return ((gi >= 0) & (gi < self.nx) &
                (gj >= 0) & (gj < self.ny))

    def _viscous_sources(self, u, v):
        """nu * lap(U), nonzero exactly on the global interior: at block
        seams the buf=2 reads of the serial source see interior values,
        at global domain edges they see zeros."""
        lg4 = self.lg4
        nu = self.nu
        b = 2
        lap_u = ai(u, lg4).lap(buf=b)
        lap_v = ai(v, lg4).lap(buf=b)
        m = self._global_interior_mask(lap_u.shape, b)
        sl = (slice(lg4.ilo - b, lg4.ihi + 1 + b),
              slice(lg4.jlo - b, lg4.jhi + 1 + b))
        source_x = jnp.zeros_like(u).at[sl].set(
            jnp.where(m, nu * lap_u, 0.0))
        source_y = jnp.zeros_like(v).at[sl].set(
            jnp.where(m, nu * lap_v, 0.0))
        return source_x, source_y

    def _update_velocity(self, u, v, advect_x_v, advect_y_v,
                         gradp_x, gradp_y, dt, sl):
        """Two decoupled C-N parabolic solves (serial
        do_other_update_velocity), inline through ShardedMG."""
        lg4 = self.lg4
        nu = self.nu
        g1 = self.smg_u.soln_grid

        def solve(smg, w, advect_w, gradp_w):
            f_v = ai(w, lg4).v() + 0.5 * dt * nu * ai(w, lg4).lap()
            if self.proj_type == 1:
                f_v = f_v - dt * (advect_w + ai(gradp_w, lg4).v())
            else:
                f_v = f_v - dt * advect_w
            f_blk = jnp.pad(f_v, 1)
            ng = lg4.ng
            guess = w[ng - 1:-(ng - 1), ng - 1:-(ng - 1)]
            f_int = f_blk[1:-1, 1:-1]
            sn = jnp.sqrt(g1.dx * g1.dy * _psum2(jnp.sum(f_int ** 2)))
            params = {"alpha": jnp.asarray(1.0, w.dtype),
                      "beta": (0.5 * dt * nu).astype(w.dtype)}
            sol, r, res, rel, ncyc = smg.solve_local(
                guess, f_blk, params, {}, 1.e-12, sn)
            return w.at[sl].set(sol[1:-1, 1:-1])

        u = solve(self.smg_u, u, advect_x_v, gradp_x)
        v = solve(self.smg_v, v, advect_y_v, gradp_y)
        return u, v
