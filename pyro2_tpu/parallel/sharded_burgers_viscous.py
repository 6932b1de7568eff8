"""SPMD viscous-Burgers solver over a block-partitioned device mesh.

The distributed twin of solvers/burgers_viscous (reference
pyro/burgers_viscous/simulation.py): the CTU advective stage
(diffusion-corrected interface states, transverse corrections, unsplit
fluxes) runs on each device's halo-padded block, and the two
Crank-Nicolson Helmholtz solves (one per velocity component,
(1 - dt/2 eps L) w = w + dt/2 eps L w - dt A) run INLINE through
ShardedMG.solve_local with traced alpha/beta -- one jitted shard_map
program per step, partition-invariant vs the serial solver to FP
roundoff (psum'd convergence norms).
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
from pyro2_tpu.solvers.burgers import burgers_interface
from pyro2_tpu.solvers.burgers_viscous import interface

__all__ = ["ShardedBurgersViscous"]


def _psum2(x):
    return jax.lax.psum(jax.lax.psum(x, "x"), "y")


def _pmax2(x):
    return jax.lax.pmax(jax.lax.pmax(x, "x"), "y")


class ShardedBurgersViscous:
    """Block-partitioned viscous Burgers flow: (2, nx, ny) interior
    (x-velocity, y-velocity) sharded P(None, "x", "y")."""

    SMALL = 1.e-12

    def __init__(self, rp, mesh, *, problem="test"):
        from pyro2_tpu.solvers import burgers_viscous
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

        local_rp = RuntimeParameters()
        local_rp.params = dict(rp.params)
        local_rp.param_comments = dict(rp.param_comments)
        local_rp.set_param("mesh.nx", bx)
        local_rp.set_param("mesh.ny", by)
        xmin = rp.get_param("mesh.xmin")
        xmax = rp.get_param("mesh.xmax")
        ymin = rp.get_param("mesh.ymin")
        ymax = rp.get_param("mesh.ymax")
        local_rp.set_param("mesh.xmax", xmin + (xmax - xmin) * bx / nx)
        local_rp.set_param("mesh.ymax", ymin + (ymax - ymin) * by / ny)
        self.local_sim = burgers_viscous.Simulation(
            "burgers_viscous", problem, lambda d, r: None, local_rp)
        self.local_sim.initialize()
        cc = self.local_sim.cc_data
        self.names = list(cc.names)
        self.bcs = [cc.BCs[n] for n in self.names]
        for bc in self.bcs:
            for e in (bc.xlb, bc.xrb, bc.ylb, bc.yrb):
                if e not in _SUPPORTED_BCS:
                    raise ValueError(
                        f"BC '{e}' not supported by the sharded "
                        "burgers_viscous path")
        self.lg4 = cc.grid
        self.iu = self.names.index("x-velocity")
        self.iv = self.names.index("y-velocity")

        bcu = self.bcs[self.iu]
        self.smg = make_sharded_mg(
            nx, ny, mesh, xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
            alpha=1.0, beta=1.0,
            xl_BC_type=bcu.xlb, xr_BC_type=bcu.xrb,
            yl_BC_type=bcu.ylb, yr_BC_type=bcu.yrb)

        problem_mod = importlib.import_module(
            f"pyro2_tpu.solvers.burgers_viscous.problems.{problem}")
        for k, v in getattr(problem_mod, "PROBLEM_PARAMS", {}).items():
            if k not in rp.params:
                rp.set_param(k, v, no_new=False)
        self.U_int = blockwise_init_interior(cc, problem_mod.init_data,
                                             rp, mesh)

        self.limiter = rp.get_param("advection.limiter")
        self.eps = rp.get_param("diffusion.eps")
        self.cfl = rp.get_param("driver.cfl")

        self._step = self._build_step()
        self._dt_fn = self._build_dt()
        self.t = 0.0
        self.n = 0
        self.dt = None

    def _fill(self, U):
        return jnp.stack([
            halo_exchange(U[i], self.lg4, self.bcs[i], self.px, self.py)
            for i in range(len(self.names))])

    def _pad(self, U_int):
        ng = self.lg4.ng
        return jnp.pad(U_int, ((0, 0), (ng, ng), (ng, ng)))

    def _build_step(self):
        lg4 = self.lg4
        ng = lg4.ng
        limiter = self.limiter
        eps = self.eps
        iu, iv = self.iu, self.iv
        sl = (slice(lg4.ilo, lg4.ihi + 1), slice(lg4.jlo, lg4.jhi + 1))
        g1 = self.smg.soln_grid

        def cn_solve(w, A, dt):
            """(1 - dt/2 eps L) w = w + dt/2 eps L w - dt A, inline
            (the serial interface.diffuse)."""
            lap = interface.get_lap(lg4, w)
            f_v = (ai(w, lg4).v() + 0.5 * dt * eps * ai(lap, lg4).v() -
                   dt * ai(A, lg4).v())
            f_blk = jnp.pad(f_v, 1)
            f_int = f_blk[1:-1, 1:-1]
            sn = jnp.sqrt(g1.dx * g1.dy * _psum2(jnp.sum(f_int ** 2)))
            params = {"alpha": jnp.asarray(1.0, w.dtype),
                      "beta": (0.5 * dt * eps).astype(w.dtype)}
            sol, r, res, rel, ncyc = self.smg.solve_local(
                jnp.zeros_like(f_blk), f_blk, params, {}, 1.e-12, sn)
            return w.at[sl].set(sol[1:-1, 1:-1])

        def body(U_int, dt):
            U = self._fill(self._pad(U_int))
            u, v = U[iu], U[iv]

            ldelta_ux = reconstruction.limit(u, lg4, 1, limiter)
            ldelta_uy = reconstruction.limit(u, lg4, 2, limiter)
            ldelta_vx = reconstruction.limit(v, lg4, 1, limiter)
            ldelta_vy = reconstruction.limit(v, lg4, 2, limiter)

            states = burgers_interface.get_interface_states(
                lg4, dt, u, v, ldelta_ux, ldelta_vx, ldelta_uy,
                ldelta_vy)
            states = interface.apply_diffusion_corrections(
                lg4, dt, eps, u, v, *states)
            states = burgers_interface.apply_transverse_corrections(
                lg4, dt, *states)
            u_fx, u_fy, v_fx, v_fy = \
                burgers_interface.construct_unsplit_fluxes(lg4, *states)

            ufx, ufy = ai(u_fx, lg4), ai(u_fy, lg4)
            vfx, vfy = ai(v_fx, lg4), ai(v_fy, lg4)
            A_u = jnp.zeros_like(u).at[sl].set(
                (ufx.ip(1) - ufx.v()) / lg4.dx +
                (ufy.jp(1) - ufy.v()) / lg4.dy)
            A_v = jnp.zeros_like(v).at[sl].set(
                (vfx.ip(1) - vfx.v()) / lg4.dx +
                (vfy.jp(1) - vfy.v()) / lg4.dy)

            u = cn_solve(u, A_u, dt)
            v = cn_solve(v, A_v, dt)
            U = U.at[iu].set(u).at[iv].set(v)
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

        def body(U_int):
            U = self._fill(self._pad(U_int))
            umax = _pmax2(jnp.max(jnp.abs(U[iu])))
            vmax = _pmax2(jnp.max(jnp.abs(U[iv])))
            xtmp = lg4.dx / jnp.maximum(umax, small)
            ytmp = lg4.dy / jnp.maximum(vmax, small)
            return cfl * jnp.minimum(xtmp, ytmp)

        spec = P(None, "x", "y")
        body = jax.shard_map(body, mesh=self.mesh, in_specs=spec,
                             out_specs=P())
        return jax.jit(body)

    # -- host driver -------------------------------------------------------
    def method_compute_timestep(self):
        self.dt = float(self._dt_fn(self.U_int))

    def evolve(self):
        self.U_int = self._step(self.U_int, jnp.asarray(self.dt))
        self.t += self.dt
        self.n += 1

    def get_var(self, name):
        return self.U_int[self.names.index(name)]
