"""SPMD Crank-Nicolson diffusion over a block-partitioned device mesh.

The distributed twin of solvers/diffusion (reference: pyro/diffusion/
simulation.py) and the first full solver built on the block-partitioned
multigrid: each step builds the C-N right-hand side f = phi + dt/2 k L phi
with one halo exchange, then solves (1 - dt/2 k L) phi' = f with ShardedMG
(one jitted dispatch).  Partition-invariant vs the serial solver to FP
roundoff.
"""

import importlib

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.parallel.mesh_comm import halo_exchange
from pyro2_tpu.parallel.sharded_mg import (ShardedMG,
                                            make_sharded_mg)

__all__ = ["ShardedDiffusion"]


class ShardedDiffusion:
    """Block-partitioned C-N diffusion stepping.

    Holds the (nx, ny) global phi interior sharded P("x", "y"); `evolve`
    advances one implicit step.  ICs and the dt rule come from the serial
    diffusion Simulation built on the same runtime parameters.
    """

    def __init__(self, rp, mesh, *, problem="gaussian"):
        from pyro2_tpu.solvers import diffusion

        problem_mod = importlib.import_module(
            f"pyro2_tpu.solvers.diffusion.problems.{problem}")
        self.global_sim = diffusion.Simulation(
            "diffusion", problem, problem_mod.init_data, rp)
        self.global_sim.initialize()
        self.global_sim.method_compute_timestep()
        self.dt = self.global_sim.dt
        self.k = rp.get_param("diffusion.k")

        gg = self.global_sim.cc_data.grid
        self.grid = gg
        self.mesh = mesh
        self.px = int(mesh.devices.shape[0])
        self.py = int(mesh.devices.shape[1])
        self.bc = self.global_sim.cc_data.BCs["phi"]

        self.smg = make_sharded_mg(
            gg.nx, gg.ny, mesh,
            xmin=gg.xmin, xmax=gg.xmax, ymin=gg.ymin, ymax=gg.ymax,
            xl_BC_type=self.bc.xlb, xr_BC_type=self.bc.xrb,
            yl_BC_type=self.bc.ylb, yr_BC_type=self.bc.yrb,
            alpha=1.0, beta=0.5 * self.dt * self.k)

        phi = self.global_sim.cc_data.get_var("phi")
        self.phi_int = jax.device_put(
            phi[gg.ilo:gg.ihi + 1, gg.jlo:gg.jhi + 1], self.smg._sharding)
        self.t = 0.0
        self.n = 0

        self._rhs_fn = self._build_rhs()

    def _build_rhs(self):
        """f = phi + dt/2 k L phi via one halo exchange, as a jitted
        shard_map program (the SPMD twin of diffusion evolve's RHS)."""
        lg = self.smg.local_grids[self.smg.nlevels - 1]
        bc = self.bc
        px, py = self.px, self.py
        k = self.k

        def body(phi_int, dt):
            p = jnp.pad(phi_int, 1)
            p = halo_exchange(p, lg, bc, px, py)
            pv = ai(p, lg)
            return pv.v() + 0.5 * dt * k * pv.lap()

        spec = P("x", "y")
        body = jax.shard_map(body, mesh=self.mesh,
                             in_specs=(spec, P()), out_specs=spec)
        return jax.jit(body)

    def evolve(self):
        """One C-N implicit step (RHS dispatch + one MG-solve dispatch)."""
        rhs = self._rhs_fn(self.phi_int, self.dt)
        # alpha/beta are traced MG parameters (keyed out of the compiled
        # cycle), so per-step coefficient updates don't retrace
        self.smg.serial.alpha = 1.0
        self.smg.serial.beta = 0.5 * self.dt * self.k
        self.smg.init_zeros()
        self.smg.init_RHS(rhs)
        self.smg.solve(rtol=1.e-10)
        self.phi_int = self.smg.get_solution()
        self.t += self.dt
        self.n += 1

    def get_phi(self):
        """The (nx, ny) global interior phi (sharded jnp array)."""
        return self.phi_int
