"""SPMD solver steps over a block-partitioned device mesh.

The single-block solver kernels are ghost-cell-oblivious above the fill
(like every reference solver above fill_BC), so the SPMD step is: shard the
global interior over the mesh -> pad each block -> halo_exchange (ppermute +
edge-block physical fills) -> run the SAME single-block step on the local
padded block -> return the updated interior.  dt reduces with lax.pmin.

Supported solvers: "compressible" (CTU, step(U, t, dt)) and "swe"
(CTU, step(U, dt)); both follow the same pure-jitted-step contract
(Simulation._make_step).  The reference has no counterpart for any of
this (SURVEY.md section 2.9).

Limitations (round 1): standard BC types only (no hse/ambient/ramp in the
sharded path), and solid-wall Riemann clamping is disabled when an axis is
split (the clamp indices are block-local); periodic/outflow flows are exact.
"""

import importlib

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pyro2_tpu.parallel.mesh_comm import halo_exchange
from pyro2_tpu.util import profile_pyro

__all__ = ["ShardedSim", "ShardedCompressible", "ShardedSWE",
           "make_sharded_compressible_step"]


class _Solid:
    """Solid-wall flags, disabled on split axes (see module docstring)."""

    def __init__(self, base, px, py):
        self.xl = base.xl if px == 1 else 0
        self.xr = base.xr if px == 1 else 0
        self.yl = base.yl if py == 1 else 0
        self.yr = base.yr if py == 1 else 0


class ShardedSim:
    """A solver's CTU step SPMD-parallelized over a device mesh.

    Builds a block-local Simulation (same runtime parameters, local block
    dimensions) and wraps its pure step with shard_map: halo exchange
    replaces the driver-level ghost fill.
    """

    #: solver name -> does the jitted step take the time argument?
    _STEP_TAKES_T = {"compressible": True, "swe": False}

    def __init__(self, solver, rp, mesh, *, problem="test", ng=4):
        if solver not in self._STEP_TAKES_T:
            raise ValueError(
                f"solver '{solver}' has no sharded step adapter "
                f"(supported: {sorted(self._STEP_TAKES_T)})")
        self.solver = solver
        self._takes_t = self._STEP_TAKES_T[solver]
        solver_mod = importlib.import_module(f"pyro2_tpu.solvers.{solver}")

        self.mesh = mesh
        self.px = mesh.devices.shape[0]
        self.py = mesh.devices.shape[1]

        nx = rp.get_param("mesh.nx")
        ny = rp.get_param("mesh.ny")
        assert nx % self.px == 0 and ny % self.py == 0, \
            "grid must divide evenly over the device mesh"
        self.nx, self.ny = nx, ny
        bx, by = nx // self.px, ny // self.py

        # the GLOBAL grid/problem (for ICs and dt) ...
        problem_mod = importlib.import_module(
            f"pyro2_tpu.solvers.{solver}.problems.{problem}")
        self.global_sim = solver_mod.Simulation(
            solver, problem, problem_mod.init_data, rp)
        self.global_sim.initialize(ng=ng)

        # ... and a block-LOCAL simulation whose jitted step becomes the
        # shard_map body.  Block physical extents don't matter beyond dx/dy
        # (Cartesian factors are uniform).
        local_rp = _clone_rp(rp)
        local_rp.set_param("mesh.nx", bx)
        local_rp.set_param("mesh.ny", by)
        gg = self.global_sim.cc_data.grid
        local_rp.set_param("mesh.xmax",
                           gg.xmin + (gg.xmax - gg.xmin) / self.px)
        local_rp.set_param("mesh.ymax",
                           gg.ymin + (gg.ymax - gg.ymin) / self.py)
        self.local_sim = solver_mod.Simulation(
            solver, problem, problem_mod.init_data, local_rp)
        self.local_sim.initialize(ng=ng)
        self.local_sim.solid = _Solid(self.local_sim.solid, self.px, self.py)
        self.local_sim.tc = profile_pyro.TimerCollection()

        self.local_grid = self.local_sim.cc_data.grid
        self.bcs = [self.global_sim.cc_data.BCs[n]
                    for n in self.global_sim.cc_data.names]
        self.nvar = len(self.bcs)
        self.ng = ng

        self._step = self._build()

    def _build(self):
        g = self.local_grid
        ng = self.ng
        px, py = self.px, self.py
        bcs = self.bcs
        takes_t = self._takes_t
        # rebuild the step with the adjusted solid flags
        local_step = self.local_sim._make_step()

        def body(U_int, t, dt):
            # pad the local interior with ghosts
            pad = [(0, 0)] * U_int.ndim
            pad[-2] = (ng, ng)
            pad[-1] = (ng, ng)
            U = jnp.pad(U_int, pad)

            # per-variable halo exchange (BCs differ by variable)
            filled = [halo_exchange(U[n], g, bcs[n], px, py)
                      for n in range(self.nvar)]
            U = jnp.stack(filled)

            U = local_step(U, t, dt) if takes_t else local_step(U, dt)
            return U[..., ng:-ng, ng:-ng]

        mesh = self.mesh
        spec = P(None, "x", "y")
        body_sharded = jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec, P(), P()),
            out_specs=spec)
        return jax.jit(body_sharded)

    # -- public API ---------------------------------------------------------
    def global_interior(self):
        """The (nvar, nx, ny) global interior, sharded over the mesh."""
        gg = self.global_sim.cc_data.grid
        U = self.global_sim.cc_data.data[:, gg.ilo:gg.ihi + 1,
                                         gg.jlo:gg.jhi + 1]
        sharding = NamedSharding(self.mesh, P(None, "x", "y"))
        return jax.device_put(U, sharding)

    def compute_dt(self):
        """The CFL dt (a global min; computed from the global state)."""
        self.global_sim.cc_data.fill_BC_all()
        self.global_sim.method_compute_timestep()
        return self.global_sim.dt

    def step(self, U_int, t, dt):
        """One sharded step on the (nvar, nx, ny) interior."""
        return self._step(U_int, t, dt)


class ShardedCompressible(ShardedSim):
    def __init__(self, rp, mesh, *, problem="test", ng=4):
        super().__init__("compressible", rp, mesh, problem=problem, ng=ng)


class ShardedSWE(ShardedSim):
    def __init__(self, rp, mesh, *, problem="test", ng=4):
        super().__init__("swe", rp, mesh, problem=problem, ng=ng)


def _clone_rp(rp):
    from pyro2_tpu.util.runparams import RuntimeParameters
    new = RuntimeParameters()
    new.params = dict(rp.params)
    new.param_comments = dict(rp.param_comments)
    return new


def make_sharded_compressible_step(rp, mesh, *, problem="test", ng=4):
    """Convenience constructor returning a ShardedCompressible."""
    return ShardedCompressible(rp, mesh, problem=problem, ng=ng)
