"""Sharded steps for the scalar hyperbolic families (advection, burgers).

The heavyweight ShardedSim (sharded.py) wraps the compressible/swe
`_make_step` contract with block-gated solids, extended BCs, and
spherical geometry.  The scalar families need none of that: their step
is a pure (fields, dt) -> fields function whose only global coupling is
the ghost fill.  Here the block-local no-fill step variant
(Simulation._build_step(fill_ghosts=False)) runs behind a per-variable
halo exchange inside shard_map -- the same decomposition contract as
every other sharded solver (SURVEY 2.9).

Reference basis: advection evolve /root/reference/pyro/advection/
simulation.py:56-84; burgers evolve burgers/simulation.py:68-137 (both
strictly serial there).
"""

import importlib

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pyro2_tpu.parallel.mesh_comm import halo_exchange

__all__ = ["ShardedAdvection", "ShardedBurgers"]


def _clone_rp(rp):
    from pyro2_tpu.util.runparams import RuntimeParameters
    new = RuntimeParameters()
    new.params = dict(rp.params)
    new.param_comments = dict(rp.param_comments)
    return new


class _ShardedScalar:
    """Common plumbing: block-local sim + halo-exchanged sharded step."""

    _SOLVER = None

    def __init__(self, rp, mesh, *, problem):
        self.mesh = mesh
        self.px = int(mesh.devices.shape[0])
        self.py = int(mesh.devices.shape[1])
        self.rp = rp
        nx = rp.get_param("mesh.nx")
        ny = rp.get_param("mesh.ny")
        if nx % self.px != 0 or ny % self.py != 0:
            raise ValueError("grid must divide evenly over the device mesh")
        self.nx, self.ny = nx, ny
        bx, by = nx // self.px, ny // self.py

        solver_mod = importlib.import_module(
            f"pyro2_tpu.solvers.{self._SOLVER}")
        self._problem_mod = importlib.import_module(
            f"pyro2_tpu.solvers.{self._SOLVER}.problems.{problem}")
        for k, v in getattr(self._problem_mod, "PROBLEM_PARAMS",
                            {}).items():
            if k not in rp.params:
                rp.set_param(k, v, no_new=False)

        local_rp = _clone_rp(rp)
        local_rp.set_param("mesh.nx", bx)
        local_rp.set_param("mesh.ny", by)
        xmin = rp.get_param("mesh.xmin")
        xmax = rp.get_param("mesh.xmax")
        ymin = rp.get_param("mesh.ymin")
        ymax = rp.get_param("mesh.ymax")
        local_rp.set_param("mesh.xmax", xmin + (xmax - xmin) * bx / nx)
        local_rp.set_param("mesh.ymax", ymin + (ymax - ymin) * by / ny)
        self.local_sim = solver_mod.Simulation(
            self._SOLVER, problem, lambda d, r: None, local_rp)
        self.local_sim.initialize()
        self.lg = self.local_sim.cc_data.grid
        self.names = list(self.local_sim.cc_data.names)
        self.bcs = [self.local_sim.cc_data.BCs[n] for n in self.names]
        self.ng = self.lg.ng
        self._sharding = NamedSharding(mesh, P(None, "x", "y"))
        self._step = self._build()

    def _fill(self, U):
        return jnp.stack([
            halo_exchange(U[n], self.lg, self.bcs[n], self.px, self.py)
            for n in range(len(self.names))])

    def _local_step(self):
        """(U_padded_filled, t, dt) -> U_padded, block-local."""
        raise NotImplementedError

    def _build(self):
        ng = self.ng
        step = self._local_step()

        def body(U_int, t, dt):
            U = self._fill(jnp.pad(U_int, ((0, 0), (ng, ng), (ng, ng))))
            U = step(U, t, dt)
            return U[:, ng:-ng, ng:-ng]

        spec = P(None, "x", "y")
        return jax.jit(jax.shard_map(body, mesh=self.mesh,
                                     in_specs=(spec, P(), P()),
                                     out_specs=spec))

    def init_interior(self):
        """Blockwise ICs (no global materialization): run the problem's
        init on a bitwise-global block window per device."""
        from pyro2_tpu.parallel.blocks import blockwise_init_interior
        return blockwise_init_interior(self.local_sim.cc_data,
                                       self._problem_mod.init_data,
                                       self.rp, self.mesh)

    def step(self, U_int, t, dt):
        return self._step(U_int, jnp.asarray(t), jnp.asarray(dt))


class ShardedAdvection(_ShardedScalar):
    """Block-partitioned linear advection (CTU): the (1, nx, ny) density
    stack stepped behind a halo exchange."""

    _SOLVER = "advection"

    def _local_step(self):
        one = self.local_sim._build_step(fill_ghosts=False)

        def step(U, t, dt):
            return U.at[0].set(one(U[0], dt))

        return step


class ShardedBurgers(_ShardedScalar):
    """Block-partitioned inviscid Burgers: the (2, nx, ny) velocity
    stack stepped behind a halo exchange."""

    _SOLVER = "burgers"

    def _local_step(self):
        two = self.local_sim._build_step(fill_ghosts=False)

        def step(U, t, dt):
            u, v = two(U[0], U[1], dt)
            return jnp.stack([u, v])

        return step
