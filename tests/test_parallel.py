"""Multi-device tests on the 8-virtual-CPU-device mesh.

The key oracle (SURVEY.md section 4): partition invariance -- the same
numerics on 1 device and on an N-device block-partitioned mesh must agree
(here: bitwise, since the per-block compute is identical and halos replace
the ghost fill exactly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyro2_tpu.mesh.grid import Cartesian2d
from pyro2_tpu.mesh.indexer import fill_ghost
from pyro2_tpu.parallel import factor_devices, make_mesh
from pyro2_tpu.parallel.mesh_comm import halo_exchange
from pyro2_tpu.parallel.sharded import ShardedCompressible
from pyro2_tpu.util.runparams import RuntimeParameters

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _rp(nx, ny, bcs="periodic"):
    rp = RuntimeParameters()
    rp.load_params("pyro2_tpu/_defaults")
    rp.load_params("pyro2_tpu/solvers/compressible/_defaults")
    for k, v in {"mesh.nx": nx, "mesh.ny": ny,
                 "mesh.xlboundary": bcs, "mesh.xrboundary": bcs,
                 "mesh.ylboundary": bcs, "mesh.yrboundary": bcs,
                 "driver.verbose": 0, "vis.dovis": 0,
                 "io.do_io": 0}.items():
        rp.set_param(k, v, no_new=False)
    return rp


class TestFactor:
    def test_factor_devices(self):
        assert factor_devices(8) == (2, 4)
        assert factor_devices(4) == (2, 2)
        assert factor_devices(1) == (1, 1)
        assert factor_devices(6) == (2, 3)


class TestHaloExchange:
    @pytest.mark.parametrize("bc_type", ["periodic", "outflow"])
    def test_matches_single_block_fill(self, bc_type):
        """Sharded halo fill == single-block ghost fill, for each BC."""
        import pyro2_tpu.mesh.boundary as bnd
        from jax.sharding import PartitionSpec as P

        ng = 4
        nx, ny = 16, 32
        mesh = make_mesh(8)
        px, py = mesh.devices.shape

        gg = Cartesian2d(nx, ny, ng=ng)
        gl = Cartesian2d(nx // px, ny // py, ng=ng)
        bc = bnd.BC(xlb=bc_type, xrb=bc_type, ylb=bc_type, yrb=bc_type)

        rng = np.random.default_rng(0)
        interior = jnp.asarray(rng.standard_normal((nx, ny)))

        # single-block: embed in padded array and fill
        full = jnp.zeros((gg.qx, gg.qy))
        full = full.at[gg.ilo:gg.ihi + 1, gg.jlo:gg.jhi + 1].set(interior)
        ref = fill_ghost(full, gg, bc)

        # sharded: pad each local block and halo-exchange
        def body(loc):
            pad = jnp.pad(loc, ((ng, ng), (ng, ng)))
            filled = halo_exchange(pad, gl, bc, px, py)
            return filled[ng:-ng, ng:-ng]

        f = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P("x", "y"),
                                  out_specs=P("x", "y")))
        out = f(interior)
        # interiors must be untouched and equal
        np.testing.assert_array_equal(np.asarray(out), np.asarray(interior))

        # also compare the full padded local blocks against windows of the
        # single-block fill (checks the ghost values themselves)
        def body_padded(loc):
            pad = jnp.pad(loc, ((ng, ng), (ng, ng)))
            return halo_exchange(pad, gl, bc, px, py)

        # run per-block and reassemble ghost checks for the (0,0) block
        f2 = jax.shard_map(body_padded, mesh=mesh, in_specs=P("x", "y"),
                           out_specs=P(("x",), ("y",)))
        # out shape: (px*(bx+2ng), py*(by+2ng)) -- block (0,0) occupies
        # the leading window
        blocks = f2(interior)
        bx, by = nx // px, ny // py
        blk00 = np.asarray(blocks)[:bx + 2 * ng, :by + 2 * ng]
        ref00 = np.asarray(ref)[0:bx + 2 * ng, 0:by + 2 * ng]
        np.testing.assert_array_equal(blk00, ref00)


class TestPartitionInvariance:
    def test_compressible_sharded_bitwise(self):
        rp = _rp(32, 32)
        mesh = make_mesh(8)
        sc = ShardedCompressible(rp, mesh, problem="advect")

        U = sc.global_interior()
        dt = 0.002
        U1 = sc.step(U, 0.0, dt)
        U2 = sc.step(U1, dt, dt)

        gs = sc.global_sim
        gs.dt = dt
        gs.cc_data.fill_BC_all()
        gs.evolve()
        gs.cc_data.fill_BC_all()
        gs.evolve()
        gg = gs.cc_data.grid
        U_ref = gs.cc_data.data[:, gg.ilo:gg.ihi + 1, gg.jlo:gg.jhi + 1]

        np.testing.assert_array_equal(np.asarray(U2), np.asarray(U_ref))


class TestGraftEntry:
    def test_entry_and_dryrun(self):
        import importlib
        ge = importlib.import_module("__graft_entry__")
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        assert out.shape == args[0].shape
        ge.dryrun_multichip(8)
