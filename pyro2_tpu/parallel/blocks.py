"""Per-block problem initialization for sharded runs.

The TPU analog of calling a problem's `init_data` on the global grid
(reference pyro_sim.py:131-139): every device position's block is
initialized on a BLOCK grid -- local shape, global domain extents, and
coordinate arrays bitwise equal to the corresponding window of the global
grid (Grid2d's `_coord_shift`/`_domain_n`) -- so a sharded run never
materializes the global state on one host, and blockwise ICs agree
bitwise with a global-init-then-shard.

`jax.make_array_from_callback` assembles the global sharded array: on a
multi-host pod each host only evaluates the callbacks for its addressable
shards, so the per-host memory footprint is O(local blocks), not O(grid).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["block_grid", "blockwise_init_interior"]


def block_grid(global_grid, px, py, ix, iy):
    """The (ix, iy) block's grid on a px x py mesh: block-local shape,
    global extents, bitwise-global coordinate windows."""
    g = global_grid
    assert g.nx % px == 0 and g.ny % py == 0
    bx, by = g.nx // px, g.ny // py
    return type(g)(bx, by, ng=g.ng,
                   xmin=g.xmin, xmax=g.xmax, ymin=g.ymin, ymax=g.ymax,
                   _coord_shift=(ix * bx, iy * by), _domain_n=(g.nx, g.ny))


class _BlockData:
    """Minimal CellCenterData2d stand-in handed to problem `init_data`:
    block-local arrays behind the standard set_var/get_var/aux surface."""

    def __init__(self, grid, names, aux, ivars=None, dtype=None):
        from pyro2_tpu.defaults import dtype as _default_dtype
        self.grid = grid
        self.names = list(names)
        self.aux = dict(aux)
        self.ivars = ivars
        self.t = 0.0
        dt = dtype if dtype is not None else _default_dtype()
        self.data = jnp.zeros((len(self.names), grid.qx, grid.qy), dt)

    def get_var(self, name):
        return self.data[self.names.index(name)]

    def get_var_by_index(self, n):
        return self.data[n]

    def set_var(self, name, arr):
        self.data = self.data.at[self.names.index(name)].set(
            jnp.asarray(arr, self.data.dtype))

    def get_aux(self, key):
        return self.aux.get(key, None)

    def set_aux(self, keyword, value):
        self.aux[keyword] = value

    def set_vars(self, stack):
        self.data = jnp.asarray(stack, self.data.dtype)


def blockwise_init_interior(contract_data, problem_init, rp, mesh,
                            *, dtype=None):
    """Evaluate `problem_init(block_data, rp)` block-by-block and assemble
    the (nvar, nx, ny) global interior sharded P(None, "x", "y") over
    `mesh` -- without ever allocating the (nvar, qx, qy) global array.

    contract_data: any CellCenterData2d (e.g. a block-sized Simulation's)
    supplying the variable/aux registration contract; its grid only
    provides type/ng (shape comes from rp's mesh.nx/ny and the mesh).
    """
    gg = contract_data.grid
    px = int(mesh.devices.shape[0])
    py = int(mesh.devices.shape[1])
    nx = rp.get_param("mesh.nx")
    ny = rp.get_param("mesh.ny")
    # global domain extents come from rp (the contract grid may be a
    # block-extent local grid)
    xmin = rp.get_param("mesh.xmin")
    xmax = rp.get_param("mesh.xmax")
    ymin = rp.get_param("mesh.ymin")
    ymax = rp.get_param("mesh.ymax")
    nvar = len(contract_data.names)
    bx, by = nx // px, ny // py

    cache = {}

    def block_interior(ix, iy):
        if (ix, iy) not in cache:
            # block grid built directly from scalars -- no global-extent
            # coordinate/geometry arrays are ever allocated
            bg = type(gg)(bx, by, ng=gg.ng,
                          xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
                          _coord_shift=(ix * bx, iy * by),
                          _domain_n=(nx, ny))
            d = _BlockData(bg, contract_data.names, contract_data.aux,
                           ivars=getattr(contract_data, "ivars", None),
                           dtype=dtype)
            problem_init(d, rp)
            cache[ix, iy] = np.asarray(
                d.data[:, bg.ilo:bg.ihi + 1, bg.jlo:bg.jhi + 1])
        return cache[ix, iy]

    sharding = NamedSharding(mesh, P(None, "x", "y"))

    def cb(index):
        # index: global index tuple of slices for one shard
        ix = (index[1].start or 0) // bx
        iy = (index[2].start or 0) // by
        return block_interior(ix, iy)

    return jax.make_array_from_callback((nvar, nx, ny), sharding, cb)
