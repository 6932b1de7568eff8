"""Device-mesh construction and halo exchange.

The TPU analog of the reference's ghost-cell fill (SURVEY.md section 2.9):
each device owns an (nvar, bx, by) interior block; `halo_exchange` pads it
with ng ghost cells filled from the neighboring blocks via
`lax.ppermute` rings over the "x"/"y" mesh axes, then overwrites
domain-edge ghosts with the physical BC fill on the blocks that own a
domain boundary.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from pyro2_tpu.mesh.indexer import _edge_fill

__all__ = ["factor_devices", "make_mesh", "halo_exchange",
           "gated_physical_fill", "seam_exchange"]


def factor_devices(n):
    """Split n devices into the most-square (px, py) factorization."""
    px = int(np.sqrt(n))
    while n % px != 0:
        px -= 1
    return px, n // px


def make_mesh(n_devices=None, shape=None):
    """A 2-D ("x", "y") device mesh over the available devices."""
    devs = jax.devices()
    if shape is None:
        n = n_devices if n_devices is not None else len(devs)
        shape = factor_devices(n)
    px, py = shape
    grid = np.array(devs[:px * py]).reshape(px, py)
    return Mesh(grid, ("x", "y"))


def _ring_perm(n):
    """Forward ring permutation [(0,1), (1,2), ..., (n-1,0)]."""
    return [(i, (i + 1) % n) for i in range(n)]


def _ring_perm_rev(n):
    return [(i, (i - 1) % n) for i in range(n)]


def halo_exchange(padded, local_grid, bc, px, py, *, axis_x="x", axis_y="y"):
    """Fill the ghost cells of a local padded (..., qx, qy) block.

    Interior block edges receive the neighbor's adjacent interior strip
    via ppermute (periodic ring -- which IS the physical fill for periodic
    global BCs).  For non-periodic BCs, the blocks owning a domain edge
    overwrite their ghosts with the physical fill.

    Must be called inside shard_map over a mesh with axes (axis_x, axis_y).
    x strips are exchanged before y so corner ghosts pick up the same
    x-then-y fill order as the single-block reference.
    """
    g = local_grid
    ng = g.ng

    def exchange(a, axis_name, n_blocks, axis):
        if n_blocks == 1:
            return a
        # strips adjacent to the high/low interior edges
        if axis == a.ndim - 2:
            hi_src = a[..., -2 * ng:-ng, :]
            lo_src = a[..., ng:2 * ng, :]
        else:
            hi_src = a[..., :, -2 * ng:-ng]
            lo_src = a[..., :, ng:2 * ng]

        # my hi-interior strip -> right neighbor's lo ghosts
        from_left = jax.lax.ppermute(hi_src, axis_name,
                                     _ring_perm(n_blocks))
        # my lo-interior strip -> left neighbor's hi ghosts
        from_right = jax.lax.ppermute(lo_src, axis_name,
                                      _ring_perm_rev(n_blocks))

        if axis == a.ndim - 2:
            a = a.at[..., :ng, :].set(from_left)
            a = a.at[..., -ng:, :].set(from_right)
        else:
            a = a.at[..., :, :ng].set(from_left)
            a = a.at[..., :, -ng:].set(from_right)
        return a

    x_axis = padded.ndim - 2
    y_axis = padded.ndim - 1

    padded = exchange(padded, axis_x, px, x_axis)
    # physical BCs on the domain-edge blocks.  Periodic ghosts come from
    # the ring wrap -- except on an unsplit axis (px == 1), where exchange()
    # is a no-op and the local periodic copy must be applied directly.
    ix = jax.lax.axis_index(axis_x)
    if bc.xlb != "periodic" or px == 1:
        lo_filled = _edge_fill(padded, g, -2, 0, bc.xlb, bc.xl_value, g.dx)
        padded = jnp.where(ix == 0, lo_filled, padded)
    if bc.xrb != "periodic" or px == 1:
        hi_filled = _edge_fill(padded, g, -2, 1, bc.xrb, bc.xr_value, g.dx)
        padded = jnp.where(ix == px - 1, hi_filled, padded)

    padded = exchange(padded, axis_y, py, y_axis)
    iy = jax.lax.axis_index(axis_y)
    if bc.ylb != "periodic" or py == 1:
        lo_filled = _edge_fill(padded, g, -1, 0, bc.ylb, bc.yl_value, g.dy)
        padded = jnp.where(iy == 0, lo_filled, padded)
    if bc.yrb != "periodic" or py == 1:
        hi_filled = _edge_fill(padded, g, -1, 1, bc.yrb, bc.yr_value, g.dy)
        padded = jnp.where(iy == py - 1, hi_filled, padded)

    return padded


def gated_physical_fill(a, local_grid, bc, px, py, *,
                        axis_x="x", axis_y="y"):
    """Physical-BC ghost fill on domain-edge-owning blocks only -- NO
    halo exchange.  For fields whose ghost values are already pointwise
    functions of an exchanged field (source terms, projection
    coefficients): seam ghosts are left at their pointwise values
    (bitwise what a global fill leaves there, since globally they are
    interior cells) and only the blocks owning a domain edge overwrite
    their ghosts with the physical fill.  Periodic ghosts are likewise
    already pointwise-correct, except on an unsplit axis where the local
    copy applies.  Must run inside shard_map over (axis_x, axis_y).
    """
    g = local_grid
    ix = jax.lax.axis_index(axis_x)
    iy = jax.lax.axis_index(axis_y)
    for edge, axis, side, nb, own in (
            ("xlb", -2, 0, px, ix == 0),
            ("xrb", -2, 1, px, ix == px - 1),
            ("ylb", -1, 0, py, iy == 0),
            ("yrb", -1, 1, py, iy == py - 1)):
        btype = getattr(bc, edge)
        dxy = g.dx if axis == -2 else g.dy
        if btype == "periodic":
            if nb == 1:
                a = _edge_fill(a, g, axis, side, btype, None, dxy)
            continue
        val = getattr(bc, edge[:2] + "_value")
        filled = _edge_fill(a, g, axis, side, btype, val, dxy)
        a = jnp.where(own, filled, a)
    return a


def seam_exchange(a, local_grid, px, py, *, axis_x="x", axis_y="y"):
    """ppermute exchange of interior-adjacent strips across block seams
    ONLY: domain-edge blocks keep their local ghost values on the domain
    side.  For face-centered intermediates (MAC velocities) whose global
    ghosts are never BC-filled: a block's seam ghosts are globally
    interior (must carry the neighbor's post-correction values), while
    its domain-side ghosts hold locally-computed values exactly like the
    serial global array's.  Must run inside shard_map.
    """
    g = local_grid
    ng = g.ng

    def exchange(a, axis_name, n_blocks, axis):
        if n_blocks == 1:
            return a
        if axis == a.ndim - 2:
            hi_src = a[..., -2 * ng:-ng, :]
            lo_src = a[..., ng:2 * ng, :]
            lo_old = a[..., :ng, :]
            hi_old = a[..., -ng:, :]
        else:
            hi_src = a[..., :, -2 * ng:-ng]
            lo_src = a[..., :, ng:2 * ng]
            lo_old = a[..., :, :ng]
            hi_old = a[..., :, -ng:]
        from_left = jax.lax.ppermute(hi_src, axis_name,
                                     _ring_perm(n_blocks))
        from_right = jax.lax.ppermute(lo_src, axis_name,
                                      _ring_perm_rev(n_blocks))
        idx = jax.lax.axis_index(axis_name)
        lo_new = jnp.where(idx == 0, lo_old, from_left)
        hi_new = jnp.where(idx == n_blocks - 1, hi_old, from_right)
        if axis == a.ndim - 2:
            a = a.at[..., :ng, :].set(lo_new)
            a = a.at[..., -ng:, :].set(hi_new)
        else:
            a = a.at[..., :, :ng].set(lo_new)
            a = a.at[..., :, -ng:].set(hi_new)
        return a

    a = exchange(a, axis_x, px, a.ndim - 2)
    a = exchange(a, axis_y, py, a.ndim - 1)
    return a
