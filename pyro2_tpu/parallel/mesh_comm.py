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
           "gated_physical_fill", "seam_exchange",
           "deep_pad_exchange", "deep_phys_refresh"]


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


# ---------------------------------------------------------------------------
# deep-halo exchange (communication-avoiding smoothing)
#
# The reference smoother refills ghosts after every red-black half sweep
# (/root/reference/pyro/multigrid/MG.py:591-599); a faithful sharded port
# pays 2 halo exchanges per sweep.  Instead, exchange ONE d-deep halo and
# recompute the halo cells locally: each half sweep shrinks the valid halo
# band by one cell, so d cells of halo buy (d-1)//2 full sweeps with zero
# additional communication -- and every updated cell computes the identical
# arithmetic on the identical operand values as the exchange-per-half-sweep
# schedule, so the result is bitwise unchanged.
# ---------------------------------------------------------------------------

def deep_phys_refresh(a, bc, px, py, dpx, dpy, *, axis_x="x", axis_y="y"):
    """Depth-1 physical-BC ghost refresh on a deep-padded (..., bx+2*dpx,
    by+2*dpy) frame, via rolls + index masks (no windowed self-writes).

    Seam sides (split axis) are untouched except on domain-edge blocks of a
    non-periodic axis.  An UNSPLIT periodic axis gets the local wrap copy
    (its pad depth is 1).  Homogeneous standard BC kinds only.  Fill order
    x-lo, x-hi, y-lo, y-hi matches indexer.fill_ghost so corner ghosts are
    identical.  Must run inside shard_map over (axis_x, axis_y).
    """
    xax, yax = a.ndim - 2, a.ndim - 1
    nX, nY = a.shape[xax], a.shape[yax]
    bx, by = nX - 2 * dpx, nY - 2 * dpy
    ix = jax.lax.axis_index(axis_x)
    iy = jax.lax.axis_index(axis_y)

    def row_mask(axis, idx):
        shape = [1] * a.ndim
        shape[axis] = a.shape[axis]
        ii = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis)
        return ii == idx

    def one_edge(a, axis, dp, b, kind, side, own):
        # ghost index and mirror shift on this axis
        gidx = dp - 1 if side == 0 else dp + b
        if kind == "periodic":
            # only reached on an unsplit axis (dp == 1): wrap copy --
            # lo ghost (index 0) <- a[b]; hi ghost (index b+1) <- a[1]
            src = jnp.roll(a, -b, axis) if side == 0 else jnp.roll(a, b, axis)
        elif kind in ("outflow", "neumann", "reflect-even"):
            src = jnp.roll(a, -1, axis) if side == 0 else jnp.roll(a, 1, axis)
        else:  # dirichlet / reflect-odd (homogeneous)
            src = -(jnp.roll(a, -1, axis) if side == 0
                    else jnp.roll(a, 1, axis))
        return jnp.where(row_mask(axis, gidx) & own, src, a)

    # x edges (rows), then y edges (full rows incl. x ghosts), as serial
    if bc.xlb == "periodic":
        if px == 1:
            a = one_edge(a, xax, dpx, bx, "periodic", 0, True)
            a = one_edge(a, xax, dpx, bx, "periodic", 1, True)
    else:
        a = one_edge(a, xax, dpx, bx, bc.xlb, 0, ix == 0)
        a = one_edge(a, xax, dpx, bx, bc.xrb, 1, ix == px - 1)
    if bc.ylb == "periodic":
        if py == 1:
            a = one_edge(a, yax, dpy, by, "periodic", 0, True)
            a = one_edge(a, yax, dpy, by, "periodic", 1, True)
    else:
        a = one_edge(a, yax, dpy, by, bc.ylb, 0, iy == 0)
        a = one_edge(a, yax, dpy, by, bc.yrb, 1, iy == py - 1)
    return a


def deep_pad_exchange(interior, bc, px, py, dpx, dpy, *, phys=True,
                      axis_x="x", axis_y="y"):
    """(..., bx, by) local interior block -> (..., bx+2*dpx, by+2*dpy)
    deep-padded frame: split-axis halos carry the neighbor's adjacent dpx/
    dpy interior strips (2 ppermutes per split axis, regardless of depth),
    unsplit periodic axes the local wrap, and (when `phys`) domain-edge
    blocks get the depth-1 physical fill via `deep_phys_refresh`.

    On a non-periodic split axis the edge blocks' outer halo rows beyond
    depth 1 keep the ring's wrapped payload -- callers must never read
    them (the deep-smoothing masks guarantee this).  Must run inside
    shard_map over (axis_x, axis_y).
    """
    lead = [(0, 0)] * (interior.ndim - 2)
    a = jnp.pad(interior, lead + [(dpx, dpx), (dpy, dpy)])
    xax, yax = a.ndim - 2, a.ndim - 1

    def exchange(a, axis_name, n_blocks, axis, dp):
        if n_blocks == 1:
            return a
        if axis == xax:
            hi_src = a[..., -2 * dp:-dp, :]
            lo_src = a[..., dp:2 * dp, :]
        else:
            hi_src = a[..., :, -2 * dp:-dp]
            lo_src = a[..., :, dp:2 * dp]
        from_left = jax.lax.ppermute(hi_src, axis_name, _ring_perm(n_blocks))
        from_right = jax.lax.ppermute(lo_src, axis_name,
                                      _ring_perm_rev(n_blocks))
        if axis == xax:
            a = a.at[..., :dp, :].set(from_left)
            a = a.at[..., -dp:, :].set(from_right)
        else:
            a = a.at[..., :, :dp].set(from_left)
            a = a.at[..., :, -dp:].set(from_right)
        return a

    a = exchange(a, axis_x, px, xax, dpx)
    a = exchange(a, axis_y, py, yax, dpy)
    if phys:
        a = deep_phys_refresh(a, bc, px, py, dpx, dpy,
                              axis_x=axis_x, axis_y=axis_y)
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
