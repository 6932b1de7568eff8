"""Stencil views and ghost-cell filling as pure functions.

The reference's ArrayIndexer (an ndarray subclass with shifted views,
/root/reference/pyro/mesh/array_indexer.py:29-148) becomes `ai`: a tiny
immutable wrapper pairing a jnp array with its (static) grid.  All view
methods return raw jnp arrays produced by *static* slicing, so under jit they
are free -- XLA fuses the shifted reads into the consuming stencil compute.

`fill_ghost` is the vectorized replacement for the reference's per-row ghost
loops (array_indexer.py:150-274): each boundary is one masked strip update.
Fill order (x-lo, x-hi, y-lo, y-hi) matches the reference so corner ghost
cells get identical values.
"""

import jax
import jax.numpy as jnp

__all__ = ["ai", "aifc", "aic", "fill_ghost", "fill_ghost_fc", "embed",
           "embed_into"]


class aic:
    """A constant-geometry stand-in for `ai`: every view is the same scalar.

    Cartesian grids have uniform Lx/Ly/Ax/Ay/V, so windowed reads of those
    arrays are just a broadcast scalar.  Using `aic` instead of `ai` keeps
    the stencil expressions verbatim while avoiding materialized constant
    arrays -- bitwise identical results, and it lets the fused Pallas kernel
    trace without capturing array constants.
    """

    __slots__ = ("c",)

    def __init__(self, c):
        self.c = jnp.asarray(c)

    def v(self, buf=0, s=1):
        return self.c

    def ip(self, shift, buf=0, s=1):
        return self.c

    def jp(self, shift, buf=0, s=1):
        return self.c

    def ip_jp(self, ishift, jshift, buf=0, s=1):
        return self.c


# ---------------------------------------------------------------------------
# full-frame mode
#
# Inside a Pallas TPU kernel, Mosaic cannot lower the pad/scatter ops that
# windowed views produce, but rolls and iota masks lower fine.  Under
# `with full_frame():` every `ai` view returns the FULL padded array
# (shifts become jnp.roll) and `embed` becomes roll + window mask -- all
# shapes stay (..., qx, qy), and every masked intermediate matches the
# windowed computation exactly, so interior results are identical.
# ---------------------------------------------------------------------------

_FULL_FRAME = False


def is_full_frame():
    return _FULL_FRAME


class _FullFrameCtx:
    def __enter__(self):
        global _FULL_FRAME
        self._prev = _FULL_FRAME
        _FULL_FRAME = True
        return self

    def __exit__(self, *exc):
        global _FULL_FRAME
        _FULL_FRAME = self._prev
        return False


def full_frame():
    """Context manager enabling full-frame (roll/mask) stencil views."""
    return _FullFrameCtx()


def _roll2(a, sx, sy):
    """Roll the trailing (x, y) dims; no-op for zero shifts."""
    shifts, axes = [], []
    if sx:
        shifts.append(sx)
        axes.append(-2)
    if sy:
        shifts.append(sy)
        axes.append(-1)
    if not shifts:
        return a
    return jnp.roll(a, tuple(shifts), axis=tuple(axes))


def embed(vals, g, buf=0, ishift=0, jshift=0, *, like=None):
    """Embed a buf-windowed block into a zero padded array as ONE lax.pad.

    Equivalent to zeros_like(like).at[window].set(vals) but compiles to a
    single pad op (XLA fuses it into consumers), which matters in the hot
    solver paths.  `buf` may be an int or a (bxlo,bxhi,bylo,byhi) spec.

    In full-frame mode `vals` is already full-sized (cell i holds cell i's
    value); the embed becomes a shift-roll plus a window mask, which is
    exactly the windowed-placement semantics.
    """
    bxlo, bxhi, bylo, byhi = _buf_split(buf)
    lo_x = g.ilo - bxlo + ishift
    lo_y = g.jlo - bylo + jshift
    hi_x_last = g.ihi + bxhi + ishift      # last index inside the window
    hi_y_last = g.jhi + byhi + jshift
    if _FULL_FRAME:
        out = _roll2(vals, ishift, jshift)
        xi = jax.lax.broadcasted_iota(jnp.int32, (g.qx, g.qy), 0)
        yi = jax.lax.broadcasted_iota(jnp.int32, (g.qx, g.qy), 1)
        m = ((xi >= lo_x) & (xi <= hi_x_last) &
             (yi >= lo_y) & (yi <= hi_y_last))
        return jnp.where(m, out, jnp.asarray(0.0, vals.dtype))
    pads = [(0, 0, 0)] * (vals.ndim - 2) + \
        [(lo_x, g.qx - hi_x_last - 1, 0),
         (lo_y, g.qy - hi_y_last - 1, 0)]
    return jax.lax.pad(vals, jnp.asarray(0.0, vals.dtype), pads)


def embed_into(vals, g, like, buf=0, ishift=0, jshift=0):
    """like.at[window].set(vals) in scatter-free form.

    The windowed twin of `embed` that preserves `like` outside the
    window instead of zeroing it; compiles to pad+select (windowed mode)
    or roll+select (full-frame mode), both of which Mosaic lowers."""
    bxlo, bxhi, bylo, byhi = _buf_split(buf)
    lo_x = g.ilo - bxlo + ishift
    lo_y = g.jlo - bylo + jshift
    hi_x_last = g.ihi + bxhi + ishift
    hi_y_last = g.jhi + byhi + jshift
    xi = jax.lax.broadcasted_iota(jnp.int32, (g.qx, g.qy), 0)
    yi = jax.lax.broadcasted_iota(jnp.int32, (g.qx, g.qy), 1)
    m = ((xi >= lo_x) & (xi <= hi_x_last) &
         (yi >= lo_y) & (yi <= hi_y_last))
    if _FULL_FRAME:
        out = _roll2(vals, ishift, jshift)
    else:
        pads = [(0, 0, 0)] * (vals.ndim - 2) + \
            [(lo_x, g.qx - hi_x_last - 1, 0),
             (lo_y, g.qy - hi_y_last - 1, 0)]
        out = jax.lax.pad(vals, jnp.asarray(0.0, vals.dtype), pads)
    return jnp.where(m, out, like)


def _buf_split(b):
    """Expand an int / (lo,hi) / (xlo,xhi,ylo,yhi) ghost-buffer spec."""
    if isinstance(b, (tuple, list)):
        if len(b) == 2:
            return b[0], b[1], b[0], b[1]
        if len(b) == 4:
            return tuple(b)
        raise ValueError(f"bad buf spec: {b}")
    return b, b, b, b


class ai:
    """A (array, grid) pair exposing the reference's stencil-view algebra.

    a must have trailing dims (qx, qy); leading dims (e.g. a variable axis)
    pass through.  Views are same-sized windows over the valid region,
    optionally shifted (ip/jp), buffered into the ghosts (buf), and strided
    (s).  Methods return plain jnp arrays.
    """

    __slots__ = ("a", "g")

    def __init__(self, a, g):
        self.a = a
        self.g = g

    def _win(self, ishift, jshift, buf, s):
        g = self.g
        if _FULL_FRAME:
            if s != 1:
                raise NotImplementedError(
                    "strided views unsupported in full-frame mode")
            return _roll2(self.a, -ishift, -jshift)
        bxlo, bxhi, bylo, byhi = _buf_split(buf)
        isl = slice(g.ilo - bxlo + ishift, g.ihi + 1 + bxhi + ishift, s)
        jsl = slice(g.jlo - bylo + jshift, g.jhi + 1 + byhi + jshift, s)
        return self.a[..., isl, jsl]

    def v(self, buf=0, s=1):
        """The valid region (optionally including buf ghost cells)."""
        return self._win(0, 0, buf, s)

    def ip(self, shift, buf=0, s=1):
        """Valid-region-sized window shifted by `shift` zones in x."""
        return self._win(shift, 0, buf, s)

    def jp(self, shift, buf=0, s=1):
        """Valid-region-sized window shifted by `shift` zones in y."""
        return self._win(0, shift, buf, s)

    def ip_jp(self, ishift, jshift, buf=0, s=1):
        """Window shifted by ishift in x and jshift in y."""
        return self._win(ishift, jshift, buf, s)

    def lap(self, buf=0):
        """The 5-point Laplacian over the (buffered) valid region."""
        g = self.g
        return ((self.ip(-1, buf=buf) - 2.0 * self.v(buf=buf)
                 + self.ip(1, buf=buf)) / g.dx ** 2 +
                (self.jp(-1, buf=buf) - 2.0 * self.v(buf=buf)
                 + self.jp(1, buf=buf)) / g.dy ** 2)

    def norm(self):
        """Grid-weighted L2 norm over the valid region."""
        g = self.g
        return jnp.sqrt(g.dx * g.dy * jnp.sum(self.v() ** 2))

    def is_symmetric(self, nodal=False, tol=1.0e-14, asymmetric=False):
        """Left-right (a)symmetry check over the valid region (debug aid)."""
        g = self.g
        s = -1.0 if asymmetric else 1.0
        if not nodal:
            L = self.a[..., g.ilo:g.ilo + g.nx // 2, g.jlo:g.jhi + 1]
            R = self.a[..., g.ilo + g.nx // 2:g.ihi + 1, g.jlo:g.jhi + 1]
        else:
            L = self.a[..., g.ilo:g.ilo + g.nx // 2 + 1, g.jlo:g.jhi + 1]
            R = self.a[..., g.ilo + g.nx // 2:g.ihi + 2, g.jlo:g.jhi + 1]
        e = jnp.abs(L - s * jnp.flip(R, axis=-2)).max()
        return bool(e < tol)

    def is_asymmetric(self, nodal=False, tol=1.0e-14):
        return self.is_symmetric(nodal=nodal, tol=tol, asymmetric=True)

    def pretty_print(self, fmt=None):
        """Print the array with j increasing upward, ghost cells in color
        (reference: array_indexer.py:276-333)."""
        import numpy as np
        a = np.asarray(self.a)
        if a.ndim != 2:
            raise ValueError("pretty_print expects a single 2-d component")
        if fmt is None:
            fmt = "%4d" if np.issubdtype(a.dtype, np.integer) else "%10.5g"
        g = self.g
        bold = "\033[31m"   # ghost cells: red, matching the reference
        reset = "\033[0m"
        for j in reversed(range(g.qy)):
            row = []
            for i in range(g.qx):
                cell = fmt % a[i, j]
                interior = (g.ilo <= i <= g.ihi) and (g.jlo <= j <= g.jhi)
                row.append(cell if interior else bold + cell + reset)
            print(" ".join(row))
        print("\n         ^ y\n         |\n         +---> x\n")


class aifc(ai):
    """Face-centered variant: one extra point in direction `idir` (1=x, 2=y).

    Mirrors ArrayIndexerFC (array_indexer.py:335-413).
    """

    __slots__ = ("idir",)

    def __init__(self, a, g, idir):
        super().__init__(a, g)
        self.idir = idir

    def _win(self, ishift, jshift, buf, s):
        g = self.g
        bxlo, bxhi, bylo, byhi = _buf_split(buf)
        xhi_extra = 1 if self.idir == 1 else 0
        yhi_extra = 1 if self.idir == 2 else 0
        isl = slice(g.ilo - bxlo + ishift,
                    g.ihi + 1 + xhi_extra + bxhi + ishift, s)
        jsl = slice(g.jlo - bylo + jshift,
                    g.jhi + 1 + yhi_extra + byhi + jshift, s)
        return self.a[..., isl, jsl]

    def lap(self, buf=0):
        raise NotImplementedError("lap not defined for face-centered data")

    def norm(self):
        g = self.g
        return jnp.sqrt(g.dx * g.dy * jnp.sum(self.v() ** 2))


# ---------------------------------------------------------------------------
# ghost-cell filling
# ---------------------------------------------------------------------------

def _edge_fill(a, g, axis, side, kind, value, dxy):
    """Fill one boundary's ghost strip of a (..., qx, qy) array.

    axis: -2 for x, -1 for y; side: 0 (low) / 1 (high).
    Matches reference array_indexer.py:150-274 exactly, including the
    one-ghost-only inhomogeneous Neumann/Dirichlet forms.
    """
    ng = g.ng
    n_tot = a.shape[axis]

    def take(idx_or_slice):
        # index along `axis`, keeping other dims
        idx = [slice(None)] * a.ndim
        idx[axis] = idx_or_slice
        return tuple(idx)

    if value is not None:
        value = jnp.asarray(value, dtype=a.dtype)

    if side == 0:
        ghost = slice(0, ng)              # ghosts 0..ng-1
        first_int = ng                    # first interior index
        if kind in ("outflow", "neumann"):
            if value is None:
                a = a.at[take(ghost)].set(
                    jnp.broadcast_to(a[take(slice(first_int, first_int + 1))],
                                     a[take(ghost)].shape))
            else:
                # only the first ghost zone carries the gradient value
                a = a.at[take(first_int - 1)].set(a[take(first_int)] -
                                                  dxy * value)
        elif kind == "reflect-even":
            a = a.at[take(ghost)].set(
                jnp.flip(a[take(slice(ng, 2 * ng))], axis=axis))
        elif kind in ("reflect-odd", "dirichlet"):
            if value is None:
                a = a.at[take(ghost)].set(
                    -jnp.flip(a[take(slice(ng, 2 * ng))], axis=axis))
            else:
                a = a.at[take(first_int - 1)].set(2.0 * value -
                                                  a[take(first_int)])
        elif kind == "periodic":
            n_int = n_tot - 2 * ng
            a = a.at[take(ghost)].set(a[take(slice(n_int, n_int + ng))])
    else:
        hi = n_tot - ng - 1               # last interior index
        ghost = slice(hi + 1, n_tot)
        if kind in ("outflow", "neumann"):
            if value is None:
                a = a.at[take(ghost)].set(
                    jnp.broadcast_to(a[take(slice(hi, hi + 1))],
                                     a[take(ghost)].shape))
            else:
                a = a.at[take(hi + 1)].set(a[take(hi)] + dxy * value)
        elif kind == "reflect-even":
            a = a.at[take(ghost)].set(
                jnp.flip(a[take(slice(hi - ng + 1, hi + 1))], axis=axis))
        elif kind in ("reflect-odd", "dirichlet"):
            if value is None:
                a = a.at[take(ghost)].set(
                    -jnp.flip(a[take(slice(hi - ng + 1, hi + 1))], axis=axis))
            else:
                a = a.at[take(hi + 1)].set(2.0 * value - a[take(hi)])
        elif kind == "periodic":
            a = a.at[take(ghost)].set(a[take(slice(ng, 2 * ng))])
    return a


def fill_ghost(a, g, bc):
    """Fill all four ghost strips of a (..., qx, qy) array per a BC spec.

    Pure function: returns a new array.  x boundaries are filled before y so
    the y fill sweeps full rows (ghost corners included), matching the
    reference's ordering (array_indexer.py:164-274).
    """
    a = _edge_fill(a, g, -2, 0, bc.xlb, bc.xl_value, g.dx)
    a = _edge_fill(a, g, -2, 1, bc.xrb, bc.xr_value, g.dx)
    a = _edge_fill(a, g, -1, 0, bc.ylb, bc.yl_value, g.dy)
    a = _edge_fill(a, g, -1, 1, bc.yrb, bc.yr_value, g.dy)
    return a


def _edge_fill_fc(a, g, axis, side, kind, idir):
    """Periodic ghost fill for face-centered data along one boundary.

    Face-centered arrays have qx+1 (idir=1) or qy+1 (idir=2) points on the
    face axis; on that axis the two domain-boundary faces are the same face
    under periodicity (reference array_indexer.py:429-492).
    """
    if kind != "periodic":
        raise NotImplementedError(
            f"BC '{kind}' not implemented for face-centered data")
    ng = g.ng
    on_face_axis = (axis == -2 and idir == 1) or (axis == -1 and idir == 2)
    n_tot = a.shape[axis]
    n_int = n_tot - 2 * ng  # nx+1 on the face axis, nx otherwise

    def take(sl):
        idx = [slice(None)] * a.ndim
        idx[axis] = sl
        return tuple(idx)

    if side == 0:
        # ghosts 0..ng-1 <- interior wrap (same formula either axis kind)
        src_lo = n_int - 1 if on_face_axis else n_int
        a = a.at[take(slice(0, ng))].set(a[take(slice(src_lo, src_lo + ng))])
    else:
        if on_face_axis:
            # ghosts hi+2..end <- ng..2ng-1 ; the hi+1 face IS the lo face
            a = a.at[take(slice(n_tot - ng, n_tot))].set(
                a[take(slice(ng + 1, 2 * ng + 1))])
        else:
            a = a.at[take(slice(n_tot - ng, n_tot))].set(
                a[take(slice(ng, 2 * ng))])
    return a


def fill_ghost_fc(a, g, bc, idir):
    """Ghost fill for face-centered data (periodic only, like the reference)."""
    a = _edge_fill_fc(a, g, -2, 0, bc.xlb, idir)
    a = _edge_fill_fc(a, g, -2, 1, bc.xrb, idir)
    a = _edge_fill_fc(a, g, -1, 0, bc.ylb, idir)
    a = _edge_fill_fc(a, g, -1, 1, bc.yrb, idir)
    return a
