"""Cell- and face-centered state containers.

The reference's mutable CellCenterData2d (/root/reference/pyro/mesh/patch.py:
315-794) becomes a thin stateful shell around an immutable jnp stack of shape
(nvar, qx, qy): registration/metadata live on the Python object, while every
numeric operation (ghost fill, restrict, prolong) is a pure function over the
stack so solvers can close over the metadata and jit the math.
"""

import h5py
import jax.numpy as jnp
import numpy as np

import pyro2_tpu.mesh.boundary as bnd
from pyro2_tpu.defaults import dtype as _default_dtype
from pyro2_tpu.mesh.indexer import ai, aifc, fill_ghost, fill_ghost_fc

__all__ = ["CellCenterData2d", "FaceCenterData2d", "cell_center_data_clone",
           "restrict_array", "prolong_array"]


# ---------------------------------------------------------------------------
# pure transfer operators (shared with multigrid)
# ---------------------------------------------------------------------------

def restrict_array(fdata, fgrid, cgrid, N=2):
    """Average a fine (..., qx, qy) array onto the factor-N coarser grid.

    Conservative box average (reference patch.py:640-676).  Ghost zones of
    the result are zero.
    """
    f = ai(fdata, fgrid)
    if N == 2:
        avg = 0.25 * (f.v(s=2) + f.ip(1, s=2) + f.jp(1, s=2)
                      + f.ip_jp(1, 1, s=2))
    elif N == 4:
        avg = sum(f.ip_jp(i, j, s=4) for i in range(4)
                  for j in range(4)) / 16.0
    else:
        raise ValueError("restriction is only allowed by 2 or 4")
    out_shape = fdata.shape[:-2] + (cgrid.qx, cgrid.qy)
    cdata = jnp.zeros(out_shape, dtype=fdata.dtype)
    return cdata.at[..., cgrid.ilo:cgrid.ihi + 1,
                    cgrid.jlo:cgrid.jhi + 1].set(avg)


def prolong_array(cdata, cgrid, fgrid):
    """Bilinear-with-centered-slopes prolongation to the 2x finer grid.

    Each coarse zone's reconstruction f(x,y) = <f> + m_x x/dx + m_y y/dy is
    averaged over its 4 children (reference patch.py:678-736).  Ghosts zero.
    """
    c = ai(cdata, cgrid)
    m_x = 0.5 * (c.ip(1) - c.ip(-1))
    m_y = 0.5 * (c.jp(1) - c.jp(-1))

    out_shape = cdata.shape[:-2] + (fgrid.qx, fgrid.qy)
    fdata = jnp.zeros(out_shape, dtype=cdata.dtype)
    ilo, ihi = fgrid.ilo, fgrid.ihi
    jlo, jhi = fgrid.jlo, fgrid.jhi
    cv = c.v()
    for di, dj, sx, sy in ((0, 0, -1, -1), (1, 0, 1, -1),
                           (0, 1, -1, 1), (1, 1, 1, 1)):
        fdata = fdata.at[..., ilo + di:ihi + 1:2, jlo + dj:jhi + 1:2].set(
            cv + 0.25 * sx * m_x + 0.25 * sy * m_y)
    return fdata


# ---------------------------------------------------------------------------
# cell-centered container
# ---------------------------------------------------------------------------

class CellCenterData2d:
    """Multi-variable cell-centered state on a ghost-cell grid.

    Built in the same multi-step way as the reference: register variables
    (each with its BC), set aux scalars, then `create()` to allocate the
    (nvar, qx, qy) stack.  After creation the stack is an immutable jnp
    array; `set_var`/`fill_BC` replace it functionally.
    """

    def __init__(self, grid, *, dtype=None):
        self.grid = grid
        self.dtype = dtype if dtype is not None else _default_dtype()
        self.data = None

        self.names = []
        self.vars = self.names  # backwards-compatible alias
        self.nvar = 0
        self.ivars = []

        self.aux = {}
        self.derives = []
        self.BCs = {}

        self.t = -1.0
        self.initialized = 0

    # -- setup --------------------------------------------------------------
    def register_var(self, name, bc):
        if self.initialized == 1:
            raise RuntimeError("ERROR: grid already initialized")
        self.names.append(name)
        self.nvar += 1
        self.BCs[name] = bc

    def set_aux(self, keyword, value):
        self.aux[keyword] = value

    def get_aux(self, keyword):
        return self.aux.get(keyword, None)

    def add_derived(self, func):
        """Register a derived-variable callback f(ccdata, name) -> array."""
        self.derives.append(func)

    def add_ivars(self, ivars):
        self.ivars = ivars

    def create(self):
        if self.initialized == 1:
            raise RuntimeError("ERROR: grid already initialized")
        self.data = jnp.zeros((self.nvar, self.grid.qx, self.grid.qy),
                              dtype=self.dtype)
        self.initialized = 1

    # -- access -------------------------------------------------------------
    def get_var(self, name):
        """The (qx, qy) array for a stored or derived variable.

        A list of names queries the derived-variable callbacks directly
        (e.g. ["velocity", "soundspeed"] -> [u, v, cs]).
        """
        if not isinstance(name, str):
            for f in self.derives:
                var = f(self, name)
                if var is not None and len(var) > 0:
                    return var
            raise KeyError(f"names {name} are not valid")
        try:
            n = self.names.index(name)
        except ValueError:
            for f in self.derives:
                var = f(self, name)
                if var is not None and len(var) > 0:
                    return var
            raise KeyError(f"name {name} is not valid") from None
        return self.data[n]

    def get_var_by_index(self, n):
        return self.data[n]

    def get_vars(self):
        """The full (nvar, qx, qy) stack."""
        return self.data

    def get_ai(self, name):
        """Stencil-view wrapper for a variable (convenience)."""
        return ai(self.get_var(name), self.grid)

    def set_var(self, name, arr):
        """Replace a variable's full (qx, qy) array (functional update)."""
        n = self.names.index(name)
        self.data = self.data.at[n].set(jnp.asarray(arr, dtype=self.dtype))

    def set_vars(self, stack):
        """Replace the full (nvar, qx, qy) stack."""
        self.data = jnp.asarray(stack, dtype=self.dtype)

    def zero(self, name):
        n = self.names.index(name)
        self.data = self.data.at[n].set(0.0)

    def min(self, name, *, ng=0):
        n = self.names.index(name)
        return float(jnp.min(ai(self.data[n], self.grid).v(buf=ng)))

    def max(self, name, *, ng=0):
        n = self.names.index(name)
        return float(jnp.max(ai(self.data[n], self.grid).v(buf=ng)))

    # -- ghost filling ------------------------------------------------------
    def fill_BC(self, name):
        """Fill one variable's ghosts (standard + any extended BC types)."""
        n = self.names.index(name)
        bc = self.BCs[name]
        self.data = self.data.at[n].set(
            fill_ghost(self.data[n], self.grid, bc))
        for edge in ("xlb", "xrb", "ylb", "yrb"):
            btype = getattr(bc, edge)
            if btype in bnd.ext_bcs:
                self.data = bnd.ext_bcs[btype](btype, edge, name, self,
                                               self.data)

    def fill_BC_all(self):
        for name in self.names:
            self.fill_BC(name)

    def fill_bc_stack(self, stack, t=None):
        """Pure ghost fill of an externally-held stack (for jitted solvers).

        Applies each variable's standard BC, then any extended BCs, without
        touching self.data.  `t` overrides the container time for
        time-dependent custom BCs (e.g. "ramp").
        """
        old_t = self.t
        if t is not None:
            self.t = t
        try:
            for n, name in enumerate(self.names):
                bc = self.BCs[name]
                stack = stack.at[n].set(fill_ghost(stack[n], self.grid, bc))
                for edge in ("xlb", "xrb", "ylb", "yrb"):
                    btype = getattr(bc, edge)
                    if btype in bnd.ext_bcs:
                        stack = bnd.ext_bcs[btype](btype, edge, name, self,
                                                   stack)
        finally:
            self.t = old_t
        return stack

    # -- coarsen / refine ---------------------------------------------------
    def restrict(self, varname, N=2):
        """Conservatively restrict one variable to a factor-N coarser grid."""
        cgrid = self.grid.coarse_like(N)
        return restrict_array(self.get_var(varname), self.grid, cgrid, N)

    def prolong(self, varname):
        """Prolong one variable to a 2x finer grid."""
        fgrid = self.grid.fine_like(2)
        return prolong_array(self.get_var(varname), self.grid, fgrid)

    def pretty_print(self, varname, fmt=None):
        """Print one variable with ghost cells marked (reference
        patch.py:736-741)."""
        ai(self.get_var(varname), self.grid).pretty_print(fmt=fmt)

    # -- I/O ----------------------------------------------------------------
    def write(self, filename):
        """Write grid + state to an HDF5 file (reference-compatible layout)."""
        if not filename.endswith(".h5"):
            filename += ".h5"
        with h5py.File(filename, "w") as f:
            self.write_data(f)

    def write_data(self, f):
        gaux = f.create_group("aux")
        for k, v in self.aux.items():
            gaux.attrs[k] = v

        ggrid = f.create_group("grid")
        for att in ("nx", "ny", "ng", "xmin", "xmax", "ymin", "ymax"):
            ggrid.attrs[att] = getattr(self.grid, att)
        if hasattr(self.grid, "coord_type"):
            ggrid.attrs["coord_type"] = self.grid.coord_type

        gstate = f.create_group("state")
        for n, name in enumerate(self.names):
            gvar = gstate.create_group(name)
            gvar.create_dataset(
                "data", data=np.asarray(ai(self.data[n], self.grid).v()))
            for edge in ("xlb", "xrb", "ylb", "yrb"):
                gvar.attrs[edge[:2] + "b"] = getattr(self.BCs[name], edge)

    def __str__(self):
        if self.initialized == 0:
            return "CellCenterData2d object not yet initialized"
        g = self.grid
        s = (f"cc data: nx = {g.nx}, ny = {g.ny}, ng = {g.ng}\n"
             f"         nvars = {self.nvar}\n         variables:\n")
        for name in self.names:
            b = self.BCs[name]
            s += (f"{name:>16s}: min: {self.min(name):15.10f}    "
                  f"max: {self.max(name):15.10f}\n")
            s += (f"{' ':>16s}  BCs: -x: {b.xlb:12s} +x: {b.xrb:12s}"
                  f" -y: {b.ylb:12s} +y: {b.yrb:12s}\n")
        return s


class FaceCenterData2d(CellCenterData2d):
    """Face-centered state: one extra point in the idir direction."""

    def __init__(self, grid, idir, dtype=None):
        super().__init__(grid, dtype=dtype)
        self.idir = idir

    def add_derived(self, func):
        raise NotImplementedError(
            "derived variables not supported for face-centered data")

    def create(self):
        if self.initialized == 1:
            raise RuntimeError("ERROR: grid already initialized")
        if self.idir == 1:
            shape = (self.nvar, self.grid.qx + 1, self.grid.qy)
        else:
            shape = (self.nvar, self.grid.qx, self.grid.qy + 1)
        self.data = jnp.zeros(shape, dtype=self.dtype)
        self.initialized = 1

    def get_ai(self, name):
        return aifc(self.get_var(name), self.grid, self.idir)

    def fill_BC(self, name):
        n = self.names.index(name)
        bc = self.BCs[name]
        for edge in ("xlb", "xrb", "ylb", "yrb"):
            if getattr(bc, edge) in bnd.ext_bcs:
                raise NotImplementedError(
                    "custom BCs not supported for face-centered data")
        self.data = self.data.at[n].set(
            fill_ghost_fc(self.data[n], self.grid, bc, self.idir))

    def restrict(self, varname, N=2):
        raise NotImplementedError(
            "restriction not implemented for FaceCenterData2d")

    def prolong(self, varname):
        raise NotImplementedError(
            "prolongation not implemented for FaceCenterData2d")

    def write_data(self, f):
        gstate = f.create_group("face-centered-state")
        for n, name in enumerate(self.names):
            gvar = gstate.create_group(name)
            gvar.create_dataset(
                "data",
                data=np.asarray(aifc(self.data[n], self.grid, self.idir).v()))
            for edge in ("xlb", "xrb", "ylb", "yrb"):
                gvar.attrs[edge[:2] + "b"] = getattr(self.BCs[name], edge)


def cell_center_data_clone(old):
    """Deep-copy a CellCenterData2d (BCs, aux, derives, data, time)."""
    if not isinstance(old, CellCenterData2d):
        raise TypeError("Can't clone object")
    new = type(old)(old.grid, dtype=old.dtype)
    for name in old.names:
        new.register_var(name, old.BCs[name])
    new.create()
    new.aux = old.aux.copy()
    new.data = old.data
    new.derives = old.derives.copy()
    new.ivars = old.ivars
    new.t = old.t
    return new
