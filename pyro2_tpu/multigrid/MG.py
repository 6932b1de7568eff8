"""Constant-coefficient cell-centered multigrid for (alpha - beta L) phi = f.

TPU-native re-design of the reference CellCenterMG2d
(/root/reference/pyro/multigrid/MG.py:77-778):

* the level list (2x2 ... NxN, each a static Grid2d + BC pair) is fixed at
  construction; per-level state (v, f) are plain jnp arrays;
* one complete V-cycle is a *pure jitted function* -- the recursion over
  levels unrolls at trace time into a single XLA program, so a solve is
  num_cycles kernel launches instead of thousands of tiny ops;
* red-black Gauss-Seidel becomes two masked half-sweeps per iteration
  (checkerboard select), arithmetically identical to the reference's
  4-color strided scheme: colors (0,0)/(1,1) are the red set, (1,0)/(0,1)
  the black set, with a ghost fill between half-sweeps (MG.py:544-599);
* the bottom solve is nsmooth_bottom smoothing iterations on the 2x2 level;
* all *numeric* per-instance data (alpha/beta scalars, coefficient
  hierarchies in subclasses) flow through a traced `params` pytree, and the
  compiled V-cycle is cached globally keyed on the static configuration --
  so solvers that construct a fresh MG object every timestep (as the
  reference does, e.g. diffusion/simulation.py:92-118) reuse one executable.

Subclasses (variable/general coefficients) override `_smooth_once`,
`_residual`, and `_params`.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

import pyro2_tpu.mesh.boundary as bnd
from pyro2_tpu.mesh.grid import Grid2d
from pyro2_tpu.mesh.indexer import ai, fill_ghost
from pyro2_tpu.mesh.patch import prolong_array, restrict_array
from pyro2_tpu.util import msg

__all__ = ["CellCenterMG2d"]

# compiled-V-cycle cache: static config key -> jitted fn(v, f, params)
_CYCLE_CACHE = {}

# test hook: build the fused Pallas cycle in interpret mode on any backend
_FORCE_PALLAS_INTERPRET = False


class _MGDataShim:
    """Minimal CellCenterData2d stand-in for extended-BC dispatch on the
    MG solution variable."""

    def __init__(self, grid):
        self.grid = grid
        self.names = ["v"]
        self.aux = {}
        self.t = 0.0

    def get_aux(self, key):
        return self.aux.get(key, None)


class CellCenterMG2d:
    """Multigrid solve of (alpha - beta L) phi = f on a square 2^m grid."""

    def __init__(self, nx, ny, ng=1,
                 xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0,
                 xl_BC_type="dirichlet", xr_BC_type="dirichlet",
                 yl_BC_type="dirichlet", yr_BC_type="dirichlet",
                 xl_BC=None, xr_BC=None, yl_BC=None, yr_BC=None,
                 alpha=0.0, beta=-1.0,
                 nsmooth=10, nsmooth_bottom=50,
                 verbose=0, aux_field=None, aux_bc=None,
                 true_function=None, vis=0, vis_title=""):
        if nx != ny:
            raise ValueError("ERROR: multigrid currently requires nx = ny")
        if (xmax - xmin) != (ymax - ymin):
            raise ValueError(
                "ERROR: multigrid currently requires a square domain")

        self.nx = nx
        self.ny = ny
        self.ng = ng
        self.xmin, self.xmax = xmin, xmax
        self.ymin, self.ymax = ymin, ymax

        self.alpha = alpha
        self.beta = beta
        self.nsmooth = nsmooth
        self.nsmooth_bottom = nsmooth_bottom
        self.max_cycles = 100
        self.verbose = verbose
        self.true_function = true_function
        self.vis = vis
        self.vis_title = vis_title

        self.small = 1.e-16
        self.initialized_rhs = 0

        # levels: index 0 is the 2x2 coarsest, nlevels-1 the finest
        self.nlevels = int(math.log(self.nx) / math.log(2.0))

        self.grids = []        # Grid2d per level
        self.bc = bnd.BC(xlb=xl_BC_type, xrb=xr_BC_type,
                         ylb=yl_BC_type, yrb=yr_BC_type)
        self.bc_v = []         # the v-variable BC per level (fine may be
                               # inhomogeneous; coarse levels homogeneous)

        nx_t = ny_t = 2
        for i in range(self.nlevels):
            g = Grid2d(nx_t, ny_t, ng=self.ng,
                       xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax)
            self.grids.append(g)
            if i == self.nlevels - 1:
                self.bc_v.append(bnd.BC(
                    xlb=xl_BC_type, xrb=xr_BC_type,
                    ylb=yl_BC_type, yrb=yr_BC_type,
                    xl_func=xl_BC, xr_func=xr_BC,
                    yl_func=yl_BC, yr_func=yr_BC, grid=g))
            else:
                self.bc_v.append(self.bc)
            nx_t *= 2
            ny_t *= 2

        # per-level state
        self.v = [g.scratch_array() for g in self.grids]
        self.f = [g.scratch_array() for g in self.grids]
        self.r = [g.scratch_array() for g in self.grids]

        # aux fields (hooks for subclasses; stored per level by name)
        self.aux = {}
        if aux_field is not None:
            for name in aux_field:
                self.aux[name] = [g.scratch_array() for g in self.grids]
        self.aux_bc = dict(zip(aux_field or [], aux_bc or []))

        # checkerboard masks per level ((i+j) parity measured from ilo/jlo,
        # over the full padded array so ghost cells never get selected)
        self._red_masks = []
        self._black_masks = []
        for g in self.grids:
            ii = np.arange(g.qx)[:, None] - g.ilo
            jj = np.arange(g.qy)[None, :] - g.jlo
            interior = ((ii >= 0) & (ii < g.nx) & (jj >= 0) & (jj < g.ny))
            red = ((ii + jj) % 2 == 0) & interior
            black = ((ii + jj) % 2 == 1) & interior
            self._red_masks.append(jnp.asarray(red))
            self._black_masks.append(jnp.asarray(black))

        # solution-mesh conveniences (reference MG.py:258-276)
        soln_grid = self.grids[self.nlevels - 1]
        self.soln_grid = soln_grid
        self.ilo, self.ihi = soln_grid.ilo, soln_grid.ihi
        self.jlo, self.jhi = soln_grid.jlo, soln_grid.jhi
        self.x, self.dx, self.x2d = soln_grid.x, soln_grid.dx, soln_grid.x2d
        self.y, self.dy, self.y2d = soln_grid.y, soln_grid.dy, soln_grid.y2d

        self.source_norm = 0.0
        self.num_cycles = 0
        self.residual_error = 1.e33
        self.relative_error = 1.e33

    # ------------------------------------------------------------------
    # state initialization / access
    # ------------------------------------------------------------------
    def init_solution(self, data):
        """Set the initial guess for phi on the finest level."""
        data = jnp.asarray(data)
        expect = (self.soln_grid.qx, self.soln_grid.qy)
        if data.shape != expect:
            raise ValueError(
                f"solution shape {data.shape} does not match the MG "
                f"solution grid {expect}")
        self.v[-1] = data

    def init_zeros(self):
        """Zero the initial guess."""
        self.v[-1] = jnp.zeros_like(self.v[-1])

    def init_RHS(self, data):
        """Set the RHS f on the finest level and record its norm."""
        data = jnp.asarray(data)
        expect = (self.soln_grid.qx, self.soln_grid.qy)
        if data.shape != expect:
            raise ValueError(
                f"RHS shape {data.shape} does not match the MG solution "
                f"grid {expect} (build the RHS on mg.soln_grid)")
        self.f[-1] = data
        self.source_norm = float(ai(self.f[-1], self.soln_grid).norm())
        if self.verbose:
            print("Source norm = ", self.source_norm)
        self.initialized_rhs = 1

    def get_solution(self, grid=None):
        """The solution phi (optionally copied onto a same-spacing grid)."""
        v = self.v[-1]
        if grid is None:
            return v
        myg = self.soln_grid
        assert grid.dx == myg.dx and grid.dy == myg.dy
        sol = grid.scratch_array()
        return sol.at[grid.ilo - 1:grid.ihi + 2,
                      grid.jlo - 1:grid.jhi + 2].set(
            ai(v, myg).v(buf=1))

    def get_solution_gradient(self, grid=None):
        """Centered-difference gradient of the solution, (gx, gy)."""
        myg = self.soln_grid
        og = grid if grid is not None else myg
        assert og.dx == myg.dx and og.dy == myg.dy

        vv = ai(self.v[-1], myg)
        gx_v = 0.5 * (vv.ip(1) - vv.ip(-1)) / myg.dx
        gy_v = 0.5 * (vv.jp(1) - vv.jp(-1)) / myg.dy

        gx = og.scratch_array()
        gy = og.scratch_array()
        gx = gx.at[og.ilo:og.ihi + 1, og.jlo:og.jhi + 1].set(gx_v)
        gy = gy.at[og.ilo:og.ihi + 1, og.jlo:og.jhi + 1].set(gy_v)
        return gx, gy

    def get_solution_object(self):
        """A CellCenterData2d view of the finest level (v, f, r)."""
        from pyro2_tpu.mesh.patch import CellCenterData2d
        d = CellCenterData2d(self.soln_grid)
        d.register_var("v", self.bc_v[-1])
        d.register_var("f", self.bc)
        d.register_var("r", self.bc)
        d.create()
        d.set_var("v", self.v[-1])
        d.set_var("f", self.f[-1])
        d.set_var("r", self.r[-1])
        return d

    def grid_info(self, level, indent=0):
        print("{}level: {}, grid: {} x {}".format(
            indent * " ", level, self.grids[level].nx, self.grids[level].ny))

    # ------------------------------------------------------------------
    # the numeric core (pure functions; all per-instance numerics flow
    # through `params` so the compiled cycle is shareable across instances)
    # ------------------------------------------------------------------
    def _params(self):
        """The traced parameter pytree for the V-cycle."""
        return {"alpha": jnp.asarray(self.alpha),
                "beta": jnp.asarray(self.beta)}

    def _cycle_key(self):
        """Static config identifying the compiled V-cycle."""
        return (type(self), tuple(self.grids), tuple(self.bc_v),
                self.nsmooth, self.nsmooth_bottom)

    def _fill_v(self, level, v):
        v = fill_ghost(v, self.grids[level], self.bc_v[level])
        # extended BC types (e.g. "moving_lid") registered via define_bc:
        # dispatch with a minimal ccdata shim whose single variable is "v"
        # (matching the reference's MG-level fill_BC("v"))
        bc = self.bc_v[level]
        for edge in ("xlb", "xrb", "ylb", "yrb"):
            btype = getattr(bc, edge)
            if btype in bnd.ext_bcs:
                shim = _MGDataShim(self.grids[level])
                stack = bnd.ext_bcs[btype](btype, edge, "v", shim, v[None])
                v = stack[0]
        return v

    def _residual(self, level, v, f, params):
        """r = f - alpha v + beta L v over the valid region (ghosts zero)."""
        g = self.grids[level]
        alpha, beta = params["alpha"], params["beta"]
        vv = ai(v, g)
        lap = ((vv.ip(-1) + vv.ip(1) - 2.0 * vv.v()) / g.dx ** 2 +
               (vv.jp(-1) + vv.jp(1) - 2.0 * vv.v()) / g.dy ** 2)
        r_v = ai(f, g).v() - alpha * vv.v() + beta * lap
        r = jnp.zeros_like(v)
        return r.at[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1].set(r_v)

    def _smooth_once(self, level, v, f, params):
        """One red-black Gauss-Seidel iteration (ghosts filled on entry)."""
        g = self.grids[level]
        alpha, beta = params["alpha"], params["beta"]
        xcoeff = beta / g.dx ** 2
        ycoeff = beta / g.dy ** 2
        denom = alpha + 2.0 * xcoeff + 2.0 * ycoeff

        def half_sweep(v, mask):
            vv = ai(v, g)
            # compute the GS update everywhere, select the color set
            upd = (ai(f, g).v() +
                   xcoeff * (vv.ip(1) + vv.ip(-1)) +
                   ycoeff * (vv.jp(1) + vv.jp(-1))) / denom
            full = jnp.zeros_like(v)
            full = full.at[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1].set(upd)
            return jnp.where(mask, full, v)

        v = half_sweep(v, self._red_masks[level])
        v = self._fill_v(level, v)
        v = half_sweep(v, self._black_masks[level])
        v = self._fill_v(level, v)
        return v

    def _smooth_n(self, level, v, f, n, params):
        # lax.fori_loop keeps the traced graph small (one body per level
        # instead of n unrolled sweeps) -- important for compile time
        v = self._fill_v(level, v)
        return jax.lax.fori_loop(
            0, n, lambda _, vv: self._smooth_once(level, vv, f, params), v)

    def smooth(self, level, nsmooth):
        """Public smoothing entry (host-side; used by tests/examples)."""
        self.v[level] = self._smooth_n(level, self.v[level], self.f[level],
                                       nsmooth, self._params())

    def _v_cycle(self, level, v, f, params):
        """Pure recursive V-cycle; unrolls over levels at trace time."""
        if level > 0:
            g_f = self.grids[level]
            g_c = self.grids[level - 1]

            v = self._smooth_n(level, v, f, self.nsmooth, params)
            r = self._residual(level, v, f, params)

            f_c = restrict_array(r, g_f, g_c)
            v_c = jnp.zeros_like(f_c)
            v_c = self._v_cycle(level - 1, v_c, f_c, params)

            e = prolong_array(v_c, g_c, g_f)
            v = v.at[g_f.ilo:g_f.ihi + 1, g_f.jlo:g_f.jhi + 1].add(
                ai(e, g_f).v())
            v = self._fill_v(level, v)
            v = self._smooth_n(level, v, f, self.nsmooth, params)
            return v
        # bottom solve: just smooth the 2x2 problem hard
        v = self._smooth_n(level, v, f, self.nsmooth_bottom, params)
        return self._fill_v(level, v)

    def _build_cycle(self, force_jnp=False):
        # on TPU, eligible configurations use the fused Pallas V-cycle
        # (3 kernel dispatches/cycle instead of ~2000 small XLA ops --
        # see multigrid/pallas_mg.py); anything else falls back to the
        # jnp cycle below.  force_jnp skips the fused path (benchmarks
        # use it to measure the jnp cycle for contrast).
        if not force_jnp and (jax.default_backend() == "tpu" or
                              _FORCE_PALLAS_INTERPRET):
            try:
                from pyro2_tpu.multigrid import pallas_mg
                return pallas_mg.build_fused_cycle(
                    self, interpret=_FORCE_PALLAS_INTERPRET)
            except pallas_mg.Ineligible:
                pass
            except Exception as e:      # Mosaic/compile failure: fall back
                if self.verbose:
                    print(f"fused MG kernel unavailable ({e}); "
                          "using the jnp V-cycle")

        nlev = self.nlevels - 1
        g = self.soln_grid

        def one_cycle(v, f, params):
            v = self._v_cycle(nlev, v, f, params)
            r = self._residual(nlev, v, f, params)
            rnorm = ai(r, g).norm()
            return v, r, rnorm

        return jax.jit(one_cycle)

    def _build_solve(self):
        """The whole solve -- V-cycles + convergence/stall tests -- as ONE
        jitted program (lax.while_loop over the compiled cycle), so a solve
        is a single dispatch instead of a host round trip per cycle.
        Semantics match the host loop in `solve` exactly."""
        key = self._cycle_key()
        cycle_fn = _CYCLE_CACHE.get(key)
        if cycle_fn is None:
            cycle_fn = self._build_cycle()
            _CYCLE_CACHE[key] = cycle_fn

        g = self.soln_grid
        nlev = self.nlevels - 1
        max_cycles = self.max_cycles
        small = self.small

        def interior_norm(a):
            return jnp.sqrt(g.dx * g.dy * jnp.sum(
                a[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1] ** 2))

        def full_solve(v0, f, params, rtol, source_norm):
            dt = v0.dtype
            denom = jnp.where(source_norm != 0.0, source_norm,
                              jnp.asarray(1.0, dt))
            big = jnp.asarray(1.e33, dt)

            def cond(c):
                v, r, res, rel, cycle, stall = c
                return (res > rtol) & (cycle <= max_cycles) & (stall < 2)

            def body(c):
                v, r, res, rel, cycle, stall = c
                v2, r2, rnorm = cycle_fn(v, f, params)
                new = (rnorm / denom).astype(dt)
                rel = interior_norm((v2 - v) / (v2 + small)).astype(dt)
                stall = jnp.where(new > 0.95 * res, stall + 1, 0)
                return (v2, r2, new, rel, cycle + 1, stall)

            c0 = (v0, jnp.zeros_like(v0), big, big,
                  jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32))
            v, r, res, rel, cycle, _ = jax.lax.while_loop(cond, body, c0)
            return self._fill_v(nlev, v), r, res, rel, cycle - 1

        return jax.jit(full_solve)

    # ------------------------------------------------------------------
    # driver
    # ------------------------------------------------------------------
    def solve(self, rtol=1.e-11):
        """V-cycle until ||r||/||f|| < rtol (or max_cycles)."""
        if not self.initialized_rhs:
            msg.fail("ERROR: RHS not initialized")

        if not self.verbose:
            # non-verbose (the solver hot path): the entire solve is one
            # jitted dispatch
            skey = ("solve",) + self._cycle_key()
            solve_fn = _CYCLE_CACHE.get(skey)
            if solve_fn is None:
                solve_fn = self._build_solve()
                _CYCLE_CACHE[skey] = solve_fn
            dt = self.v[-1].dtype
            v, r, res, rel, ncyc = solve_fn(
                self.v[-1], self.f[-1], self._params(),
                jnp.asarray(rtol, dt), jnp.asarray(self.source_norm, dt))
            self.v[-1] = v
            self.r[-1] = r
            self.num_cycles = int(ncyc)
            self.residual_error = float(res)
            self.relative_error = float(rel)
            return

        print("source norm = ", self.source_norm)

        key = self._cycle_key()
        cycle_fn = _CYCLE_CACHE.get(key)
        if cycle_fn is None:
            cycle_fn = self._build_cycle()
            _CYCLE_CACHE[key] = cycle_fn
        params = self._params()

        old_phi = self.v[-1]
        g = self.soln_grid

        residual_error = 1.e33
        relative_error = 1.e33
        cycle = 1
        n_stalled = 0
        while residual_error > rtol and cycle <= self.max_cycles:
            v, r, rnorm = cycle_fn(self.v[-1], self.f[-1], params)
            self.v[-1] = v
            self.r[-1] = r

            diff = (v - old_phi) / (v + self.small)
            relative_error = float(ai(diff, g).norm())
            old_phi = v

            rnorm = float(rnorm)
            prev_residual_error = residual_error
            if self.source_norm != 0.0:
                residual_error = rnorm / self.source_norm
            else:
                residual_error = rnorm

            if self.verbose:
                print(f"cycle {cycle}: relative err = {relative_error}, "
                      f"residual err = {residual_error}\n")
            cycle += 1

            # stall detection: once the residual reaches the working
            # dtype's roundoff floor it stops contracting (ratio ~1); a
            # healthy V-cycle contracts ~10x/cycle, so two consecutive
            # near-flat cycles mean further work is wasted (this is how
            # f32 TPU solves avoid burning max_cycles against an
            # f64-calibrated rtol)
            if residual_error > 0.95 * prev_residual_error:
                n_stalled += 1
                if n_stalled >= 2:
                    if self.verbose:
                        print(f"MG stalled at residual err "
                              f"{residual_error:.3e} (cycle {cycle - 1}); "
                              "at the working-precision floor")
                    break
            else:
                n_stalled = 0

        self.num_cycles = cycle - 1
        self.relative_error = relative_error
        self.residual_error = residual_error
        self.v[-1] = self._fill_v(self.nlevels - 1, self.v[-1])
