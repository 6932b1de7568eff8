"""Block-partitioned SPMD multigrid over a device mesh.

The distributed analog of the CellCenterMG2d family (SURVEY.md section 2.9:
the reference, /root/reference/pyro/multigrid/MG.py:77-778,
variable_coeff_MG.py:24-213, general_MG.py:27-242, is strictly
single-process; this layer is new).  Design:

* every level whose per-device block is at least 2x2 stays block-partitioned:
  the red-black half sweeps, residual, restrict and prolong all run on the
  local padded block, with `halo_exchange` (ppermute rings + domain-edge
  physical fills) replacing the serial ghost fill between color sweeps --
  the identical update stencil in the identical order, so a sharded solve is
  partition-invariant vs the serial solve to FP roundoff;
* below the crossover the remaining residual blocks are `all_gather`ed into
  a replicated global coarse problem and the SERIAL V-cycle recursion
  (CellCenterMG2d._v_cycle) runs identically on every device -- redundant
  compute on tiny grids is far cheaper than latency-bound 2x2 halo traffic;
  each device then dynamic-slices its own padded block of the correction
  back out;
* one full sharded V-cycle + residual + psum'd norm is a single jitted
  shard_map program, cached per static configuration like the serial cycle;
* the OPERATOR MATH is not duplicated: a duck-typed `_LocalMGOps` object
  exposes block-local `grids`/`_red_masks`/`_fill_v` (halo exchange) and
  borrows the serial class's `_smooth_once`/`_smooth_n`/`_residual`
  unchanged, so the const-coeff, variable-coeff, and general operators all
  shard through the same machinery.

Per-level numeric data (variable coefficients) is carried in a
"block-padded layout": for each sharded level, an array of shape
(px*(bx+2ng), py*(by+2ng)) sharded P("x","y") whose per-device shard IS
that device's local padded coefficient block (interior-neighbor values in
the ghost slots, physical coefficient ghosts on domain-edge blocks) --
computed once at construction from the serial hierarchy.

Supported BCs: the standard homogeneous kinds (dirichlet / neumann /
outflow / reflect-* / periodic).  Inhomogeneous BC functions and
user-registered extended BCs are not supported in the sharded path
(constructors raise).
"""


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pyro2_tpu.mesh.grid import Grid2d
from pyro2_tpu.mesh.patch import prolong_array, restrict_array
from pyro2_tpu.multigrid.MG import CellCenterMG2d
from pyro2_tpu.multigrid.general_MG import GeneralMG2d
from pyro2_tpu.multigrid.variable_coeff_MG import VarCoeffCCMG2d
from pyro2_tpu.parallel.mesh_comm import halo_exchange
from pyro2_tpu.util import msg

__all__ = ["ShardedMG", "ShardedVarCoeffMG", "ShardedGeneralMG"]

_SUPPORTED_BCS = frozenset(
    ["outflow", "neumann", "dirichlet", "reflect-odd", "reflect-even",
     "periodic"])

# compiled sharded-cycle cache: static config -> jitted fn
_CYCLE_CACHE = {}


def _check_bcs(*bc_types):
    for t in bc_types:
        if t not in _SUPPORTED_BCS:
            raise ValueError(
                f"BC '{t}' is not supported by the sharded MG path")


class _LocalMGOps:
    """Duck-typed stand-in running the serial MG operator methods on
    block-LOCAL grids, with halo exchange as the ghost fill.

    The serial `_smooth_once`/`_smooth_n`/`_residual` only touch
    `self.grids[level]`, `self._red_masks`/`_black_masks[level]` and
    `self._fill_v(level, v)` (plus, for GeneralMG2d, `_coeff_views` which
    reads grids + params), so borrowing them unbound gives the
    block-local operators with zero math duplication.
    """

    def __init__(self, serial_cls, local_grids, red_masks, black_masks,
                 bc, px, py):
        self._cls = serial_cls
        self.grids = local_grids          # dict: level -> Grid2d
        self._red_masks = red_masks       # dict: level -> mask
        self._black_masks = black_masks
        self.bc = bc
        self.px, self.py = px, py

    def _fill_v(self, level, v):
        return halo_exchange(v, self.grids[level], self.bc, self.px, self.py)

    def _smooth_once(self, level, v, f, params):
        return self._cls._smooth_once(self, level, v, f, params)

    def _smooth_n(self, level, v, f, n, params):
        return self._cls._smooth_n(self, level, v, f, n, params)

    def _residual(self, level, v, f, params):
        return self._cls._residual(self, level, v, f, params)

    # GeneralMG2d's _smooth_once/_residual route through _coeff_views
    def _coeff_views(self, level, params):
        return self._cls._coeff_views(self, level, params)


class ShardedMG:
    """SPMD multigrid solve of (alpha - beta L) phi = f on a device mesh.

    The global nx x ny interior is block-partitioned as P("x", "y") over
    `mesh`; `solve` drives jitted sharded V-cycles exactly like the serial
    CellCenterMG2d.solve loop (same stall detection, same convergence
    criterion, same smoother ordering).
    """

    def __init__(self, nx, ny, mesh, *,
                 xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0,
                 xl_BC_type="dirichlet", xr_BC_type="dirichlet",
                 yl_BC_type="dirichlet", yr_BC_type="dirichlet",
                 alpha=0.0, beta=-1.0,
                 nsmooth=10, nsmooth_bottom=50,
                 verbose=0):
        _check_bcs(xl_BC_type, xr_BC_type, yl_BC_type, yr_BC_type)

        # the serial MG supplies the level grids, the replicated coarse
        # recursion, and the parameter pytree contract
        serial = CellCenterMG2d(
            nx, ny, xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
            xl_BC_type=xl_BC_type, xr_BC_type=xr_BC_type,
            yl_BC_type=yl_BC_type, yr_BC_type=yr_BC_type,
            alpha=alpha, beta=beta,
            nsmooth=nsmooth, nsmooth_bottom=nsmooth_bottom, verbose=0)
        self._setup_mesh(serial, mesh, verbose)

    # ------------------------------------------------------------------
    # shared mesh/crossover/local-grid setup
    # ------------------------------------------------------------------
    def _setup_mesh(self, serial, mesh, verbose):
        self.serial = serial
        nx, ny = serial.nx, serial.ny
        self.mesh = mesh
        self.px = int(mesh.devices.shape[0])
        self.py = int(mesh.devices.shape[1])
        self.nx, self.ny = nx, ny
        self.ng = 1
        self.nlevels = serial.nlevels
        self.nsmooth = serial.nsmooth
        self.nsmooth_bottom = serial.nsmooth_bottom
        self.verbose = verbose
        self.max_cycles = serial.max_cycles
        self.bc = serial.bc

        if nx % self.px != 0 or ny % self.py != 0:
            raise ValueError("grid must divide evenly over the device mesh")

        # crossover: the coarsest level whose local block is >= 2x2 on every
        # device (blocks stay even/power-of-2 above it, so local red-black
        # parity == global parity and local factor-2 restriction is exact)
        self.k_cross = None
        for k in range(self.nlevels):
            g = self.serial.grids[k]
            if (g.nx % self.px == 0 and g.ny % self.py == 0 and
                    g.nx // self.px >= 2 and g.ny // self.py >= 2):
                self.k_cross = k
                break
        if self.k_cross is None or self.k_cross == self.nlevels:
            raise ValueError(
                f"no level of a {nx}x{ny} grid gives >=2x2 blocks on a "
                f"{self.px}x{self.py} mesh -- use the serial solver")

        # per-level local block grids (levels k_cross-1 .. finest; the
        # k_cross-1 entry only provides shapes for the final local restrict
        # feeding the replicated coarse gather)
        self.local_grids = {}
        red, black = {}, {}
        for k in range(max(self.k_cross - 1, 0), self.nlevels):
            g = self.serial.grids[k]
            bx, by = g.nx // self.px, g.ny // self.py
            lg = Grid2d(bx, by, ng=self.ng,
                        xmin=0.0, xmax=bx * g.dx, ymin=0.0, ymax=by * g.dy)
            assert abs(lg.dx - g.dx) < 1e-14 * max(1.0, g.dx)
            self.local_grids[k] = lg
            if k >= self.k_cross:
                ii = np.arange(lg.qx)[:, None] - lg.ilo
                jj = np.arange(lg.qy)[None, :] - lg.jlo
                interior = ((ii >= 0) & (ii < lg.nx) &
                            (jj >= 0) & (jj < lg.ny))
                # local parity == global parity: block offsets ix*bx are
                # even at every sharded level (bx is a power of 2, >= 2)
                r = ((ii + jj) % 2 == 0) & interior
                red[k] = jnp.asarray(r)
                black[k] = jnp.asarray(~r & interior)

        self._ops = _LocalMGOps(type(self.serial), self.local_grids,
                                red, black, self.bc, self.px, self.py)

        self.source_norm = 0.0
        self.initialized_rhs = 0
        self.num_cycles = 0
        self.residual_error = 1.e33
        self.relative_error = 1.e33

        self._sharding = NamedSharding(mesh, P("x", "y"))
        gf = self.serial.grids[self.nlevels - 1]
        self.soln_grid = gf
        dtype = self.serial.v[-1].dtype
        self.v_int = jax.device_put(
            jnp.zeros((self.nx, self.ny), dtype), self._sharding)
        self.f_int = jax.device_put(
            jnp.zeros((self.nx, self.ny), dtype), self._sharding)
        self.r_int = None

    # ------------------------------------------------------------------
    # per-level numeric data plumbing (overridden by coefficient MGs)
    # ------------------------------------------------------------------
    def _coarse_params(self):
        """Params for the replicated coarse recursion (replicated leaves)."""
        return self.serial._params()

    def _local_params(self):
        """Params for the sharded levels: block-padded-layout leaves,
        sharded P("x","y").  Constant coefficients need none."""
        return {}

    def _level_params(self, coarse_params, local_params):
        """The params pytree handed to the block-local operator methods."""
        return coarse_params

    def _block_layout(self, global_arr, level):
        """(qx, qy) global padded level-`level` array -> block-padded
        layout (px*(bx+2ng), py*(by+2ng)) sharded P("x","y"): each
        device's shard is its own local padded block (neighbor interior
        values in interior-facing ghost slots, the serial hierarchy's
        physical ghosts on domain-edge blocks)."""
        lg = self.local_grids[level]
        bx, by = lg.nx, lg.ny
        qlx, qly = lg.qx, lg.qy
        A = np.asarray(global_arr)
        out = np.zeros((self.px * qlx, self.py * qly), A.dtype)
        for ix in range(self.px):
            for iy in range(self.py):
                out[ix * qlx:(ix + 1) * qlx, iy * qly:(iy + 1) * qly] = \
                    A[ix * bx:ix * bx + qlx, iy * by:iy * by + qly]
        return jax.device_put(jnp.asarray(out), self._sharding)

    @staticmethod
    def _dummy_tail(per_level, k_cross):
        """Replace levels >= k_cross of a per-level tuple with scalar
        dummies (the replicated coarse recursion never reads them; keeping
        the big fine-level arrays out of the replicated pytree)."""
        z = jnp.zeros((), per_level[0].dtype)
        return tuple(a if k < k_cross else z for k, a in enumerate(per_level))

    # ------------------------------------------------------------------
    # state initialization / access (global-interior arrays)
    # ------------------------------------------------------------------
    def _to_interior(self, data):
        data = jnp.asarray(data)
        g = self.soln_grid
        if data.shape == (g.qx, g.qy):
            data = data[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1]
        if data.shape != (self.nx, self.ny):
            raise ValueError(
                f"expected ({self.nx}, {self.ny}) interior or "
                f"({g.qx}, {g.qy}) padded array, got {data.shape}")
        return jax.device_put(data, self._sharding)

    def init_zeros(self):
        self.v_int = jax.device_put(jnp.zeros_like(self.v_int),
                                    self._sharding)

    def init_solution(self, data):
        self.v_int = self._to_interior(data)

    def init_RHS(self, data):
        self.f_int = self._to_interior(data)
        g = self.soln_grid
        self.source_norm = float(jnp.sqrt(
            g.dx * g.dy * jnp.sum(self.f_int ** 2)))
        self.initialized_rhs = 1

    def get_solution(self):
        """The (nx, ny) global interior solution (sharded jnp array)."""
        return self.v_int

    def get_solution_gradient_interior(self):
        """Centered-difference gradient (gx, gy) on the global interior,
        as one jitted sharded dispatch (the SPMD twin of
        CellCenterMG2d.get_solution_gradient)."""
        lg = self.local_grids[self.nlevels - 1]
        ops = self._ops

        def body(v_int):
            v = ops._fill_v(self.nlevels - 1, jnp.pad(v_int, self.ng))
            from pyro2_tpu.mesh.indexer import ai
            vv = ai(v, lg)
            gx = 0.5 * (vv.ip(1) - vv.ip(-1)) / lg.dx
            gy = 0.5 * (vv.jp(1) - vv.jp(-1)) / lg.dy
            return gx, gy

        spec = P("x", "y")
        fn = jax.jit(jax.shard_map(body, mesh=self.mesh, in_specs=spec,
                                   out_specs=(spec, spec)))
        return fn(self.v_int)

    # ------------------------------------------------------------------
    # SPMD numeric core (everything below runs inside shard_map)
    # ------------------------------------------------------------------
    def _replicated_coarse(self, kc, fc_blk, coarse_params):
        """Gather the level-kc RHS blocks into a replicated global problem,
        run the serial V-cycle on it (identically on every device), and
        slice the local padded correction block back out."""
        ng = self.ng
        f_int = fc_blk[ng:-ng, ng:-ng]
        f_int = jax.lax.all_gather(f_int, "x", axis=0, tiled=True)
        f_int = jax.lax.all_gather(f_int, "y", axis=1, tiled=True)
        gk = self.serial.grids[kc]
        f_glob = jnp.zeros((gk.qx, gk.qy), f_int.dtype)
        f_glob = f_glob.at[gk.ilo:gk.ihi + 1, gk.jlo:gk.jhi + 1].set(f_int)
        v_glob = self.serial._v_cycle(kc, jnp.zeros_like(f_glob), f_glob,
                                      coarse_params)
        bx, by = gk.nx // self.px, gk.ny // self.py
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        return jax.lax.dynamic_slice(
            v_glob, (ix * bx, iy * by), (bx + 2 * ng, by + 2 * ng))

    def _sharded_v_cycle(self, k, v, f, coarse_params, local_params):
        """V-cycle over the block-partitioned levels; unrolls at trace time
        (mirrors CellCenterMG2d._v_cycle)."""
        ops = self._ops
        lg = self.local_grids[k]
        lp = self._level_params(coarse_params, local_params)
        if k == 0:
            # only reachable on a 1x1 mesh: plain bottom smooth
            return ops._smooth_n(0, v, f, self.nsmooth_bottom, lp)

        v = ops._smooth_n(k, v, f, self.nsmooth, lp)
        r = ops._residual(k, v, f, lp)

        lg_c = self.local_grids[k - 1]
        f_c = restrict_array(r, lg, lg_c)
        if k - 1 >= self.k_cross:
            v_c = self._sharded_v_cycle(k - 1, jnp.zeros_like(f_c), f_c,
                                        coarse_params, local_params)
        else:
            v_c = self._replicated_coarse(k - 1, f_c, coarse_params)

        e = prolong_array(v_c, lg_c, lg)
        from pyro2_tpu.mesh.indexer import ai
        v = v.at[lg.ilo:lg.ihi + 1, lg.jlo:lg.jhi + 1].add(ai(e, lg).v())
        v = ops._fill_v(k, v)
        return ops._smooth_n(k, v, f, self.nsmooth, lp)

    def _cycle_local(self, v, f, coarse_params, local_params):
        """One V-cycle + residual + psum'd norm on the local padded block
        (must run inside shard_map over axes "x","y")."""
        top = self.nlevels - 1
        g = self.soln_grid
        ng = self.ng
        v = self._sharded_v_cycle(top, v, f, coarse_params, local_params)
        r = self._ops._residual(
            top, v, f, self._level_params(coarse_params, local_params))
        r_int = r[ng:-ng, ng:-ng]
        ss = jax.lax.psum(jax.lax.psum(jnp.sum(r_int ** 2), "x"), "y")
        rnorm = jnp.sqrt(g.dx * g.dy * ss)
        return v, r_int, rnorm

    def solve_local(self, v, f, coarse_params, local_params, rtol,
                    source_norm):
        """The complete solve loop (V-cycles + convergence/stall tests) on
        the local padded block; must run inside shard_map over axes
        "x","y".  This is the building block solver steps (projections,
        C-N solves) call inline from their own shard_map programs.

        v, f: (bx+2ng, by+2ng) local padded blocks.  Returns
        (v, r_int, residual_error, relative_error, ncycles).
        """
        g = self.soln_grid
        ng = self.ng
        max_cycles = self.max_cycles
        small = self.serial.small
        dt = v.dtype
        denom = jnp.where(source_norm != 0.0, source_norm,
                          jnp.asarray(1.0, dt))
        big = jnp.asarray(1.e33, dt)
        rtol = jnp.asarray(rtol, dt)

        def interior_norm(a):
            ss = jax.lax.psum(jax.lax.psum(
                jnp.sum(a[ng:-ng, ng:-ng] ** 2), "x"), "y")
            return jnp.sqrt(g.dx * g.dy * ss)

        def cond(c):
            v, r, res, rel, cycle, stall = c
            return (res > rtol) & (cycle <= max_cycles) & (stall < 2)

        def body(c):
            v, r, res, rel, cycle, stall = c
            v2, r2, rnorm = self._cycle_local(v, f, coarse_params,
                                              local_params)
            new = (rnorm / denom).astype(dt)
            rel = interior_norm((v2 - v) / (v2 + small)).astype(dt)
            stall = jnp.where(new > 0.95 * res, stall + 1, 0)
            return (v2, r2, new, rel, cycle + 1, stall)

        # 0*slice keeps the residual carry device-varying (VMA) like the
        # cycle's output, as shard_map's while_loop typing requires
        c0 = (v, 0.0 * v[ng:-ng, ng:-ng],
              big, big, jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32))
        v, r, res, rel, cycle, _ = jax.lax.while_loop(cond, body, c0)
        return v, r, res, rel, cycle - 1

    # ------------------------------------------------------------------
    # standalone jitted drivers (shard_map wrappers over the core)
    # ------------------------------------------------------------------
    def _cycle_key(self):
        return ("sharded", type(self.serial), tuple(self.serial.grids),
                self.bc, self.px, self.py, self.nsmooth,
                self.nsmooth_bottom, id(self.mesh))

    def _param_specs(self):
        """shard_map in_specs for (coarse_params, local_params)."""
        cp = jax.tree.map(lambda _: P(), self._coarse_params())
        lp = jax.tree.map(lambda _: P("x", "y"), self._local_params())
        return cp, lp

    def _build_cycle(self):
        ng = self.ng

        def body(v_int, f_int, coarse_params, local_params):
            v = jnp.pad(v_int, ng)
            f = jnp.pad(f_int, ng)
            v, r_int, rnorm = self._cycle_local(v, f, coarse_params,
                                                local_params)
            return v[ng:-ng, ng:-ng], r_int, rnorm

        spec = P("x", "y")
        cspec, lspec = self._param_specs()
        body = jax.shard_map(body, mesh=self.mesh,
                             in_specs=(spec, spec, cspec, lspec),
                             out_specs=(spec, spec, P()))
        return jax.jit(body)

    def _build_solve(self):
        """The whole sharded solve as ONE jitted dispatch -- see
        CellCenterMG2d._build_solve."""
        ng = self.ng

        def body(v_int, f_int, coarse_params, local_params, rtol,
                 source_norm):
            v = jnp.pad(v_int, ng)
            f = jnp.pad(f_int, ng)
            v, r, res, rel, ncyc = self.solve_local(
                v, f, coarse_params, local_params, rtol, source_norm)
            return v[ng:-ng, ng:-ng], r, res, rel, ncyc

        spec = P("x", "y")
        cspec, lspec = self._param_specs()
        body = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(spec, spec, cspec, lspec, P(), P()),
            out_specs=(spec, spec, P(), P(), P()))
        return jax.jit(body)

    # ------------------------------------------------------------------
    # driver (mirrors CellCenterMG2d.solve)
    # ------------------------------------------------------------------
    def solve(self, rtol=1.e-11):
        if not self.initialized_rhs:
            msg.fail("ERROR: RHS not initialized")

        dtype = self.v_int.dtype
        if not self.verbose:
            skey = ("solve",) + self._cycle_key()
            solve_fn = _CYCLE_CACHE.get(skey)
            if solve_fn is None:
                solve_fn = self._build_solve()
                _CYCLE_CACHE[skey] = solve_fn
            v, r, res, rel, ncyc = solve_fn(
                self.v_int, self.f_int, self._coarse_params(),
                self._local_params(), jnp.asarray(rtol, dtype),
                jnp.asarray(self.source_norm, dtype))
            self.v_int = v
            self.r_int = r
            self.num_cycles = int(ncyc)
            self.residual_error = float(res)
            self.relative_error = float(rel)
            return

        key = self._cycle_key()
        cycle_fn = _CYCLE_CACHE.get(key)
        if cycle_fn is None:
            cycle_fn = self._build_cycle()
            _CYCLE_CACHE[key] = cycle_fn
        coarse_params = self._coarse_params()
        local_params = self._local_params()

        old_phi = self.v_int
        small = self.serial.small

        residual_error = 1.e33
        relative_error = 1.e33
        cycle = 1
        n_stalled = 0
        while residual_error > rtol and cycle <= self.max_cycles:
            v, r, rnorm = cycle_fn(self.v_int, self.f_int, coarse_params,
                                   local_params)
            self.v_int = v
            self.r_int = r

            diff = (v - old_phi) / (v + small)
            relative_error = float(jnp.sqrt(
                self.soln_grid.dx * self.soln_grid.dy * jnp.sum(diff ** 2)))
            old_phi = v

            rnorm = float(rnorm)
            prev_residual_error = residual_error
            if self.source_norm != 0.0:
                residual_error = rnorm / self.source_norm
            else:
                residual_error = rnorm

            if self.verbose:
                print(f"sharded cycle {cycle}: relative err = "
                      f"{relative_error}, residual err = {residual_error}")
            cycle += 1

            # working-precision stall detection (see CellCenterMG2d.solve)
            if residual_error > 0.95 * prev_residual_error:
                n_stalled += 1
                if n_stalled >= 2:
                    break
            else:
                n_stalled = 0

        self.num_cycles = cycle - 1
        self.relative_error = relative_error
        self.residual_error = residual_error


class ShardedVarCoeffMG(ShardedMG):
    """SPMD variable-coefficient multigrid: div(eta grad phi) = f.

    The distributed twin of VarCoeffCCMG2d: the serial instance computes
    the coefficient hierarchy (cell-centered eta restricted down, averaged
    onto edges pre-scaled by 1/dx^2) once at construction; every sharded
    level's edge coefficients are then laid out block-padded so each device
    holds exactly its own block (plus coefficient halos).  The smoother /
    residual are the serial operators borrowed onto local grids.
    """

    def __init__(self, nx, ny, mesh, *,
                 xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0,
                 xl_BC_type="dirichlet", xr_BC_type="dirichlet",
                 yl_BC_type="dirichlet", yr_BC_type="dirichlet",
                 nsmooth=10, nsmooth_bottom=50,
                 coeffs=None, coeffs_bc=None,
                 verbose=0):
        _check_bcs(xl_BC_type, xr_BC_type, yl_BC_type, yr_BC_type)

        serial = VarCoeffCCMG2d(
            nx, ny, xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
            xl_BC_type=xl_BC_type, xr_BC_type=xr_BC_type,
            yl_BC_type=yl_BC_type, yr_BC_type=yr_BC_type,
            nsmooth=nsmooth, nsmooth_bottom=nsmooth_bottom,
            coeffs=coeffs, coeffs_bc=coeffs_bc, verbose=0)
        self._setup_mesh(serial, mesh, verbose)

        # block-padded edge-coefficient layouts for the sharded levels
        self._local_coeffs = {
            "eta_x": {k: self._block_layout(serial.edge_coeffs[k].x, k)
                      for k in range(self.k_cross, self.nlevels)},
            "eta_y": {k: self._block_layout(serial.edge_coeffs[k].y, k)
                      for k in range(self.k_cross, self.nlevels)},
        }

    def _coarse_params(self):
        p = self.serial._params()
        return {k: self._dummy_tail(v, self.k_cross) for k, v in p.items()}

    def _local_params(self):
        return self._local_coeffs

    def _level_params(self, coarse_params, local_params):
        return local_params


class ShardedGeneralMG(ShardedMG):
    """SPMD general-form multigrid:
    alpha phi + div(beta grad phi) + gamma . grad(phi) = f.

    The distributed twin of GeneralMG2d (homogeneous BCs only; the serial
    class's inhomogeneous BC functions are not supported here).
    `coeffs` is a CellCenterData2d with alpha/beta/gamma_x/gamma_y, as for
    the serial class.
    """

    def __init__(self, nx, ny, mesh, *,
                 xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0,
                 xl_BC_type="dirichlet", xr_BC_type="dirichlet",
                 yl_BC_type="dirichlet", yr_BC_type="dirichlet",
                 nsmooth=10, nsmooth_bottom=50,
                 coeffs=None,
                 verbose=0):
        _check_bcs(xl_BC_type, xr_BC_type, yl_BC_type, yr_BC_type)

        serial = GeneralMG2d(
            nx, ny, xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
            xl_BC_type=xl_BC_type, xr_BC_type=xr_BC_type,
            yl_BC_type=yl_BC_type, yr_BC_type=yr_BC_type,
            nsmooth=nsmooth, nsmooth_bottom=nsmooth_bottom,
            coeffs=coeffs, verbose=0)
        self._setup_mesh(serial, mesh, verbose)

        rng = range(self.k_cross, self.nlevels)
        self._local_coeffs = {
            "alpha": {k: self._block_layout(serial.aux["alpha"][k], k)
                      for k in rng},
            "gamma_x": {k: self._block_layout(serial.aux["gamma_x"][k], k)
                        for k in rng},
            "gamma_y": {k: self._block_layout(serial.aux["gamma_y"][k], k)
                        for k in rng},
            "beta_x": {k: self._block_layout(serial.beta_edge[k].x, k)
                       for k in rng},
            "beta_y": {k: self._block_layout(serial.beta_edge[k].y, k)
                       for k in rng},
        }

    def _coarse_params(self):
        p = self.serial._params()
        return {k: self._dummy_tail(v, self.k_cross) for k, v in p.items()}

    def _local_params(self):
        return self._local_coeffs

    def _level_params(self, coarse_params, local_params):
        return local_params
