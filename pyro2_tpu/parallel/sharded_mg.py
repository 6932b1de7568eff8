"""Block-partitioned SPMD multigrid over a device mesh.

The distributed analog of CellCenterMG2d (SURVEY.md section 2.9: the
reference, /root/reference/pyro/multigrid/MG.py:77-778, is strictly
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
  shard_map program, cached per static configuration like the serial cycle.

Supported BCs: the standard homogeneous kinds (dirichlet / neumann /
outflow / reflect-* / periodic).  Inhomogeneous BC functions and
user-registered extended BCs are not supported in the sharded path.
"""


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pyro2_tpu.mesh.grid import Grid2d
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.mesh.patch import prolong_array, restrict_array
from pyro2_tpu.multigrid.MG import CellCenterMG2d
from pyro2_tpu.parallel.mesh_comm import halo_exchange
from pyro2_tpu.util import msg

__all__ = ["ShardedMG"]

_SUPPORTED_BCS = frozenset(
    ["outflow", "neumann", "dirichlet", "reflect-odd", "reflect-even",
     "periodic"])

# compiled sharded-cycle cache: static config -> jitted fn
_CYCLE_CACHE = {}


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
        for t in (xl_BC_type, xr_BC_type, yl_BC_type, yr_BC_type):
            if t not in _SUPPORTED_BCS:
                raise ValueError(
                    f"BC '{t}' is not supported by the sharded MG path")

        # the serial MG supplies the level grids, the replicated coarse
        # recursion, and the parameter pytree contract
        self.serial = CellCenterMG2d(
            nx, ny, xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
            xl_BC_type=xl_BC_type, xr_BC_type=xr_BC_type,
            yl_BC_type=yl_BC_type, yr_BC_type=yr_BC_type,
            alpha=alpha, beta=beta,
            nsmooth=nsmooth, nsmooth_bottom=nsmooth_bottom, verbose=0)

        self.mesh = mesh
        self.px = int(mesh.devices.shape[0])
        self.py = int(mesh.devices.shape[1])
        self.nx, self.ny = nx, ny
        self.ng = 1
        self.nlevels = self.serial.nlevels
        self.nsmooth = nsmooth
        self.nsmooth_bottom = nsmooth_bottom
        self.verbose = verbose
        self.max_cycles = 100
        self.bc = self.serial.bc

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
                f"{self.px}x{self.py} mesh -- use the serial CellCenterMG2d")

        # per-level local block grids (levels k_cross-1 .. finest; the
        # k_cross-1 entry only provides shapes for the final local restrict
        # feeding the replicated coarse gather)
        self.local_grids = {}
        self._masks = {}
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
                red = ((ii + jj) % 2 == 0) & interior
                self._masks[k] = (jnp.asarray(red),
                                  jnp.asarray(~red & interior))

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
            jnp.zeros((nx, ny), dtype), self._sharding)
        self.f_int = jax.device_put(
            jnp.zeros((nx, ny), dtype), self._sharding)
        self.r_int = None

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

    # ------------------------------------------------------------------
    # SPMD numeric core (everything below runs inside shard_map)
    # ------------------------------------------------------------------
    def _halo(self, k, v):
        return halo_exchange(v, self.local_grids[k], self.bc,
                             self.px, self.py)

    def _residual_local(self, k, v, f, params):
        lg = self.local_grids[k]
        alpha, beta = params["alpha"], params["beta"]
        vv = ai(v, lg)
        lap = ((vv.ip(-1) + vv.ip(1) - 2.0 * vv.v()) / lg.dx ** 2 +
               (vv.jp(-1) + vv.jp(1) - 2.0 * vv.v()) / lg.dy ** 2)
        r_v = ai(f, lg).v() - alpha * vv.v() + beta * lap
        r = jnp.zeros_like(v)
        return r.at[lg.ilo:lg.ihi + 1, lg.jlo:lg.jhi + 1].set(r_v)

    def _smooth_sharded(self, k, v, f, n, params):
        """n red-black sweeps with a halo exchange between color sets --
        the SPMD twin of CellCenterMG2d._smooth_once/_smooth_n."""
        lg = self.local_grids[k]
        alpha, beta = params["alpha"], params["beta"]
        xcoeff = beta / lg.dx ** 2
        ycoeff = beta / lg.dy ** 2
        denom = alpha + 2.0 * xcoeff + 2.0 * ycoeff
        red, black = self._masks[k]

        def half_sweep(v, mask):
            vv = ai(v, lg)
            upd = (ai(f, lg).v() +
                   xcoeff * (vv.ip(1) + vv.ip(-1)) +
                   ycoeff * (vv.jp(1) + vv.jp(-1))) / denom
            full = jnp.zeros_like(v)
            full = full.at[lg.ilo:lg.ihi + 1, lg.jlo:lg.jhi + 1].set(upd)
            return jnp.where(mask, full, v)

        def once(_, v):
            v = self._halo(k, half_sweep(v, red))
            v = self._halo(k, half_sweep(v, black))
            return v

        v = self._halo(k, v)
        return jax.lax.fori_loop(0, n, once, v)

    def _replicated_coarse(self, kc, fc_blk, params):
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
                                      params)
        bx, by = gk.nx // self.px, gk.ny // self.py
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        return jax.lax.dynamic_slice(
            v_glob, (ix * bx, iy * by), (bx + 2 * ng, by + 2 * ng))

    def _sharded_v_cycle(self, k, v, f, params):
        """V-cycle over the block-partitioned levels; unrolls at trace time
        (mirrors CellCenterMG2d._v_cycle)."""
        lg = self.local_grids[k]
        if k == 0:
            # only reachable on a 1x1 mesh: plain bottom smooth
            return self._smooth_sharded(0, v, f, self.nsmooth_bottom, params)

        v = self._smooth_sharded(k, v, f, self.nsmooth, params)
        r = self._residual_local(k, v, f, params)

        lg_c = self.local_grids[k - 1]
        f_c = restrict_array(r, lg, lg_c)
        if k - 1 >= self.k_cross:
            v_c = self._sharded_v_cycle(k - 1, jnp.zeros_like(f_c), f_c,
                                        params)
        else:
            v_c = self._replicated_coarse(k - 1, f_c, params)

        e = prolong_array(v_c, lg_c, lg)
        v = v.at[lg.ilo:lg.ihi + 1, lg.jlo:lg.jhi + 1].add(ai(e, lg).v())
        v = self._halo(k, v)
        return self._smooth_sharded(k, v, f, self.nsmooth, params)

    def _cycle_key(self):
        return ("sharded", tuple(self.serial.grids), self.bc,
                self.px, self.py, self.nsmooth, self.nsmooth_bottom,
                id(self.mesh))

    def _build_cycle(self):
        ng = self.ng
        top = self.nlevels - 1
        g = self.soln_grid

        def body(v_int, f_int, params):
            v = jnp.pad(v_int, ng)
            f = jnp.pad(f_int, ng)
            v = self._sharded_v_cycle(top, v, f, params)
            r = self._residual_local(top, v, f, params)
            r_int = r[ng:-ng, ng:-ng]
            ss = jax.lax.psum(jax.lax.psum(jnp.sum(r_int ** 2), "x"), "y")
            rnorm = jnp.sqrt(g.dx * g.dy * ss)
            return v[ng:-ng, ng:-ng], r_int, rnorm

        spec = P("x", "y")
        body = jax.shard_map(body, mesh=self.mesh,
                             in_specs=(spec, spec, P()),
                             out_specs=(spec, spec, P()))
        return jax.jit(body)

    def _build_solve(self):
        """The whole sharded solve as ONE jitted dispatch (lax.while_loop
        over the shard_map'ed cycle) -- see CellCenterMG2d._build_solve."""
        key = self._cycle_key()
        cycle_fn = _CYCLE_CACHE.get(key)
        if cycle_fn is None:
            cycle_fn = self._build_cycle()
            _CYCLE_CACHE[key] = cycle_fn

        g = self.soln_grid
        max_cycles = self.max_cycles
        small = self.serial.small

        def interior_norm(a):
            return jnp.sqrt(g.dx * g.dy * jnp.sum(a ** 2))

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
            return v, r, res, rel, cycle - 1

        return jax.jit(full_solve)

    # ------------------------------------------------------------------
    # driver (mirrors CellCenterMG2d.solve)
    # ------------------------------------------------------------------
    def solve(self, rtol=1.e-11):
        if not self.initialized_rhs:
            msg.fail("ERROR: RHS not initialized")

        if not self.verbose:
            skey = ("solve",) + self._cycle_key()
            solve_fn = _CYCLE_CACHE.get(skey)
            if solve_fn is None:
                solve_fn = self._build_solve()
                _CYCLE_CACHE[skey] = solve_fn
            dt = self.v_int.dtype
            v, r, res, rel, ncyc = solve_fn(
                self.v_int, self.f_int, self.serial._params(),
                jnp.asarray(rtol, dt), jnp.asarray(self.source_norm, dt))
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
        params = self.serial._params()

        old_phi = self.v_int
        small = self.serial.small

        residual_error = 1.e33
        relative_error = 1.e33
        cycle = 1
        n_stalled = 0
        while residual_error > rtol and cycle <= self.max_cycles:
            v, r, rnorm = cycle_fn(self.v_int, self.f_int, params)
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
