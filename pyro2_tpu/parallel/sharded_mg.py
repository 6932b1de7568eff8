"""Block-partitioned SPMD multigrid over a device mesh.

The distributed analog of the CellCenterMG2d family (SURVEY.md section 2.9:
the reference, /root/reference/pyro/multigrid/MG.py:77-778,
variable_coeff_MG.py:24-213, general_MG.py:27-242, is strictly
single-process; this layer is new).  Design:

* every level whose per-device block is large enough stays
  block-partitioned.  The default smoothing schedule is COMMUNICATION-
  AVOIDING (`comm_mode="deep"`): one d-deep halo exchange per smoothing
  call buys (d-1)//2 red-black sweeps computed redundantly on the halo
  band -- every updated cell evaluates the identical arithmetic on the
  identical operand values as the reference's exchange-per-half-sweep
  schedule (/root/reference/pyro/multigrid/MG.py:544-599, ghost fill
  after colors 2 and 4), so the result is arithmetically unchanged
  (identical operations on identical operand values; the separately
  compiled graphs may differ by instruction-fusion/FMA ulps) while the
  ppermute count per V-cycle drops ~15-20x (2 ppermutes per split axis
  per smoothing call, independent of nsmooth).  `comm_mode="sweep"`
  keeps the literal exchange-per-half-sweep schedule for cross-checking;
* `smoother="rbgs"` (default) is the reference-parity red-black
  Gauss-Seidel.  `smoother="jacobi"` / `"chebyshev"` are speed modes
  (SURVEY.md section 7 "Hard parts"): damped-Jacobi / Chebyshev-
  accelerated-Jacobi need only 1 halo cell per step (vs 2 per RB-GS
  sweep), so the same d-deep halo buys d-1 steps; they trade a few extra
  V-cycles for strictly less synchronization.  Jacobi reads only
  old-iterate values and is partition-invariant; Chebyshev restarts its
  polynomial at round boundaries, so its iterates depend (at the
  truncation-error-irrelevant level) on the block size;
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
from pyro2_tpu.parallel.mesh_comm import (deep_pad_exchange,
                                          deep_phys_refresh, halo_exchange)
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

    # deep mode prefers replicating levels whose split-axis blocks are
    # smaller than this (one exchange then buys >= 7 sweeps); tests lower
    # it to pin the crossover while isolating the smoothing schedule
    _deep_crossover = 16

    # fused-kernel operator arity: 0 = constant-coefficient scalars,
    # 2 = vc planes [eta_x, eta_y], 5 = general planes (see
    # pallas_sharded_mg.build_deep_smooth_kernel)
    _pallas_ncoef = 0

    def __init__(self, nx, ny, mesh, *,
                 xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0,
                 xl_BC_type="dirichlet", xr_BC_type="dirichlet",
                 yl_BC_type="dirichlet", yr_BC_type="dirichlet",
                 alpha=0.0, beta=-1.0,
                 nsmooth=10, nsmooth_bottom=50,
                 comm_mode="deep", smoother="rbgs", nsmooth_speed=None,
                 use_pallas=False, verbose=0):
        _check_bcs(xl_BC_type, xr_BC_type, yl_BC_type, yr_BC_type)

        # the serial MG supplies the level grids, the replicated coarse
        # recursion, and the parameter pytree contract
        serial = CellCenterMG2d(
            nx, ny, xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
            xl_BC_type=xl_BC_type, xr_BC_type=xr_BC_type,
            yl_BC_type=yl_BC_type, yr_BC_type=yr_BC_type,
            alpha=alpha, beta=beta,
            nsmooth=nsmooth, nsmooth_bottom=nsmooth_bottom, verbose=0)
        self._setup_mesh(serial, mesh, verbose, comm_mode=comm_mode,
                         smoother=smoother, nsmooth_speed=nsmooth_speed,
                         use_pallas=use_pallas)

    # ------------------------------------------------------------------
    # shared mesh/crossover/local-grid setup
    # ------------------------------------------------------------------
    def _setup_mesh(self, serial, mesh, verbose, *, comm_mode="deep",
                    smoother="rbgs", nsmooth_speed=None, use_pallas=False):
        if comm_mode not in ("deep", "sweep"):
            raise ValueError(f"unknown comm_mode '{comm_mode}'")
        if smoother not in ("rbgs", "jacobi", "chebyshev"):
            raise ValueError(f"unknown smoother '{smoother}'")
        if smoother != "rbgs" and comm_mode != "deep":
            raise ValueError("speed smoothers require comm_mode='deep'")
        if use_pallas:
            from pyro2_tpu.multigrid.pallas_sharded_mg import SUPPORTED_BCS
            if comm_mode != "deep":
                raise ValueError("use_pallas requires comm_mode='deep'")
            bc = serial.bc
            for edge in ("xlb", "xrb", "ylb", "yrb"):
                if getattr(bc, edge) not in SUPPORTED_BCS:
                    raise ValueError(
                        f"BC '{getattr(bc, edge)}' not supported by the "
                        "fused sharded-MG kernels")
        self.use_pallas = use_pallas
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
        self.comm_mode = comm_mode
        self.smoother = smoother
        # speed modes: Chebyshev degree ~4 matches 10 RB-GS sweeps'
        # smoothing power; damped Jacobi needs a few more
        if nsmooth_speed is None:
            nsmooth_speed = 4 if smoother == "chebyshev" else 8
        self.nsmooth_speed = nsmooth_speed
        self.verbose = verbose
        self.max_cycles = serial.max_cycles
        self.bc = serial.bc

        if nx % self.px != 0 or ny % self.py != 0:
            raise ValueError("grid must divide evenly over the device mesh")

        # crossover: the coarsest block-partitioned level.  Blocks stay
        # even/power-of-2 above it, so local red-black parity == global
        # parity and local factor-2 restriction is exact.  In deep mode,
        # prefer a crossover whose split-axis blocks are >= 16 cells (one
        # exchange buys >= 7 sweeps); tiny sharded levels cost more in
        # latency-bound halo traffic than redundant replicated compute.
        def _coarsest(min_seam_block):
            for k in range(self.nlevels):
                g = self.serial.grids[k]
                if g.nx % self.px != 0 or g.ny % self.py != 0:
                    continue
                bx, by = g.nx // self.px, g.ny // self.py
                if bx < 2 or by < 2:
                    continue
                seam = ([bx] if self.px > 1 else []) + \
                       ([by] if self.py > 1 else [])
                if not seam or min(seam) >= min_seam_block:
                    return k
            return None

        if comm_mode == "deep":
            self.k_cross = _coarsest(self._deep_crossover)
            if self.k_cross is None:
                self.k_cross = _coarsest(4)
        else:
            self.k_cross = _coarsest(2)
        if self.k_cross is None:
            self.k_cross = _coarsest(2)
        if self.k_cross is None:
            raise ValueError(
                f"no level of a {nx}x{ny} grid gives >=2x2 blocks on a "
                f"{self.px}x{self.py} mesh -- use the serial solver")
        if use_pallas:
            # kernel mode handles the sub-crossover recursion with ONE
            # fused-core kernel on the gathered problem; replicating up
            # to REPL_MAX^2 costs less than per-level kernel launches +
            # exchanges (a 1x1 mesh collapses to the serial fused
            # DOWN/UP/CORE structure)
            from pyro2_tpu.multigrid.pallas_mg import CORE_MAX
            repl_max = CORE_MAX if self.px * self.py == 1 else 64
            k = self.k_cross
            while (k < self.nlevels - 1 and
                   self.serial.grids[k].nx <= repl_max):
                k += 1
            self.k_cross = k

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

        # deep-halo geometry per sharded level: halo depth d (bounded by
        # 2*nsmooth+1 -- a full RB sweep consumes 2 halo cells -- and by
        # the block extent along each split axis, since the exchange
        # carries the neighbor's interior), and the per-round sweep
        # schedule.  Entry None => exchange-per-half-sweep fallback.
        self._deep_geom = {}
        if comm_mode == "deep":
            for k in range(self.k_cross, self.nlevels):
                lg = self.local_grids[k]
                seam = ([lg.nx] if self.px > 1 else []) + \
                       ([lg.ny] if self.py > 1 else [])
                d = min([2 * self.nsmooth + 1] + seam)
                if d < 3:
                    self._deep_geom[k] = None
                    continue
                dpx = d if self.px > 1 else 1
                dpy = d if self.py > 1 else 1

                def schedule(n, per_round):
                    full, rem = divmod(n, per_round)
                    return [per_round] * full + ([rem] if rem else [])

                self._deep_geom[k] = {
                    "d": d, "dpx": dpx, "dpy": dpy,
                    # rbgs: 2 halo cells per sweep; jacobi/cheb: 1 per step
                    "sweeps_rb": schedule(self.nsmooth, (d - 1) // 2),
                    "sweeps_j": schedule(self.nsmooth_speed, d - 1),
                }

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

    def _block_layout(self, global_arr, level, dpx=None, dpy=None):
        """(qx, qy) global padded level-`level` array -> block-padded
        layout (px*(bx+2*dpx), py*(by+2*dpy)) sharded P("x","y"): each
        device's shard is its own local padded block (neighbor interior
        values in interior-facing ghost slots, the serial hierarchy's
        physical ghosts on domain-edge blocks).  The default depth is the
        standard ng=1; deep-mode coefficient planes use the level's halo
        depth (positions beyond the global array -- physical ghosts
        deeper than 1 -- are zero-filled and never read)."""
        lg = self.local_grids[level]
        bx, by = lg.nx, lg.ny
        if dpx is None:
            dpx, dpy = self.ng, self.ng

        def extend(A, dp, axis, periodic):
            """1-ghost global array -> dp-ghost: periodic axes wrap
            (seam halos are globally interior cells; on a periodic axis
            that includes the around-the-domain images), non-periodic
            axes keep the serial depth-1 ghost and zero-fill deeper
            (those positions feed only masked-out updates)."""
            if dp <= 1:
                return A
            Ai = np.moveaxis(A, axis, 0)
            n = Ai.shape[0] - 2
            interior = Ai[1:-1]
            if periodic:
                ext = np.concatenate([interior[n - dp:], interior,
                                      interior[:dp]])
            else:
                z = np.zeros((dp - 1,) + Ai.shape[1:], Ai.dtype)
                ext = np.concatenate([z, Ai[:1], interior, Ai[-1:], z])
            return np.moveaxis(ext, 0, axis)

        qlx, qly = bx + 2 * dpx, by + 2 * dpy
        A = np.asarray(global_arr)
        A = extend(A, dpx, 0, self.bc.xlb == "periodic")
        A = extend(A, dpy, 1, self.bc.ylb == "periodic")
        out = np.zeros((self.px * qlx, self.py * qly), A.dtype)
        for ix in range(self.px):
            for iy in range(self.py):
                # extended-array row/col origin of this block's frame
                r0, c0 = ix * bx, iy * by
                out[ix * qlx:(ix + 1) * qlx, iy * qly:(iy + 1) * qly] = \
                    A[r0:r0 + qlx, c0:c0 + qly]
        return jax.device_put(jnp.asarray(out), self._sharding)

    def _coeff_layout(self, global_arr, level):
        """Block-padded layout of a level coefficient plane at the level's
        smoothing halo depth (ng=1 when the level is not deep-smoothed)."""
        geom = self._deep_geom.get(level)
        if geom is None:
            return self._block_layout(global_arr, level)
        return self._block_layout(global_arr, level, geom["dpx"],
                                  geom["dpy"])

    def _block_layout_traced(self, A, level, dpx=None, dpy=None):
        """TRACED twin of _block_layout: identical values, but pure jnp
        (concat + static-index gather + sharding constraint), so per-step
        coefficient hierarchies (lm_atm's projections) can be built
        inside jit instead of through numpy host round trips."""
        lg = self.local_grids[level]
        bx, by = lg.nx, lg.ny
        if dpx is None:
            dpx, dpy = self.ng, self.ng

        def extend(A, dp, axis, periodic):
            if dp <= 1:
                return A
            Ai = jnp.moveaxis(A, axis, 0)
            n = Ai.shape[0] - 2
            interior = Ai[1:-1]
            if periodic:
                ext = jnp.concatenate([interior[n - dp:], interior,
                                       interior[:dp]])
            else:
                z = jnp.zeros((dp - 1,) + Ai.shape[1:], Ai.dtype)
                ext = jnp.concatenate([z, Ai[:1], interior, Ai[-1:], z])
            return jnp.moveaxis(ext, 0, axis)

        qlx, qly = bx + 2 * dpx, by + 2 * dpy
        A = extend(A, dpx, 0, self.bc.xlb == "periodic")
        A = extend(A, dpy, 1, self.bc.ylb == "periodic")
        # block (ix, iy) of the output holds the extended array's window
        # starting at (ix*bx, iy*by): one static-index gather
        ridx = np.concatenate([np.arange(ix * bx, ix * bx + qlx)
                               for ix in range(self.px)])
        cidx = np.concatenate([np.arange(iy * by, iy * by + qly)
                               for iy in range(self.py)])
        out = A[jnp.asarray(ridx)][:, jnp.asarray(cidx)]
        return jax.lax.with_sharding_constraint(out, self._sharding)

    def _coeff_layout_traced(self, arr, level):
        """Traced twin of _coeff_layout."""
        geom = self._deep_geom.get(level)
        if geom is None:
            return self._block_layout_traced(arr, level)
        return self._block_layout_traced(arr, level, geom["dpx"],
                                         geom["dpy"])

    def _ng1_view(self, local_params):
        """Standard ng=1 per-level views of (possibly deep) coefficient
        layouts, for the ops residual / sweep-mode smoother (the sliced
        values are bitwise the ng=1 layout's)."""
        out = {}
        for name, per_level in local_params.items():
            out[name] = {}
            for k, plane in per_level.items():
                geom = self._deep_geom.get(k)
                if geom is None:
                    out[name][k] = plane
                else:
                    lg = self.local_grids[k]
                    dpx, dpy = geom["dpx"], geom["dpy"]
                    out[name][k] = plane[dpx - 1:dpx + lg.nx + 1,
                                         dpy - 1:dpy + lg.ny + 1]
        return out

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
    # deep-halo smoothing (everything below runs inside shard_map)
    # ------------------------------------------------------------------
    def _deep_gs_update(self, k, v, f, coarse_params, local_params):
        """The Gauss-Seidel update formula evaluated at EVERY frame cell
        from the current iterate (callers mask-select the cells that may
        legally take it).  Same term order as CellCenterMG2d._smooth_once
        so selected cells are bitwise identical."""
        g = self.serial.grids[k]
        alpha = coarse_params["alpha"]
        beta = coarse_params["beta"]
        xc = beta / g.dx ** 2
        yc = beta / g.dy ** 2
        denom = alpha + 2.0 * xc + 2.0 * yc
        return (f +
                xc * (jnp.roll(v, -1, -2) + jnp.roll(v, 1, -2)) +
                yc * (jnp.roll(v, -1, -1) + jnp.roll(v, 1, -1))) / denom

    def _deep_frame_masks(self, k, geom):
        """Static excess-distance grids + red parity for level k's deep
        frame, plus the traced per-side seam flags."""
        lg = self.local_grids[k]
        bx, by = lg.nx, lg.ny
        dpx, dpy = geom["dpx"], geom["dpy"]
        ii = np.arange(bx + 2 * dpx)[:, None]
        jj = np.arange(by + 2 * dpy)[None, :]
        exl = jnp.asarray(np.maximum(dpx - ii, 0))
        exr = jnp.asarray(np.maximum(ii - (dpx + bx - 1), 0))
        eyl = jnp.asarray(np.maximum(dpy - jj, 0))
        eyr = jnp.asarray(np.maximum(jj - (dpy + by - 1), 0))
        # block origins are even multiples of even block extents, so
        # global parity == frame parity shifted by the pad depths
        red = jnp.asarray(((ii - dpx) + (jj - dpy)) % 2 == 0)

        def seam_pair(p, axname, lb, rb):
            if p == 1:
                return None, None
            idx = jax.lax.axis_index(axname)
            lo = jnp.asarray(True) if lb == "periodic" else idx > 0
            hi = jnp.asarray(True) if rb == "periodic" else idx < p - 1
            return lo, hi

        sxl, sxr = seam_pair(self.px, "x", self.bc.xlb, self.bc.xrb)
        syl, syr = seam_pair(self.py, "y", self.bc.ylb, self.bc.yrb)

        def elig(lim):
            """Cells allowed to take an update whose reads must be valid
            to halo depth lim+1: excess <= lim toward seam sides, 0
            toward physical/wrap sides (those ghosts are refreshed)."""
            zero = jnp.asarray(0, jnp.int32)
            m = (exl <= (jnp.where(sxl, lim, zero) if sxl is not None
                         else zero))
            m &= exr <= (jnp.where(sxr, lim, zero) if sxr is not None
                         else zero)
            m &= eyl <= (jnp.where(syl, lim, zero) if syl is not None
                         else zero)
            m &= eyr <= (jnp.where(syr, lim, zero) if syr is not None
                         else zero)
            return m

        return elig, red

    def _deep_smooth(self, k, v_std, f_deep, geom, coarse_params,
                     local_params):
        """Deep-halo smoothing at level k.

        v_std: the (bx+2, by+2) standard ng=1 padded block (ghost values
        ignored -- each round starts with its own exchange).  f_deep: the
        level's RHS on the deep frame (seam halos exchanged; physical
        ghosts never read).  Returns the ng=1 padded block with depth-1
        valid ghosts, exactly as ops._smooth_n would (bitwise, for
        smoother='rbgs')."""
        lg = self.local_grids[k]
        bx, by = lg.nx, lg.ny
        d, dpx, dpy = geom["d"], geom["dpx"], geom["dpy"]
        bc, px, py = self.bc, self.px, self.py
        elig, red = self._deep_frame_masks(k, geom)

        def refresh(a):
            return deep_phys_refresh(a, bc, px, py, dpx, dpy)

        v_int = v_std[1:-1, 1:-1]
        vd = None
        if self.smoother == "rbgs":
            def sweep(s, vd):
                lim = jnp.asarray(d, jnp.int32) - (2 * s + 1)
                upd = self._deep_gs_update(k, vd, f_deep, coarse_params,
                                           local_params)
                vd = refresh(jnp.where(elig(lim) & red, upd, vd))
                upd = self._deep_gs_update(k, vd, f_deep, coarse_params,
                                           local_params)
                vd = refresh(jnp.where(elig(lim - 1) & ~red, upd, vd))
                return vd

            for n_r in geom["sweeps_rb"]:
                vd = deep_pad_exchange(v_int, bc, px, py, dpx, dpy)
                vd = jax.lax.fori_loop(0, n_r, sweep, vd)
                v_int = vd[dpx:dpx + bx, dpy:dpy + by]

        elif self.smoother == "jacobi":
            omega = jnp.asarray(0.8, v_std.dtype)

            def step(s, vd):
                lim = jnp.asarray(d, jnp.int32) - (s + 1)
                upd = self._deep_gs_update(k, vd, f_deep, coarse_params,
                                           local_params)
                return refresh(jnp.where(
                    elig(lim), vd + omega * (upd - vd), vd))

            for n_r in geom["sweeps_j"]:
                vd = deep_pad_exchange(v_int, bc, px, py, dpx, dpy)
                vd = jax.lax.fori_loop(0, n_r, step, vd)
                v_int = vd[dpx:dpx + bx, dpy:dpy + by]

        else:  # chebyshev acceleration of the Jacobi iteration
            # z = M(v) - v = D^{-1}(f - A v) for every operator class;
            # eigenvalues of D^{-1}A lie in (0, 2) (diagonally dominant
            # M-matrix), smooth the upper 3/4 of the spectrum
            dt = v_std.dtype
            lmax, lmin = 2.0, 0.5
            theta = jnp.asarray((lmax + lmin) / 2.0, dt)
            delta = jnp.asarray((lmax - lmin) / 2.0, dt)
            sigma = theta / delta

            for n_r in geom["sweeps_j"]:
                vd = deep_pad_exchange(v_int, bc, px, py, dpx, dpy)
                rho = 1.0 / sigma
                upd = self._deep_gs_update(k, vd, f_deep, coarse_params,
                                           local_params)
                lim0 = jnp.asarray(d - 1, jnp.int32)
                z = jnp.where(elig(lim0), upd - vd, 0.0)
                dk = z / theta
                vd = refresh(jnp.where(elig(lim0), vd + dk, vd))
                for s in range(1, n_r):
                    rho_new = 1.0 / (2.0 * sigma - rho)
                    lim = jnp.asarray(d - (s + 1), jnp.int32)
                    upd = self._deep_gs_update(k, vd, f_deep,
                                               coarse_params, local_params)
                    z = jnp.where(elig(lim), upd - vd, 0.0)
                    dk = rho_new * rho * dk + (2.0 * rho_new / delta) * z
                    vd = refresh(jnp.where(elig(lim), vd + dk, vd))
                    rho = rho_new
                v_int = vd[dpx:dpx + bx, dpy:dpy + by]

        if vd is None:
            # empty sweep schedule (nsmooth=0): no smoothing happened,
            # but the contract still promises depth-1 valid ghosts
            vd = deep_pad_exchange(v_int, bc, px, py, dpx, dpy)
        return vd[dpx - 1:dpx + bx + 1, dpy - 1:dpy + by + 1]

    def _deep_rhs(self, k, f_std, geom):
        """The level RHS on the deep frame: seam halos exchanged once per
        level visit (f is constant across both smoothing calls); physical
        ghosts are never read by the masked updates."""
        return deep_pad_exchange(f_std[1:-1, 1:-1], self.bc, self.px,
                                 self.py, geom["dpx"], geom["dpy"],
                                 phys=False)

    # ------------------------------------------------------------------
    # fused Pallas deep smoothing (constant-coefficient rbgs only)
    # ------------------------------------------------------------------
    def _pallas_interpret(self):
        return jax.default_backend() != "tpu"

    def _kernel_flags(self):
        """The 8 SMEM flags [seam_xl..yr, own_xl..yr] for this block."""
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        one = jnp.ones((), jnp.int32)
        zero = jnp.zeros((), jnp.int32)

        def flags_for(p, idx, lb, rb):
            if p == 1:
                return zero, zero, one, one
            per_l = one if lb == "periodic" else (idx > 0).astype(jnp.int32)
            per_r = one if rb == "periodic" else \
                (idx < p - 1).astype(jnp.int32)
            own_l = (idx == 0).astype(jnp.int32)
            own_r = (idx == p - 1).astype(jnp.int32)
            return per_l, per_r, own_l, own_r

        sxl, sxr, oxl, oxr = flags_for(self.px, ix, self.bc.xlb,
                                       self.bc.xrb)
        syl, syr, oyl, oyr = flags_for(self.py, iy, self.bc.ylb,
                                       self.bc.yrb)
        return jnp.stack([sxl, sxr, syl, syr, oxl, oxr, oyl, oyr])

    def _smooth_kernel(self, k, n_r, emit, dtype):
        from pyro2_tpu.multigrid.pallas_sharded_mg import \
            build_deep_smooth_kernel
        cache = getattr(self, "_psk_cache", None)
        if cache is None:
            cache = self._psk_cache = {}
        key = (k, n_r, emit, self.smoother, jnp.dtype(dtype).name,
               self._pallas_ncoef)
        fn = cache.get(key)
        if fn is None:
            geom = self._deep_geom[k]
            lg = self.local_grids[k]
            g = self.serial.grids[k]
            fn = build_deep_smooth_kernel(
                bx=lg.nx, by=lg.ny, dpx=geom["dpx"], dpy=geom["dpy"],
                d=geom["d"], n_sweeps=n_r, dx=g.dx, dy=g.dy,
                bc=self.bc, px=self.px, py=self.py, emit=emit,
                smoother=self.smoother, ncoef=self._pallas_ncoef,
                dtype=dtype, interpret=self._pallas_interpret())
            cache[key] = fn
        return fn

    def _kernel_coeffs(self, k, local_params, dtype):
        """The (ncoef, Fx, Fy) deep-frame coefficient stack for level k's
        smoothing kernel (None for the constant-coefficient operator)."""
        return None

    def _core_coeff_stacks(self, coarse_params, kc, dtype):
        """Per-level (ncoef, q, q) replicated coefficient stacks for the
        fused coarse core, levels 0..kc (None for constant coefficients)."""
        return None

    def _deep_smooth_pallas(self, k, v_std, f_deep, geom, coarse_params,
                            local_params, emit_last="v"):
        """The Pallas twin of _deep_smooth (rbgs): one kernel per
        smoothing round; the final round optionally fuses the residual
        [+ restrict].  Returns (ng=1 padded block, extra-or-None)."""
        lg = self.local_grids[k]
        bx, by = lg.nx, lg.ny
        dpx, dpy = geom["dpx"], geom["dpy"]
        dtype = v_std.dtype
        flags = self._kernel_flags()
        C = self._kernel_coeffs(k, local_params, dtype)
        if C is None:
            ab = jnp.stack([coarse_params["alpha"],
                            coarse_params["beta"]]).astype(dtype)

        sweeps = geom["sweeps_rb" if self.smoother == "rbgs"
                      else "sweeps_j"]
        v_int = v_std[1:-1, 1:-1]
        extra = None
        for i, n_r in enumerate(sweeps):
            # seam halos only -- the kernel's entry refresh fills the
            # physical ghosts in-VMEM
            vd = deep_pad_exchange(v_int, self.bc, self.px, self.py,
                                   dpx, dpy, phys=False)
            emit = emit_last if i == len(sweeps) - 1 else "v"
            kfn = self._smooth_kernel(k, n_r, emit, dtype)
            outs = (kfn(flags, ab, vd, f_deep) if C is None
                    else kfn(flags, vd, f_deep, C))
            if emit == "v":
                vd, = outs
            else:
                vd, extra = outs
                if emit == "v_r":
                    # full-frame residual (zero outside interior) ->
                    # owned interior block
                    extra = extra[dpx:dpx + bx, dpy:dpy + by]
            v_int = vd[dpx:dpx + bx, dpy:dpy + by]
        return vd[dpx - 1:dpx + bx + 1, dpy - 1:dpy + by + 1], extra

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
        if self.use_pallas:
            from pyro2_tpu.multigrid.pallas_sharded_mg import (
                build_core_kernel, build_core_kernel_general)
            cache = getattr(self, "_psk_cache", None)
            if cache is None:
                cache = self._psk_cache = {}
            key = ("core", kc, f_glob.dtype.name)
            core = cache.get(key)
            Cs = self._core_coeff_stacks(coarse_params, kc, f_glob.dtype)
            if core is None:
                if Cs is None:
                    core = build_core_kernel(
                        self.serial, kc, f_glob.dtype,
                        interpret=self._pallas_interpret())
                else:
                    core = build_core_kernel_general(
                        self.serial, kc, self._pallas_ncoef, f_glob.dtype,
                        interpret=self._pallas_interpret())
                cache[key] = core
            if Cs is None:
                ab = jnp.stack([coarse_params["alpha"],
                                coarse_params["beta"]]).astype(f_glob.dtype)
                v_glob = core(ab, jnp.zeros_like(f_glob), f_glob)
            else:
                v_glob = core(jnp.zeros_like(f_glob), f_glob, Cs)
        else:
            v_glob = self.serial._v_cycle(kc, jnp.zeros_like(f_glob),
                                          f_glob, coarse_params)
        bx, by = gk.nx // self.px, gk.ny // self.py
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        return jax.lax.dynamic_slice(
            v_glob, (ix * bx, iy * by), (bx + 2 * ng, by + 2 * ng))

    def _sharded_v_cycle(self, k, v, f, coarse_params, local_params,
                         want_top_r=False):
        """V-cycle over the block-partitioned levels; unrolls at trace time
        (mirrors CellCenterMG2d._v_cycle).  want_top_r (kernel mode):
        additionally return the post-smooth residual, fused into the
        final kernel."""
        ops = self._ops
        lg = self.local_grids[k]
        lp = self._level_params(coarse_params, local_params)
        if k == 0:
            # only reachable on a 1x1 mesh: plain bottom smooth
            return ops._smooth_n(0, v, f, self.nsmooth_bottom, lp)

        geom = self._deep_geom.get(k)
        lg_c = self.local_grids[k - 1]
        if geom is not None and self.use_pallas:
            f_deep = self._deep_rhs(k, f, geom)
            v, f_c = self._deep_smooth_pallas(k, v, f_deep, geom,
                                              coarse_params, local_params,
                                              emit_last="v_fc")
        else:
            if geom is not None:
                f_deep = self._deep_rhs(k, f, geom)
                v = self._deep_smooth(k, v, f_deep, geom, coarse_params,
                                      local_params)
            else:
                v = ops._smooth_n(k, v, f, self.nsmooth, lp)
            r = ops._residual(k, v, f, lp)
            f_c = restrict_array(r, lg, lg_c)
        if k - 1 >= self.k_cross:
            v_c = self._sharded_v_cycle(k - 1, jnp.zeros_like(f_c), f_c,
                                        coarse_params, local_params)
        else:
            v_c = self._replicated_coarse(k - 1, f_c, coarse_params)

        if geom is not None and self.use_pallas:
            # prolong+correct fused on the MXU (the jnp prolong's
            # strided interleave costs more than the whole rest of the
            # cycle on TPU)
            from pyro2_tpu.multigrid.pallas_sharded_mg import \
                build_correct_kernel
            cache = getattr(self, "_psk_cache", None)
            if cache is None:
                cache = self._psk_cache = {}
            ckey = ("correct", k, v.dtype.name)
            ck = cache.get(ckey)
            if ck is None:
                ck = build_correct_kernel(
                    bx=lg.nx, by=lg.ny, dtype=v.dtype,
                    interpret=self._pallas_interpret())
                cache[ckey] = ck
            v, = ck(v, v_c)
        else:
            e = prolong_array(v_c, lg_c, lg)
            from pyro2_tpu.mesh.indexer import ai
            v = v.at[lg.ilo:lg.ihi + 1,
                     lg.jlo:lg.jhi + 1].add(ai(e, lg).v())
        if geom is not None:
            # the deep smoother re-exchanges v itself; no ghost fill needed
            if self.use_pallas:
                v, r = self._deep_smooth_pallas(
                    k, v, f_deep, geom, coarse_params, local_params,
                    emit_last="v_r" if want_top_r else "v")
                return (v, r) if want_top_r else v
            return self._deep_smooth(k, v, f_deep, geom, coarse_params,
                                     local_params)
        v = ops._fill_v(k, v)
        return ops._smooth_n(k, v, f, self.nsmooth, lp)

    def _cycle_local(self, v, f, coarse_params, local_params):
        """One V-cycle + residual + psum'd norm on the local padded block
        (must run inside shard_map over axes "x","y")."""
        top = self.nlevels - 1
        g = self.soln_grid
        ng = self.ng
        pallas_top = self.use_pallas and self._deep_geom.get(top) is not None
        if pallas_top:
            # the final UP kernel fuses the top-level residual
            v, r_int = self._sharded_v_cycle(top, v, f, coarse_params,
                                             local_params, want_top_r=True)
        else:
            v = self._sharded_v_cycle(top, v, f, coarse_params,
                                      local_params)
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
                self.nsmooth_bottom, self.comm_mode, self.smoother,
                self.nsmooth_speed, self.k_cross, self.use_pallas,
                id(self.mesh))

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
        # check_vma off in kernel mode: pallas_call outputs inside the
        # traced body do not thread varying-mesh-axes metadata through
        # in-kernel loop carries
        body = jax.shard_map(body, mesh=self.mesh,
                             in_specs=(spec, spec, cspec, lspec),
                             out_specs=(spec, spec, P()),
                             check_vma=not self.use_pallas)
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
            out_specs=(spec, spec, P(), P(), P()),
            check_vma=not self.use_pallas)
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


def make_sharded_mg(*args, **kwargs):
    """A ShardedMG with the fused Pallas kernels enabled on TPU when the
    configuration supports them (transparent jnp-cycle construction
    otherwise).  The solver tiers (diffusion, incompressible +/- viscous,
    burgers_viscous) build their inline MG through this.

    The kernels compile lazily inside the solve jit, so a Mosaic
    failure would otherwise surface mid-production; a warm-up solve at
    construction forces that compile NOW and falls back to the jnp
    cycles if it fails (the serial fused cycle eager-compiles for the
    same reason, pallas_gen_mg.build_fused_cycle_general)."""
    if jax.default_backend() == "tpu" and "use_pallas" not in kwargs:
        try:
            smg = ShardedMG(*args, use_pallas=True, **kwargs)
            # warm-up: rtol above the 1e33 initial residual -> the
            # while_loop body never runs, but jit compiles it (kernels
            # included); state is untouched zeros
            smg.init_zeros()
            smg.init_RHS(jnp.zeros_like(smg.f_int))
            smg.solve(rtol=1.e34)
            smg.init_zeros()
            smg.initialized_rhs = 0
            return smg
        except Exception as e:
            if not isinstance(e, ValueError):
                print(f"WARNING: fused sharded MG unavailable "
                      f"({type(e).__name__}: {str(e)[:120]}); using the "
                      "jnp cycles")
    return ShardedMG(*args, **kwargs)


class ShardedVarCoeffMG(ShardedMG):
    """SPMD variable-coefficient multigrid: div(eta grad phi) = f.

    The distributed twin of VarCoeffCCMG2d: the serial instance computes
    the coefficient hierarchy (cell-centered eta restricted down, averaged
    onto edges pre-scaled by 1/dx^2) once at construction; every sharded
    level's edge coefficients are then laid out block-padded at that
    level's halo depth so each device holds exactly its own block (plus
    coefficient halos).  The smoother / residual are the serial operators
    borrowed onto local grids (deep mode evaluates the identical update
    formula on the deep frame).
    """

    _pallas_ncoef = 2

    def __init__(self, nx, ny, mesh, *,
                 xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0,
                 xl_BC_type="dirichlet", xr_BC_type="dirichlet",
                 yl_BC_type="dirichlet", yr_BC_type="dirichlet",
                 nsmooth=10, nsmooth_bottom=50,
                 coeffs=None, coeffs_bc=None,
                 comm_mode="deep", smoother="rbgs", nsmooth_speed=None,
                 use_pallas=False, verbose=0):
        _check_bcs(xl_BC_type, xr_BC_type, yl_BC_type, yr_BC_type)

        serial = VarCoeffCCMG2d(
            nx, ny, xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
            xl_BC_type=xl_BC_type, xr_BC_type=xr_BC_type,
            yl_BC_type=yl_BC_type, yr_BC_type=yr_BC_type,
            nsmooth=nsmooth, nsmooth_bottom=nsmooth_bottom,
            coeffs=coeffs, coeffs_bc=coeffs_bc, verbose=0)
        self._setup_mesh(serial, mesh, verbose, comm_mode=comm_mode,
                         smoother=smoother, nsmooth_speed=nsmooth_speed,
                         use_pallas=use_pallas)

        # block-padded edge-coefficient layouts for the sharded levels
        self._local_coeffs = {
            "eta_x": {k: self._coeff_layout(serial.edge_coeffs[k].x, k)
                      for k in range(self.k_cross, self.nlevels)},
            "eta_y": {k: self._coeff_layout(serial.edge_coeffs[k].y, k)
                      for k in range(self.k_cross, self.nlevels)},
        }

    def _coarse_params(self):
        p = self.serial._params()
        return {k: self._dummy_tail(v, self.k_cross) for k, v in p.items()}

    def _local_params(self):
        return self._local_coeffs

    def _level_params(self, coarse_params, local_params):
        return self._ng1_view(local_params)

    def _deep_gs_update(self, k, v, f, coarse_params, local_params):
        ex = local_params["eta_x"][k]
        ey = local_params["eta_y"][k]
        exp1 = jnp.roll(ex, -1, -2)
        eyp1 = jnp.roll(ey, -1, -1)
        denom = exp1 + ex + eyp1 + ey
        return (-f +
                exp1 * jnp.roll(v, -1, -2) + ex * jnp.roll(v, 1, -2) +
                eyp1 * jnp.roll(v, -1, -1) + ey * jnp.roll(v, 1, -1)) / denom

    def _kernel_coeffs(self, k, local_params, dtype):
        return jnp.stack([local_params["eta_x"][k],
                          local_params["eta_y"][k]]).astype(dtype)

    def _core_coeff_stacks(self, coarse_params, kc, dtype):
        return tuple(
            jnp.stack([coarse_params["eta_x"][k],
                       coarse_params["eta_y"][k]]).astype(dtype)
            for k in range(kc + 1))


class ShardedGeneralMG(ShardedMG):
    """SPMD general-form multigrid:
    alpha phi + div(beta grad phi) + gamma . grad(phi) = f.

    The distributed twin of GeneralMG2d (homogeneous BCs only; the serial
    class's inhomogeneous BC functions are not supported here).
    `coeffs` is a CellCenterData2d with alpha/beta/gamma_x/gamma_y, as for
    the serial class.
    """

    _pallas_ncoef = 5

    def __init__(self, nx, ny, mesh, *,
                 xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0,
                 xl_BC_type="dirichlet", xr_BC_type="dirichlet",
                 yl_BC_type="dirichlet", yr_BC_type="dirichlet",
                 nsmooth=10, nsmooth_bottom=50,
                 coeffs=None,
                 comm_mode="deep", smoother="rbgs", nsmooth_speed=None,
                 use_pallas=False, verbose=0):
        _check_bcs(xl_BC_type, xr_BC_type, yl_BC_type, yr_BC_type)

        serial = GeneralMG2d(
            nx, ny, xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
            xl_BC_type=xl_BC_type, xr_BC_type=xr_BC_type,
            yl_BC_type=yl_BC_type, yr_BC_type=yr_BC_type,
            nsmooth=nsmooth, nsmooth_bottom=nsmooth_bottom,
            coeffs=coeffs, verbose=0)
        self._setup_mesh(serial, mesh, verbose, comm_mode=comm_mode,
                         smoother=smoother, nsmooth_speed=nsmooth_speed,
                         use_pallas=use_pallas)

        rng = range(self.k_cross, self.nlevels)
        self._local_coeffs = {
            "alpha": {k: self._coeff_layout(serial.aux["alpha"][k], k)
                      for k in rng},
            "gamma_x": {k: self._coeff_layout(serial.aux["gamma_x"][k], k)
                        for k in rng},
            "gamma_y": {k: self._coeff_layout(serial.aux["gamma_y"][k], k)
                        for k in rng},
            "beta_x": {k: self._coeff_layout(serial.beta_edge[k].x, k)
                       for k in rng},
            "beta_y": {k: self._coeff_layout(serial.beta_edge[k].y, k)
                       for k in rng},
        }

    def _coarse_params(self):
        p = self.serial._params()
        return {k: self._dummy_tail(v, self.k_cross) for k, v in p.items()}

    def _local_params(self):
        return self._local_coeffs

    def _level_params(self, coarse_params, local_params):
        return self._ng1_view(local_params)

    def _deep_gs_update(self, k, v, f, coarse_params, local_params):
        g = self.serial.grids[k]
        al = local_params["alpha"][k]
        gx = 0.5 * local_params["gamma_x"][k] / g.dx
        gy = 0.5 * local_params["gamma_y"][k] / g.dy
        bx_ = local_params["beta_x"][k]
        by_ = local_params["beta_y"][k]
        bxp = jnp.roll(bx_, -1, -2)
        byp = jnp.roll(by_, -1, -1)
        denom = al - bxp - bx_ - byp - by_
        return (f -
                (bxp + gx) * jnp.roll(v, -1, -2) -
                (bx_ - gx) * jnp.roll(v, 1, -2) -
                (byp + gy) * jnp.roll(v, -1, -1) -
                (by_ - gy) * jnp.roll(v, 1, -1)) / denom

    def _kernel_coeffs(self, k, local_params, dtype):
        g = self.serial.grids[k]
        return jnp.stack([
            local_params["alpha"][k],
            local_params["beta_x"][k], local_params["beta_y"][k],
            0.5 * local_params["gamma_x"][k] / g.dx,
            0.5 * local_params["gamma_y"][k] / g.dy]).astype(dtype)

    def _core_coeff_stacks(self, coarse_params, kc, dtype):
        grids = self.serial.grids
        return tuple(
            jnp.stack([
                coarse_params["alpha"][k],
                coarse_params["beta_x"][k], coarse_params["beta_y"][k],
                0.5 * coarse_params["gamma_x"][k] / grids[k].dx,
                0.5 * coarse_params["gamma_y"][k] / grids[k].dy]
            ).astype(dtype)
            for k in range(kc + 1))
