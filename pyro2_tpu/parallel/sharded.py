"""SPMD solver steps over a block-partitioned device mesh.

The single-block solver kernels are ghost-cell-oblivious above the fill
(like every reference solver above fill_BC), so the SPMD step is: shard the
global interior over the mesh -> pad each block -> halo_exchange (ppermute +
edge-block physical fills) -> run the SAME single-block step on the local
padded block -> return the updated interior.

Self-sufficiency (nothing global is ever materialized):

* problem ICs are evaluated block-by-block on bitwise-global block grids
  (parallel/blocks.py);
* dt is the solver's CFL rule on each block reduced with `lax.pmin`
  (bitwise equal to the serial global min);
* solid-wall Riemann clamps are BLOCK-LOCAL: the static domain-interface
  mask is gated per block by `lax.axis_index`, so only blocks owning a
  domain boundary clamp (compressible/riemann.py `_solid_mask`).

Supported solvers: "compressible" and "swe" -- both expose the pure jitted
step contract step(U, t, dt) (Simulation._make_step).  The reference has no
counterpart for any of this (SURVEY.md section 2.9).

Extended (user-registered) BCs -- hse / ambient / ramp (reference
compressible/BC.py:48-182) -- are supported: after the per-variable
standard halo exchange, the stack-level extended fills run on EVERY block
and are masked in only on the blocks owning that domain edge (same gating
as the physical fills in mesh_comm.halo_exchange).  Coordinate-dependent
fills (ramp) see a grid proxy whose x/y arrays are the block's
bitwise-global coordinate window, built from traced axis indices with the
exact Grid2d float expressions (mesh/grid.py:66-72).  The in-step source
ghost fill (aux_data.fill_bc_stack, unsplit_fluxes.apply_source_terms)
is replaced by a block-gated fill with NO exchange: source fields are
pointwise functions of the halo-exchanged state, so their seam ghosts are
already bitwise-correct and only domain-edge fills apply.

Spherical geometry is supported (r04): the SPMD program is one trace
but geometry factor arrays differ per block, so the global f64 planes
(incl. the avisc trig planes) are precomputed once and traced per-block
windows are dynamic-sliced into the local grid before each trace
(_gate_geometry, the same holder-mutation mechanism as the solid
flags); blockwise init builds SphericalPolar block grids with
bitwise-global coordinates (parallel/blocks.py).

Limitations: a grid must divide evenly over the mesh; problems with
`source_terms` (global-coordinate heating) are rejected; extended BCs are
not yet supported by the overlapped (halo-hiding) step variant, nor is
spherical geometry by overlap/extended BCs.
"""

import importlib

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import pyro2_tpu.mesh.boundary as bnd
from pyro2_tpu.mesh.indexer import _edge_fill
from pyro2_tpu.parallel.blocks import blockwise_init_interior
from pyro2_tpu.parallel.mesh_comm import halo_exchange
from pyro2_tpu.util import profile_pyro

__all__ = ["ShardedSim", "ShardedCompressible", "ShardedSWE",
           "make_sharded_compressible_step"]

_SUPPORTED_BCS = frozenset(
    ["outflow", "neumann", "dirichlet", "reflect", "reflect-odd",
     "reflect-even", "periodic"])


class _TracedSolid:
    """Solid-wall flags holder whose attributes are set to traced
    block-gated values inside the shard_map body (before the local step
    traces), so only domain-edge blocks apply the Riemann wall clamp."""

    def __init__(self, base):
        self.xl = base.xl
        self.xr = base.xr
        self.yl = base.yl
        self.yr = base.yr


class ShardedSim:
    """A solver's CTU step SPMD-parallelized over a device mesh.

    Builds a block-local Simulation (same runtime parameters, local block
    dimensions) and wraps its pure step with shard_map: halo exchange
    replaces the driver-level ghost fill.
    """

    _SOLVERS = ("compressible", "swe")

    def __init__(self, solver, rp, mesh, *, problem="test", ng=4,
                 overlap=False):
        if solver not in self._SOLVERS:
            raise ValueError(
                f"solver '{solver}' has no sharded step "
                f"(supported: {sorted(self._SOLVERS)})")
        self.solver = solver
        solver_mod = importlib.import_module(f"pyro2_tpu.solvers.{solver}")
        self._solver_mod = solver_mod
        self.rp = rp
        self.problem = problem
        self._problem_mod = importlib.import_module(
            f"pyro2_tpu.solvers.{solver}.problems.{problem}")
        # problem-parameter layering (pyro_sim.py initialize_problem):
        # PROBLEM_PARAMS provide defaults, caller-set values win
        for k, v in getattr(self._problem_mod, "PROBLEM_PARAMS",
                            {}).items():
            if k not in rp.params:
                rp.set_param(k, v, no_new=False)

        self.mesh = mesh
        self.px = int(mesh.devices.shape[0])
        self.py = int(mesh.devices.shape[1])

        nx = rp.get_param("mesh.nx")
        ny = rp.get_param("mesh.ny")
        if nx % self.px != 0 or ny % self.py != 0:
            raise ValueError("grid must divide evenly over the device mesh")
        self.nx, self.ny = nx, ny
        bx, by = nx // self.px, ny // self.py

        # a block-LOCAL simulation whose jitted step becomes the shard_map
        # body.  Its problem init is a no-op (real ICs are per-block on
        # bitwise-global block grids); block physical extents only matter
        # through dx/dy (Cartesian factors are uniform).
        local_rp = _clone_rp(rp)
        local_rp.set_param("mesh.nx", bx)
        local_rp.set_param("mesh.ny", by)
        xmin = rp.get_param("mesh.xmin")
        xmax = rp.get_param("mesh.xmax")
        ymin = rp.get_param("mesh.ymin")
        ymax = rp.get_param("mesh.ymax")
        local_rp.set_param("mesh.xmax", xmin + (xmax - xmin) * bx / nx)
        local_rp.set_param("mesh.ymax", ymin + (ymax - ymin) * by / ny)
        self.local_sim = solver_mod.Simulation(
            solver, problem, lambda d, r: None, local_rp)
        self.local_sim.initialize(ng=ng)
        self._base_solid = self.local_sim.solid
        self._traced_solid = _TracedSolid(self._base_solid)
        self.local_sim.solid = self._traced_solid
        self._traced_edges = None
        if hasattr(self.local_sim, "domain_edges"):
            self._traced_edges = self.local_sim.domain_edges
        self.local_sim.tc = profile_pyro.TimerCollection()

        self.local_grid = self.local_sim.cc_data.grid
        self.names = list(self.local_sim.cc_data.names)
        self.bcs = [self.local_sim.cc_data.BCs[n] for n in self.names]
        self.nvar = len(self.bcs)
        self.ng = ng

        # BC validation AFTER local initialize (which registers the
        # solver's extended BCs via define_bc)
        ext_used = False
        for edge in ("xl", "xr", "yl", "yr"):
            b = rp.get_param(f"mesh.{edge}boundary")
            if b in bnd.ext_bcs:
                ext_used = True
            elif b not in _SUPPORTED_BCS:
                raise ValueError(
                    f"boundary '{b}' is not supported by the sharded "
                    "path (it would silently mis-fill block seams)")
        self._has_ext = ext_used
        if ext_used and overlap:
            raise ValueError(
                "extended BCs are not supported by the overlapped step "
                "variant yet; use overlap=False")
        if getattr(self._problem_mod, "source_terms", None) is not None:
            raise ValueError(
                "problems with source_terms (global-coordinate heating) "
                "have no sharded step")
        if hasattr(self.local_sim, "aux_data"):
            # in-step source ghost fill -> block-gated, exchange-free
            self.local_sim.aux_data.fill_bc_stack = \
                self._make_gated_stack_fill(self.local_sim.aux_data)

        # spherical geometry: the SPMD program is one trace, but the
        # geometry factor arrays differ per block -- precompute the
        # GLOBAL f64 planes once and dynamic-slice traced per-block
        # windows into the local grid before each trace (_gate_geometry,
        # the same holder-mutation mechanism as the solid flags)
        self._spherical = getattr(self.local_grid, "coord_type", 0) == 1
        if self._spherical:
            if overlap:
                raise ValueError("overlap is not supported with "
                                 "spherical geometry")
            if ext_used:
                raise ValueError("extended BCs are not supported with "
                                 "spherical geometry in the sharded path")
            self._setup_spherical_planes()

        if overlap:
            # core-compute ∥ halo-exchange pipelining (parallel/overlap.py):
            # bitwise-identical results, collectives off the critical path
            from pyro2_tpu.parallel.overlap import build_overlapped_step
            self._step = build_overlapped_step(self)
        else:
            self._step = self._build()
            # eligible simple configurations run the block-local step as
            # the fused Pallas band kernel INSIDE shard_map on TPU (the
            # single-chip 3-5x carried to multi-chip); anything else
            # keeps the jnp block step
            if jax.default_backend() == "tpu":
                fused = None
                try:
                    fused = self._build_fused()
                except Exception as e:
                    # _build_fused returns None for coverage gates; an
                    # exception here is an unexpected build failure --
                    # fall back but always say so (a silent 3-5x
                    # slowdown would mask the bug)
                    print(f"WARNING: fused sharded step build failed "
                          f"({type(e).__name__}: {e}); using the jnp "
                          "block step")
                if fused is not None:
                    self._step = fused
        self._dt_fn = self._build_dt()
        self._global_sim = None

    def _setup_spherical_planes(self):
        """Global spherical geometry planes (np f64, exactly the serial
        grid's) for traced per-block windows."""
        import numpy as np

        from pyro2_tpu.mesh.grid import SphericalPolar
        rp = self.rp
        gg = SphericalPolar(self.nx, self.ny, ng=self.ng,
                            xmin=rp.get_param("mesh.xmin"),
                            xmax=rp.get_param("mesh.xmax"),
                            ymin=rp.get_param("mesh.ymin"),
                            ymax=rp.get_param("mesh.ymax"))
        planes = {n: np.asarray(getattr(gg, n))
                  for n in ("Lx", "Ly", "Ax", "Ay", "dlogAx", "dlogAy",
                            "V", "x2d")}
        qx, qy = gg.qx, gg.qy

        def rows(v):
            return np.broadcast_to(np.asarray(v)[:, None], (qx, qy))

        def lanes(v):
            return np.broadcast_to(np.asarray(v)[None, :], (qx, qy))

        # the artificial-viscosity trig planes (interface.py geom_plane)
        planes.update({
            "_plane_rc": rows(gg.xl), "_plane_rr": rows(gg.x),
            "_plane_rl": rows(gg.x - gg.dx),
            "_plane_sinc": lanes(np.sin(gg.yl)),
            "_plane_sint": lanes(np.sin(gg.y)),
            "_plane_sinb": lanes(np.sin(gg.y - gg.dy)),
        })
        self._geo_planes = {k: jnp.asarray(v) for k, v in planes.items()}

    def _gate_geometry(self):
        """Point the local grid's geometry arrays at this block's traced
        windows of the global planes (inside the shard_map body, before
        the local step traces)."""
        if not self._spherical:
            return
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        g = self.local_grid
        start = (ix * g.nx, iy * g.ny)
        for name, plane in self._geo_planes.items():
            win = jax.lax.dynamic_slice(plane, start, (g.qx, g.qy))
            setattr(g, name, win)

    def _gate_solid(self):
        """Point the traced-solid holder at block-gated flags (called
        inside the shard_map body, before the local step traces)."""
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        base = self._base_solid
        ts = self._traced_solid
        one = jnp.asarray(1, jnp.int32)
        # statically-open walls stay static ints (keeps the no-clamp fast
        # path and Pallas eligibility); solid walls become block-gated
        ts.xl = jnp.where(ix == 0, one, 0) if base.xl else 0
        ts.xr = jnp.where(ix == self.px - 1, one, 0) if base.xr else 0
        ts.yl = jnp.where(iy == 0, one, 0) if base.yl else 0
        ts.yr = jnp.where(iy == self.py - 1, one, 0) if base.yr else 0
        if self._traced_edges is not None:
            # domain-edge flags for window-semantics masking (avisc):
            # gated for EVERY BC type, since the reference zeroes avisc
            # outside the global interior window regardless of BC
            es = self._traced_edges
            es.xl = jnp.where(ix == 0, one, 0)
            es.xr = jnp.where(ix == self.px - 1, one, 0)
            es.yl = jnp.where(iy == 0, one, 0)
            es.yr = jnp.where(iy == self.py - 1, one, 0)

    def _owns(self):
        """Traced per-edge domain-ownership flags for this block."""
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        return {"xlb": ix == 0, "xrb": ix == self.px - 1,
                "ylb": iy == 0, "yrb": iy == self.py - 1}

    def _make_bc_proxy(self, cc, t):
        """A ccdata stand-in for extended-BC fills inside the shard_map
        body: local grid statics + TRACED bitwise-global coordinate
        windows (the exact Grid2d float expressions, mesh/grid.py:66-72,
        with the block's coordinate shift from the axis indices)."""
        g = self.local_grid

        class _G:
            pass

        gp = _G()
        for a in ("dx", "dy", "ng", "ilo", "ihi", "jlo", "jhi",
                  "qx", "qy", "nx", "ny"):
            setattr(gp, a, getattr(g, a))
        sx = jax.lax.axis_index("x") * g.nx
        sy = jax.lax.axis_index("y") * g.ny
        xmin = self.rp.get_param("mesh.xmin")
        ymin = self.rp.get_param("mesh.ymin")
        gp.xl = (jnp.arange(g.qx) + sx - g.ng) * g.dx + xmin
        gp.xr = gp.xl + g.dx
        gp.x = 0.5 * (gp.xl + gp.xr)
        gp.yl = (jnp.arange(g.qy) + sy - g.ng) * g.dy + ymin
        gp.yr = gp.yl + g.dy
        gp.y = 0.5 * (gp.yl + gp.yr)

        class _Proxy:
            pass

        pr = _Proxy()
        pr.grid = gp
        pr.names = list(cc.names)
        pr.aux = cc.aux
        pr.get_aux = cc.aux.get
        pr.t = t if t is not None else 0.0
        return pr

    def _apply_ext_fills(self, cc, bcs_list, names, U, t):
        """Stack-level extended-BC fills, computed on every block and
        masked in on the owning blocks (same var-then-edge order as the
        serial fill_bc_stack, patch.py:199-220)."""
        owns = self._owns()
        proxy = self._make_bc_proxy(cc, t)
        for n, name in enumerate(names):
            bc = bcs_list[n]
            for edge in ("xlb", "xrb", "ylb", "yrb"):
                btype = getattr(bc, edge)
                if btype in bnd.ext_bcs:
                    filled = bnd.ext_bcs[btype](btype, edge, name,
                                                proxy, U)
                    U = jnp.where(owns[edge], filled, U)
        return U

    def _make_gated_stack_fill(self, aux_cc):
        """A fill_bc_stack replacement for source-like containers whose
        ghost values are pointwise functions of the (already exchanged)
        state: seam ghosts are left at their pointwise values (bitwise
        what the serial global fill leaves there) and only domain-edge
        blocks apply the physical/extended fills."""
        from pyro2_tpu.parallel.mesh_comm import gated_physical_fill
        g = self.local_grid
        px, py = self.px, self.py
        names = list(aux_cc.names)
        bcs_list = [aux_cc.BCs[n] for n in names]

        def fill(stack, t=None):
            for n, bc in enumerate(bcs_list):
                if any(getattr(bc, e) in bnd.ext_bcs
                       for e in ("xlb", "xrb", "ylb", "yrb")):
                    # ext edges handled at stack level below; standard
                    # edges of the same var still fill here (ext kinds
                    # no-op inside _edge_fill)
                    pass
                stack = stack.at[n].set(
                    gated_physical_fill(stack[n], g, bc, px, py))
            if self._has_ext:
                stack = self._apply_ext_fills(aux_cc, bcs_list, names,
                                              stack, t)
            return stack

        return fill

    def _fill_local(self, U, t=None):
        """Per-variable halo exchange of a local padded stack (BCs differ
        by variable), then any extended-BC fills on owning blocks."""
        g = self.local_grid
        U = jnp.stack([halo_exchange(U[n], g, self.bcs[n],
                                     self.px, self.py)
                       for n in range(self.nvar)])
        if self._has_ext:
            U = self._apply_ext_fills(self.local_sim.cc_data, self.bcs,
                                      self.names, U, t)
        return U

    def _build_fused(self, interpret=False):
        """The block-local step as the fused Pallas band kernel inside
        shard_map (carrying the single-chip kernel win to multi-chip),
        or None when the configuration is outside the plain kernels'
        coverage (sources, sponge, floors, solid walls, extended BCs,
        spherical -- those keep the jnp block step)."""
        lg = self.local_grid
        ng = self.ng
        if self._spherical or self._has_ext:
            return None
        if self.solver == "compressible":
            rp = self.rp
            base = self._base_solid
            if (rp.get_param("compressible.grav") != 0.0 or
                    rp.get_param("sponge.do_sponge") or
                    rp.get_param("compressible.small_dens") > 0.0 or
                    any((base.xl, base.xr, base.yl, base.yr))):
                return None
            from pyro2_tpu.solvers.compressible.pallas_step import (
                _vmem_tile, make_pallas_ctu_step_padded)
            to_p, from_p, _f, step_p = make_pallas_ctu_step_padded(
                lg.nx, lg.ny, lg.dx, lg.dy, rp.get_param("eos.gamma"),
                rp.params, self.local_sim.ivars,
                tile_rows=_vmem_tile(lg.nx, lg.ny), interpret=interpret)

            def kstep(U, t, dt):
                return from_p(step_p(to_p(U), dt))
        elif self.solver == "swe":
            from pyro2_tpu.solvers.swe.pallas_step import \
                make_pallas_swe_step_padded
            to_p, from_p, _f, step_p = make_pallas_swe_step_padded(
                self.local_sim, interpret=interpret)

            def kstep(U, t, dt):
                return from_p(step_p(to_p(U), t, dt))
        else:
            return None

        def body(U_int, t, dt):
            pad = [(0, 0)] * U_int.ndim
            pad[-2] = (ng, ng)
            pad[-1] = (ng, ng)
            U = self._fill_local(jnp.pad(U_int, pad), t)
            U = kstep(U, t, dt)
            # the kernel leaves ghost rows/lanes stale; only the interior
            # is returned (exactly the jnp block step's contract)
            return U[..., ng:-ng, ng:-ng]

        spec = P(None, "x", "y")
        # check_vma off: pallas_call outputs inside the traced body do
        # not thread varying-mesh-axes metadata (same as the fused
        # sharded MG, sharded_mg.py kernel mode)
        return jax.jit(jax.shard_map(body, mesh=self.mesh,
                                     in_specs=(spec, P(), P()),
                                     out_specs=spec, check_vma=False))

    def _build(self):
        ng = self.ng
        # the step traces with the traced-solid holder installed
        local_step = self.local_sim._make_step()

        def body(U_int, t, dt):
            pad = [(0, 0)] * U_int.ndim
            pad[-2] = (ng, ng)
            pad[-1] = (ng, ng)
            U = self._fill_local(jnp.pad(U_int, pad), t)
            self._gate_solid()
            self._gate_geometry()
            U = local_step(U, t, dt)
            return U[..., ng:-ng, ng:-ng]

        spec = P(None, "x", "y")
        body_sharded = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(spec, P(), P()),
            out_specs=spec)
        return jax.jit(body_sharded)

    def build_step_with_particles(self, particles):
        """A jitted (U_int, pos, active, t, dt) -> (U_int', pos',
        active') step: the sharded grid step followed by the replicated
        particle advance on the post-step velocities -- with the ghost
        ring stale from the pre-step fill, exactly like the serial
        evolve's update_particles call (compressible/simulation.py).

        `particles` is a serial global-grid Particles instance (supplies
        geometry, BCs, enforcement); its positions/active arrays are the
        replicated carries.
        """
        from pyro2_tpu.driver_loop import _particle_velocity_fn
        from pyro2_tpu.parallel.sharded_particles import \
            make_sharded_particle_advance
        adv = make_sharded_particle_advance(particles, self.local_grid,
                                            self.px, self.py)
        local_step = self.local_sim._make_step()
        vel = _particle_velocity_fn(self.local_sim)
        ng = self.ng

        def body(U_int, pos, active, t, dt):
            pad = [(0, 0)] * U_int.ndim
            pad[-2] = (ng, ng)
            pad[-1] = (ng, ng)
            U = self._fill_local(jnp.pad(U_int, pad), t)
            self._gate_solid()
            self._gate_geometry()
            U = local_step(U, t, dt)
            u2d, v2d = vel(U)
            pos, active = adv(pos, active, u2d, v2d, dt)
            return U[..., ng:-ng, ng:-ng], pos, active

        spec = P(None, "x", "y")
        return jax.jit(jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(spec, P(), P(), P(), P()),
            out_specs=(spec, P(), P())))

    def _build_dt(self):
        local_dt = self.local_sim._make_dt()
        ng = self.ng

        def body(U_int):
            pad = [(0, 0)] * U_int.ndim
            pad[-2] = (ng, ng)
            pad[-1] = (ng, ng)
            U = self._fill_local(jnp.pad(U_int, pad))
            self._gate_geometry()
            d = local_dt(U)
            return jax.lax.pmin(jax.lax.pmin(d, "x"), "y")

        spec = P(None, "x", "y")
        body_sharded = jax.shard_map(body, mesh=self.mesh,
                                     in_specs=spec, out_specs=P())
        return jax.jit(body_sharded)

    # -- public API ---------------------------------------------------------
    def init_interior(self):
        """The (nvar, nx, ny) problem ICs, initialized block-by-block and
        sharded over the mesh (no global materialization)."""
        return blockwise_init_interior(self.local_sim.cc_data,
                                       self._problem_mod.init_data,
                                       self.rp, self.mesh)

    @property
    def global_sim(self):
        """A GLOBAL serial Simulation on the same problem (built lazily;
        used by partition-invariance tests, never by the sharded path)."""
        if self._global_sim is None:
            self._global_sim = self._solver_mod.Simulation(
                self.solver, self.problem, self._problem_mod.init_data,
                self.rp)
            self._global_sim.initialize(ng=self.ng)
        return self._global_sim

    def global_interior(self):
        """The (nvar, nx, ny) global interior, sharded over the mesh."""
        gs = self.global_sim
        gg = gs.cc_data.grid
        U = gs.cc_data.data[:, gg.ilo:gg.ihi + 1, gg.jlo:gg.jhi + 1]
        sharding = NamedSharding(self.mesh, P(None, "x", "y"))
        return jax.device_put(U, sharding)

    def compute_dt(self, U_int):
        """The CFL dt: block-local CFL minima reduced with lax.pmin
        (bitwise equal to the serial global min)."""
        cfl = self.rp.get_param("driver.cfl")
        return cfl * float(self._dt_fn(U_int))

    def step(self, U_int, t, dt):
        """One sharded step on the (nvar, nx, ny) interior."""
        return self._step(U_int, t, dt)


class ShardedCompressible(ShardedSim):
    def __init__(self, rp, mesh, *, problem="test", ng=4, overlap=False):
        super().__init__("compressible", rp, mesh, problem=problem, ng=ng,
                         overlap=overlap)


class ShardedSWE(ShardedSim):
    def __init__(self, rp, mesh, *, problem="test", ng=4, overlap=False):
        super().__init__("swe", rp, mesh, problem=problem, ng=ng,
                         overlap=overlap)


def _clone_rp(rp):
    from pyro2_tpu.util.runparams import RuntimeParameters
    new = RuntimeParameters()
    new.params = dict(rp.params)
    new.param_comments = dict(rp.param_comments)
    return new


def make_sharded_compressible_step(rp, mesh, *, problem="test", ng=4):
    """Convenience constructor returning a ShardedCompressible."""
    return ShardedCompressible(rp, mesh, problem=problem, ng=ng)
