"""A fused Pallas TPU kernel for the full compressible CTU step.

The jnp-level step is ~100+ HBM passes (each windowed stage materializes
(nvar, qx, qy) arrays).  This kernel applies the partition argument already
proven bitwise for the multi-chip path (parallel/sharded.py) *within* a
chip: the padded global state lives in HBM; each program DMAs one
(nvar, T+2ng, qy) row-band (with ng-deep halos) into VMEM, runs the SAME
single-block CTU pipeline on it entirely on-chip, and writes back only its
T owned rows.  One HBM read + one write per cell per step instead of
hundreds.

Two tiers: `make_pallas_ctu_step_padded` is the periodic benchmark
configuration; `make_pallas_ctu_step_padded_general` covers gravity +
predictor-corrector sources, sponge, density floors, solid walls,
custom/extended BCs, passive species, and spherical geometry (factor
planes DMA'd per band, see SPH_PLANES).  The jnp step remains the
reference implementation and the fallback; tests/test_pallas_tpu.py
checks the kernels against it bitwise on hardware.
"""


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyro2_tpu.mesh.grid import Cartesian2d

NG = 4


# geometry planes the spherical band kernel DMAs alongside the state:
# the pipeline's grid-attribute reads (Lx..V), the radial coordinate for
# sources, and the precomputed avisc trig planes (host f64 -> f32, so
# in-kernel values are bitwise the jnp f32 path's)
SPH_PLANES = ("Lx", "Ly", "dlogAx", "dlogAy", "Ax", "Ay", "V", "x2d",
              "rc", "rr", "rl", "sinc", "sint", "sinb")


def _local_step_fn(tile_rows, ny, dx, dy, gamma, rp_params, ivars_proto,
                   stages=4, *, ny_actual=None, nx_total=None,
                   small_dens=None, with_sources=False, do_sponge=False,
                   solid=(0, 0, 0, 0), n_bands=None, spherical=False):
    """The single-block CTU pipeline specialized to the band grid.

    stages < 4 truncates the pipeline after that stage (1 = interface
    states, 2 = +transverse flux, 3 = +Riemann, 4 = full step) and
    returns a same-shaped sum of the live intermediates -- used only by
    the benchmark's in-kernel stage-time differencing (bench.py), where
    the sum keeps every intermediate live against XLA dead-code
    elimination.

    The keyword options enable the GENERAL step (bitwise twin of
    simulation._make_step for Cartesian geometry):
      * small_dens      -- density floor applied to exactly the GLOBAL
                           interior cells inside the band (halo rows are
                           other bands' interiors and were floored in the
                           jnp step too; global ghosts are NOT floored);
                           needs nx_total/ny_actual/n_bands + band_i;
      * with_sources    -- apply 0.5*dt of the ghost-filled external
                           sources to the interface states (the S band is
                           produced and BC-filled at the jnp level, so
                           reflect-odd/hse source ghosts are exact) plus
                           the predictor-corrector source update;
      * do_sponge       -- implicit velocity damping (pointwise);
      * solid           -- (xl, xr, yl, yr) solid-wall flags; x clamps
                           apply only in the band owning that global edge
                           (traced program-id gate, same mechanism as the
                           sharded path's block-gated walls), y clamps
                           are in-band static masks.
    The general step's signature is step(U, dt, t, S, band_i); the plain
    periodic bench kernel calls step(U, dt)."""
    import pyro2_tpu.solvers.compressible.unsplit_fluxes as flx
    from pyro2_tpu.mesh.indexer import ai
    from pyro2_tpu.solvers.compressible import riemann
    from pyro2_tpu.util import profile_pyro
    from pyro2_tpu.util.runparams import RuntimeParameters

    g = Cartesian2d(tile_rows, ny, ng=NG,
                    xmax=tile_rows * dx, ymax=ny * dy)

    rp = RuntimeParameters()
    rp.params = dict(rp_params)

    tc = profile_pyro.TimerCollection()

    class _Data:
        grid = g

    my_data = _Data()
    ivars = ivars_proto

    # keep ALL y columns (lane alignment); the host wrapper slices y
    iv_sl = (slice(None), slice(g.ilo, g.ihi + 1), slice(None))

    def step(U, dt, t=None, S=None, band_i=None, G=None):
        # full-frame mode: windows become rolls, embeds become masks --
        # the only view forms Mosaic can lower.  Interior results are
        # identical to the windowed pipeline (see indexer.full_frame).
        from pyro2_tpu.mesh import indexer as _ix
        from pyro2_tpu.solvers.compressible import simulation as comp

        if spherical:
            # band grid proxy: Grid2d statics from the Cartesian band
            # grid + the DMA'd per-band geometry planes (SURVEY.md
            # section 7: geometry as precomputed per-band arrays keeps
            # the kernel geometry-agnostic)
            class _Geom:
                pass

            gp = _Geom()
            for a in ("dx", "dy", "ng", "ilo", "ihi", "jlo", "jhi",
                      "qx", "qy", "nx", "ny"):
                setattr(gp, a, getattr(g, a))
            gp.coord_type = 1
            for n, name in enumerate(SPH_PLANES):
                if name in ("rc", "rr", "rl", "sinc", "sint", "sinb"):
                    setattr(gp, "_plane_" + name, G[n])
                else:
                    setattr(gp, name, G[n])

            class _DataSph:
                grid = gp

            gg = gp
            data = _DataSph()
        else:
            gg = g
            data = my_data

        if band_i is None:
            class _Solid:
                xl = xr = yl = yr = 0
            solid_b = _Solid()
        else:
            last = n_bands - 1

            class _Solid:
                # x walls only in the band owning that global edge
                # (traced gate, like the sharded path's block-gated
                # walls); y walls are global on every band.  Open walls
                # stay static 0 so _solid_mask skips the mask entirely.
                xl = ((band_i == 0).astype(jnp.int32)
                      if solid[0] else 0)
                xr = ((band_i == last).astype(jnp.int32)
                      if solid[1] else 0)
                yl = solid[2]
                yr = solid[3]
            solid_b = _Solid()

        with _ix.full_frame():
            if small_dens is not None and band_i is not None:
                # global-interior mask: local row r is global interior
                # row band_i*T + (r - NG); lanes [NG, NG+ny_actual)
                xi = jax.lax.broadcasted_iota(jnp.int32, U.shape[1:], 0)
                yi = jax.lax.broadcasted_iota(jnp.int32, U.shape[1:], 1)
                gi = xi + (band_i * tile_rows - NG)
                interior = ((gi >= 0) & (gi < nx_total) &
                            (yi >= NG) & (yi < NG + ny_actual))
                rho = U[ivars.idens]
                floor = max(small_dens, float(jnp.finfo(U.dtype).min))
                # row-list rebuild: .at[i].set lowers to scatter, which
                # Mosaic cannot lower; stack is a concatenate
                rows = [U[n] for n in range(ivars.nvar)]
                rows[ivars.idens] = jnp.where(
                    interior, jnp.maximum(rho, floor), rho)
                U = jnp.stack(rows)

            U_xl, U_xr, U_yl, U_yr = flx.interface_states(
                U, data, rp, ivars, tc, dt)
            if stages == 1:
                return (U_xl + U_xr + U_yl + U_yr)[iv_sl]

            if with_sources:
                # S is the band of the globally-computed, BC-filled
                # source stack; a shim aux container hands it to
                # apply_source_terms in place of its own fill.  The
                # increments are masked to the GLOBAL buf=1 window
                # (the jnp step's increment window) for bitwise parity.
                class _AuxShim:
                    @staticmethod
                    def fill_bc_stack(stack, t=None):
                        return S
                xi = jax.lax.broadcasted_iota(jnp.int32, U.shape[1:], 0)
                yi = jax.lax.broadcasted_iota(jnp.int32, U.shape[1:], 1)
                gi = xi + (band_i * tile_rows - NG)
                wmask = ((gi >= -1) & (gi < nx_total + 1) &
                         (yi >= NG - 1) & (yi < NG + ny_actual + 1))
                U_xl, U_xr, U_yl, U_yr = flx.apply_source_terms(
                    U_xl, U_xr, U_yl, U_yr, U, t, data, _AuxShim(),
                    rp, ivars, tc, dt, window_mask=wmask)

            U_xl, U_xr, U_yl, U_yr = flx.apply_transverse_flux(
                U_xl, U_xr, U_yl, U_yr, data, rp, ivars, solid_b, tc,
                dt)
            if stages == 2:
                return (U_xl + U_xr + U_yl + U_yr)[iv_sl]
            if spherical:
                F_x, U_x = riemann.riemann_flux(
                    1, U_xl, U_xr, data, rp, ivars, solid_b.xl,
                    solid_b.xr, tc, return_cons=True)
                F_y, U_y = riemann.riemann_flux(
                    2, U_yl, U_yr, data, rp, ivars, solid_b.yl,
                    solid_b.yr, tc, return_cons=True)
                qx_i = comp.cons_to_prim(U_x, gamma, ivars, gg)
                qy_i = comp.cons_to_prim(U_y, gamma, ivars, gg)
            else:
                F_x = riemann.riemann_flux(1, U_xl, U_xr, data, rp,
                                           ivars, solid_b.xl, solid_b.xr,
                                           tc)
                F_y = riemann.riemann_flux(2, U_yl, U_yr, data, rp,
                                           ivars, solid_b.yl, solid_b.yr,
                                           tc)
            if stages == 3:
                return (F_x + F_y)[iv_sl]

            q = comp.cons_to_prim(U, gamma, ivars, gg)
            F_x, F_y = flx.apply_artificial_viscosity(F_x, F_y, q, U,
                                                      data, rp, ivars)

            # same arithmetic form as simulation._make_step's update
            from pyro2_tpu.mesh.indexer import aic
            Fx = ai(F_x, gg)
            Fy = ai(F_y, gg)
            if spherical:
                dtdV = dt / ai(gg.V, gg).v()
                Ax = ai(gg.Ax, gg)
                Ay = ai(gg.Ay, gg)
            else:
                Ax = aic(dy)
                Ay = aic(dx)
                dtdV = dt / jnp.asarray(dx * dy)
            upd = dtdV[None] * (
                Fx.v() * Ax.v()[None] - Fx.ip(1) * Ax.ip(1)[None] +
                Fy.v() * Ay.v()[None] - Fy.jp(1) * Ay.jp(1)[None])
            out = U + upd

            if spherical:
                # non-conservative pressure gradients (momenta), as
                # row-list rebuilds (scatter-free)
                Lxv = ai(gg.Lx, gg)
                Lyv = ai(gg.Ly, gg)
                qxp = ai(qx_i[ivars.ip], gg)
                qyp = ai(qy_i[ivars.ip], gg)
                rows = [out[n] for n in range(ivars.nvar)]
                rows[ivars.ixmom] = rows[ivars.ixmom] + \
                    (-dt * (qxp.ip(1) - qxp.v()) / Lxv.v())
                rows[ivars.iymom] = rows[ivars.iymom] + \
                    (-dt * (qyp.jp(1) - qyp.v()) / Lyv.v())
                out = jnp.stack(rows)

            if with_sources:
                # predictor-corrector external sources (pointwise; only
                # owned rows are written back, so full-frame adds match
                # the jnp step's interior-windowed adds there)
                S_old = comp.get_external_sources(t, dt, U, ivars, rp, gg)
                out = out + dt * S_old
                S_new = comp.get_external_sources(t, dt, out, ivars, rp,
                                                  gg, U_old=U)
                out = out + 0.5 * dt * (S_new - S_old)

            if do_sponge:
                kappa_f = comp.get_sponge_factor(out, ivars, rp, gg)
                damp = 1.0 + dt * kappa_f
                pre_x = out[ivars.ixmom]
                pre_y = out[ivars.iymom]
                new_x = pre_x / damp
                new_y = pre_y / damp
                dke = 0.5 * ((new_x ** 2 + new_y ** 2) -
                             (pre_x ** 2 + pre_y ** 2)) / out[ivars.idens]
                rows = [out[n] for n in range(ivars.nvar)]
                rows[ivars.ixmom] = new_x
                rows[ivars.iymom] = new_y
                rows[ivars.iener] = out[ivars.iener] + dke
                out = jnp.stack(rows)
        return out[iv_sl]

    return step, g


def make_pallas_ctu_step(nx, ny, dx, dy, gamma, rp_params, ivars,
                         tile_rows=8):
    """A jitted (U_padded, dt) -> U_padded CTU step using the fused kernel.

    U_padded is the (nvar, nx+2ng, ny+2ng) stack with ghosts already
    filled.  The returned array has the interior updated (ghosts stale).
    """
    assert nx % tile_rows == 0
    n_tiles = nx // tile_rows
    nvar = ivars.nvar
    qy = ny + 2 * NG
    band = tile_rows + 2 * NG

    # Mosaic requires DMA slice lane extents to be 128-aligned: pad the y
    # axis to a lane multiple and give the band grid the padded logical
    # width.  The pad columns sit beyond every interior read (stencil
    # reach <= NG), so interior results are unaffected.
    qy_pad = -(-qy // 128) * 128
    ny_eff = qy_pad - 2 * NG

    local_step, _g = _local_step_fn(tile_rows, ny_eff, dx, dy, gamma,
                                    rp_params, ivars)

    def kernel(dt_ref, U_hbm, out_ref, band_vmem, sem):
        i = pl.program_id(0)
        # DMA this program's row band (with halos) into VMEM; the offset
        # divisibility hint lets Mosaic slice the (8,128)-tiled memref
        start = pl.multiple_of(i * tile_rows, min(tile_rows, 8))
        cp = pltpu.make_async_copy(
            U_hbm.at[:, pl.ds(start, band), :],
            band_vmem, sem)
        cp.start()
        cp.wait()
        U_loc = band_vmem[...]
        dt = dt_ref[0]
        out_full = local_step(U_loc, dt)   # (nvar, tile_rows, qy_pad)
        out_ref[...] = out_full

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (nvar, tile_rows, qy_pad),
            lambda i, *_: (0, i, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nvar, band, qy_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    pallas_interior = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nvar, nx, qy_pad), jnp.float32),
        grid_spec=grid_spec,
        # the CTU pipeline's live full-band temporaries exceed Mosaic's
        # 16 MB default scoped-vmem budget for tile_rows >= 64; v5e has
        # 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def step(U_padded, dt):
        dt_arr = jnp.asarray([dt], jnp.float32)
        U_wide = jax.lax.pad(U_padded, jnp.float32(0.0),
                             [(0, 0, 0), (0, 0, 0), (0, qy_pad - qy, 0)])
        rows = pallas_interior(dt_arr, U_wide)
        return U_padded.at[:, NG:-NG, NG:-NG].set(
            rows[:, :, NG:NG + ny])

    return step


# -- persistent padded-layout variant ---------------------------------------
#
# make_pallas_ctu_step pads the lane axis and re-embeds the interior on the
# host side of every step: a full lax.pad copy in and a full .at[].set copy
# out -- two extra HBM round trips per step on top of the kernel's one.
# The variant below keeps the state PERMANENTLY in a kernel-friendly layout
#     (nvar, nx + 2*NGX, qy_pad),  NGX = 8 ghost rows, qy_pad lane-aligned,
# so a step is: cheap strip-copy periodic ghost fill (4 dynamic-update-
# slices) + ONE pallas_call whose programs DMA their row band in and DMA
# their updated interior rows back out at an 8-aligned sublane offset.
# Nothing else touches HBM.  Ghost rows of the output are left unwritten;
# the next fill() overwrites them from interior rows before anything reads
# them.  Arithmetic is the same _local_step_fn pipeline, so interior results
# stay bitwise identical to the jnp step (validated in tests/test_pallas_tpu).

NGX = 8   # x ghost rows in the padded layout (stencil uses NG=4; 8 keeps
          # every DMA sublane offset a multiple of the f32 tile height)


def make_pallas_ctu_step_padded(nx, ny, dx, dy, gamma, rp_params, ivars,
                                tile_rows=128, interpret=False, stages=4):
    """Periodic-BC CTU stepping on a persistent padded state layout.

    Returns (to_padded, from_padded, fill, step):
      to_padded(U)   -- (nvar, nx+2NG, ny+2NG) -> padded layout
      from_padded(P) -- inverse slice.  Ghost cells are only valid
                        immediately after fill()/to_padded; after step()
                        the x-ghost rows of the fresh output buffer are
                        UNINITIALIZED memory (call fill() first if ghost
                        content matters)
      fill(P)        -- periodic ghost fill, strip copies only
      step(P, dt)    -- one CTU step; interior rows updated, ghosts stale

    Lane-pad columns [qy, qy_pad) are zero at to_padded time and are never
    re-filled, so zero density there produces non-finite values in those
    lanes inside the kernel.  This is harmless: the pipeline's total
    stencil reach is <= NG columns, so pad-lane garbage can only reach the
    y-ghost columns [NG+ny, qy), and fill() overwrites those from interior
    lanes before every step -- no interior lane ever depends on a pad lane.
    """
    assert tile_rows % 8 == 0 and nx % tile_rows == 0
    n_tiles = nx // tile_rows
    nvar = ivars.nvar
    qy = ny + 2 * NG
    qy_pad = -(-qy // 128) * 128
    ny_eff = qy_pad - 2 * NG
    qxp = nx + 2 * NGX

    local_step, _g = _local_step_fn(tile_rows, ny_eff, dx, dy, gamma,
                                    rp_params, ivars, stages=stages)

    band_in = tile_rows + 2 * NGX   # aligned read: rows [i*T, i*T+T+16)

    def kernel(dt_ref, U_hbm, out_hbm, band_vmem, res_vmem, sem_in, sem_out):
        i = pl.program_id(0)
        start = pl.multiple_of(i * tile_rows, 8)
        cp = pltpu.make_async_copy(
            U_hbm.at[:, pl.ds(start, band_in), :], band_vmem, sem_in)
        cp.start()
        cp.wait()
        # the stencil band (NG halos) sits at rows [NGX-NG, NGX+T+NG) of
        # the aligned read
        U_loc = band_vmem[:, NGX - NG:NGX + tile_rows + NG, :]
        res_vmem[...] = local_step(U_loc, dt_ref[0])
        wstart = pl.multiple_of(NGX + i * tile_rows, 8)
        cpo = pltpu.make_async_copy(
            res_vmem, out_hbm.at[:, pl.ds(wstart, tile_rows), :], sem_out)
        cpo.start()
        cpo.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((nvar, band_in, qy_pad), jnp.float32),
            pltpu.VMEM((nvar, tile_rows, qy_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    pallas_step = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nvar, qxp, qy_pad), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    @jax.jit
    def step(P, dt):
        return pallas_step(jnp.asarray([dt], jnp.float32), P)

    @jax.jit
    def fill(P):
        # lane (y) periodic ghosts first -- all rows, so the row copies
        # below carry complete lane-filled strips into the x ghosts
        P = P.at[:, :, 0:NG].set(P[:, :, ny:ny + NG])
        P = P.at[:, :, NG + ny:2 * NG + ny].set(P[:, :, NG:2 * NG])
        # row (x) periodic ghosts, full lane width
        P = P.at[:, 0:NGX, :].set(P[:, nx:nx + NGX, :])
        P = P.at[:, NGX + nx:, :].set(P[:, NGX:2 * NGX, :])
        return P

    @jax.jit
    def to_padded(U):
        P = jnp.zeros((nvar, qxp, qy_pad), jnp.float32)
        return P.at[:, NGX - NG:NGX + nx + NG, :qy].set(
            U.astype(jnp.float32))

    @jax.jit
    def from_padded(P):
        return P[:, NGX - NG:NGX + nx + NG, :qy]

    return to_padded, from_padded, fill, step


# -- ensemble (batch) stepping on the padded layout ---------------------------

def make_pallas_ctu_ensemble_step(n_ens, nx, ny, dx, dy, gamma, rp_params,
                                  ivars, tile_rows=128, interpret=False):
    """Periodic-BC CTU stepping of an ENSEMBLE of n_ens same-shape
    problems through the fused band kernel (SURVEY 2.9's batch
    parallelism tier, which the reference lacks entirely).

    The Pallas ANY-memory-space DMA path cannot be vmapped, so the batch
    axis becomes an extra grid dimension instead: state shape
    (nvar, n_ens, nx + 2*NGX, qy_pad), grid (n_ens, n_tiles), each
    program DMAs its problem's row band.  Per-problem arithmetic is the
    exact single-problem pipeline.

    Returns (to_padded, from_padded, fill, step) over the batched layout;
    to_padded/from_padded map (n_ens, nvar, qx, qy) stacks.
    """
    assert tile_rows % 8 == 0 and nx % tile_rows == 0
    n_tiles = nx // tile_rows
    nvar = ivars.nvar
    qy = ny + 2 * NG
    qy_pad = -(-qy // 128) * 128
    ny_eff = qy_pad - 2 * NG
    qxp = nx + 2 * NGX

    local_step, _g = _local_step_fn(tile_rows, ny_eff, dx, dy, gamma,
                                    rp_params, ivars)
    band_in = tile_rows + 2 * NGX

    def kernel(dt_ref, U_hbm, out_hbm, band_vmem, res_vmem, sem_in,
               sem_out):
        e = pl.program_id(0)
        i = pl.program_id(1)
        start = pl.multiple_of(i * tile_rows, 8)
        cp = pltpu.make_async_copy(
            U_hbm.at[:, e, pl.ds(start, band_in), :], band_vmem, sem_in)
        cp.start()
        cp.wait()
        U_loc = band_vmem[:, NGX - NG:NGX + tile_rows + NG, :]
        res_vmem[...] = local_step(U_loc, dt_ref[0])
        wstart = pl.multiple_of(NGX + i * tile_rows, 8)
        cpo = pltpu.make_async_copy(
            res_vmem, out_hbm.at[:, e, pl.ds(wstart, tile_rows), :],
            sem_out)
        cpo.start()
        cpo.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ens, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((nvar, band_in, qy_pad), jnp.float32),
            pltpu.VMEM((nvar, tile_rows, qy_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    pallas_step = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nvar, n_ens, qxp, qy_pad),
                                       jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    @jax.jit
    def step(P, dt):
        return pallas_step(jnp.asarray([dt], jnp.float32), P)

    @jax.jit
    def fill(P):
        P = P.at[:, :, :, 0:NG].set(P[:, :, :, ny:ny + NG])
        P = P.at[:, :, :, NG + ny:2 * NG + ny].set(P[:, :, :, NG:2 * NG])
        P = P.at[:, :, 0:NGX, :].set(P[:, :, nx:nx + NGX, :])
        P = P.at[:, :, NGX + nx:, :].set(P[:, :, NGX:2 * NGX, :])
        return P

    @jax.jit
    def to_padded(Us):
        # (n_ens, nvar, qx, qy) -> (nvar, n_ens, qxp, qy_pad)
        P = jnp.zeros((nvar, n_ens, qxp, qy_pad), jnp.float32)
        return P.at[:, :, NGX - NG:NGX + nx + NG, :qy].set(
            jnp.moveaxis(Us, 0, 1).astype(jnp.float32))

    @jax.jit
    def from_padded(P):
        return jnp.moveaxis(
            P[:, :, NGX - NG:NGX + nx + NG, :qy], 1, 0)

    return to_padded, from_padded, fill, step


# -- general problems on the padded layout -----------------------------------

class IneligibleStep(Exception):
    """This Simulation configuration is not covered by the fused kernel."""


def _pick_tile(nx, want=128):
    """Largest multiple of 8 that divides nx, capped at `want`."""
    t = (min(want, nx) // 8) * 8    # start ON a multiple of 8
    while t >= 8:
        if nx % t == 0:
            return t
        t -= 8
    raise IneligibleStep(f"no 8-multiple tile divides nx={nx}")


# empirical live-VMEM footprint of the CTU band pipeline: ~78 band-sized
# f32 planes (measured: 189 MB at band=144 rows x 4224 lanes -> VMEM OOM
# on the 128 MB v5e at 4096^2 with 128-row tiles)
_CTU_LIVE_PLANES = 78


def _vmem_tile(nx, ny, want=128):
    """The largest tile whose band pipeline fits the VMEM budget at this
    lane width (wide grids shrink the tile instead of failing)."""
    qy_pad = -(-(ny + 2 * NG) // 128) * 128
    budget_rows = int(100e6 / (qy_pad * 4 * _CTU_LIVE_PLANES)) - 2 * NGX
    return _pick_tile(nx, want=max(8, min(want, budget_rows)))


def make_pallas_ctu_step_padded_general(sim, tile_rows=None,
                                        interpret=False):
    """Fused CTU stepping for a LIVE Simulation on the padded layout.

    Generalizes make_pallas_ctu_step_padded beyond the periodic benchmark
    configuration: gravity (+ predictor-corrector), passive species
    (nvar > 4), sponge damping, the density floor, solid walls, and
    arbitrary standard/custom BCs.  Ghost fills and the external-source
    stack are produced at the jnp level on the global frame (so hse /
    ambient / reflect-odd source ghosts are exactly the jnp step's), then
    the full CTU pipeline runs in the fused row-band kernel; interior
    results are bitwise identical to sim._make_step() in f32
    (tests/test_pallas_tpu.py validates sod and rt on hardware).

    Returns (to_padded, from_padded, fill, step):
      fill(P, t) -- ghost fill (fast strip copies when every BC is
                    periodic, else a jnp fill_bc_stack round trip)
      step(P, t, dt) -- one full CTU step (interior rows updated)

    Raises IneligibleStep for spherical geometry or problem heating
    terms (those run the jnp step).
    """
    from pyro2_tpu.solvers.compressible import simulation as comp

    rp = sim.rp
    myg = sim.cc_data.grid
    ivars = sim.ivars
    spherical = getattr(myg, "coord_type", 0) == 1
    if sim.problem_source is not None:
        raise IneligibleStep("problem source terms use global coordinates")

    nx, ny = myg.nx, myg.ny
    tile_rows = tile_rows or _vmem_tile(nx, ny)
    n_tiles = nx // tile_rows
    nvar = ivars.nvar
    qy = ny + 2 * NG
    qy_pad = -(-qy // 128) * 128
    ny_eff = qy_pad - 2 * NG
    qxp = nx + 2 * NGX

    gamma = rp.get_param("eos.gamma")
    grav = rp.get_param("compressible.grav")
    # spherical geometry has nonzero geometric (centrifugal/Coriolis-
    # like) sources even with grav == 0 (simulation.get_external_sources)
    with_sources = grav != 0.0 or spherical
    do_sponge = bool(rp.get_param("sponge.do_sponge"))
    small_dens = rp.get_param("compressible.small_dens")
    solid = (sim.solid.xl, sim.solid.xr, sim.solid.yl, sim.solid.yr)

    local_step, _g = _local_step_fn(
        tile_rows, ny_eff, myg.dx, myg.dy, gamma, rp.params, ivars,
        ny_actual=ny, nx_total=nx, small_dens=small_dens,
        with_sources=with_sources, do_sponge=do_sponge, solid=solid,
        n_bands=n_tiles, spherical=spherical)

    band_in = tile_rows + 2 * NGX
    n_geo = len(SPH_PLANES)

    def kernel(sc_ref, U_hbm, *rest):
        rest = list(rest)
        S_hbm = rest.pop(0) if with_sources else None
        G_hbm = rest.pop(0) if spherical else None
        out_hbm = rest.pop(0)
        band_vmem = rest.pop(0)
        s_vmem = rest.pop(0) if with_sources else None
        g_vmem = rest.pop(0) if spherical else None
        res_vmem = rest.pop(0)
        sems = rest
        S_loc = None
        G_loc = None
        i = pl.program_id(0)
        start = pl.multiple_of(i * tile_rows, 8)
        cp = pltpu.make_async_copy(
            U_hbm.at[:, pl.ds(start, band_in), :], band_vmem, sems[0])
        cp.start()
        si = 1
        if with_sources:
            cps = pltpu.make_async_copy(
                S_hbm.at[:, pl.ds(start, band_in), :], s_vmem, sems[si])
            si += 1
            cps.start()
            cps.wait()
            S_loc = s_vmem[:, NGX - NG:NGX + tile_rows + NG, :]
        if spherical:
            cpg = pltpu.make_async_copy(
                G_hbm.at[:, pl.ds(start, band_in), :], g_vmem, sems[si])
            si += 1
            cpg.start()
            cpg.wait()
            G_loc = g_vmem[:, NGX - NG:NGX + tile_rows + NG, :]
        cp.wait()
        U_loc = band_vmem[:, NGX - NG:NGX + tile_rows + NG, :]
        res_vmem[...] = local_step(U_loc, sc_ref[0], t=sc_ref[1],
                                   S=S_loc, band_i=i, G=G_loc)
        wstart = pl.multiple_of(NGX + i * tile_rows, 8)
        cpo = pltpu.make_async_copy(
            res_vmem, out_hbm.at[:, pl.ds(wstart, tile_rows), :],
            sems[si])
        cpo.start()
        cpo.wait()

    scratch = [pltpu.VMEM((nvar, band_in, qy_pad), jnp.float32)]
    if with_sources:
        scratch.append(pltpu.VMEM((4, band_in, qy_pad), jnp.float32))
    if spherical:
        scratch.append(pltpu.VMEM((n_geo, band_in, qy_pad), jnp.float32))
    scratch.append(pltpu.VMEM((nvar, tile_rows, qy_pad), jnp.float32))
    n_sems = 2 + int(with_sources) + int(spherical)
    scratch += [pltpu.SemaphoreType.DMA(())] * n_sems

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] *
        (1 + int(with_sources) + int(spherical)),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
    )

    pallas_step = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nvar, qxp, qy_pad), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    @jax.jit
    def to_padded(U):
        P = jnp.zeros((nvar, qxp, qy_pad), jnp.float32)
        return P.at[:, NGX - NG:NGX + nx + NG, :qy].set(
            U.astype(jnp.float32))

    @jax.jit
    def from_padded(P):
        return P[:, NGX - NG:NGX + nx + NG, :qy]

    all_periodic = all(
        getattr(bc, e) == "periodic"
        for bc in sim.cc_data.BCs.values()
        for e in ("xlb", "xrb", "ylb", "yrb"))

    if all_periodic:
        @jax.jit
        def fill(P, t=None):
            P = P.at[:, :, 0:NG].set(P[:, :, ny:ny + NG])
            P = P.at[:, :, NG + ny:2 * NG + ny].set(P[:, :, NG:2 * NG])
            P = P.at[:, 0:NGX, :].set(P[:, nx:nx + NGX, :])
            P = P.at[:, NGX + nx:, :].set(P[:, NGX:2 * NGX, :])
            return P
    else:
        @jax.jit
        def fill(P, t=0.0):
            # fill_bc_stack may promote to f64 under x64 (spherical
            # reflect fills touch f64 geometry); cast back so the
            # scatter into the f32 padded frame stays same-dtype
            U = sim.cc_data.fill_bc_stack(from_padded(P), t=t)
            return P.at[:, NGX - NG:NGX + nx + NG, :qy].set(
                U.astype(P.dtype))

    GP = None
    if spherical:
        import numpy as np
        qx = myg.qx

        def rows(vec):
            return np.broadcast_to(np.asarray(vec)[:, None], (qx, qy))

        def lanes(vec):
            return np.broadcast_to(np.asarray(vec)[None, :], (qx, qy))

        plane_vals = {
            "Lx": myg.Lx, "Ly": myg.Ly, "dlogAx": myg.dlogAx,
            "dlogAy": myg.dlogAy, "Ax": myg.Ax, "Ay": myg.Ay,
            "V": myg.V, "x2d": myg.x2d,
            "rc": rows(myg.xl), "rr": rows(myg.x),
            "rl": rows(myg.x - myg.dx),
            "sinc": lanes(np.sin(myg.yl)), "sint": lanes(np.sin(myg.y)),
            "sinb": lanes(np.sin(myg.y - myg.dy)),
        }
        G_np = np.zeros((n_geo, qxp, qy_pad), np.float32)
        for n, name in enumerate(SPH_PLANES):
            G_np[n, NGX - NG:NGX + nx + NG, :qy] = \
                np.asarray(plane_vals[name], np.float64)
        GP = jnp.asarray(G_np)

    @jax.jit
    def step(P, t, dt):
        sc = jnp.stack([jnp.asarray(dt, jnp.float32),
                        jnp.asarray(t, jnp.float32)])
        args = [sc, P]
        if with_sources:
            U = from_padded(P)
            S_full = comp.get_external_sources(t, dt, U, ivars, rp, myg)
            Sst = jnp.stack([S_full[ivars.idens], S_full[ivars.ixmom],
                             S_full[ivars.iymom], S_full[ivars.iener]])
            Sst = sim.aux_data.fill_bc_stack(Sst, t=t)
            SP = jnp.zeros((4, qxp, qy_pad), jnp.float32)
            SP = SP.at[:, NGX - NG:NGX + nx + NG, :qy].set(
                Sst.astype(jnp.float32))
            args.append(SP)
        if spherical:
            args.append(GP)
        return pallas_step(*args)

    return to_padded, from_padded, fill, step
