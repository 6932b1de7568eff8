"""A fused Pallas TPU kernel for the full compressible CTU step.

The jnp-level step is ~100+ HBM passes (each windowed stage materializes
(nvar, qx, qy) arrays).  This kernel applies the partition argument already
proven bitwise for the multi-chip path (parallel/sharded.py) *within* a
chip: the padded global state lives in HBM; each program DMAs one
(nvar, T+2ng, qy) row-band (with ng-deep halos) into VMEM, runs the SAME
single-block CTU pipeline on it entirely on-chip, and writes back only its
T owned rows.  One HBM read + one write per cell per step instead of
hundreds.

Scope: Cartesian geometry, no gravity/problem sources, no sponge, no
species -- the benchmark configuration.  The general jnp step remains the
reference implementation; `validate()` checks the kernel against it.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyro2_tpu.mesh.grid import Cartesian2d

NG = 4


def _local_step_fn(tile_rows, ny, dx, dy, gamma, rp_params, ivars_proto):
    """The single-block CTU pipeline specialized to the band grid."""
    import pyro2_tpu.solvers.compressible.unsplit_fluxes as flx
    from pyro2_tpu.mesh.indexer import ai
    from pyro2_tpu.solvers.compressible import riemann
    from pyro2_tpu.util import profile_pyro
    from pyro2_tpu.util.runparams import RuntimeParameters

    g = Cartesian2d(tile_rows, ny, ng=NG,
                    xmax=tile_rows * dx, ymax=ny * dy)

    rp = RuntimeParameters()
    rp.params = dict(rp_params)

    class _Data:
        grid = g

    class _Solid:
        xl = xr = yl = yr = 0

    tc = profile_pyro.TimerCollection()
    my_data = _Data()
    solid = _Solid()
    ivars = ivars_proto

    # keep ALL y columns (lane alignment); the host wrapper slices y
    iv_sl = (slice(None), slice(g.ilo, g.ihi + 1), slice(None))

    def step(U, dt):
        # full-frame mode: windows become rolls, embeds become masks --
        # the only view forms Mosaic can lower.  Interior results are
        # identical to the windowed pipeline (see indexer.full_frame).
        from pyro2_tpu.mesh import indexer as _ix

        with _ix.full_frame():
            U_xl, U_xr, U_yl, U_yr = flx.interface_states(
                U, my_data, rp, ivars, tc, dt)
            U_xl, U_xr, U_yl, U_yr = flx.apply_transverse_flux(
                U_xl, U_xr, U_yl, U_yr, my_data, rp, ivars, solid, tc, dt)
            F_x = riemann.riemann_flux(1, U_xl, U_xr, my_data, rp, ivars,
                                       0, 0, tc)
            F_y = riemann.riemann_flux(2, U_yl, U_yr, my_data, rp, ivars,
                                       0, 0, tc)

            from pyro2_tpu.solvers.compressible.simulation import \
                cons_to_prim
            q = cons_to_prim(U, gamma, ivars, g)
            F_x, F_y = flx.apply_artificial_viscosity(F_x, F_y, q, U,
                                                      my_data, rp, ivars)

            # same arithmetic form as simulation._make_step's update
            from pyro2_tpu.mesh.indexer import aic
            Fx = ai(F_x, g)
            Fy = ai(F_y, g)
            Ax = aic(dy)
            Ay = aic(dx)
            dtdV = dt / jnp.asarray(dx * dy)
            upd = dtdV[None] * (
                Fx.v() * Ax.v()[None] - Fx.ip(1) * Ax.ip(1)[None] +
                Fy.v() * Ay.v()[None] - Fy.jp(1) * Ay.jp(1)[None])
            out = U + upd
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
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
                                tile_rows=128, interpret=False):
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
                                    rp_params, ivars)

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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
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
