"""A fused Pallas TPU kernel for the full shallow-water CTU step.

The swe CTU pipeline is structurally the compressible one (SURVEY 2.7:
same unsplit scheme, two Riemann passes -- reference
/root/reference/pyro/swe/unsplit_fluxes.py:132-380, kernels flagged
NATIVE->Pallas at swe/interface.py:6,211,359,531), so this module reuses
the proven band architecture of compressible/pallas_step.py verbatim:
the padded global state lives in HBM; each program DMAs one
(nvar, T+2*NGX, qy_pad) row band into VMEM, runs the SAME jnp swe
pipeline (tracing -> Roe/HLLC -> transverse corrections -> second
Riemann pass -> conservative update) under indexer.full_frame(), and
writes back its owned rows.  One HBM read + one write per zone per step.

The swe jnp pipeline is scatter-free (row-list rebuilds + embed), so the
in-kernel arithmetic is BITWISE the jnp step's on the interior
(tests/test_pallas_tpu.py::test_swe_kernel_bitwise_vs_jnp).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyro2_tpu.mesh.grid import Cartesian2d
from pyro2_tpu.solvers.compressible.pallas_step import (
    NG, NGX, IneligibleStep, _vmem_tile)

__all__ = ["make_pallas_swe_step_padded", "IneligibleStep"]


def _local_swe_step_fn(tile_rows, ny, dx, dy, rp_params, ivars):
    """The single-band swe CTU pipeline (full-frame mode)."""
    import pyro2_tpu.solvers.swe.unsplit_fluxes as flx
    from pyro2_tpu.mesh import indexer as _ix
    from pyro2_tpu.mesh.indexer import ai
    from pyro2_tpu.util import profile_pyro
    from pyro2_tpu.util.runparams import RuntimeParameters

    g = Cartesian2d(tile_rows, ny, ng=NG,
                    xmax=tile_rows * dx, ymax=ny * dy)
    rp = RuntimeParameters()
    rp.params = dict(rp_params)
    tc = profile_pyro.TimerCollection()

    class _Data:
        grid = g

    class _Solid:
        # the swe Riemann solvers take the flags but (like the
        # reference's) never clamp on them
        xl = xr = yl = yr = 0

    my_data = _Data()
    solid = _Solid()
    iv_sl = (slice(None), slice(g.ilo, g.ihi + 1), slice(None))

    def step(U, dt):
        with _ix.full_frame():
            F_x, F_y = flx.unsplit_fluxes(U, my_data, rp, ivars, solid,
                                          tc, dt)
            dtdx = dt / g.dx
            dtdy = dt / g.dy
            Fx = ai(F_x, g)
            Fy = ai(F_y, g)
            upd = (dtdx * (Fx.v() - Fx.ip(1)) +
                   dtdy * (Fy.v() - Fy.jp(1)))
            # full-frame add; only owned interior rows are written back,
            # where this matches the jnp step's windowed add exactly
            out = U + upd
        return out[iv_sl]

    return step


def make_pallas_swe_step_padded(sim, tile_rows=None, interpret=False):
    """Fused swe stepping for a LIVE Simulation on the padded layout.

    Returns (to_padded, from_padded, fill, step):
      fill(P, t) -- ghost fill (strip copies when every BC is periodic,
                    else a jnp fill_bc_stack round trip)
      step(P, t, dt) -- one full swe CTU step (interior rows updated,
                    ghosts stale)

    Raises IneligibleStep when no 8-multiple tile divides nx.
    """
    rp = sim.rp
    myg = sim.cc_data.grid
    ivars = sim.ivars

    nx, ny = myg.nx, myg.ny
    # VMEM-aware: wide grids shrink the band instead of overflowing
    tile_rows = tile_rows or _vmem_tile(nx, ny)
    n_tiles = nx // tile_rows
    nvar = ivars.nvar
    qy = ny + 2 * NG
    qy_pad = -(-qy // 128) * 128
    ny_eff = qy_pad - 2 * NG
    qxp = nx + 2 * NGX

    local_step = _local_swe_step_fn(tile_rows, ny_eff, myg.dx, myg.dy,
                                    rp.params, ivars)

    band_in = tile_rows + 2 * NGX

    def kernel(dt_ref, U_hbm, out_hbm, band_vmem, res_vmem, sem_in,
               sem_out):
        i = pl.program_id(0)
        start = pl.multiple_of(i * tile_rows, 8)
        cp = pltpu.make_async_copy(
            U_hbm.at[:, pl.ds(start, band_in), :], band_vmem, sem_in)
        cp.start()
        cp.wait()
        U_loc = band_vmem[:, NGX - NG:NGX + tile_rows + NG, :]
        res_vmem[...] = local_step(U_loc, dt_ref[0])
        wstart = pl.multiple_of(NGX + i * tile_rows, 8)
        cpo = pltpu.make_async_copy(
            res_vmem, out_hbm.at[:, pl.ds(wstart, tile_rows), :],
            sem_out)
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
            U = sim.cc_data.fill_bc_stack(from_padded(P), t=t)
            return P.at[:, NGX - NG:NGX + nx + NG, :qy].set(
                U.astype(P.dtype))

    @jax.jit
    def step(P, t, dt):
        del t
        return pallas_step(jnp.asarray([dt], jnp.float32), P)

    return to_padded, from_padded, fill, step
