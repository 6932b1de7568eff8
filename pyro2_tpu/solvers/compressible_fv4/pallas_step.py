"""A fused Pallas TPU kernel for the fv4 (McCorquodale-Colella) substep.

The per-stage cost of the 4th-order tier (compressible_fv4 and, through
its inherited substep, compressible_sdc) is the fluxes pipeline:
avg<->center conversions, 4th-order limited face states, the primitive
Riemann solve on face averages, the transverse-Laplacian corrections,
and the MC artificial viscosity -- all flagged NATIVE->Pallas in SURVEY
2.1/2.3 (reference /root/reference/pyro/mesh/fourth_order.py:8-236,
compressible_fv4/fluxes.py:40-223).

The whole pipeline is scatter-free (rolls, embeds, iota masks), so the
band architecture of compressible/pallas_step.py applies unchanged: each
program DMAs one (nvar, T+2*NGX, qy_pad) row band into VMEM, evaluates
the IDENTICAL build_substep closure on the band grid under
indexer.full_frame(), and writes back its owned increment rows.  The RK
stage loop and ghost fills stay at the jnp level (Butcher combines are
pointwise); each stage is ONE kernel dispatch.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyro2_tpu.mesh.grid import Cartesian2d
from pyro2_tpu.solvers.compressible.pallas_step import (
    NG, NGX, IneligibleStep, _pick_tile)

__all__ = ["make_pallas_fv4_substep", "make_pallas_rk_substep",
           "make_pallas_mol_substep", "IneligibleStep"]


def _local_substep_fn(tile_rows, ny, dx, dy, rp_params, ivars, builder):
    """`builder`'s substep on the band grid, wrapped for full-frame mode.

    builder(band_grid, rp, ivars) -> substep(U, t, dt); fv4 passes
    compressible_fv4.build_substep, rk a solid-closing wrapper over
    compressible_rk.build_substep."""
    from pyro2_tpu.mesh import indexer as _ix
    from pyro2_tpu.util.runparams import RuntimeParameters

    g = Cartesian2d(tile_rows, ny, ng=NG,
                    xmax=tile_rows * dx, ymax=ny * dy)
    rp = RuntimeParameters()
    rp.params = dict(rp_params)
    inner = builder(g, rp, ivars)
    iv_sl = (slice(None), slice(g.ilo, g.ihi + 1), slice(None))

    def substep(U, t, dt):
        with _ix.full_frame():
            k = inner(U, t, dt)
        return k[iv_sl]

    return substep


def make_pallas_fv4_substep(sim, tile_rows=None, interpret=False):
    """A jitted fv4 substep(U, t, dt) -> k in the fused band kernel.

    Bitwise vs the jnp substep on the interior
    (tests/test_pallas_tpu.py::test_fv4_substep_bitwise_vs_jnp)."""
    from pyro2_tpu.solvers.compressible_fv4.simulation import build_substep
    return make_pallas_mol_substep(sim, build_substep,
                                   tile_rows=tile_rows,
                                   interpret=interpret)


def make_pallas_rk_substep(sim, tile_rows=None, interpret=False):
    """A jitted 2nd-order MOL substep(U, t, dt) -> k in the fused band
    kernel (compressible_rk's PLM + single Riemann pass pipeline)."""
    from pyro2_tpu.solvers.compressible_rk.simulation import build_substep
    from pyro2_tpu.util.profile_pyro import TimerCollection

    if sim.rp.get_param("compressible.well_balanced"):
        raise IneligibleStep(
            "well-balanced reconstruction has no kernel tier")
    s = sim.solid
    if any(not isinstance(v, int) or v != 0
           for v in (s.xl, s.xr, s.yl, s.yr)):
        raise IneligibleStep("solid walls need band-gated clamps")

    class _Solid:
        xl = xr = yl = yr = 0

    def builder(g, rp, ivars):
        return build_substep(g, rp, ivars, _Solid(), TimerCollection())

    return make_pallas_mol_substep(sim, builder, tile_rows=tile_rows,
                                   interpret=interpret)


def make_pallas_mol_substep(sim, builder, tile_rows=None, interpret=False):
    """The shared band-kernel machinery for MOL stage increments.

    Same contract as jax.jit(sim._make_substep()): U is the (nvar, qx,
    qy) ghost-filled stack; k is the stage increment, zero on the
    ghosts.  Raises IneligibleStep for spherical geometry, problem
    sources, or when no 8-multiple tile divides nx.
    """
    myg = sim.cc_data.grid
    if getattr(myg, "coord_type", 0) != 0:
        raise IneligibleStep("MOL kernels are Cartesian-only")
    if sim.problem_source is not None:
        raise IneligibleStep("problem source terms use global coordinates")
    if sim.rp.get_param("compressible.small_dens") > 0.0:
        # a positive density floor applies to the GLOBAL interior; the
        # band substep would also floor its x-halo rows' reads and skip
        # flooring global y-ghosts, diverging from the jnp substep near
        # band seams (the CTU kernel gates this with a band_i mask;
        # the MOL kernels keep it simple and stay on the jnp path).
        # Non-positive floors are exact no-ops on finite states.
        raise IneligibleStep("positive small_dens needs the band-gated "
                             "global-interior floor")
    rp = sim.rp
    ivars = sim.ivars

    nx, ny = myg.nx, myg.ny
    # 64-row tiles measured fastest at 512^2 (0.231 ms vs 0.337 at 128):
    # the fv4 pipeline's ~20 live full-band temporaries stay VMEM-resident
    # longer per owned row at smaller bands
    tile_rows = tile_rows or _pick_tile(nx, want=64)
    n_tiles = nx // tile_rows
    nvar = ivars.nvar
    qy = ny + 2 * NG
    qy_pad = -(-qy // 128) * 128
    ny_eff = qy_pad - 2 * NG
    qxp = nx + 2 * NGX

    local_substep = _local_substep_fn(tile_rows, ny_eff, myg.dx,
                                      myg.dy, rp.params, ivars, builder)

    band_in = tile_rows + 2 * NGX

    def kernel(sc_ref, U_hbm, out_hbm, band_vmem, res_vmem, sem_in,
               sem_out):
        i = pl.program_id(0)
        start = pl.multiple_of(i * tile_rows, 8)
        cp = pltpu.make_async_copy(
            U_hbm.at[:, pl.ds(start, band_in), :], band_vmem, sem_in)
        cp.start()
        cp.wait()
        U_loc = band_vmem[:, NGX - NG:NGX + tile_rows + NG, :]
        res_vmem[...] = local_substep(U_loc, sc_ref[1], sc_ref[0])
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

    pallas_substep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nvar, qxp, qy_pad), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    zero32 = jnp.float32(0.0)

    @jax.jit
    def substep(U, t, dt):
        sc = jnp.stack([jnp.asarray(dt, jnp.float32),
                        jnp.asarray(t, jnp.float32)])
        # single-pad in, single-pad out (cheaper than zeros + .at[].set)
        P = jax.lax.pad(U.astype(jnp.float32), zero32,
                        [(0, 0, 0), (NGX - NG, NGX - NG, 0),
                         (0, qy_pad - qy, 0)])
        K = pallas_substep(sc, P)
        # increments are zero on the ghosts, exactly like the jnp
        # substep's embed(k_v, myg)
        k32 = jax.lax.pad(K[:, NGX:NGX + nx, NG:NG + ny], zero32,
                          [(0, 0, 0), (NG, NG, 0), (NG, NG, 0)])
        return k32.astype(U.dtype)

    return substep
