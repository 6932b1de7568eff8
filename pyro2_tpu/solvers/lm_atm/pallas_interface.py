"""Fused Pallas TPU band kernels for the lm_atm interface-state stages.

The reference's numba kernels (mac_vels / rho advection / full states,
/root/reference/pyro/lm_atm/LM_atm_interface.py:181-703, flagged
NATIVE->Pallas in SURVEY 2.8) become three fused band kernels built on
the proven architecture of compressible/pallas_step.py: the padded
plane stack lives in HBM; each program DMAs one (n_in, T+2*NGX, qy_pad)
row band into VMEM, runs the SAME frame-agnostic jnp pipeline
(LM_atm_interface.py) under indexer.full_frame(), and writes back its
owned interior rows.

Design notes for exact parity with the jnp path:

* The MC limiter slopes are computed at the jnp level (exactly as the
  plain evolve does) and passed in as input planes.  This keeps the
  GLOBAL window-truncation semantics of reconstruction.limit (zeros
  outside the buf=2 window) in the data the kernel sees, which makes
  every band-interior output bitwise the jnp value -- re-deriving the
  limit4 slopes in-band would truncate its two-stage window at band
  rather than global positions and perturb the outermost band row.

* Downstream consumers read the MAC velocities on the (lo-1, hi+2)
  row window -- three rows beyond the union of band interiors, with
  partially-corrected values whose truncation sits at the GLOBAL
  window edge.  Those rows are produced by running the identical jnp
  pipeline on two thin edge slabs (SLAB interior rows + ghosts, so the
  slab's window truncation coincides with the global one) and pasted
  into the assembled plane.  rho_increment/advect_terms outputs are
  interior-only, so only mac_vels needs the slab paste.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import pyro2_tpu.solvers.lm_atm.LM_atm_interface as lm_interface
from pyro2_tpu.mesh import indexer as _ix
from pyro2_tpu.mesh.grid import Cartesian2d
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.solvers.compressible.pallas_step import (
    NG, NGX, IneligibleStep, _pick_tile)

__all__ = ["make_lm_interface_kernels", "IneligibleStep"]

SLAB = 16   # interior rows per edge slab (>= deepest dependency chain)


def _band_call(n_in, n_out, nx, qy_pad, tile_rows, local_fn, interpret):
    """An (n_in -> n_out)-plane band kernel over the padded row layout.

    local_fn(S_loc, dt) takes the (n_in, T+2*NG, qy_pad) local frame and
    returns the (n_out, T, qy_pad) owned interior rows.
    """
    n_tiles = nx // tile_rows
    band_in = tile_rows + 2 * NGX
    qxp = nx + 2 * NGX

    def kernel(dt_ref, S_hbm, out_hbm, band_vmem, res_vmem, sem_in,
               sem_out):
        i = pl.program_id(0)
        start = pl.multiple_of(i * tile_rows, 8)
        cp = pltpu.make_async_copy(
            S_hbm.at[:, pl.ds(start, band_in), :], band_vmem, sem_in)
        cp.start()
        cp.wait()
        S_loc = band_vmem[:, NGX - NG:NGX + tile_rows + NG, :]
        res_vmem[...] = local_fn(S_loc, dt_ref[0])
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
            pltpu.VMEM((n_in, band_in, qy_pad), jnp.float32),
            pltpu.VMEM((n_out, tile_rows, qy_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_out, qxp, qy_pad), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


class LMInterfaceKernels:
    """Drop-in fused twins of the three LM_atm_interface call sites.

    All methods take/return arrays in the plain jnp (qx, qy) layout of
    simulation.evolve; padding, band dispatch, and (for mac_vels) the
    edge-slab paste happen inside.
    """

    def __init__(self, sim, tile_rows=None, interpret=False):
        myg = sim.cc_data.grid
        if getattr(myg, "coord_type", 0) != 0:
            raise IneligibleStep("lm_atm kernels are Cartesian-only")
        if myg.ng != NG:
            raise IneligibleStep(f"band layout expects ng={NG}")
        if min(myg.nx, myg.ny) < 2 * SLAB:
            raise IneligibleStep("edge slabs need nx, ny >= 32")
        self.myg = myg
        self.nx, self.ny = myg.nx, myg.ny
        self.qx, self.qy = myg.qx, myg.qy
        self.qy_pad = -(-self.qy // 128) * 128
        self.tile = tile_rows or _pick_tile(self.nx, want=64)
        self.interpret = interpret
        self.ny_eff = self.qy_pad - 2 * NG
        # the band-local grid: dx/dy only enter through dt/dx scalars,
        # which the lm_interface functions take explicitly
        self.gb = Cartesian2d(self.tile, self.ny_eff, ng=NG,
                              xmax=self.tile * myg.dx,
                              ymax=self.ny_eff * myg.dy)
        self.gs = Cartesian2d(SLAB, self.ny, ng=NG,
                              xmax=SLAB * myg.dx, ymax=self.ny * myg.dy)
        self.gs_col = Cartesian2d(self.nx, SLAB, ng=NG,
                                  xmax=self.nx * myg.dx,
                                  ymax=SLAB * myg.dy)
        self._calls = {}

    # -- plumbing ---------------------------------------------------------

    def _pad(self, planes):
        S = jnp.stack([p.astype(jnp.float32) for p in planes])
        return jax.lax.pad(S, jnp.float32(0.0),
                           [(0, 0, 0), (NGX - NG, NGX - NG, 0),
                            (0, self.qy_pad - self.qy, 0)])

    def _get(self, name, n_in, n_out, local_fn, post=None):
        """A cached jitted runner: pad -> band kernel -> slice core rows
        -> optional `post(core, dt, planes)` assembly, all in ONE jit
        (eager per-op dispatch through the TPU tunnel would dominate)."""
        if name not in self._calls:
            call = _band_call(n_in, n_out, self.nx, self.qy_pad,
                              self.tile, local_fn, self.interpret)

            @jax.jit
            def run(dt, *planes):
                P = self._pad(planes)
                O = call(jnp.asarray([dt], jnp.float32), P)
                core = O[:, NGX:NGX + self.nx, :self.qy]
                return post(core, dt, planes) if post else core

            self._calls[name] = run
        return self._calls[name]

    # -- mac_vels ---------------------------------------------------------

    def _local_mac(self, S, dt):
        gb = self.gb
        with _ix.full_frame():
            um, vm = lm_interface.mac_vels(
                gb, self.myg.dx, self.myg.dy, dt,
                S[0], S[1], S[2], S[3], S[4], S[5], S[6], S[7], S[8])
        return jnp.stack([um, vm])[:, gb.ilo:gb.ihi + 1, :]

    def _post_mac(self, core, dt, planes):
        """Assemble the full padded MAC planes: band interiors + edge
        slabs.  The slabs run the identical jnp pipeline on thin strips
        whose window truncation coincides with the global one; row
        slabs supply rows lo-1 / hi+1 / hi+2, the column slab supplies
        col jhi+2 (the band's lane padding moves the j-window
        truncation beyond the real ghost columns, so the kernel's top
        ghost columns carry untruncated values there)."""
        sq = 2 * NG + SLAB
        f32 = [p.astype(jnp.float32) for p in planes]
        dx, dy = self.myg.dx, self.myg.dy
        um_b, vm_b = lm_interface.mac_vels(
            self.gs, dx, dy, dt, *[p[:sq] for p in f32])
        um_t, vm_t = lm_interface.mac_vels(
            self.gs, dx, dy, dt, *[p[-sq:] for p in f32])
        um_c, vm_c = lm_interface.mac_vels(
            self.gs_col, dx, dy, dt, *[p[:, -sq:] for p in f32])

        out = jnp.zeros((2, self.qx, self.qy), jnp.float32)
        out = out.at[:, NG:NG + self.nx, :self.qy - 3].set(
            core[:, :, :self.qy - 3])
        out = out.at[:, :, self.qy - 3].set(
            jnp.stack([um_c[:, sq - 3], vm_c[:, sq - 3]]))
        out = out.at[:, NG - 1, :].set(
            jnp.stack([um_b[NG - 1], vm_b[NG - 1]]))
        out = out.at[:, NG + self.nx:NG + self.nx + 2, :].set(
            jnp.stack([um_t[sq - NG:sq - NG + 2],
                       vm_t[sq - NG:sq - NG + 2]], 0))
        return out

    def mac_vels(self, dt, u, v, lux, lvx, luy, lvy, gpx, gpy, src):
        """u_MAC, v_MAC with the jnp path's exact layout and window
        semantics (zeros outside the (lo-1, hi+2) window; the
        partially-corrected window-edge rows/columns from the slabs)."""
        run = self._get("mac", 9, 2, self._local_mac,
                        post=self._post_mac)
        out = run(jnp.float32(dt), u, v, lux, lvx, luy, lvy, gpx, gpy,
                  src)
        return out[0].astype(u.dtype), out[1].astype(u.dtype)

    # -- rho advection ----------------------------------------------------

    def _local_rho(self, S, dt):
        gb = self.gb
        dx, dy = self.myg.dx, self.myg.dy
        with _ix.full_frame():
            rho_xint, rho_yint = lm_interface.rho_states(
                gb, dx, dy, dt, S[0], S[1], S[2], S[3], S[4])
            rxi = ai(rho_xint, gb)
            ryi = ai(rho_yint, gb)
            um = ai(S[1], gb)
            vm = ai(S[2], gb)
            inc = -dt * (
                (rxi.ip(1) * um.ip(1) - rxi.v() * um.v()) / dx +
                (ryi.jp(1) * vm.jp(1) - ryi.v() * vm.v()) / dy)
        return inc[None, gb.ilo:gb.ihi + 1, :]

    def rho_increment(self, dt, rho, u_MAC, v_MAC, lrx, lry):
        """The (nx, ny) interior density update increment
        (-dt * div(rho_int U_MAC)), matching the jnp path's."""
        run = self._get("rho", 5, 1, self._local_rho,
                        post=lambda core, dt, planes:
                        core[0, :, NG:NG + self.ny])
        return run(jnp.float32(dt), rho, u_MAC, v_MAC, lrx,
                   lry).astype(rho.dtype)

    # -- full states + advective terms ------------------------------------

    def _local_states(self, S, dt):
        gb = self.gb
        dx, dy = self.myg.dx, self.myg.dy
        with _ix.full_frame():
            u_xint, v_xint, u_yint, v_yint = lm_interface.states(
                gb, dx, dy, dt, S[0], S[1], S[2], S[3], S[4], S[5],
                S[6], S[7], S[8], S[9], S[10])
            um = ai(S[9], gb)
            vm = ai(S[10], gb)
            uxi = ai(u_xint, gb)
            vxi = ai(v_xint, gb)
            uyi = ai(u_yint, gb)
            vyi = ai(v_yint, gb)
            ubar = 0.5 * (um.v() + um.ip(1))
            vbar = 0.5 * (vm.v() + vm.jp(1))
            advect_x = (ubar * (uxi.ip(1) - uxi.v()) / dx +
                        vbar * (uyi.jp(1) - uyi.v()) / dy)
            advect_y = (ubar * (vxi.ip(1) - vxi.v()) / dx +
                        vbar * (vyi.jp(1) - vyi.v()) / dy)
        return jnp.stack([advect_x, advect_y])[:, gb.ilo:gb.ihi + 1, :]

    def advect_terms(self, dt, u, v, lux, lvx, luy, lvy, gpx, gpy, src,
                     u_MAC, v_MAC):
        """The (nx, ny) interior advective terms of the provisional
        velocity update, matching the jnp path's."""
        run = self._get("states", 11, 2, self._local_states,
                        post=lambda core, dt, planes:
                        core[:, :, NG:NG + self.ny])
        ax, ay = run(jnp.float32(dt), u, v, lux, lvx, luy, lvy, gpx,
                     gpy, src, u_MAC, v_MAC)
        return ax.astype(u.dtype), ay.astype(u.dtype)


def make_lm_interface_kernels(sim, tile_rows=None, interpret=False):
    """Build the fused kernel trio for a live lm_atm Simulation.

    Raises IneligibleStep when the grid can't host the band layout."""
    return LMInterfaceKernels(sim, tile_rows=tile_rows,
                              interpret=interpret)
