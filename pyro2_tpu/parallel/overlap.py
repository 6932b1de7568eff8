"""Comm/compute-overlapped sharded stepping + halo scaling accounting.

The plain sharded step (parallel/sharded.py) is exchange-then-compute:
halo_exchange's ppermutes are a hard data dependency of every output
cell, so the ICI transfer time adds to the step's critical path.  This
module restructures the step so that

* the CORE of the block -- interior cells >= ng away from every block
  edge -- is computed straight from the local padded block with NO
  dependence on any collective, and
* only the ng-deep RIM is computed from the exchanged halos, on narrow
  band grids sliced out of the filled block.

XLA's async collectives (ppermute lowers to collective-permute-start /
-done pairs) can then schedule the exchange DURING the core compute;
the redundant rim recompute costs ~4*ng*(bx+by)/(bx*by) extra zone
updates (<7% at 1024^2 blocks, vanishing as blocks grow).  The
reference has no counterpart (its fill_BC is serial); this is the
"halo exchange overlapped with interior stencil compute" north star of
BASELINE.md.

STATUS (r04): measured slower than the sequential step everywhere, and
docs/DESIGN.md section 11 shows the loss is structural on ICI -- the
rim recompute (>=1.3 ns/zone) costs more than the transfer it hides
(~0.7 ns/zone), and both scale with the block perimeter.  Kept
default-OFF as the measured record; the trade inverts only on
DCN-class links.

Partition invariance stays BITWISE: every output cell is produced by
the same elementwise formula graph on the same inputs as the plain
sharded step -- core cells by the full-block program, rim cells by
band programs.  XLA's elementwise lowering is value-deterministic
across array shapes (validated: tests/test_parallel.py::TestOverlap).
"""

import jax
import jax.numpy as jnp

from pyro2_tpu.parallel.mesh_comm import halo_exchange

__all__ = ["build_overlapped_step", "halo_stats"]


def _band_sim(ss, bnx, bny):
    """A band-shaped local Simulation sharing ss's runtime parameters."""
    from pyro2_tpu.parallel.sharded import _TracedSolid, _clone_rp
    from pyro2_tpu.util import profile_pyro

    rp = _clone_rp(ss.local_sim.rp)
    rp.set_param("mesh.nx", bnx)
    rp.set_param("mesh.ny", bny)
    g = ss.local_grid
    rp.set_param("mesh.xmax", g.xmin + bnx * g.dx)
    rp.set_param("mesh.ymax", g.ymin + bny * g.dy)
    sim = type(ss.local_sim)(ss.solver, ss.problem, lambda d, r: None, rp)
    sim.initialize(ng=ss.ng)
    sim.solid = _TracedSolid(sim.solid)
    sim.tc = profile_pyro.TimerCollection()
    return sim


def build_overlapped_step(ss):
    """An overlapped shard_map step for a ShardedSim (same signature and
    bitwise-identical results as ss._step).

    Requires block dims >= 4*ng so the edge bands are disjoint from the
    opposite block edge (their interior-facing sides must be genuinely
    interior for the band's static open-wall fast path to be correct).
    """
    g = ss.local_grid
    ng = ss.ng
    bx, by = g.nx, g.ny
    if bx < 4 * ng or by < 4 * ng:
        raise ValueError(
            f"overlapped stepping needs block dims >= {4 * ng} "
            f"(got {bx}x{by}); use the plain sharded step")

    sim_x = _band_sim(ss, 2 * ng, by)    # x-edge bands (rows)
    sim_y = _band_sim(ss, bx, 2 * ng)    # y-edge bands (cols)
    step_full = ss.local_sim._make_step()
    step_x = sim_x._make_step()
    step_y = sim_y._make_step()

    base = ss._base_solid

    def _flags(sim, ix, iy, xl, xr, yl, yr):
        """Install traced block/band-gated wall + domain-edge flags on a
        local sim before its step traces.  xl..yr: per-side multiplier --
        1 keeps the block's gate, 0 forces interior (band's inner side)."""
        one = jnp.asarray(1, jnp.int32)
        at_xl = jnp.where(ix == 0, one, 0)
        at_xr = jnp.where(ix == ss.px - 1, one, 0)
        at_yl = jnp.where(iy == 0, one, 0)
        at_yr = jnp.where(iy == ss.py - 1, one, 0)
        s = sim.solid
        s.xl = at_xl if (base.xl and xl) else 0
        s.xr = at_xr if (base.xr and xr) else 0
        s.yl = at_yl if (base.yl and yl) else 0
        s.yr = at_yr if (base.yr and yr) else 0
        if hasattr(sim, "domain_edges"):
            e = sim.domain_edges
            e.xl = at_xl if xl else 0
            e.xr = at_xr if xr else 0
            e.yl = at_yl if yl else 0
            e.yr = at_yr if yr else 0

    def body(U_int, t, dt):
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        pad = [(0, 0)] * U_int.ndim
        pad[-2] = (ng, ng)
        pad[-1] = (ng, ng)
        U_pad = jnp.pad(U_int, pad)

        # core pass: full-block step on the UNFILLED padded block -- no
        # collective in its dependency cone, so XLA can run the halo
        # exchange below concurrently.  Ghost-adjacent outputs are
        # garbage (zero-density ghosts stay finite through the guarded
        # cons_to_prim) and are overwritten by the rim bands.
        _flags(ss.local_sim, ix, iy, 1, 1, 1, 1)
        out_core = step_full(U_pad, t, dt)[..., ng:-ng, ng:-ng]

        # halo exchange (ppermute rings + edge-block physical fills)
        U_fill = jnp.stack([
            halo_exchange(U_pad[n], g, ss.bcs[n], ss.px, ss.py)
            for n in range(ss.nvar)])

        # rim bands: 4*ng-deep slices of the filled block; each band's
        # outer side carries the block's gates, its inner side is
        # statically interior.  Keep the ng rim rows/cols.
        w = 4 * ng
        _flags(sim_x, ix, iy, 1, 0, 1, 1)
        o_xlo = step_x(U_fill[..., :w, :], t, dt)[..., ng:2 * ng, ng:-ng]
        _flags(sim_x, ix, iy, 0, 1, 1, 1)
        o_xhi = step_x(U_fill[..., -w:, :], t, dt)[..., 2 * ng:3 * ng,
                                                   ng:-ng]
        _flags(sim_y, ix, iy, 1, 1, 1, 0)
        o_ylo = step_y(U_fill[..., :, :w], t, dt)[..., ng:-ng, ng:2 * ng]
        _flags(sim_y, ix, iy, 1, 1, 0, 1)
        o_yhi = step_y(U_fill[..., :, -w:], t, dt)[..., ng:-ng,
                                                   2 * ng:3 * ng]

        out = out_core
        out = out.at[..., :ng, :].set(o_xlo)
        out = out.at[..., bx - ng:, :].set(o_xhi)
        out = out.at[..., :, :ng].set(o_ylo)
        out = out.at[..., :, by - ng:].set(o_yhi)
        return out

    from jax.sharding import PartitionSpec as P
    spec = P(None, "x", "y")
    body_sharded = jax.shard_map(body, mesh=ss.mesh,
                                 in_specs=(spec, P(), P()),
                                 out_specs=spec)
    return jax.jit(body_sharded)


def halo_stats(ss, *, fills_per_step=1):
    """Per-step halo accounting for a ShardedSim (the scaling-efficiency
    methodology of BASELINE.md's north star, reportable without real
    multi-chip hardware).

    Returns a dict with exchanged bytes, ppermute count, the core
    fraction (share of output zones computable with no collective in
    their dependency cone = the overlap window), and the redundant rim
    recompute fraction the overlap costs.
    """
    from pyro2_tpu.defaults import dtype as _dtype

    g = ss.local_grid
    ng, bx, by = g.ng, g.nx, g.ny
    itemsize = jnp.dtype(_dtype()).itemsize
    # each split axis: 2 ppermutes per variable, each moving an
    # (ng x qy) / (qx x ng) strip per device
    ex_x = 2 if ss.px > 1 else 0
    ex_y = 2 if ss.py > 1 else 0
    strips_bytes = ss.nvar * (ex_x * ng * g.qy + ex_y * ng * g.qx) * itemsize
    n_permutes = ss.nvar * (ex_x + ex_y)
    core = max(bx - 2 * ng, 0) * max(by - 2 * ng, 0) / (bx * by)
    rim_extra = (4 * ng * (bx + by)) / (bx * by)
    return {
        "block": [bx, by],
        "mesh": [ss.px, ss.py],
        "halo_bytes_per_step": strips_bytes * fills_per_step,
        "ppermutes_per_step": n_permutes * fills_per_step,
        "core_fraction": core,
        "rim_recompute_fraction": rim_extra,
    }
