"""MOL fluxes for compressible flow: plain PLM interface states (no
characteristic tracing), single Riemann pass, artificial viscosity, and the
optional well-balanced hydrostatic pressure reconstruction
(reference: pyro/compressible_rk/fluxes.py)."""

import jax.numpy as jnp

import pyro2_tpu.solvers.compressible.unsplit_fluxes as ctu_flx
from pyro2_tpu.mesh import reconstruction
from pyro2_tpu.mesh.indexer import ai, embed
from pyro2_tpu.solvers.compressible import riemann


def fluxes(U, my_data, rp, ivars, solid, tc):
    """(F_x, F_y) through all interfaces from one unsplit reconstruction."""
    from pyro2_tpu.solvers.compressible import simulation as comp

    tm_flux = tc.timer("unsplitFluxes")
    tm_flux.begin()

    myg = my_data.grid
    gamma = rp.get_param("eos.gamma")

    q = comp.cons_to_prim(U, gamma, ivars, myg)

    use_flattening = rp.get_param("compressible.use_flattening")
    if use_flattening:
        xi_x = reconstruction.flatten(myg, q, 1, ivars, rp)
        xi_y = reconstruction.flatten(myg, q, 2, ivars, rp)
        xi = reconstruction.flatten_multid(myg, q, xi_x, xi_y, ivars)
    else:
        xi = 1.0

    limiter = rp.get_param("compressible.limiter")
    ldx = jnp.stack([xi * reconstruction.limit(q[n], myg, 1, limiter)
                     for n in range(ivars.nq)])
    ldy = jnp.stack([xi * reconstruction.limit(q[n], myg, 2, limiter)
                     for n in range(ivars.nq)])

    well_balanced = rp.get_param("compressible.well_balanced")
    grav = rp.get_param("compressible.grav")
    if well_balanced:
        # hydrostatic-subtracted limiting of the y pressure slope
        # (row-list rebuild: scatter-free for the fused band kernel)
        rows = [ldy[n] for n in range(ivars.nq)]
        rows[ivars.ip] = reconstruction.well_balance(q, myg, limiter,
                                                     ivars, grav)
        ldy = jnp.stack(rows)

    b = 2
    qw = ai(q, myg).v(buf=b)
    ldx_w = ai(ldx, myg).v(buf=b)
    ldy_w = ai(ldy, myg).v(buf=b)

    def put(vals, ishift=0, jshift=0):
        return embed(vals, myg, buf=b, ishift=ishift, jshift=jshift)

    V_xl = put(qw + 0.5 * ldx_w, ishift=1)
    V_xr = put(qw - 0.5 * ldx_w)

    V_yl_w = qw + 0.5 * ldy_w
    V_yr_w = qw - 0.5 * ldy_w
    if well_balanced:
        # reconstruct p0 + p1 on the y faces: add the hydrostatic p0 part
        p0_incr = 0.5 * myg.dy * qw[ivars.irho] * grav
        rows_l = [V_yl_w[n] for n in range(ivars.nq)]
        rows_r = [V_yr_w[n] for n in range(ivars.nq)]
        rows_l[ivars.ip] = (qw[ivars.ip] + p0_incr +
                            0.5 * ldy_w[ivars.ip])
        rows_r[ivars.ip] = (qw[ivars.ip] - p0_incr -
                            0.5 * ldy_w[ivars.ip])
        V_yl_w = jnp.stack(rows_l)
        V_yr_w = jnp.stack(rows_r)
    V_yl = put(V_yl_w, jshift=1)
    V_yr = put(V_yr_w)

    U_xl = comp.prim_to_cons(V_xl, gamma, ivars, myg)
    U_xr = comp.prim_to_cons(V_xr, gamma, ivars, myg)
    U_yl = comp.prim_to_cons(V_yl, gamma, ivars, myg)
    U_yr = comp.prim_to_cons(V_yr, gamma, ivars, myg)

    F_x = riemann.riemann_flux(1, U_xl, U_xr, my_data, rp, ivars,
                               solid.xl, solid.xr, tc)
    F_y = riemann.riemann_flux(2, U_yl, U_yr, my_data, rp, ivars,
                               solid.yl, solid.yr, tc)

    F_x, F_y = ctu_flx.apply_artificial_viscosity(F_x, F_y, q, U,
                                                  my_data, rp, ivars)
    tm_flux.end()
    return F_x, F_y
