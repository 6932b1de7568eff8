"""Unsplit CTU fluxes for the shallow water equations.

Functional mirror of /root/reference/pyro/swe/unsplit_fluxes.py: tracing ->
first Riemann pass for transverse fluxes -> transverse-corrected interface
states -> second Riemann pass for the final fluxes.
"""

import jax.numpy as jnp

import pyro2_tpu.solvers.swe.interface as ifc
from pyro2_tpu.mesh import reconstruction
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.util import msg


def unsplit_fluxes(U, my_data, rp, ivars, solid, tc, dt):
    """Construct the x and y interface fluxes (two Riemann passes)."""
    from pyro2_tpu.solvers.swe import simulation as swe

    tm_flux = tc.timer("unsplitFluxes")
    tm_flux.begin()

    myg = my_data.grid
    grav = rp.get_param("swe.grav")

    q = swe.cons_to_prim(U, ivars, myg)

    use_flattening = rp.get_param("swe.use_flattening")
    if use_flattening:
        xi_x = reconstruction.flatten(myg, q, 1, ivars, rp)
        xi_y = reconstruction.flatten(myg, q, 2, ivars, rp)
        xi = reconstruction.flatten_multid(myg, q, xi_x, xi_y, ivars)
    else:
        xi = 1.0

    limiter = rp.get_param("swe.limiter")
    ldx = jnp.stack([xi * reconstruction.limit(q[n], myg, 1, limiter)
                     for n in range(ivars.nq)])
    ldy = jnp.stack([xi * reconstruction.limit(q[n], myg, 2, limiter)
                     for n in range(ivars.nq)])

    V_xl, V_xr = ifc.states(1, myg, myg.dx, dt, ivars, grav, q, ldx)
    V_yl, V_yr = ifc.states(2, myg, myg.dy, dt, ivars, grav, q, ldy)

    U_xl = swe.prim_to_cons(V_xl, ivars, myg)
    U_xr = swe.prim_to_cons(V_xr, ivars, myg)
    U_yl = swe.prim_to_cons(V_yl, ivars, myg)
    U_yr = swe.prim_to_cons(V_yr, ivars, myg)

    riemann = rp.get_param("swe.riemann")
    if riemann == "HLLC":
        riemannFunc = ifc.riemann_hllc
    elif riemann == "Roe":
        riemannFunc = ifc.riemann_roe
    else:
        msg.fail("ERROR: Riemann solver undefined")

    # first pass: transverse fluxes
    F_x = riemannFunc(1, myg, ivars, solid.xl, solid.xr, grav, U_xl, U_xr)
    F_y = riemannFunc(2, myg, ivars, solid.yl, solid.yr, grav, U_yl, U_yr)

    # apply transverse corrections to the interface states (embed form:
    # scatter-free, so the identical code runs inside the fused kernel)
    from pyro2_tpu.mesh.indexer import embed
    b = (2, 1)
    Fx = ai(F_x, myg)
    Fy = ai(F_y, myg)
    dtdx = dt / myg.dx
    dtdy = dt / myg.dy

    U_xl = U_xl + embed(-0.5 * dtdy * (Fy.ip_jp(-1, 1, buf=b) -
                                       Fy.ip(-1, buf=b)), myg, b)
    U_xr = U_xr + embed(-0.5 * dtdy * (Fy.jp(1, buf=b) - Fy.v(buf=b)),
                        myg, b)
    U_yl = U_yl + embed(-0.5 * dtdx * (Fx.ip_jp(1, -1, buf=b) -
                                       Fx.jp(-1, buf=b)), myg, b)
    U_yr = U_yr + embed(-0.5 * dtdx * (Fx.ip(1, buf=b) - Fx.v(buf=b)),
                        myg, b)

    # second pass: the final normal fluxes
    F_x = riemannFunc(1, myg, ivars, solid.xl, solid.xr, grav, U_xl, U_xr)
    F_y = riemannFunc(2, myg, ivars, solid.yl, solid.yr, grav, U_yl, U_yr)

    tm_flux.end()
    return F_x, F_y
