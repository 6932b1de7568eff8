"""Compressible-specific extended boundary conditions.

Pure-functional re-design of /root/reference/pyro/compressible/BC.py:
"hse" (hydrostatic pressure integration into ghosts, constant density),
"ambient" (fill from stored ambient state), and "ramp" (time-dependent
oblique-shock inflow for the double Mach reflection problem).

Signature contract (see pyro2_tpu.mesh.boundary.define_bc): the function
takes the full state stack and returns an updated stack.
"""

import math

import jax.numpy as jnp
import numpy as np

from pyro2_tpu.solvers.compressible import eos
from pyro2_tpu.util import msg

_SRC_LIKE = ["density", "x-momentum", "y-momentum",
             "dens_src", "xmom_src", "ymom_src", "E_src", "fuel", "ash"]


def user(bc_name, bc_edge, variable, ccdata, stack):
    """Dispatch the named extended BC; returns the updated stack."""
    myg = ccdata.grid
    n = ccdata.names.index(variable)
    v = stack[n]

    if bc_name == "hse":
        if bc_edge == "ylb":
            if variable in _SRC_LIKE:
                # constant into the ghosts
                v = v.at[:, 0:myg.jlo].set(v[:, myg.jlo:myg.jlo + 1])
            elif variable == "energy":
                dens = stack[ccdata.names.index("density")]
                xmom = stack[ccdata.names.index("x-momentum")]
                ymom = stack[ccdata.names.index("y-momentum")]

                grav = ccdata.get_aux("grav")
                gamma = ccdata.get_aux("gamma")

                dens_base = dens[:, myg.jlo]
                ke_base = 0.5 * (xmom[:, myg.jlo] ** 2 +
                                 ymom[:, myg.jlo] ** 2) / dens_base
                eint_base = (v[:, myg.jlo] - ke_base) / dens_base
                pres_base = eos.pres(gamma, dens_base, eint_base)

                # integrate dP = -rho g dy downward at constant density
                for k in range(1, myg.ng + 1):
                    pres_below = pres_base - k * grav * dens_base * myg.dy
                    v = v.at[:, myg.jlo - k].set(
                        eos.rhoe(gamma, pres_below) + ke_base)
            else:
                raise NotImplementedError("variable not defined")

        elif bc_edge == "yrb":
            if variable in _SRC_LIKE:
                v = v.at[:, myg.jhi + 1:].set(v[:, myg.jhi:myg.jhi + 1])
            elif variable == "energy":
                dens = stack[ccdata.names.index("density")]
                xmom = stack[ccdata.names.index("x-momentum")]
                ymom = stack[ccdata.names.index("y-momentum")]

                grav = ccdata.get_aux("grav")
                gamma = ccdata.get_aux("gamma")

                dens_base = dens[:, myg.jhi]
                ke_base = 0.5 * (xmom[:, myg.jhi] ** 2 +
                                 ymom[:, myg.jhi] ** 2) / dens_base
                eint_base = (v[:, myg.jhi] - ke_base) / dens_base
                pres_base = eos.pres(gamma, dens_base, eint_base)

                for k in range(1, myg.ng + 1):
                    pres_above = pres_base + k * grav * dens_base * myg.dy
                    v = v.at[:, myg.jhi + k].set(
                        eos.rhoe(gamma, pres_above) + ke_base)
            else:
                raise NotImplementedError("variable not defined")
        else:
            msg.fail("error: hse BC not supported for xlb or xrb")

    elif bc_name == "ambient":
        ambient_rho = ccdata.get_aux("ambient_rho")
        ambient_u = ccdata.get_aux("ambient_u")
        ambient_v = ccdata.get_aux("ambient_v")
        ambient_p = ccdata.get_aux("ambient_p")

        if bc_edge == "yrb":
            # zero-gradient default, overwritten by the ambient state
            v = v.at[:, myg.jhi + 1:].set(v[:, myg.jhi:myg.jhi + 1])
            ghost = slice(myg.jhi + 1, myg.jhi + myg.ng + 1)
            if variable == "density":
                v = v.at[:, ghost].set(ambient_rho)
            elif variable == "x-momentum":
                v = v.at[:, ghost].set(ambient_rho * ambient_u)
            elif variable == "y-momentum":
                v = v.at[:, ghost].set(ambient_rho * ambient_v)
            elif variable == "energy":
                gamma = ccdata.get_aux("gamma")
                ke = 0.5 * ambient_rho * (ambient_u ** 2 + ambient_v ** 2)
                v = v.at[:, ghost].set(ambient_p / (gamma - 1.0) + ke)
        else:
            msg.fail("error: ambient BC not supported for xlb, xrb, or ylb")

    elif bc_name == "ramp":
        gamma = ccdata.get_aux("gamma")
        cons_vars = ["density", "x-momentum", "y-momentum", "energy"]

        if bc_edge == "xlb":
            if variable in cons_vars:
                v = v.at[0:myg.ilo, :].set(inflow_post_bc(variable, gamma))
            else:
                v = jnp.zeros_like(v)  # no source term

        elif bc_edge == "ylb":
            if variable in cons_vars:
                post = inflow_post_bc(variable, gamma)
                xcen_l = myg.x < 1.0 / 6.0
                sgn = -1.0 if variable == "y-momentum" else 1.0
                for k in range(myg.ng):
                    j = myg.jlo - 1 - k
                    refl = sgn * v[:, myg.jlo + k]
                    row = jnp.where(jnp.asarray(xcen_l), post, refl)
                    v = v.at[:, j].set(row)
            else:
                v = jnp.zeros_like(v)

        elif bc_edge == "yrb":
            # the Mach-10 oblique shock front sweeps along the top
            # boundary; each ghost cell blends pre/post-shock states by
            # the 4-point (2 front positions x 2 cell extents) quadrature
            if variable in cons_vars:
                post = inflow_post_bc(variable, gamma)
                pre = inflow_pre_bc(variable, gamma)
                t = ccdata.t
                # jnp.stack: myg.x may be a traced block-global window
                # in the sharded path (parallel/sharded.py _make_bc_proxy)
                cx = jnp.stack([myg.x - 0.5 * myg.dx * math.sqrt(3),
                                myg.x + 0.5 * myg.dx * math.sqrt(3)])  # (2,qx)
                for j in range(myg.jhi + 1, myg.jhi + myg.ng + 1):
                    sf_up = (1.0 / 6.0 +
                             (myg.y[j] + 0.5 * myg.dy * math.sqrt(3)) /
                             math.tan(math.pi / 3.0) +
                             (10.0 / math.sin(math.pi / 3.0)) * t)
                    sf_down = (1.0 / 6.0 +
                               (myg.y[j] - 0.5 * myg.dy * math.sqrt(3)) /
                               math.tan(math.pi / 3.0) +
                               (10.0 / math.sin(math.pi / 3.0)) * t)
                    sf = jnp.asarray([sf_down, sf_up])   # (2,)
                    below = jnp.asarray(cx)[None, :, :] < sf[:, None, None]
                    row = jnp.sum(jnp.where(below, 0.25 * post, 0.25 * pre),
                                  axis=(0, 1))
                    v = v.at[:, j].set(row)
            else:
                v = jnp.zeros_like(v)
    else:
        msg.fail(f"error: bc type {bc_name} not supported")

    return stack.at[n].set(v)


def inflow_post_bc(var, g):
    """The post-shock (inflow) state for the double Mach reflection."""
    r_l = 8.0
    u_l = 7.1447096
    v_l = -4.125
    p_l = 116.5
    if var == "density":
        return r_l
    if var == "x-momentum":
        return r_l * u_l
    if var == "y-momentum":
        return r_l * v_l
    if var == "energy":
        return p_l / (g - 1.0) + 0.5 * r_l * (u_l * u_l + v_l * v_l)
    return 0.0


def inflow_pre_bc(var, g):
    """The undisturbed pre-shock state for the double Mach reflection."""
    r_r = 1.4
    u_r = 0.0
    v_r = 0.0
    p_r = 1.0
    if var == "density":
        return r_r
    if var == "x-momentum":
        return r_r * u_r
    if var == "y-momentum":
        return r_r * v_r
    if var == "energy":
        return p_r / (g - 1.0) + 0.5 * r_r * (u_r * u_r + v_r * v_r)
    return 0.0
