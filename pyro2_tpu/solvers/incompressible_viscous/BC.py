"""Viscous-incompressible custom BCs: a "moving_lid" (unit tangential
velocity at the top wall) for lid-driven cavity problems
(reference: pyro/incompressible_viscous/BC.py)."""

from pyro2_tpu.util import msg


def user(bc_name, bc_edge, variable, ccdata, stack):
    """Fill the moving-lid ghost cells; returns the updated stack."""
    myg = ccdata.grid
    n = ccdata.names.index(variable)
    v = stack[n]

    if bc_name == "moving_lid":
        if bc_edge == "yrb":
            if variable in ("x-velocity", "u"):
                v = v.at[:, myg.jhi + 1:myg.jhi + myg.ng + 1].set(1.0)
            elif variable in ("y-velocity", "v"):
                v = v.at[:, myg.jhi + 1:myg.jhi + myg.ng + 1].set(0.0)
            else:
                raise NotImplementedError("variable not defined")
        else:
            msg.fail("error: moving_lid BC only implemented for 'yrb' "
                     "(top boundary)")
    else:
        msg.fail(f"error: bc type {bc_name} not supported")

    return stack.at[n].set(v)
