"""Viscous-Burgers helpers: 5-point Laplacian, diffusion-corrected
interface states, and the C-N + advective-source Helmholtz solve
(reference: pyro/burgers_viscous/interface.py)."""

import jax.numpy as jnp

from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.multigrid import MG


def get_lap(g, a):
    """Full padded array holding the 5-point Laplacian on buf=2."""
    av = ai(a, g)
    lap_w = ((av.ip(1, buf=2) - 2.0 * av.v(buf=2) + av.ip(-1, buf=2)) /
             g.dx ** 2 +
             (av.jp(1, buf=2) - 2.0 * av.v(buf=2) + av.jp(-1, buf=2)) /
             g.dy ** 2)
    lap = jnp.zeros_like(a)
    return lap.at[g.ilo - 2:g.ihi + 3, g.jlo - 2:g.jhi + 3].set(lap_w)


def diffuse(my_data, rp, dt, scalar_name, A):
    """C-N solve of (1 - dt/2 eps L) a = a + dt/2 eps L a - dt A.

    Functional: returns the updated full padded array for scalar_name.
    """
    myg = my_data.grid
    a = my_data.get_var(scalar_name)
    eps = rp.get_param("diffusion.eps")
    bcs = my_data.BCs[scalar_name]

    mg = MG.CellCenterMG2d(myg.nx, myg.ny,
                           xmin=myg.xmin, xmax=myg.xmax,
                           ymin=myg.ymin, ymax=myg.ymax,
                           xl_BC_type=bcs.xlb, xr_BC_type=bcs.xrb,
                           yl_BC_type=bcs.ylb, yr_BC_type=bcs.yrb,
                           alpha=1.0, beta=0.5 * dt * eps, verbose=0)

    lap = get_lap(myg, a)
    f_v = (ai(a, myg).v() + 0.5 * dt * eps * ai(lap, myg).v() -
           dt * ai(A, myg).v())
    f = mg.soln_grid.scratch_array()
    f = f.at[mg.ilo:mg.ihi + 1, mg.jlo:mg.jhi + 1].set(f_v)

    mg.init_RHS(f)
    mg.init_zeros()
    mg.solve(rtol=1.e-12)

    sol = mg.get_solution()
    return a.at[myg.ilo:myg.ihi + 1, myg.jlo:myg.jhi + 1].set(
        ai(sol, mg.soln_grid).v())


def apply_diffusion_corrections(g, dt, eps, u, v,
                                u_xl, u_xr, u_yl, u_yr,
                                v_xl, v_xr, v_yl, v_yr):
    """Add 0.5*eps*dt*Lap(U) to all interface states."""
    lap_u = ai(get_lap(g, u), g).v(buf=2)
    lap_v = ai(get_lap(g, v), g).v(buf=2)

    def add(arr, vals, ishift=0, jshift=0):
        return arr.at[g.ilo - 2 + ishift:g.ihi + 3 + ishift,
                      g.jlo - 2 + jshift:g.jhi + 3 + jshift].add(vals)

    cu = 0.5 * eps * dt * lap_u
    cv = 0.5 * eps * dt * lap_v
    u_xl = add(u_xl, cu, ishift=1)
    u_yl = add(u_yl, cu, jshift=1)
    u_xr = add(u_xr, cu)
    u_yr = add(u_yr, cu)
    v_xl = add(v_xl, cv, ishift=1)
    v_yl = add(v_yl, cv, jshift=1)
    v_xr = add(v_xr, cv)
    v_yr = add(v_yr, cv)
    return u_xl, u_xr, u_yl, u_yr, v_xl, v_xr, v_yl, v_yr
