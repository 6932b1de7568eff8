"""The CTU (corner transport upwind) pipeline for compressible flow.

Functional re-design of /root/reference/pyro/compressible/unsplit_fluxes.py
(Colella 1990 unsplit Godunov): interface states via characteristic tracing,
interface-state source increments, transverse Riemann flux corrections, and
Colella-Woodward artificial viscosity.  Everything is whole-array windowed
jnp; the stages compose inside one jitted step.
"""

import jax.numpy as jnp

import pyro2_tpu.solvers.compressible.interface as ifc
from pyro2_tpu.mesh import reconstruction
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.solvers.compressible import riemann


def interface_states(U, my_data, rp, ivars, tc, dt):
    """Left/right conserved states on x and y interfaces.

    cons -> prim, flattening, limited slopes, characteristic tracing,
    prim -> cons (reference unsplit_fluxes.py:134-244).
    """
    from pyro2_tpu.solvers.compressible import simulation as comp

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

    tm_limit = tc.timer("limiting")
    tm_limit.begin()
    limiter = rp.get_param("compressible.limiter")

    ldx = jnp.stack([xi * reconstruction.limit(q[n], myg, 1, limiter)
                     for n in range(ivars.nq)])
    ldy = jnp.stack([xi * reconstruction.limit(q[n], myg, 2, limiter)
                     for n in range(ivars.nq)])
    tm_limit.end()

    tm_states = tc.timer("interfaceStates")
    tm_states.begin()
    if getattr(myg, "coord_type", 0) == 0:
        # Cartesian: uniform spacing and no geometric source -- pass
        # scalars (bitwise identical; avoids constant geometry arrays)
        V_xl, V_xr = ifc.states(1, myg, myg.dx, 0.0, dt, ivars, gamma,
                                q, ldx)
        V_yl, V_yr = ifc.states(2, myg, myg.dy, 0.0, dt, ivars, gamma,
                                q, ldy)
    else:
        V_xl, V_xr = ifc.states(1, myg, myg.Lx, myg.dlogAx, dt, ivars,
                                gamma, q, ldx)
        V_yl, V_yr = ifc.states(2, myg, myg.Ly, myg.dlogAy, dt, ivars,
                                gamma, q, ldy)
    tm_states.end()

    U_xl = comp.prim_to_cons(V_xl, gamma, ivars, myg)
    U_xr = comp.prim_to_cons(V_xr, gamma, ivars, myg)
    U_yl = comp.prim_to_cons(V_yl, gamma, ivars, myg)
    U_yr = comp.prim_to_cons(V_yr, gamma, ivars, myg)

    return U_xl, U_xr, U_yl, U_yr


def apply_source_terms(U_xl, U_xr, U_yl, U_yr, U, t,
                       my_data, my_aux, rp, ivars, tc, dt, *,
                       problem_source=None, window_mask=None):
    """Add 0.5*dt of the (ghost-filled) external sources to the interface
    states (reference unsplit_fluxes.py:247-330).

    window_mask (full-frame mode only): 1 on the GLOBAL buf=1 window.
    The windowed path increments only rows/lanes [ilo-1, ihi+2); inside a
    Pallas row band the full-frame adds must be masked to the same global
    window or deeper ghost cells pick up increments the jnp step never
    applies (which leak into interior results through the transverse
    corrections)."""
    from pyro2_tpu.solvers.compressible import simulation as comp

    tm_source = tc.timer("sourceTerms")
    tm_source.begin()

    myg = my_data.grid
    U_src = comp.get_external_sources(t, dt, U, ivars, rp, myg,
                                      problem_source=problem_source)

    # ghost-fill the four source fields via the aux container's BCs
    src_stack = jnp.stack([U_src[ivars.idens], U_src[ivars.ixmom],
                           U_src[ivars.iymom], U_src[ivars.iener]])
    src_stack = my_aux.fill_bc_stack(src_stack, t=t)
    xmom_src = ai(src_stack[1], myg)
    ymom_src = ai(src_stack[2], myg)
    E_src = ai(src_stack[3], myg)

    b = 1
    hdt = 0.5 * dt
    from pyro2_tpu.mesh import indexer as _ix
    if _ix.is_full_frame():
        # inside Pallas kernels windows are the full frame
        sl = (slice(None), slice(None))
    else:
        sl = (slice(myg.ilo - b, myg.ihi + 2),
              slice(myg.jlo - b, myg.jhi + 2))

    def _m(x):
        return jnp.where(window_mask, x, 0.0) if window_mask is not None \
            else x

    if _ix.is_full_frame():
        # Mosaic cannot lower scatter(-add); rebuild the stack row-wise
        # (a concatenate), bitwise identical to the windowed add
        def bump(A, n, inc):
            rows = [A[k] for k in range(A.shape[0])]
            rows[n] = A[n] + inc
            return jnp.stack(rows)
    else:
        def bump(A, n, inc):
            return A.at[(n,) + sl].add(inc)

    # left states pick up the source of the zone they came from (i-1 / j-1)
    for n_target, src in ((ivars.ixmom, xmom_src), (ivars.iymom, ymom_src),
                          (ivars.iener, E_src)):
        U_xl = bump(U_xl, n_target, _m(hdt * src.ip(-1, buf=b)))
        U_xr = bump(U_xr, n_target, _m(hdt * src.v(buf=b)))
        U_yl = bump(U_yl, n_target, _m(hdt * src.jp(-1, buf=b)))
        U_yr = bump(U_yr, n_target, _m(hdt * src.v(buf=b)))

    tm_source.end()
    return U_xl, U_xr, U_yl, U_yr


def apply_transverse_flux(U_xl, U_xr, U_yl, U_yr,
                          my_data, rp, ivars, solid, tc, dt):
    """Correct the normal interface states with transverse flux
    differences (reference unsplit_fluxes.py:333-494)."""
    from pyro2_tpu.solvers.compressible import simulation as comp

    myg = my_data.grid

    if getattr(myg, "coord_type", 0) == 1:
        F_x, U_x = riemann.riemann_flux(1, U_xl, U_xr, my_data, rp, ivars,
                                        solid.xl, solid.xr, tc,
                                        return_cons=True)
        F_y, U_y = riemann.riemann_flux(2, U_yl, U_yr, my_data, rp, ivars,
                                        solid.yl, solid.yr, tc,
                                        return_cons=True)
        gamma = rp.get_param("eos.gamma")
        qx = comp.cons_to_prim(U_x, gamma, ivars, myg)
        qy = comp.cons_to_prim(U_y, gamma, ivars, myg)
    else:
        F_x = riemann.riemann_flux(1, U_xl, U_xr, my_data, rp, ivars,
                                   solid.xl, solid.xr, tc)
        F_y = riemann.riemann_flux(2, U_yl, U_yr, my_data, rp, ivars,
                                   solid.yl, solid.yr, tc)

    tm_transverse = tc.timer("transverse flux addition")
    tm_transverse.begin()

    b = (2, 1)
    hdt = 0.5 * dt
    if getattr(myg, "coord_type", 0) == 0:
        # uniform Cartesian geometry: scalar stand-ins, bitwise identical
        from pyro2_tpu.mesh.indexer import aic
        V = aic(myg.dx * myg.dy)
        Ax = aic(myg.dy)
        Ay = aic(myg.dx)
    else:
        V = ai(jnp.asarray(myg.V), myg)
        Ax = ai(jnp.asarray(myg.Ax), myg)
        Ay = ai(jnp.asarray(myg.Ay), myg)
    Fx = ai(F_x, myg)
    Fy = ai(F_y, myg)
    hdtV = hdt / V.v(buf=b)

    # windowed adds as zero-pad + whole-array add (scatter-free; identical
    # arithmetic inside the window, and the outside was zero-padded anyway)
    from pyro2_tpu.mesh.indexer import embed

    U_xl = U_xl + embed(-hdtV * (Fy.ip_jp(-1, 1, buf=b) *
                                 Ay.ip_jp(-1, 1, buf=b) -
                                 Fy.ip(-1, buf=b) * Ay.ip(-1, buf=b)),
                        myg, b)
    U_xr = U_xr + embed(-hdtV * (Fy.jp(1, buf=b) * Ay.jp(1, buf=b) -
                                 Fy.v(buf=b) * Ay.v(buf=b)), myg, b)
    U_yl = U_yl + embed(-hdtV * (Fx.ip_jp(1, -1, buf=b) *
                                 Ax.ip_jp(1, -1, buf=b) -
                                 Fx.jp(-1, buf=b) * Ax.jp(-1, buf=b)),
                        myg, b)
    U_yr = U_yr + embed(-hdtV * (Fx.ip(1, buf=b) * Ax.ip(1, buf=b) -
                                 Fx.v(buf=b) * Ax.v(buf=b)), myg, b)

    if getattr(myg, "coord_type", 0) == 1:
        # non-conservative transverse pressure gradients (momentum only):
        # single-component embed adds (scatter-free so the expression
        # lowers inside Pallas kernels; identical arithmetic to the
        # windowed .at[component].add form)
        Lx = ai(jnp.asarray(myg.Lx), myg)
        Ly = ai(jnp.asarray(myg.Ly), myg)
        qxv = ai(qx[ivars.ip], myg)
        qyv = ai(qy[ivars.ip], myg)

        def mom_add(U_st, comp_i, expr):
            zero = jnp.zeros_like(expr)
            win = jnp.stack([expr if n == comp_i else zero
                             for n in range(ivars.nvar)])
            return U_st + embed(win, myg, b)

        U_xl = mom_add(U_xl, ivars.iymom,
                       -hdt * (qyv.ip_jp(-1, 1, buf=b) -
                               qyv.ip(-1, buf=b)) / Ly.v(buf=b))
        U_xr = mom_add(U_xr, ivars.iymom,
                       -hdt * (qyv.jp(1, buf=b) -
                               qyv.v(buf=b)) / Ly.v(buf=b))
        U_yl = mom_add(U_yl, ivars.ixmom,
                       -hdt * (qxv.ip_jp(1, -1, buf=b) -
                               qxv.jp(-1, buf=b)) / Lx.v(buf=b))
        U_yr = mom_add(U_yr, ivars.ixmom,
                       -hdt * (qxv.ip(1, buf=b) -
                               qxv.v(buf=b)) / Lx.v(buf=b))

    tm_transverse.end()
    return U_xl, U_xr, U_yl, U_yr


def apply_artificial_viscosity(F_x, F_y, q, U, my_data, rp, ivars,
                               edges=None):
    """Add Colella-Woodward artificial viscosity to the fluxes
    (reference unsplit_fluxes.py:497-549).  `edges` forwards the
    domain-edge flags to the avisc window masking (see
    interface.artificial_viscosity)."""
    cvisc = rp.get_param("compressible.cvisc")
    myg = my_data.grid

    avisco_x, avisco_y = ifc.artificial_viscosity(
        myg, cvisc, q[ivars.iu], q[ivars.iv], edges=edges)

    b = (2, 1)
    avx = ai(avisco_x, myg)
    avy = ai(avisco_y, myg)
    Uv = ai(U, myg)

    from pyro2_tpu.mesh.indexer import embed
    F_x = F_x + embed(avx.v(buf=b)[None] *
                      (Uv.ip(-1, buf=b) - Uv.v(buf=b)), myg, b)
    F_y = F_y + embed(avy.v(buf=b)[None] *
                      (Uv.jp(-1, buf=b) - Uv.v(buf=b)), myg, b)
    return F_x, F_y
