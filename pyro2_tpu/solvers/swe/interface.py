"""Shallow-water characteristic tracing and Riemann solvers, vectorized.

Re-design of /root/reference/pyro/swe/interface.py (numba): the 3x3
eigen-system of the SWE primitive Jacobian unrolls analytically; the Roe
solver (with entropy fix) and HLLC become jnp.where ladders over whole
interface arrays.

Everything is scatter-free (row-list rebuilds + indexer.embed instead of
.at[] updates) so the SAME code runs inside the fused Pallas row-band
kernel (swe/pallas_step.py) under indexer.full_frame(), exactly like the
compressible pipeline.
"""

import jax.numpy as jnp

from pyro2_tpu.mesh.indexer import ai, embed

__all__ = ["states", "riemann_roe", "riemann_hllc", "consFlux"]

SMALLC = 1.e-10


def states(idir, g, dx, dt, ivars, grav, qv, dqv):
    """Predict primitive states (h, u, v[, X]) to edges along idir.

    Analytic unroll of the 3x3 characteristic tracing
    (reference swe/interface.py:6-210).  q_l[i] is the left state at the
    i-1/2 interface.
    """
    ih, iu, iv = ivars.ih, ivars.iu, ivars.iv
    nspec = ivars.naux

    b = 2
    q = ai(qv, g).v(buf=b)
    dq = ai(dqv, g).v(buf=b)

    dtdx = dt / dx
    dtdx3 = 0.33333 * dtdx   # the reference's (approximate) 1/3 factor

    h = q[ih]
    cs = jnp.sqrt(grav * h)
    un = q[iu] if idir == 1 else q[iv]

    d_h = dq[ih]
    d_un = dq[iu] if idir == 1 else dq[iv]
    d_ut = dq[iv] if idir == 1 else dq[iu]

    ev0 = un - cs
    ev2 = un + cs

    # left-eigenvector dot products (scaled per the reference)
    a0 = 0.5 / (cs * h) * (cs * d_h - h * d_un)
    a1 = d_ut
    a2 = -0.5 / (cs * h) * (cs * d_h + h * d_un) * (-1.0)
    # note: lvec[2] = -[cs, h, 0]*0.5/(cs h) -> l2.dq = -(cs d_h + h d_un)
    # * 0.5/(cs h); rewrite explicitly:
    a2 = -0.5 / (cs * h) * (cs * d_h + h * d_un)

    def beta_pair(ev_m, asum):
        gate_l = jnp.where(ev_m >= 0.0, 2.0, 0.0)   # copysign(1,0) == +1
        gate_r = jnp.where(ev_m >= 0.0, 0.0, 2.0)
        bl = dtdx3 * (ev2 - ev_m) * gate_l * asum
        br = dtdx3 * (ev0 - ev_m) * gate_r * asum
        return bl, br

    bl0, br0 = beta_pair(ev0, a0)
    bl1, br1 = beta_pair(un, a1)
    bl2, br2 = beta_pair(ev2, a2)

    factor_l = 0.5 * (1.0 - dtdx * jnp.maximum(ev2, 0.0))
    factor_r = 0.5 * (1.0 + dtdx * jnp.minimum(ev0, 0.0))

    q_l_win = q + factor_l[None] * dq
    q_r_win = q - factor_r[None] * dq

    # right eigenvectors: r0 = (h, -c, 0), r_trans = (0,..,1,..), r2 = (h, c, 0)
    corr = {
        ih: (bl0 + bl2, br0 + br2, h),
        (iu if idir == 1 else iv): (bl2 - bl0, br2 - br0, cs),
        (iv if idir == 1 else iu): (bl1, br1, 1.0),
    }
    rows_l = [q_l_win[m] for m in range(ivars.nq)]
    rows_r = [q_r_win[m] for m in range(ivars.nq)]
    for m, (cl, cr, scale) in corr.items():
        rows_l[m] = rows_l[m] + scale * cl
        rows_r[m] = rows_r[m] + scale * cr

    for n in range(ivars.ix, ivars.ix + nspec):
        bls, brs = beta_pair(un, dq[n])
        rows_l[n] = rows_l[n] + bls
        rows_r[n] = rows_r[n] + brs
    q_l_win = jnp.stack(rows_l)
    q_r_win = jnp.stack(rows_r)

    ish, jsh = (1, 0) if idir == 1 else (0, 1)
    q_l = embed(q_l_win, g, buf=b, ishift=ish, jshift=jsh)
    q_r = embed(q_r_win, g, buf=b)
    return q_l, q_r


def _wslice(g, b=1):
    from pyro2_tpu.mesh import indexer
    if indexer.is_full_frame():
        return (slice(None), slice(None), slice(None))
    return (slice(None), slice(g.ilo - b, g.ihi + 2),
            slice(g.jlo - b, g.jhi + 2))


def _consFlux_win(idir, grav, ivars, U):
    """SWE analytic flux of a window stack (scatter-free rebuild)."""
    h = U[ivars.ih]
    u = U[ivars.ixmom] / h
    v = U[ivars.iymom] / h
    vel = u if idir == 1 else v
    rows = [None] * ivars.nvar
    rows[ivars.ih] = h * vel
    rows[ivars.ixmom] = U[ivars.ixmom] * vel
    rows[ivars.iymom] = U[ivars.iymom] * vel
    if idir == 1:
        rows[ivars.ixmom] = rows[ivars.ixmom] + 0.5 * grav * h ** 2
    else:
        rows[ivars.iymom] = rows[ivars.iymom] + 0.5 * grav * h ** 2
    for n in range(ivars.ihx, ivars.ihx + ivars.naux):
        rows[n] = U[n] * vel
    return jnp.stack(rows)


def consFlux(idir, grav, ivars, U_state):
    """SWE analytic flux of a full stack (guarding h == 0 zones)."""
    h = U_state[ivars.ih]
    safe = jnp.where(h != 0.0, h, 1.0)
    rows = [U_state[n] for n in range(ivars.nvar)]
    rows[ivars.ih] = safe
    F = _consFlux_win(idir, grav, ivars, jnp.stack(rows))
    F = jnp.where(h[None] != 0.0, F, 0.0)
    rows = [F[n] for n in range(ivars.nvar)]
    rows[ivars.ih] = jnp.where(h != 0.0, F[ivars.ih], 0.0)
    return jnp.stack(rows)


def riemann_roe(idir, g, ivars, lower_solid, upper_solid, grav, U_l, U_r):
    """Roe solver with entropy fix (Toro SWE book / clawpack form).

    Returns the interface flux (reference swe/interface.py:211-357).
    """
    del lower_solid, upper_solid
    w = _wslice(g)
    Ul = U_l[w]
    Ur = U_r[w]

    tol = 0.1e-1   # entropy-fix parameter (assumes cfl ~ 0.1, per reference)

    h_l = Ul[ivars.ih]
    h_r = Ur[ivars.ih]
    iun = ivars.ixmom if idir == 1 else ivars.iymom
    iut = ivars.iymom if idir == 1 else ivars.ixmom
    un_l = Ul[iun] / h_l
    un_r = Ur[iun] / h_r

    c_l = jnp.maximum(SMALLC, jnp.sqrt(grav * h_l))
    c_r = jnp.maximum(SMALLC, jnp.sqrt(grav * h_r))

    # Roe averages (of the velocity components; h is the geometric mean)
    sq_l = jnp.sqrt(h_l)
    sq_r = jnp.sqrt(h_r)
    U_roe = (Ul / sq_l[None] + Ur / sq_r[None]) / (sq_l + sq_r)[None]
    rows = [U_roe[n] for n in range(ivars.nvar)]
    rows[ivars.ih] = jnp.sqrt(h_l * h_r)
    U_roe = jnp.stack(rows)
    c_roe = jnp.sqrt(0.5 * (c_l ** 2 + c_r ** 2))

    delta = Ur / h_r[None] - Ul / h_l[None]
    rows = [delta[n] for n in range(ivars.nvar)]
    rows[ivars.ih] = h_r - h_l
    delta = jnp.stack(rows)

    un_roe = U_roe[iun]
    h_roe = U_roe[ivars.ih]

    lam0 = un_roe - c_roe
    lam1 = un_roe
    lam2 = un_roe + c_roe

    alpha0 = 0.5 * (delta[ivars.ih] - h_roe / c_roe * delta[iun])
    alpha1 = h_roe * delta[iut]
    alpha2 = 0.5 * (delta[ivars.ih] + h_roe / c_roe * delta[iun])

    # entropy fix: widen transonic rarefactions
    h_star = 1.0 / grav * (0.5 * (c_l + c_r) + 0.25 * (un_l - un_r)) ** 2
    u_star = 0.5 * (un_l + un_r) + c_l - c_r
    c_star = jnp.sqrt(grav * h_star)

    lam0 = jnp.where(jnp.abs(lam0) < tol,
                     lam0 * (u_star - c_star - lam0) /
                     (u_star - c_star - (un_l - c_l)), lam0)
    lam2 = jnp.where(jnp.abs(lam2) < tol,
                     lam2 * (u_star + c_star - lam2) /
                     (u_star + c_star - (un_r + c_r)), lam2)

    F_w = 0.5 * (_consFlux_win(idir, grav, ivars, Ul) +
                 _consFlux_win(idir, grav, ivars, Ur))

    # subtract sum_m 0.5 alpha_m |lam_m| K_m
    # K0 = (1, un-c | ut), K1 = transverse unit, K2 = (1, un+c | ut)
    ut_roe = U_roe[iut]

    def K_contrib(alpha, lam, comp_h, comp_un, comp_ut):
        term = 0.5 * alpha * jnp.abs(lam)
        zero = jnp.zeros_like(term)
        rows = [zero] * ivars.nvar
        rows[ivars.ih] = term * comp_h
        rows[iun] = term * comp_un
        rows[iut] = term * comp_ut
        return jnp.stack(rows)

    F_w = F_w - K_contrib(alpha0, lam0, 1.0, un_roe - c_roe, ut_roe)
    F_w = F_w - K_contrib(alpha1, lam1, 0.0, 0.0, 1.0)
    F_w = F_w - K_contrib(alpha2, lam2, 1.0, un_roe + c_roe, ut_roe)

    # species ride at un_roe with alpha = h_roe * delta
    if ivars.naux > 0:
        rows = [F_w[n] for n in range(ivars.nvar)]
        for n in range(ivars.ihx, ivars.ihx + ivars.naux):
            rows[n] = rows[n] + (-0.5 * h_roe * delta[n] * jnp.abs(lam1))
        F_w = jnp.stack(rows)

    return embed(F_w, g, 1)


def riemann_hllc(idir, g, ivars, lower_solid, upper_solid, grav, U_l, U_r):
    """HLLC for SWE (Toro); returns the interface flux
    (reference swe/interface.py:359-530)."""
    del lower_solid, upper_solid
    w = _wslice(g)
    Ul = U_l[w]
    Ur = U_r[w]

    h_l = Ul[ivars.ih]
    h_r = Ur[ivars.ih]
    iun = ivars.ixmom if idir == 1 else ivars.iymom
    iut = ivars.iymom if idir == 1 else ivars.ixmom
    un_l = Ul[iun] / h_l
    ut_l = Ul[iut] / h_l
    un_r = Ur[iun] / h_r
    ut_r = Ur[iut] / h_r

    c_l = jnp.maximum(SMALLC, jnp.sqrt(grav * h_l))
    c_r = jnp.maximum(SMALLC, jnp.sqrt(grav * h_r))

    h_avg = 0.5 * (h_l + h_r)
    c_avg = 0.5 * (c_l + c_r)
    hstar = h_avg - 0.25 * (un_r - un_l) * h_avg / c_avg

    S_l = jnp.where(hstar <= h_l, un_l - c_l,
                    un_l - c_l * jnp.sqrt(0.5 * (hstar + h_l) * hstar) /
                    h_l)
    S_r = jnp.where(hstar <= h_r, un_r + c_r,
                    un_r + c_r * jnp.sqrt(0.5 * (hstar + h_r) * hstar) /
                    h_r)
    S_c = (S_l * h_r * (un_r - S_r) - S_r * h_l * (un_l - S_l)) / \
        (h_r * (un_r - S_r) - h_l * (un_l - S_l))

    F_l = _consFlux_win(idir, grav, ivars, Ul)
    F_r = _consFlux_win(idir, grav, ivars, Ur)

    def star_state(U, h, un, ut, S):
        fac = h * (S - un) / (S - S_c)
        rows = [None] * ivars.nvar
        rows[ivars.ih] = fac
        rows[iun] = fac * S_c
        rows[iut] = fac * ut
        for n in range(ivars.ihx, ivars.ihx + ivars.naux):
            rows[n] = fac * U[n] / h
        return jnp.stack(rows)

    F_star_r = F_r + S_r[None] * (star_state(Ur, h_r, un_r, ut_r, S_r) - Ur)
    F_star_l = F_l + S_l[None] * (star_state(Ul, h_l, un_l, ut_l, S_l) - Ul)

    Sl_b, Sr_b, Sc_b = S_l[None], S_r[None], S_c[None]
    F_w = jnp.where(Sr_b <= 0.0, F_r,
                    jnp.where((Sc_b <= 0.0) & (Sr_b > 0.0), F_star_r,
                              jnp.where((Sl_b < 0.0) & (Sc_b > 0.0),
                                        F_star_l, F_l)))

    return embed(F_w, g, 1)
