"""Riemann solvers for compressible flow, vectorized for TPU.

Re-design of /root/reference/pyro/compressible/riemann.py (numba
per-interface scalar wave logic): the shock/rarefaction region selection
becomes elementwise `jnp.where` ladders over whole interface arrays --
every branch is computed everywhere and the select keeps the right one,
which XLA fuses into a single pass.

Solvers: CGF 2-shock star-state solver (conserved and primitive-variable
variants), HLLC, and low-Mach-corrected HLLC (Minoshima & Miyoshi 2021).
All operate on (nvar, qx, qy) stacks, valid on the buf=1 window, zeros
outside (matching the reference loop ranges).
"""

import jax.numpy as jnp

from pyro2_tpu.util import msg

__all__ = ["riemann_cgf", "riemann_prim", "estimate_wave_speed",
           "riemann_hllc", "riemann_hllc_lowspeed", "riemann_flux",
           "consFlux"]

SMALLC = 1.e-10
SMALLRHO = 1.e-10
SMALLP = 1.e-10


def _wslice(g, b=1):
    from pyro2_tpu.mesh import indexer
    if indexer.is_full_frame():
        return (slice(None), slice(None))
    return (slice(g.ilo - b, g.ihi + 2), slice(g.jlo - b, g.jhi + 2))


def _solid_mask(g, idir, lower_solid, upper_solid, shape):
    """1 where the interface normal velocity must be zeroed (solid walls).

    Returns None when both walls are statically open (no clamp needed;
    also avoids a captured constant mask inside Pallas kernels).

    The flags may also be TRACED 0/1 scalars: the sharded path gates the
    domain-edge clamp per block with `axis_index` (only blocks owning a
    domain boundary clamp), so the mask becomes a traced select."""
    import numpy as np

    from pyro2_tpu.mesh import indexer
    static = all(isinstance(s, (int, np.integer))
                 for s in (lower_solid, upper_solid))
    if static and lower_solid == 0 and upper_solid == 0:
        return None
    if indexer.is_full_frame():
        # full-frame (Pallas) mode: position == grid index, so compare
        # frame indices directly against the clamp interfaces
        i_idx = np.arange(shape[-2])
        j_idx = np.arange(shape[-1])
    else:
        i_idx = np.arange(g.ilo - 1, g.ihi + 2)
        j_idx = np.arange(g.jlo - 1, g.jhi + 2)
    if idir == 1:
        lo = np.broadcast_to((i_idx == g.ilo)[:, None], shape)
        hi = np.broadcast_to((i_idx == g.ihi + 1)[:, None], shape)
    else:
        lo = np.broadcast_to((j_idx == g.jlo)[None, :], shape)
        hi = np.broadcast_to((j_idx == g.jhi + 1)[None, :], shape)
    if static:
        return jnp.asarray((lo & (lower_solid == 1)) |
                           (hi & (upper_solid == 1)))
    return ((jnp.asarray(lo) & (lower_solid == 1)) |
            (jnp.asarray(hi) & (upper_solid == 1)))


def _decompose(U, idir, ivars, gamma):
    """Window stack -> (rho, un, ut, rhoe, p) with pressure floors."""
    rho = U[ivars.idens]
    if idir == 1:
        un = U[ivars.ixmom] / rho
        ut = U[ivars.iymom] / rho
    else:
        un = U[ivars.iymom] / rho
        ut = U[ivars.ixmom] / rho
    rhoe = U[ivars.iener] - 0.5 * rho * (un ** 2 + ut ** 2)
    p = jnp.maximum(rhoe * (gamma - 1.0), SMALLP)
    return rho, un, ut, rhoe, p


def _cgf_core(idir, g, ivars, lower_solid, upper_solid, gamma,
              rho_l, un_l, ut_l, rhoe_l, p_l,
              rho_r, un_r, ut_r, rhoe_r, p_r):
    """The CGF star-state construction + wave-region resolution.

    Returns (rho, un, ut, p, rhoe) interface states on the window
    (reference riemann.py:8-310).
    """
    W_l = jnp.maximum(SMALLRHO * SMALLC, jnp.sqrt(gamma * p_l * rho_l))
    W_r = jnp.maximum(SMALLRHO * SMALLC, jnp.sqrt(gamma * p_r * rho_r))

    c_l = jnp.maximum(SMALLC, jnp.sqrt(gamma * p_l / rho_l))
    c_r = jnp.maximum(SMALLC, jnp.sqrt(gamma * p_r / rho_r))

    pstar = jnp.maximum((W_l * p_r + W_r * p_l +
                         W_l * W_r * (un_l - un_r)) / (W_l + W_r), SMALLP)
    ustar = (W_l * un_l + W_r * un_r + (p_l - p_r)) / (W_l + W_r)

    rhostar_l = rho_l + (pstar - p_l) / c_l ** 2
    rhostar_r = rho_r + (pstar - p_r) / c_r ** 2

    rhoestar_l = rhoe_l + (pstar - p_l) * (rhoe_l / rho_l +
                                           p_l / rho_l) / c_l ** 2
    rhoestar_r = rhoe_r + (pstar - p_r) * (rhoe_r / rho_r +
                                           p_r / rho_r) / c_r ** 2

    cstar_l = jnp.maximum(SMALLC, jnp.sqrt(gamma * pstar / rhostar_l))
    cstar_r = jnp.maximum(SMALLC, jnp.sqrt(gamma * pstar / rhostar_r))

    def resolve(outer, star, lam, lamstar, p_s, left):
        """Per-quantity wave-region select for one side of the contact."""
        sigma = 0.5 * (lam + lamstar)
        if left:
            shock = jnp.where(sigma > 0.0, outer, star)
        else:
            shock = jnp.where(sigma > 0.0, star, outer)
        denom = lam - lamstar
        alpha = lam / jnp.where(denom == 0.0, 1.0, denom)
        interp = alpha * star + (1.0 - alpha) * outer
        if left:
            raref = jnp.where((lam < 0.0) & (lamstar < 0.0), star,
                              jnp.where((lam > 0.0) & (lamstar > 0.0),
                                        outer, interp))
        else:
            raref = jnp.where((lam < 0.0) & (lamstar < 0.0), outer,
                              jnp.where((lam > 0.0) & (lamstar > 0.0),
                                        star, interp))
        return jnp.where(pstar > p_s, shock, raref)

    lam_l = un_l - c_l
    lamstar_l = ustar - cstar_l
    lam_r = un_r + c_r
    lamstar_r = ustar + cstar_r

    def pick(q_l_outer, q_l_star, q_r_outer, q_r_star, mid):
        Ls = resolve(q_l_outer, q_l_star, lam_l, lamstar_l, p_l, True)
        Rs = resolve(q_r_outer, q_r_star, lam_r, lamstar_r, p_r, False)
        return jnp.where(ustar > 0.0, Ls,
                         jnp.where(ustar < 0.0, Rs, mid))

    rho_state = pick(rho_l, rhostar_l, rho_r, rhostar_r,
                     0.5 * (rhostar_l + rhostar_r))
    un_state = pick(un_l, ustar, un_r, ustar, ustar)
    p_state = pick(p_l, pstar, p_r, pstar, pstar)
    rhoe_state = pick(rhoe_l, rhoestar_l, rhoe_r, rhoestar_r,
                      0.5 * (rhoestar_l + rhoestar_r))
    ut_state = jnp.where(ustar > 0.0, ut_l,
                         jnp.where(ustar < 0.0, ut_r,
                                   0.5 * (ut_l + ut_r)))

    # solid-wall clamp on the normal velocity
    solid = _solid_mask(g, idir, lower_solid, upper_solid, rho_state.shape)
    if solid is not None:
        un_state = jnp.where(solid, 0.0, un_state)

    return rho_state, un_state, ut_state, p_state, rhoe_state, ustar


def riemann_cgf(idir, g, ivars, lower_solid, upper_solid, gamma, U_l, U_r):
    """CGF (Colella-Glaz-Ferguson) solver on conserved states.

    Returns the interface conserved state U (reference riemann.py:8-310).
    """
    w = _wslice(g)
    Ul = U_l[(slice(None),) + w]
    Ur = U_r[(slice(None),) + w]

    rho_l, un_l, ut_l, rhoe_l, p_l = _decompose(Ul, idir, ivars, gamma)
    rho_r, un_r, ut_r, rhoe_r, p_r = _decompose(Ur, idir, ivars, gamma)

    rho_s, un_s, ut_s, _p_s, rhoe_s, ustar = _cgf_core(
        idir, g, ivars, lower_solid, upper_solid, gamma,
        rho_l, un_l, ut_l, rhoe_l, p_l, rho_r, un_r, ut_r, rhoe_r, p_r)

    # build the interface state as one stack (scatter-free for Pallas)
    rows = [None] * ivars.nvar
    rows[ivars.idens] = rho_s
    if idir == 1:
        rows[ivars.ixmom] = rho_s * un_s
        rows[ivars.iymom] = rho_s * ut_s
    else:
        rows[ivars.ixmom] = rho_s * ut_s
        rows[ivars.iymom] = rho_s * un_s
    rows[ivars.iener] = rhoe_s + 0.5 * rho_s * (un_s ** 2 + ut_s ** 2)

    # species ride with the contact
    for n in range(ivars.irhox, ivars.irhox + ivars.naux):
        xn_l = Ul[n] / Ul[ivars.idens]
        xn_r = Ur[n] / Ur[ivars.idens]
        xn = jnp.where(ustar > 0.0, xn_l,
                       jnp.where(ustar < 0.0, xn_r, 0.5 * (xn_l + xn_r)))
        rows[n] = xn * rho_s

    from pyro2_tpu.mesh.indexer import embed
    return embed(jnp.stack(rows), g, 1)


def riemann_prim(idir, g, ivars, lower_solid, upper_solid, gamma, q_l, q_r):
    """CGF solver on primitive states; returns the primitive interface
    state (used by the 4th-order solver; reference riemann.py:313-593)."""
    w = _wslice(g)
    ql = q_l[(slice(None),) + w]
    qr = q_r[(slice(None),) + w]

    rho_l = ql[ivars.irho]
    rho_r = qr[ivars.irho]
    if idir == 1:
        un_l, ut_l = ql[ivars.iu], ql[ivars.iv]
        un_r, ut_r = qr[ivars.iu], qr[ivars.iv]
    else:
        un_l, ut_l = ql[ivars.iv], ql[ivars.iu]
        un_r, ut_r = qr[ivars.iv], qr[ivars.iu]
    p_l = jnp.maximum(ql[ivars.ip], SMALLP)
    p_r = jnp.maximum(qr[ivars.ip], SMALLP)
    rhoe_l = p_l / (gamma - 1.0)
    rhoe_r = p_r / (gamma - 1.0)

    rho_s, un_s, ut_s, p_s, _rhoe_s, ustar = _cgf_core(
        idir, g, ivars, lower_solid, upper_solid, gamma,
        rho_l, un_l, ut_l, rhoe_l, p_l, rho_r, un_r, ut_r, rhoe_r, p_r)

    rows = [None] * ivars.nq
    rows[ivars.irho] = rho_s
    if idir == 1:
        rows[ivars.iu] = un_s
        rows[ivars.iv] = ut_s
    else:
        rows[ivars.iu] = ut_s
        rows[ivars.iv] = un_s
    rows[ivars.ip] = p_s

    for n in range(ivars.ix, ivars.ix + ivars.naux):
        rows[n] = jnp.where(ustar > 0.0, ql[n],
                            jnp.where(ustar < 0.0, qr[n],
                                      0.5 * (ql[n] + qr[n])))

    from pyro2_tpu.mesh.indexer import embed
    return embed(jnp.stack(rows), g, 1)


def estimate_wave_speed(rho_l, u_l, p_l, c_l, rho_r, u_r, p_r, c_r, gamma):
    """(S_l, S_r) wave-speed estimates with 2-shock/2-rarefaction
    upgrades when the simple primitive solver is unreliable
    (reference riemann.py:596-678)."""
    p_max = jnp.maximum(p_l, p_r)
    p_min = jnp.minimum(p_l, p_r)
    Q = p_max / p_min

    rho_avg = 0.5 * (rho_l + rho_r)
    c_avg = 0.5 * (c_l + c_r)
    factor = rho_avg * c_avg

    pstar0 = 0.5 * (p_l + p_r) + 0.5 * (u_l - u_r) * factor
    ustar0 = 0.5 * (u_l + u_r) + 0.5 * (p_l - p_r) / factor

    # 2-rarefaction estimate
    z = (gamma - 1.0) / (2.0 * gamma)
    p_lr = (p_l / p_r) ** z
    ustar_2r = (p_lr * u_l / c_l + u_r / c_r +
                2.0 * (p_lr - 1.0) / (gamma - 1.0)) / \
        (p_lr / c_l + 1.0 / c_r)
    pstar_2r = 0.5 * (
        p_l * (1.0 + (gamma - 1.0) * (u_l - ustar_2r) / (2.0 * c_l))
        ** (1.0 / z) +
        p_r * (1.0 + (gamma - 1.0) * (ustar_2r - u_r) / (2.0 * c_r))
        ** (1.0 / z))

    # 2-shock estimate
    A_r = 2.0 / ((gamma + 1.0) * rho_r)
    B_r = p_r * (gamma - 1.0) / (gamma + 1.0)
    A_l = 2.0 / ((gamma + 1.0) * rho_l)
    B_l = p_l * (gamma - 1.0) / (gamma + 1.0)
    p_guess = jnp.maximum(0.0, pstar0)
    g_l = jnp.sqrt(A_l / (p_guess + B_l))
    g_r = jnp.sqrt(A_r / (p_guess + B_r))
    pstar_2s = (g_l * p_l + g_r * p_r - (u_r - u_l)) / (g_l + g_r)
    ustar_2s = 0.5 * (u_l + u_r) + \
        0.5 * ((pstar_2s - p_r) * g_r - (pstar_2s - p_l) * g_l)

    upgrade = (Q > 2.0) & ((pstar0 < p_min) | (pstar0 > p_max))
    use_2r = upgrade & (pstar0 < p_min)
    use_2s = upgrade & ~(pstar0 < p_min)

    pstar = jnp.where(use_2r, pstar_2r,
                      jnp.where(use_2s, pstar_2s, pstar0))

    S_l = jnp.where(
        pstar <= p_l, u_l - c_l,
        u_l - c_l * jnp.sqrt(1.0 + ((gamma + 1.0) / (2.0 * gamma)) *
                             (pstar / p_l - 1.0)))
    # NOTE: the reference writes (gamma + 1) / (2 / gamma) here
    # (riemann.py:677) -- an apparent typo for 2*gamma that inflates S_r
    # for right-moving shocks.  Reproduced verbatim for trajectory parity.
    S_r = jnp.where(
        pstar <= p_r, u_r + c_r,
        u_r + c_r * jnp.sqrt(1.0 + ((gamma + 1.0) / (2.0 / gamma)) *
                             (pstar / p_r - 1.0)))
    return S_l, S_r


def _consFlux_win(idir, coord_type, gamma, ivars, U):
    """Analytic conserved flux of a window stack (reference
    riemann.py:1104-1179).  Pressure joins the normal-momentum flux only
    in Cartesian geometry."""
    rho = U[ivars.idens]
    nonzero = rho != 0.0
    u = jnp.where(nonzero, U[ivars.ixmom] / jnp.where(nonzero, rho, 1.0),
                  0.0)
    v = jnp.where(nonzero, U[ivars.iymom] / jnp.where(nonzero, rho, 1.0),
                  0.0)
    p = (U[ivars.iener] - 0.5 * rho * (u * u + v * v)) * (gamma - 1.0)

    vel = u if idir == 1 else v
    rows = [None] * ivars.nvar
    rows[ivars.idens] = rho * vel
    rows[ivars.ixmom] = U[ivars.ixmom] * vel
    rows[ivars.iymom] = U[ivars.iymom] * vel
    if coord_type == 0:
        if idir == 1:
            rows[ivars.ixmom] = rows[ivars.ixmom] + p
        else:
            rows[ivars.iymom] = rows[ivars.iymom] + p
    rows[ivars.iener] = (U[ivars.iener] + p) * vel
    for n in range(ivars.irhox, ivars.irhox + ivars.naux):
        rows[n] = U[n] * vel
    return jnp.stack(rows)


def consFlux(idir, coord_type, gamma, ivars, U_state):
    """Analytic conserved flux of a full (nvar, qx, qy) stack."""
    return _consFlux_win(idir, coord_type, gamma, ivars, U_state)


def _hllc_shared(idir, ivars, gamma, Ul, Ur):
    """Shared HLLC preamble: primitive decomposition + wave speeds."""
    rho_l, un_l, ut_l, rhoe_l, p_l = _decompose(Ul, idir, ivars, gamma)
    rho_r, un_r, ut_r, rhoe_r, p_r = _decompose(Ur, idir, ivars, gamma)

    c_l = jnp.maximum(SMALLC, jnp.sqrt(gamma * p_l / rho_l))
    c_r = jnp.maximum(SMALLC, jnp.sqrt(gamma * p_r / rho_r))

    S_l, S_r = estimate_wave_speed(rho_l, un_l, p_l, c_l,
                                   rho_r, un_r, p_r, c_r, gamma)

    # contact speed from Rankine-Hugoniot (Batten et al. 1997)
    S_c = (p_r - p_l + rho_l * un_l * (S_l - un_l) -
           rho_r * un_r * (S_r - un_r)) / \
        (rho_l * (S_l - un_l) - rho_r * (S_r - un_r))

    return (rho_l, un_l, ut_l, p_l, rho_r, un_r, ut_r, p_r,
            c_l, c_r, S_l, S_r, S_c)


def riemann_hllc(idir, g, ivars, lower_solid, upper_solid, gamma, U_l, U_r):
    """HLLC solver (Toro); returns the interface *flux*.

    Cartesian only (reference riemann.py:681-860)."""
    del lower_solid, upper_solid  # reference HLLC ignores solid walls
    coord_type = 0
    w = _wslice(g)
    Ul = U_l[(slice(None),) + w]
    Ur = U_r[(slice(None),) + w]

    (rho_l, un_l, ut_l, p_l, rho_r, un_r, ut_r, p_r,
     _c_l, _c_r, S_l, S_r, S_c) = _hllc_shared(idir, ivars, gamma, Ul, Ur)

    F_l = _consFlux_win(idir, coord_type, gamma, ivars, Ul)
    F_r = _consFlux_win(idir, coord_type, gamma, ivars, Ur)

    def star_state(U, rho, un, ut, p, S, S_c):
        """The HLLC star-region conserved state for one side."""
        HLLCfactor = rho * (S - un) / (S - S_c)
        rows = [None] * ivars.nvar
        rows[ivars.idens] = HLLCfactor
        if idir == 1:
            rows[ivars.ixmom] = HLLCfactor * S_c
            rows[ivars.iymom] = HLLCfactor * ut
        else:
            rows[ivars.ixmom] = HLLCfactor * ut
            rows[ivars.iymom] = HLLCfactor * S_c
        rows[ivars.iener] = HLLCfactor * (
            U[ivars.iener] / rho +
            (S_c - un) * (S_c + p / (rho * (S - un))))
        for n in range(ivars.irhox, ivars.irhox + ivars.naux):
            rows[n] = HLLCfactor * U[n] / rho
        return jnp.stack(rows)

    Ustar_r = star_state(Ur, rho_r, un_r, ut_r, p_r, S_r, S_c)
    Ustar_l = star_state(Ul, rho_l, un_l, ut_l, p_l, S_l, S_c)

    F_star_r = F_r + S_r[None] * (Ustar_r - Ur)
    F_star_l = F_l + S_l[None] * (Ustar_l - Ul)

    Sl_b = S_l[None]
    Sr_b = S_r[None]
    Sc_b = S_c[None]
    F_w = jnp.where(Sr_b <= 0.0, F_r,
                    jnp.where((Sc_b <= 0.0) & (Sr_b > 0.0), F_star_r,
                              jnp.where((Sl_b < 0.0) & (Sc_b > 0.0),
                                        F_star_l, F_l)))

    from pyro2_tpu.mesh.indexer import embed
    return embed(F_w, g, 1)


def riemann_hllc_lowspeed(idir, g, ivars, lower_solid, upper_solid,
                          gamma, U_l, U_r):
    """HLLC in Toro's alternate form with the Minoshima & Miyoshi (2021)
    low-Mach pressure fix; returns the interface flux
    (reference riemann.py:863-1020)."""
    del lower_solid, upper_solid
    coord_type = 0
    w = _wslice(g)
    Ul = U_l[(slice(None),) + w]
    Ur = U_r[(slice(None),) + w]

    (rho_l, un_l, ut_l, p_l, rho_r, un_r, ut_r, p_r,
     c_l, c_r, S_l, S_r, S_c) = _hllc_shared(idir, ivars, gamma, Ul, Ur)

    iun = (ivars.ixmom if idir == 1 else ivars.iymom)

    F_l = _consFlux_win(idir, coord_type, gamma, ivars, Ul)
    F_r = _consFlux_win(idir, coord_type, gamma, ivars, Ur)

    # low-Mach-corrected star pressure
    vmag_l = jnp.sqrt(un_l ** 2 + ut_l ** 2)
    vmag_r = jnp.sqrt(un_r ** 2 + ut_r ** 2)
    cs_max = jnp.maximum(c_l, c_r)
    chi = jnp.minimum(1.0, jnp.maximum(vmag_l, vmag_r) / cs_max)
    phi = chi * (2.0 - chi)
    pstar_lr = 0.5 * (p_l + p_r) + \
        0.5 * phi * (rho_l * (S_l - un_l) * (S_c - un_l) +
                     rho_r * (S_r - un_r) * (S_c - un_r))

    # D* controls where the star pressure enters the flux
    def star_flux(U, F, S):
        num = S_c[None] * (S[None] * U - F)
        rows = list(num)
        rows[iun] = rows[iun] + S * pstar_lr
        rows[ivars.iener] = rows[ivars.iener] + S * pstar_lr * S_c
        return jnp.stack(rows) / (S - S_c)[None]

    F_star_r = star_flux(Ur, F_r, S_r)
    F_star_l = star_flux(Ul, F_l, S_l)

    Sl_b = S_l[None]
    Sr_b = S_r[None]
    Sc_b = S_c[None]
    F_w = jnp.where(Sr_b <= 0.0, F_r,
                    jnp.where((Sc_b <= 0.0) & (Sr_b > 0.0), F_star_r,
                              jnp.where((Sl_b < 0.0) & (Sc_b > 0.0),
                                        F_star_l, F_l)))

    from pyro2_tpu.mesh.indexer import embed
    return embed(F_w, g, 1)


def riemann_flux(idir, U_l, U_r, my_data, rp, ivars,
                 lower_solid, upper_solid, tc, return_cons=False):
    """Dispatch on compressible.riemann and assemble the interface flux.

    CGF returns the interface conserved state and flux; HLLC variants
    return the flux directly (reference riemann.py:1023-1101)."""
    tm_riem = tc.timer("riemann")
    tm_riem.begin()

    myg = my_data.grid
    riemann_method = rp.get_param("compressible.riemann")
    gamma = rp.get_param("eos.gamma")

    solvers = {"HLLC": riemann_hllc,
               "HLLC_lm": riemann_hllc_lowspeed,
               "CGF": riemann_cgf}
    if riemann_method not in solvers:
        msg.fail("ERROR: Riemann solver undefined")

    _u = solvers[riemann_method](idir, myg, ivars,
                                 lower_solid, upper_solid, gamma, U_l, U_r)

    if riemann_method not in ["HLLC", "HLLC_lm"]:
        _f = consFlux(idir, getattr(myg, "coord_type", 0), gamma, ivars, _u)
    else:
        _f = _u

    tm_riem.end()

    if riemann_method not in ["HLLC", "HLLC_lm"] and return_cons:
        return _f, _u
    return _f
