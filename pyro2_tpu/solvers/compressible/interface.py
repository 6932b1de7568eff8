"""Characteristic tracing and artificial viscosity, vectorized.

Re-design of the reference's hottest numba kernels
(/root/reference/pyro/compressible/interface.py:5-378): the per-cell 4x4
eigen-system of `states` is unrolled analytically -- the left/right
eigenvector dot products of the primitive-variable Euler Jacobian reduce to
a handful of closed-form array expressions, so the whole tracing step is one
fused XLA stencil pass instead of a scalar loop.

Variable layout: stacks are (nvar, qx, qy) with primitive ordering
(rho, u, v, p[, X...]).
"""

import jax.numpy as jnp

from pyro2_tpu.mesh.indexer import ai

__all__ = ["states", "artificial_viscosity"]


def _win(a, g, buf=2):
    return ai(a, g).v(buf=buf)


def states(idir, g, dxa, dloga, dt, ivars, gamma, qv, dqv):
    """Predict cell-centered primitive states to edges along one dimension.

    Characteristic tracing (Colella 1990): reference states limited by the
    fastest wave toward each face, plus the sum of carried characteristic
    corrections sum_m beta_m r_m.  Follows interface.py:5-236 including the
    spherical d(log A) geometric source.

    Parameters: dxa is the per-cell spacing array (Lx or Ly), dloga the
    geometric source array; qv/dqv the primitive stack and its limited
    slopes.  Returns (q_l, q_r) full stacks; q_l[i] is the left state at
    the i-1/2 interface.
    """
    irho, iu, iv, ip = ivars.irho, ivars.iu, ivars.iv, ivars.ip
    nspec = ivars.naux
    nq = ivars.nq

    b = 2
    q = _win(qv, g, b)          # (nq, win_x, win_y)
    dq = _win(dqv, g, b)

    # dxa may be a scalar (uniform Cartesian spacing) or a per-cell array
    if jnp.ndim(dxa) == 0:
        dtdx = dt / dxa
    else:
        dtdx = dt / _win(jnp.asarray(dxa), g, b)
    dtdx4 = 0.25 * dtdx

    rho = q[irho]
    p = q[ip]
    cs = jnp.sqrt(gamma * p / rho)
    un = q[iu] if idir == 1 else q[iv]

    # eigenvalues: un-c, un, un, un+c (species ride at un)
    ev0 = un - cs
    ev3 = un + cs

    d_rho = dq[irho]
    d_un = dq[iu] if idir == 1 else dq[iv]
    d_ut = dq[iv] if idir == 1 else dq[iu]
    d_p = dq[ip]

    # left-eigenvector dot products l_m . dq (analytic forms)
    a0 = -0.5 * rho / cs * d_un + 0.5 / cs ** 2 * d_p   # l(un-c) . dq
    a1 = d_rho - d_p / cs ** 2                           # l(un)   . dq
    a2 = d_ut                                            # transverse
    a3 = 0.5 * rho / cs * d_un + 0.5 / cs ** 2 * d_p     # l(un+c) . dq

    # beta_m = dtdx/4 (ev_ref - ev_m) (sign gate) (l_m . dq)
    # gate = copysign(1, ev) +/- 1: note copysign(1, 0.0) == +1, so a
    # stationary wave (ev == 0) gates fully left -- jnp.sign would not
    def beta_pair(ev_m, asum):
        gate_l = jnp.where(ev_m >= 0.0, 2.0, 0.0)
        gate_r = jnp.where(ev_m >= 0.0, 0.0, 2.0)
        bl = dtdx4 * (ev3 - ev_m) * gate_l * asum
        br = dtdx4 * (ev0 - ev_m) * gate_r * asum
        return bl, br

    bl0, br0 = beta_pair(ev0, a0)
    bl1, br1 = beta_pair(un, a1)
    bl2, br2 = beta_pair(un, a2)
    bl3, br3 = beta_pair(ev3, a3)

    # reference states
    factor_l = 0.5 * (1.0 - dtdx * jnp.maximum(ev3, 0.0))
    factor_r = 0.5 * (1.0 + dtdx * jnp.minimum(ev0, 0.0))

    q_l_win = q + factor_l[None] * dq
    q_r_win = q - factor_r[None] * dq

    # characteristic corrections: sum_k beta_k rvec[k, m]
    # rvec rows: r(un-c)=(1, -+c/rho on un, 0, c^2), r(un)=(1,0,0,0),
    # r(trans)=(0,..,1,..,0), r(un+c)=(1, +c/rho on un, 0, c^2)
    # built as one stacked add (scatter-free, so it lowers inside Pallas);
    # per-variable arithmetic is identical to individual .at[m].add calls
    iun = iu if idir == 1 else iv
    iut = iv if idir == 1 else iu

    corr_l = [None] * nq
    corr_r = [None] * nq
    corr_l[irho] = bl0 + bl1 + bl3
    corr_r[irho] = br0 + br1 + br3
    corr_l[iun] = (cs / rho) * (bl3 - bl0)
    corr_r[iun] = (cs / rho) * (br3 - br0)
    corr_l[iut] = bl2
    corr_r[iut] = br2
    corr_l[ip] = cs ** 2 * (bl0 + bl3)
    corr_r[ip] = cs ** 2 * (br0 + br3)

    # species characteristics: beta for ev=un with asum = dq[species]
    for n in range(ivars.ix, ivars.ix + nspec):
        corr_l[n], corr_r[n] = beta_pair(un, dq[n])

    q_l_win = q_l_win + jnp.stack(corr_l)
    q_r_win = q_r_win + jnp.stack(corr_r)

    # geometric source (spherical): only rho and p pick it up; a scalar 0
    # (Cartesian fast path) skips it entirely.  Row-list rebuild instead
    # of .at[component].add so the expression lowers inside Pallas
    # kernels (Mosaic has no scatter); per-row arithmetic is identical.
    if jnp.ndim(dloga) != 0:
        dloga_w = _win(jnp.asarray(dloga), g, b)
        rho_source = -0.5 * dt * dloga_w * rho * un

        def add_rows(stack):
            rows = [stack[n] for n in range(nq)]
            rows[irho] = rows[irho] + rho_source
            rows[ip] = rows[ip] + rho_source * cs ** 2
            return jnp.stack(rows)

        q_l_win = add_rows(q_l_win)
        q_r_win = add_rows(q_r_win)

    # scatter: q_l shifted +1 toward the interface it feeds
    from pyro2_tpu.mesh.indexer import embed
    ish, jsh = (1, 0) if idir == 1 else (0, 1)
    q_l = embed(q_l_win, g, b, ish, jsh)
    q_r = embed(q_r_win, g, b)
    return q_l, q_r


def artificial_viscosity(g, cvisc, u, v, edges=None):
    """Colella-Woodward artificial viscosity coefficients (avisco_x/y).

    Vertex-centered div(U) (Cartesian or spherical, reference
    interface.py:239-378) averaged to faces; avisco = cvisc *
    max(-divU*L, 0).  Valid on the plain interior window (the reference
    computes no viscosity on the domain's outermost high faces,
    reference interface.py:366-376).

    `edges` is an optional (xl, xr, yl, yr) tuple of domain-edge flags
    (1 = this grid edge IS the physical domain boundary).  Under spatial
    block partitioning a local grid edge is only a domain edge when the
    block sits on the mesh boundary, so the sharded path passes
    axis_index-gated TRACED flags: avisco is then computed on the full
    halo-supported window and zeroed only outside the GLOBAL interior
    window, which makes the seam faces bitwise partition-invariant.
    None (or all statically 1) reproduces the serial behavior exactly.
    """
    uv = ai(u, g)
    vv = ai(v, g)

    import numpy as np

    spherical = getattr(g, "coord_type", 0) != 0
    qxn, qyn = g.qx, g.qy

    def rows(vec):
        return np.broadcast_to(np.asarray(vec)[:, None], (qxn, qyn))

    def lanes(vec):
        return np.broadcast_to(np.asarray(vec)[None, :], (qxn, qyn))

    def geom_plane(name, build, buf):
        # precomputed traced per-band/per-block windows when the grid
        # proxy carries _plane_* (fused kernel / sharded path); else the
        # host f64 broadcast of the coordinate line
        p = getattr(g, "_plane_" + name, None)
        if p is None:
            p = build()
        return _win(jnp.asarray(p), g, buf=buf)

    def sph_divergence(buf):
        """Vertex div(U) in spherical geometry on a buf window."""
        rc = geom_plane("rc", lambda: rows(g.xl), buf)       # node r i-1/2
        rr = geom_plane("rr", lambda: rows(g.x), buf)        # center r, i
        rl = geom_plane("rl", lambda: rows(g.x - g.dx), buf)  # r, i-1
        sinc = geom_plane("sinc", lambda: lanes(np.sin(g.yl)), buf)
        sint = geom_plane("sint", lambda: lanes(np.sin(g.y)), buf)
        sinb = geom_plane("sinb", lambda: lanes(np.sin(g.y - g.dy)), buf)

        ur = 0.5 * (uv.v(buf=buf) + uv.jp(-1, buf=buf))
        ul = 0.5 * (uv.ip(-1, buf=buf) + uv.ip_jp(-1, -1, buf=buf))
        ux = (ur * rr ** 2 - ul * rl ** 2) / (rc ** 2 * g.dx)

        vt = 0.5 * (vv.v(buf=buf) + vv.ip(-1, buf=buf))
        vb = 0.5 * (vv.jp(-1, buf=buf) + vv.ip_jp(-1, -1, buf=buf))
        vy_raw = (sint * vt - sinb * vb) / (rc * jnp.where(
            sinc == 0.0, 1.0, sinc) * g.dy)
        vy = jnp.where(sinc == 0.0, 0.0, vy_raw)
        return ux + vy

    static_edges = edges is None or all(
        isinstance(e, (int, np.integer)) and e == 1 for e in edges)
    if not static_edges:
        from pyro2_tpu.mesh.indexer import embed
        # vertex divergence on the widest window the application
        # (unsplit_fluxes buf=(2,1)) plus face averaging can reach;
        # needs u,v at buf=3 which ng>=4 supplies
        bw = 2
        if spherical:
            dv_w = sph_divergence(bw)
        else:
            ur = 0.5 * (uv.v(buf=bw) + uv.jp(-1, buf=bw))
            ul = 0.5 * (uv.ip(-1, buf=bw) + uv.ip_jp(-1, -1, buf=bw))
            vt = 0.5 * (vv.v(buf=bw) + vv.ip(-1, buf=bw))
            vb = 0.5 * (vv.jp(-1, buf=bw) + vv.ip_jp(-1, -1, buf=bw))
            dv_w = (ur - ul) / g.dx + (vt - vb) / g.dy
        dv = ai(embed(dv_w, g, bw), g)
        ba = (2, 1)
        divU_x = 0.5 * (dv.v(buf=ba) + dv.jp(1, buf=ba))
        divU_y = 0.5 * (dv.v(buf=ba) + dv.ip(1, buf=ba))
        if spherical:
            Lx_w = _win(jnp.asarray(g.Lx), g, ba)
            Ly_w = _win(jnp.asarray(g.Ly), g, ba)
        else:
            Lx_w = jnp.asarray(g.dx)
            Ly_w = jnp.asarray(g.dy)
        av_x = cvisc * jnp.maximum(-divU_x * Lx_w, 0.0)
        av_y = cvisc * jnp.maximum(-divU_y * Ly_w, 0.0)
        avx = embed(av_x, g, ba)
        avy = embed(av_y, g, ba)
        # zero outside the GLOBAL interior window: a side is clipped
        # only when this block's edge is the domain boundary there
        xl, xr, yl, yr = edges
        ii = np.arange(avx.shape[0])[:, None]
        jj = np.arange(avx.shape[1])[None, :]
        keep = (((ii >= g.ilo) | (xl == 0)) & ((ii <= g.ihi) | (xr == 0)) &
                ((jj >= g.jlo) | (yl == 0)) & ((jj <= g.jhi) | (yr == 0)))
        return jnp.where(keep, avx, 0.0), jnp.where(keep, avy, 0.0)

    if getattr(g, "coord_type", 0) == 0:
        # vertex divergence on the buf=1 window
        b = 1
        ur = 0.5 * (uv.v(buf=b) + uv.jp(-1, buf=b))
        ul = 0.5 * (uv.ip(-1, buf=b) + uv.ip_jp(-1, -1, buf=b))
        vt = 0.5 * (vv.v(buf=b) + vv.ip(-1, buf=b))
        vb = 0.5 * (vv.jp(-1, buf=b) + vv.ip_jp(-1, -1, buf=b))
        divU_w = (ur - ul) / g.dx + (vt - vb) / g.dy
    else:
        # spherical vertex divergence from the (qx, qy) trig planes --
        # identical values to slicing the 1-D coordinate lines; the
        # plane form also serves the fused kernel and the sharded path,
        # whose grid proxies carry traced _plane_* windows
        b = 1
        divU_w = sph_divergence(b)

    from pyro2_tpu.mesh.indexer import embed
    divU = embed(divU_w, g, b)

    dv = ai(divU, g)
    if getattr(g, "coord_type", 0) == 0:
        # uniform Cartesian cell sides: scalars, bitwise identical
        Lx_w = jnp.asarray(g.dx)
        Ly_w = jnp.asarray(g.dy)
    else:
        Lx_w = _win(jnp.asarray(g.Lx), g, 0)
        Ly_w = _win(jnp.asarray(g.Ly), g, 0)

    divU_x = 0.5 * (dv.v() + dv.jp(1))
    divU_y = 0.5 * (dv.v() + dv.ip(1))

    av_x = cvisc * jnp.maximum(-divU_x * Lx_w, 0.0)
    av_y = cvisc * jnp.maximum(-divU_y * Ly_w, 0.0)

    return embed(av_x, g, 0), embed(av_y, g, 0)
