"""Slope limiters, shock flattening, and WENO reconstruction.

Vectorized jnp re-implementations of /root/reference/pyro/mesh/
reconstruction.py.  All functions are pure: they take full (qx, qy) padded
arrays (or (nvar, qx, qy) stacks) and return full padded arrays whose valid
window (buf=2 into the ghosts) holds the limited slopes; cells outside that
window are zero (flattening: one), matching the reference's scratch-array
semantics so downstream windowed reads agree exactly.
"""

import jax.numpy as jnp

from pyro2_tpu.mesh.indexer import ai, embed

__all__ = ["limit", "nolimit", "limit2", "limit4", "well_balance",
           "flatten", "flatten_multid", "weno", "weno_upwind"]


def _scatter(vals, g, buf, like):
    """Place a buf-windowed block back into a zeroed full padded array."""
    del like
    return embed(vals, g, buf)


def _mc(dc, dl, dr):
    """The monotonized-central limiter combination."""
    d1 = 2.0 * jnp.where(jnp.abs(dl) < jnp.abs(dr), dl, dr)
    dt = jnp.where(jnp.abs(dc) < jnp.abs(d1), dc, d1)
    return jnp.where(dl * dr > 0.0, dt, 0.0)


def limit(data, g, idir, limiter):
    """Dispatch on the limiter runtime parameter (0/1/other -> 4th-order)."""
    if limiter == 0:
        return nolimit(data, g, idir)
    if limiter == 1:
        return limit2(data, g, idir)
    return limit4(data, g, idir)


def nolimit(a, g, idir):
    """Centered difference, no limiting."""
    av = ai(a, g)
    if idir == 1:
        d = 0.5 * (av.ip(1, buf=2) - av.ip(-1, buf=2))
    else:
        d = 0.5 * (av.jp(1, buf=2) - av.jp(-1, buf=2))
    return _scatter(d, g, 2, a)


def limit2(a, g, idir):
    """2nd-order monotonized central-difference limiter."""
    av = ai(a, g)
    if idir == 1:
        dc = 0.5 * (av.ip(1, buf=2) - av.ip(-1, buf=2))
        dl = av.ip(1, buf=2) - av.v(buf=2)
        dr = av.v(buf=2) - av.ip(-1, buf=2)
    else:
        dc = 0.5 * (av.jp(1, buf=2) - av.jp(-1, buf=2))
        dl = av.jp(1, buf=2) - av.v(buf=2)
        dr = av.v(buf=2) - av.jp(-1, buf=2)
    return _scatter(_mc(dc, dl, dr), g, 2, a)


def limit4(a, g, idir):
    """4th-order monotonized central-difference limiter."""
    lda_tmp = limit2(a, g, idir)
    av = ai(a, g)
    tv = ai(lda_tmp, g)
    if idir == 1:
        dc = (2.0 / 3.0) * (av.ip(1, buf=2) - av.ip(-1, buf=2) -
                            0.25 * (tv.ip(1, buf=2) + tv.ip(-1, buf=2)))
        dl = av.ip(1, buf=2) - av.v(buf=2)
        dr = av.v(buf=2) - av.ip(-1, buf=2)
    else:
        dc = (2.0 / 3.0) * (av.jp(1, buf=2) - av.jp(-1, buf=2) -
                            0.25 * (tv.jp(1, buf=2) + tv.jp(-1, buf=2)))
        dl = av.jp(1, buf=2) - av.v(buf=2)
        dr = av.v(buf=2) - av.jp(-1, buf=2)
    return _scatter(_mc(dc, dl, dr), g, 2, a)


def well_balance(q, g, limiter, iv, grav):
    """MC-limit the y pressure slope with hydrostatic equilibrium subtracted.

    q is the primitive stack (nvar, qx, qy).  Only limiter==1 supported
    (reference reconstruction.py:21-53).
    """
    if limiter != 1:
        raise ValueError("well-balanced only works for limiter == 1")

    p = ai(q[iv.ip], g)
    rho = ai(q[iv.irho], g)

    # deviations of neighbor pressure from local hydrostatic extrapolation;
    # p1 (the local deviation) is identically zero
    p1_jp1 = (p.jp(1, buf=2) -
              (p.v(buf=2) + 0.5 * g.dy *
               (rho.v(buf=2) + rho.jp(1, buf=2)) * grav))
    p1_jm1 = (p.jp(-1, buf=2) -
              (p.v(buf=2) - 0.5 * g.dy *
               (rho.v(buf=2) + rho.jp(-1, buf=2)) * grav))

    dc = 0.5 * (p1_jp1 - p1_jm1)
    dl = p1_jp1
    dr = -p1_jm1
    return _scatter(_mc(dc, dl, dr), g, 2, q[iv.ip])


def flatten(g, q, idir, ivars, rp):
    """1-D Colella flattening coefficient xi in [0, 1].

    q is the primitive stack; rp supplies compressible.{delta,z0,z1}.
    Cells outside the buf=2 window get xi=1 (reference reconstruction.py:
    123-164).
    """
    delta = rp.get_param("compressible.delta")
    z0 = rp.get_param("compressible.z0")
    z1 = rp.get_param("compressible.z1")
    smallp = 1.0e-10

    p = ai(q[ivars.ip], g)
    if idir == 1:
        un = ai(q[ivars.iu], g)
        dp1 = jnp.abs(p.ip(1, buf=2) - p.ip(-1, buf=2))
        dp2 = jnp.abs(p.ip(2, buf=2) - p.ip(-2, buf=2))
        z_w = dp1 / jnp.maximum(dp2, smallp)
        t2_w = dp1 / jnp.minimum(p.ip(1, buf=2), p.ip(-1, buf=2))
        t1_w = un.ip(-1, buf=2) - un.ip(1, buf=2)
    else:
        un = ai(q[ivars.iv], g)
        dp1 = jnp.abs(p.jp(1, buf=2) - p.jp(-1, buf=2))
        dp2 = jnp.abs(p.jp(2, buf=2) - p.jp(-2, buf=2))
        z_w = dp1 / jnp.maximum(dp2, smallp)
        t2_w = dp1 / jnp.minimum(p.jp(1, buf=2), p.jp(-1, buf=2))
        t1_w = un.jp(-1, buf=2) - un.jp(1, buf=2)

    like = q[ivars.ip]
    z = _scatter(z_w, g, 2, like)
    t1 = _scatter(t1_w, g, 2, like)
    t2 = _scatter(t2_w, g, 2, like)

    xi = jnp.minimum(1.0, jnp.maximum(0.0, 1.0 - (z - z0) / (z1 - z0)))
    return jnp.where(jnp.logical_and(t1 > 0.0, t2 > delta), xi, 1.0)


def flatten_multid(g, q, xi_x, xi_y, ivars):
    """Multidimensional flattening: min over upwinded neighbor coefficients."""
    p = ai(q[ivars.ip], g)
    xx = ai(xi_x, g)
    xy = ai(xi_y, g)

    px = jnp.where(p.ip(1, buf=2) - p.ip(-1, buf=2) > 0,
                   xx.ip(-1, buf=2), xx.ip(1, buf=2))
    py = jnp.where(p.jp(1, buf=2) - p.jp(-1, buf=2) > 0,
                   xy.jp(-1, buf=2), xy.jp(1, buf=2))

    v = jnp.minimum(jnp.minimum(xx.v(buf=2), px),
                    jnp.minimum(xy.v(buf=2), py))
    return _scatter(v, g, 2, xi_x)


# ---------------------------------------------------------------------------
# WENO (k = 2, 3) -- smoothness/weight tables from Shu's lecture notes
# (reference reconstruction.py:186-221)
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402  (host-side constant tables)

C_all = {2: np.array([1, 2]) / 3,
         3: np.array([1, 6, 3]) / 10}

a_all = {2: np.array([[3, -1], [1, 1]]) / 2,
         3: np.array([[11, -7, 2], [2, 5, -1], [-1, 5, 2]]) / 6}

sigma_all = {
    2: np.array([[[1, 0], [-2, 1]],
                 [[1, 0], [-2, 1]]]),
    3: np.array([[[40, 0, 0], [-124, 100, 0], [44, -76, 16]],
                 [[16, 0, 0], [-52, 52, 0], [20, -52, 16]],
                 [[16, 0, 0], [-76, 100, 0], [44, -124, 40]]]) / 12,
}


def _weno_combine(get, order):
    """WENO combination given get(o) -> array of q shifted by o zones."""
    a_t = a_all[order]
    C = C_all[order]
    sigma = sigma_all[order]
    epsilon = 1e-16

    alphas = []
    stencils = []
    for k in range(order):
        beta = 0.0
        for l in range(order):
            for m in range(l + 1):
                if sigma[k, l, m] != 0.0:
                    beta = beta + sigma[k, l, m] * get(k - l) * get(k - m)
        alphas.append(C[k] / (epsilon + beta ** 2))
        st = 0.0
        for l in range(order):
            st = st + a_t[k, l] * get(k - l)
        stencils.append(st)

    alpha_sum = sum(alphas)
    out = 0.0
    for k in range(order):
        out = out + (alphas[k] / alpha_sum) * stencils[k]
    return out


def weno_upwind(q, order):
    """Left-biased WENO reconstruction of a single (2*order-1)-point stencil.

    1-D convenience entry matching the reference's scalar helper.
    """
    q = jnp.asarray(q)

    def get(o):
        return q[order - 1 + o]
    return _weno_combine(get, order)


def weno(q, order, axis=-1):
    """WENO reconstruction along `axis` of an N-d array.

    Returns (q_minus, q_plus): left/right biased face values at each cell,
    valid for indices [order, n-order) along axis; zero outside (matching
    the reference's zeros_like + loop-range semantics,
    reconstruction.py:261-287).
    """
    q = jnp.asarray(q)
    n = q.shape[axis]

    def shifted(o):
        return jnp.roll(q, -o, axis=axis)

    q_plus = _weno_combine(lambda o: shifted(o), order)
    q_minus = _weno_combine(lambda o: shifted(-o), order)

    # zero outside the valid window
    idx = jnp.arange(n)
    valid = (idx >= order) & (idx < n - order)
    shape = [1] * q.ndim
    shape[axis] = n
    valid = valid.reshape(shape)
    return jnp.where(valid, q_minus, 0.0), jnp.where(valid, q_plus, 0.0)
