"""4th-order (McCorquodale & Colella 2011) limited face-state
reconstruction, vectorized.

Re-design of the numba kernel /root/reference/pyro/mesh/fourth_order.py:
the per-cell extrema/limiting decision tree (MC Eqs. 24-32) becomes nested
jnp.where selects over whole arrays; left states at i+1/2 are written
through a +1 shift.  Region masks reproduce the reference's loop ranges
exactly (cells outside them are zero), so downstream windowed reads agree.
"""

import jax
import jax.numpy as jnp

__all__ = ["states", "states_nolimit"]

C2 = 1.25
C3 = 0.1


def _region_mask(g, axis, lo_off, hi_off, t_lo_off, t_hi_off):
    """Boolean mask for the index box [ilo+lo_off, ihi+hi_off] along
    `axis` and [lo+t_lo_off, hi+t_hi_off] transverse (offsets measured
    from the inclusive interior bounds).  Built from iotas (not captured
    numpy constants) so the same code lowers inside Pallas kernels."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (g.qx, g.qy), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (g.qx, g.qy), 1)
    if axis == 0:
        return ((ii >= g.ilo + lo_off) & (ii <= g.ihi + hi_off) &
                (jj >= g.jlo + t_lo_off) & (jj <= g.jhi + t_hi_off))
    return ((jj >= g.jlo + lo_off) & (jj <= g.jhi + hi_off) &
            (ii >= g.ilo + t_lo_off) & (ii <= g.ihi + t_hi_off))


def _sgn(x):
    """copysign(1, x) with copysign(1, 0) == +1."""
    return jnp.where(x >= 0.0, 1.0, -1.0)


def states(a, g, idir):
    """4th-order limited left/right edge states along idir (1=x, 2=y).

    al[i] is the left state at the i-1/2 interface.  Valid on the
    reference's loop ranges; zero elsewhere.
    """
    axis = 0 if idir == 1 else 1

    def sh(arr, k):
        # sh(arr, k)[i] = arr[i + k] along axis
        return jnp.roll(arr, -k, axis=axis)

    # the reference's d3a range differs between directions
    d3a_hi = 3 if idir == 1 else 2

    m_int = _region_mask(g, axis, -2, 3, -1, 1)
    m_d2ac = _region_mask(g, axis, -3, 3, -1, 1)
    m_d3a = _region_mask(g, axis, -2, d3a_hi, -1, 1)
    m_W = _region_mask(g, axis, -1, 1, -1, 1)

    # 4th-order edge interpolant a_{i-1/2}
    a_int = jnp.where(m_int,
                      (7.0 / 12.0) * (sh(a, -1) + a) -
                      (1.0 / 12.0) * (sh(a, -2) + sh(a, 1)), 0.0)

    al = a_int
    ar = a_int

    dafm = jnp.where(m_int, a - a_int, 0.0)
    dafp = jnp.where(m_int, sh(a_int, 1) - a, 0.0)
    d2af = jnp.where(m_int, 6.0 * (a_int - 2.0 * a + sh(a_int, 1)), 0.0)
    d2ac = jnp.where(m_d2ac, sh(a, -1) - 2.0 * a + sh(a, 1), 0.0)
    d3a = jnp.where(m_d3a, d2ac - sh(d2ac, -1), 0.0)

    # ---- the per-cell limiter decision tree over the working window ----
    extrema = ((dafm * dafp <= 0.0) |
               ((a - sh(a, -2)) * (sh(a, 2) - a) <= 0.0))

    s = _sgn(d2ac)
    samesign = ((s == _sgn(sh(d2ac, -1))) & (s == _sgn(sh(d2ac, 1))) &
                (s == _sgn(d2af)))
    d2a_lim = jnp.where(
        samesign,
        s * jnp.minimum(jnp.abs(d2af),
                        C2 * jnp.minimum(jnp.abs(sh(d2ac, -1)),
                                         jnp.minimum(jnp.abs(d2ac),
                                                     jnp.abs(sh(d2ac, 1))))),
        0.0)

    maxa = jnp.maximum(
        jnp.maximum(jnp.abs(sh(a, -2)), jnp.abs(sh(a, -1))),
        jnp.maximum(jnp.abs(a),
                    jnp.maximum(jnp.abs(sh(a, 1)), jnp.abs(sh(a, 2)))))
    tiny = jnp.abs(d2af) <= 1.e-12 * maxa
    rho = jnp.where(tiny, 0.0,
                    d2a_lim / jnp.where(d2af == 0.0, 1.0, d2af))

    d3a_min = jnp.minimum(jnp.minimum(sh(d3a, -1), d3a),
                          jnp.minimum(sh(d3a, 1), sh(d3a, 2)))
    d3a_max = jnp.maximum(jnp.maximum(sh(d3a, -1), d3a),
                          jnp.maximum(sh(d3a, 1), sh(d3a, 2)))

    dolim = ((rho < 1.0 - 1.e-12) &
             (C3 * jnp.maximum(jnp.abs(d3a_min), jnp.abs(d3a_max)) <=
              d3a_max - d3a_min))

    case1 = dafm * dafp < 0.0
    case2 = ~case1 & (jnp.abs(dafm) >= 2.0 * jnp.abs(dafp))
    case3 = ~case1 & ~case2 & (jnp.abs(dafp) >= 2.0 * jnp.abs(dafm))

    al_up = sh(al, 1)    # current al[i+1], the default for this cell's left

    # extrema + limiting active
    ar_lim = jnp.where(case1, a - rho * dafm,
                       jnp.where(case2,
                                 a - 2.0 * (1.0 - rho) * dafp - rho * dafm,
                                 ar))
    al_lim = jnp.where(case1, a + rho * dafp,
                       jnp.where(case3,
                                 a + 2.0 * (1.0 - rho) * dafm + rho * dafp,
                                 al_up))

    # no extrema: independent one-sided limits
    ar_ne = jnp.where(jnp.abs(dafm) >= 2.0 * jnp.abs(dafp),
                      a - 2.0 * dafp, ar)
    al_ne = jnp.where(jnp.abs(dafp) >= 2.0 * jnp.abs(dafm),
                      a + 2.0 * dafm, al_up)

    ar_cell = jnp.where(extrema, jnp.where(dolim, ar_lim, ar), ar_ne)
    al_cell = jnp.where(extrema, jnp.where(dolim, al_lim, al_up), al_ne)

    ar = jnp.where(m_W, ar_cell, ar)
    # al[i+1] <- al_cell[i]: shift the cell values up by one.  The
    # shifted mask is built directly from iotas (the +1-rolled box)
    # rather than rolling the bool array -- Mosaic cannot lower i1
    # vector rolls (bitcast failure)
    m_W_up = _region_mask(g, axis, 0, 2, -1, 1)
    al = jnp.where(m_W_up, jnp.roll(al_cell, 1, axis=axis), al)

    return al, ar


def states_nolimit(a, g, idir):
    """Unlimited 4th-order edge states (reference fourth_order.py:239-303)."""
    axis = 0 if idir == 1 else 1

    def sh(arr, k):
        return jnp.roll(arr, -k, axis=axis)

    m_int = _region_mask(g, axis, -2, 3, -1, 1)
    a_int = jnp.where(m_int,
                      (7.0 / 12.0) * (sh(a, -1) + a) -
                      (1.0 / 12.0) * (sh(a, -2) + sh(a, 1)), 0.0)
    return a_int, a_int
