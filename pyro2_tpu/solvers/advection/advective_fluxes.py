"""Unsplit CTU fluxes for linear advection with constant (u, v).

Pure-function re-design of the reference pipeline
(/root/reference/pyro/advection/{interface.py,advective_fluxes.py}): limited
slopes -> upwind interface states -> transverse-flux-corrected fluxes, all as
whole-array windowed jnp ops that XLA fuses into one stencil pass.  Fluxes
are defined on the left edge of each zone.
"""

import jax.numpy as jnp

from pyro2_tpu.mesh import reconstruction
from pyro2_tpu.mesh.indexer import ai

__all__ = ["linear_interface_states", "unsplit_fluxes"]


def _scatter(vals, g, buf, like):
    out = jnp.zeros_like(like)
    return out.at[..., g.ilo - buf:g.ihi + 1 + buf,
                  g.jlo - buf:g.jhi + 1 + buf].set(vals)


def linear_interface_states(a, g, u, v, limiter, dt):
    """Upwinded interface states a_{i-1/2}^{n+1/2} for constant velocity.

    u, v, limiter are static Python scalars (the upwind branch is resolved
    at trace time); dt may be traced.
    """
    cx = u * dt / g.dx
    cy = v * dt / g.dy

    ldelta_ax = reconstruction.limit(a, g, 1, limiter)
    ldelta_ay = reconstruction.limit(a, g, 2, limiter)

    av = ai(a, g)
    ldx = ai(ldelta_ax, g)
    ldy = ai(ldelta_ay, g)

    if u < 0:
        a_x_w = av.v(buf=1) - 0.5 * (1.0 + cx) * ldx.v(buf=1)
    else:
        a_x_w = av.ip(-1, buf=1) + 0.5 * (1.0 - cx) * ldx.ip(-1, buf=1)

    if v < 0:
        a_y_w = av.v(buf=1) - 0.5 * (1.0 + cy) * ldy.v(buf=1)
    else:
        a_y_w = av.jp(-1, buf=1) + 0.5 * (1.0 - cy) * ldy.jp(-1, buf=1)

    return _scatter(a_x_w, g, 1, a), _scatter(a_y_w, g, 1, a)


def unsplit_fluxes(a, g, u, v, limiter, dt,
                   interface=linear_interface_states):
    """x/y interface fluxes for a_t + u a_x + v a_y = 0 (Colella 1990 CTU).

    Pure advection needs no Riemann solve -- the single upwinded state per
    interface gets a transverse-derivative correction, then F = (velocity *
    state).  Returns full padded arrays valid on the buf=1 window.
    """
    a_x, a_y = interface(a, g, u, v, limiter, dt)

    # transverse fluxes from the predictor states
    F_xt = ai(u * a_x, g)
    F_yt = ai(v * a_y, g)
    axv = ai(a_x, g)
    ayv = ai(a_y, g)

    # which zone the transverse derivative comes from depends on upwinding
    mx = 0 if u <= 0 else -1
    my = 0 if v <= 0 else -1

    dtdx2 = 0.5 * dt / g.dx
    dtdy2 = 0.5 * dt / g.dy

    F_x_w = u * (axv.v(buf=1) -
                 dtdy2 * (F_yt.ip_jp(mx, 1, buf=1) - F_yt.ip(mx, buf=1)))
    F_y_w = v * (ayv.v(buf=1) -
                 dtdx2 * (F_xt.ip_jp(1, my, buf=1) - F_xt.jp(my, buf=1)))

    return _scatter(F_x_w, g, 1, a), _scatter(F_y_w, g, 1, a)
