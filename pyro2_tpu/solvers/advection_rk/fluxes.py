"""1-D upwind interface fluxes for method-of-lines advection
(reference: pyro/advection_rk/fluxes.py)."""

import jax.numpy as jnp

from pyro2_tpu.mesh import reconstruction
from pyro2_tpu.mesh.indexer import ai


def fluxes(a, g, rp):
    """(F_x, F_y) from piecewise-linear 1-D upwind states (no transverse
    terms -- RK stages couple the directions)."""
    u = rp.get_param("advection.u")
    v = rp.get_param("advection.v")
    limiter = rp.get_param("advection.limiter")

    ldelta_ax = reconstruction.limit(a, g, 1, limiter)
    ldelta_ay = reconstruction.limit(a, g, 2, limiter)

    av = ai(a, g)
    ldx = ai(ldelta_ax, g)
    ldy = ai(ldelta_ay, g)

    if u < 0:
        a_x_w = av.v(buf=1) - 0.5 * ldx.v(buf=1)
    else:
        a_x_w = av.ip(-1, buf=1) + 0.5 * ldx.ip(-1, buf=1)
    if v < 0:
        a_y_w = av.v(buf=1) - 0.5 * ldy.v(buf=1)
    else:
        a_y_w = av.jp(-1, buf=1) + 0.5 * ldy.jp(-1, buf=1)

    def put(vals):
        out = jnp.zeros_like(a)
        return out.at[g.ilo - 1:g.ihi + 2, g.jlo - 1:g.jhi + 2].set(vals)

    return u * put(a_x_w), v * put(a_y_w)
