"""WENO Lax-Friedrichs flux-vector-split fluxes, vectorized.

The reference's per-row/column 1-D loops (pyro/advection_weno/fluxes.py)
become one 2-D shifted-window WENO combination per direction.
"""

import jax.numpy as jnp
import numpy as np

from pyro2_tpu.mesh.reconstruction import _weno_combine


def _fvs2d(q, order, u, alpha, axis):
    """LF flux-vector-split WENO along `axis` of a full padded array.

    flux_p is reconstructed left-biased to the i-1/2 face, flux_m
    right-biased; valid mirroring the reference loop ranges.
    """
    flux = u * q
    flux_p = (flux + alpha * q) / 2
    flux_m = (flux - alpha * q) / 2

    def sh(arr, k):
        return jnp.roll(arr, -k, axis=axis)

    # the reference windows: flux_p_r[i] combines flux_p[i-1+o],
    # flux_m_l[i] combines flux_m[i-o]
    p_r = _weno_combine(lambda o: sh(flux_p, o - 1), order)
    m_l = _weno_combine(lambda o: sh(flux_m, -o), order)

    n = q.shape[axis]
    idx = np.arange(n)
    valid = (idx >= order) & (idx < n - order)
    inner = (idx >= 1) & (idx < n - 1)
    shape = [1, 1]
    shape[axis] = n
    valid = jnp.asarray(valid.reshape(shape))
    inner = jnp.asarray(inner.reshape(shape))

    recon = jnp.where(valid, p_r + m_l, 0.0)
    return jnp.where(inner, recon, 0.0)


def fluxes(a, g, rp):
    """(F_x, F_y) WENO fluxes for constant-velocity advection."""
    u = rp.get_param("advection.u")
    v = rp.get_param("advection.v")
    weno_order = rp.get_param("advection.weno_order")
    assert weno_order in (2, 3), "Currently only implemented weno_order=2, 3"
    assert g.ng > weno_order, "Need more ghosts than the weno_order"

    alpha = np.sqrt(u ** 2 + v ** 2)
    F_x = _fvs2d(a, weno_order, u, alpha, axis=0)
    F_y = _fvs2d(a, weno_order, v, alpha, axis=1)
    return F_x, F_y
