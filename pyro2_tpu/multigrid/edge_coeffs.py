"""Edge-centered coefficients for variable-coefficient multigrid.

Vectorized analog of the reference EdgeCoeffs
(/root/reference/pyro/multigrid/edge_coeffs.py): cell-centered eta averaged
to x/y faces, pre-scaled by 1/dx^2 (1/dy^2), with a factor-2 coarsening that
averages the two fine faces making up each coarse face.
"""

import jax.numpy as jnp

from pyro2_tpu.mesh.indexer import ai

__all__ = ["EdgeCoeffs"]


class EdgeCoeffs:
    """Holds eta_x[i,j] = eta_{i-1/2,j}/dx^2 and eta_y[i,j] = eta_{i,j-1/2}/dy^2."""

    def __init__(self, g, eta, empty=False):
        self.grid = g

        if not empty:
            ev = ai(eta, g)
            b = (0, 1)
            x_w = 0.5 * (ev.ip(-1, buf=b) + ev.v(buf=b)) / g.dx ** 2
            y_w = 0.5 * (ev.jp(-1, buf=b) + ev.v(buf=b)) / g.dy ** 2

            eta_x = jnp.zeros_like(eta)
            eta_y = jnp.zeros_like(eta)
            sl = (slice(g.ilo, g.ihi + 2), slice(g.jlo, g.jhi + 2))
            self.x = eta_x.at[sl].set(x_w)
            self.y = eta_y.at[sl].set(y_w)

    def restrict(self):
        """Edge coefficients on the factor-2 coarser grid (new EdgeCoeffs)."""
        fg = self.grid
        cg = fg.coarse_like(2)

        xv = ai(self.x, fg)
        yv = ai(self.y, fg)

        # coarse x-face value = average of the two stacked fine x-faces
        bx = (0, 1, 0, 0)
        cx_w = 0.5 * (xv.v(buf=bx, s=2) + xv.jp(1, buf=bx, s=2))
        # coarse y-face value = average of the two side-by-side fine y-faces
        by = (0, 0, 0, 1)
        cy_w = 0.5 * (yv.v(buf=by, s=2) + yv.ip(1, buf=by, s=2))

        c = EdgeCoeffs(cg, None, empty=True)
        scale_x = fg.dx ** 2 / cg.dx ** 2
        scale_y = fg.dy ** 2 / cg.dy ** 2

        c_x = jnp.zeros((cg.qx, cg.qy), dtype=self.x.dtype)
        c_y = jnp.zeros((cg.qx, cg.qy), dtype=self.y.dtype)
        c.x = c_x.at[cg.ilo:cg.ihi + 2, cg.jlo:cg.jhi + 1].set(cx_w * scale_x)
        c.y = c_y.at[cg.ilo:cg.ihi + 1, cg.jlo:cg.jhi + 2].set(cy_w * scale_y)
        return c
