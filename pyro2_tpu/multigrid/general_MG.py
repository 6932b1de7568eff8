r"""General-form multigrid: alpha phi + div(beta grad phi) + gamma.grad(phi) = f.

Re-design of the reference GeneralMG2d
(/root/reference/pyro/multigrid/general_MG.py:27-242): cell-centered alpha,
beta, gamma_x, gamma_y are restricted down the hierarchy once; beta is
edge-averaged (pre-scaled 1/dx^2).  Supports inhomogeneous solution BCs.
"""

import jax.numpy as jnp

import pyro2_tpu.multigrid.edge_coeffs as ec
from pyro2_tpu.mesh.indexer import ai, fill_ghost
from pyro2_tpu.mesh.patch import restrict_array
from pyro2_tpu.multigrid import MG

__all__ = ["GeneralMG2d"]

_COEFFS = ["alpha", "beta", "gamma_x", "gamma_y"]


class GeneralMG2d(MG.CellCenterMG2d):
    """Multigrid for the general linear elliptic operator."""

    def __init__(self, nx, ny, xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0,
                 xl_BC_type="dirichlet", xr_BC_type="dirichlet",
                 yl_BC_type="dirichlet", yr_BC_type="dirichlet",
                 xl_BC=None, xr_BC=None, yl_BC=None, yr_BC=None,
                 nsmooth=10, nsmooth_bottom=50,
                 verbose=0, coeffs=None,
                 true_function=None, vis=0, vis_title=""):
        """coeffs is a CellCenterData2d with alpha/beta/gamma_x/gamma_y."""
        self.beta_edge = []

        super().__init__(nx, ny, ng=1,
                         xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
                         xl_BC_type=xl_BC_type, xr_BC_type=xr_BC_type,
                         yl_BC_type=yl_BC_type, yr_BC_type=yr_BC_type,
                         xl_BC=xl_BC, xr_BC=xr_BC,
                         yl_BC=yl_BC, yr_BC=yr_BC,
                         alpha=0.0, beta=0.0,
                         nsmooth=nsmooth, nsmooth_bottom=nsmooth_bottom,
                         verbose=verbose,
                         aux_field=_COEFFS,
                         aux_bc=[coeffs.BCs[c] for c in _COEFFS],
                         true_function=true_function, vis=vis,
                         vis_title=vis_title)

        fine = self.nlevels - 1
        g_f = self.grids[fine]
        for c in _COEFFS:
            bc_c = coeffs.BCs[c]
            c_in = jnp.asarray(coeffs.get_var(c))
            if c_in.shape != (g_f.qx, g_f.qy):
                # accept coefficients from a grid with a different ghost
                # count: only the valid region is used
                src_g = coeffs.grid
                valid = c_in[src_g.ilo:src_g.ihi + 1,
                             src_g.jlo:src_g.jhi + 1]
                c_in = g_f.scratch_array().at[
                    g_f.ilo:g_f.ihi + 1, g_f.jlo:g_f.jhi + 1].set(valid)
            arr = fill_ghost(c_in, g_f, bc_c)
            self.aux[c][fine] = arr
            for n in range(self.nlevels - 2, -1, -1):
                cc = restrict_array(self.aux[c][n + 1], self.grids[n + 1],
                                    self.grids[n])
                self.aux[c][n] = fill_ghost(cc, self.grids[n], bc_c)

        self.beta_edge.insert(0, ec.EdgeCoeffs(self.grids[fine],
                                               self.aux["beta"][fine]))
        for n in range(self.nlevels - 2, -1, -1):
            self.beta_edge.insert(0, self.beta_edge[0].restrict())

    # -- operator overrides ------------------------------------------------
    def _params(self):
        return {"alpha": tuple(self.aux["alpha"]),
                "gamma_x": tuple(self.aux["gamma_x"]),
                "gamma_y": tuple(self.aux["gamma_y"]),
                "beta_x": tuple(e.x for e in self.beta_edge),
                "beta_y": tuple(e.y for e in self.beta_edge)}

    def _coeff_views(self, level, params):
        g = self.grids[level]
        alpha = ai(params["alpha"][level], g)
        gamma_x = ai(0.5 * params["gamma_x"][level] / g.dx, g)
        gamma_y = ai(0.5 * params["gamma_y"][level] / g.dy, g)
        beta_x = ai(params["beta_x"][level], g)
        beta_y = ai(params["beta_y"][level], g)
        return alpha, gamma_x, gamma_y, beta_x, beta_y

    def _smooth_once(self, level, v, f, params):
        g = self.grids[level]
        alpha, gamma_x, gamma_y, beta_x, beta_y = \
            self._coeff_views(level, params)

        def half_sweep(v, mask):
            vv = ai(v, g)
            denom = (alpha.v() -
                     beta_x.ip(1) - beta_x.v() -
                     beta_y.jp(1) - beta_y.v())
            upd = (ai(f, g).v() -
                   (beta_x.ip(1) + gamma_x.v()) * vv.ip(1) -
                   (beta_x.v() - gamma_x.v()) * vv.ip(-1) -
                   (beta_y.jp(1) + gamma_y.v()) * vv.jp(1) -
                   (beta_y.v() - gamma_y.v()) * vv.jp(-1)) / denom
            full = jnp.zeros_like(v)
            full = full.at[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1].set(upd)
            return jnp.where(mask, full, v)

        v = half_sweep(v, self._red_masks[level])
        v = self._fill_v(level, v)
        v = half_sweep(v, self._black_masks[level])
        v = self._fill_v(level, v)
        return v

    def _residual(self, level, v, f, params):
        g = self.grids[level]
        alpha, gamma_x, gamma_y, beta_x, beta_y = \
            self._coeff_views(level, params)
        vv = ai(v, g)

        L_phi = (alpha.v() * vv.v() +
                 beta_x.ip(1) * (vv.ip(1) - vv.v()) -
                 beta_x.v() * (vv.v() - vv.ip(-1)) +
                 beta_y.jp(1) * (vv.jp(1) - vv.v()) -
                 beta_y.v() * (vv.v() - vv.jp(-1)) +
                 gamma_x.v() * (vv.ip(1) - vv.ip(-1)) +
                 gamma_y.v() * (vv.jp(1) - vv.jp(-1)))
        r_v = ai(f, g).v() - L_phi
        r = jnp.zeros_like(v)
        return r.at[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1].set(r_v)
