r"""Variable-coefficient multigrid: div( eta grad(phi) ) = f.

Re-design of the reference VarCoeffCCMG2d
(/root/reference/pyro/multigrid/variable_coeff_MG.py:24-213): eta lives
cell-centered on the finest level, is conservatively restricted down the
hierarchy once at construction, and is averaged onto edges (pre-scaled by
1/dx^2) per level.  The smoother/residual are the masked red-black forms of
the edge-coefficient 5-point operator.
"""

import jax.numpy as jnp

import pyro2_tpu.multigrid.edge_coeffs as ec
from pyro2_tpu.mesh.indexer import ai, fill_ghost
from pyro2_tpu.mesh.patch import restrict_array
from pyro2_tpu.multigrid import MG

__all__ = ["VarCoeffCCMG2d"]


class VarCoeffCCMG2d(MG.CellCenterMG2d):
    """Multigrid with a cell-centered variable coefficient eta."""

    def __init__(self, nx, ny, xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0,
                 xl_BC_type="dirichlet", xr_BC_type="dirichlet",
                 yl_BC_type="dirichlet", yr_BC_type="dirichlet",
                 nsmooth=10, nsmooth_bottom=50,
                 verbose=0, coeffs=None, coeffs_bc=None,
                 true_function=None, vis=0, vis_title=""):
        self.edge_coeffs = []

        super().__init__(nx, ny, ng=1,
                         xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
                         xl_BC_type=xl_BC_type, xr_BC_type=xr_BC_type,
                         yl_BC_type=yl_BC_type, yr_BC_type=yr_BC_type,
                         alpha=0.0, beta=0.0,
                         nsmooth=nsmooth, nsmooth_bottom=nsmooth_bottom,
                         verbose=verbose,
                         aux_field=["coeffs"], aux_bc=[coeffs_bc],
                         true_function=true_function, vis=vis,
                         vis_title=vis_title)

        # install the fine-level coefficients and restrict down once.
        # coeffs may come from a grid with a different ghost count (the
        # solvers use ng=4); only the valid region is used.
        fine = self.nlevels - 1
        g_f = self.grids[fine]
        c_in = jnp.asarray(coeffs)
        if c_in.shape != (g_f.qx, g_f.qy):
            src_ngx = (c_in.shape[0] - nx) // 2
            src_ngy = (c_in.shape[1] - ny) // 2
            if (c_in.shape[0] - 2 * src_ngx != nx or
                    c_in.shape[1] - 2 * src_ngy != ny or src_ngx < 0):
                raise IndexError(
                    "coefficient array not the same size as multigrid "
                    "problem")
            valid = c_in[src_ngx:src_ngx + nx, src_ngy:src_ngy + ny]
            c_in = g_f.scratch_array()
            c_in = c_in.at[g_f.ilo:g_f.ihi + 1,
                           g_f.jlo:g_f.jhi + 1].set(valid)
        c = fill_ghost(c_in, g_f, coeffs_bc)
        self.aux["coeffs"][fine] = c

        self.edge_coeffs.insert(0, ec.EdgeCoeffs(g_f, c))

        for n in range(self.nlevels - 2, -1, -1):
            g_c = self.grids[n]
            cc = restrict_array(self.aux["coeffs"][n + 1],
                                self.grids[n + 1], g_c)
            cc = fill_ghost(cc, g_c, coeffs_bc)
            self.aux["coeffs"][n] = cc
            self.edge_coeffs.insert(0, self.edge_coeffs[0].restrict())

    # -- operator overrides ------------------------------------------------
    def _params(self):
        return {"eta_x": tuple(e.x for e in self.edge_coeffs),
                "eta_y": tuple(e.y for e in self.edge_coeffs)}

    def _smooth_once(self, level, v, f, params):
        g = self.grids[level]
        exv = ai(params["eta_x"][level], g)
        eyv = ai(params["eta_y"][level], g)

        def half_sweep(v, mask):
            vv = ai(v, g)
            denom = exv.ip(1) + exv.v() + eyv.jp(1) + eyv.v()
            upd = (-ai(f, g).v() +
                   exv.ip(1) * vv.ip(1) + exv.v() * vv.ip(-1) +
                   eyv.jp(1) * vv.jp(1) + eyv.v() * vv.jp(-1)) / denom
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
        vv = ai(v, g)
        exv = ai(params["eta_x"][level], g)
        eyv = ai(params["eta_y"][level], g)

        L_eta_phi = (exv.ip(1) * (vv.ip(1) - vv.v()) -
                     exv.v() * (vv.v() - vv.ip(-1)) +
                     eyv.jp(1) * (vv.jp(1) - vv.v()) -
                     eyv.v() * (vv.v() - vv.jp(-1)))
        r_v = ai(f, g).v() - L_eta_phi
        r = jnp.zeros_like(v)
        return r.at[g.ilo:g.ihi + 1, g.jlo:g.jhi + 1].set(r_v)
