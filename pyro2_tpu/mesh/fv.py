"""4th-order finite-volume data: cell-average <-> cell-center conversion.

Functional analog of the reference FV2d (/root/reference/pyro/mesh/fv.py):
averages and centers differ by dx^2/24 times the Laplacian.  Assumes dx == dy.
"""

import jax.numpy as jnp

from pyro2_tpu.mesh.indexer import ai, embed_into
from pyro2_tpu.mesh.patch import CellCenterData2d

__all__ = ["FV2d", "to_centers_array", "from_centers_array"]


def to_centers_array(a, g, is_positive=False):
    """Convert a padded cell-average array to cell-center values.

    The buf=ng-1 window is converted; the outermost ghost ring is copied
    through unchanged (it has no Laplacian stencil).  With is_positive, cells
    whose converted value goes negative fall back to the average
    (reference fv.py:27-29).  Scatter-free (embed_into) so the identical
    code runs inside the fused Pallas band kernels.
    """
    av = ai(a, g)
    ng = g.ng
    cv = av.v(buf=ng - 1) - g.dx ** 2 * av.lap(buf=ng - 1) / 24.0
    if is_positive:
        cv = jnp.where(cv >= 0.0, cv, av.v(buf=ng - 1))
    return embed_into(cv, g, a, buf=ng - 1)


def from_centers_array(a, g):
    """Convert a padded cell-center array (ghosts filled) to averages.

    Only the valid region is converted (reference fv.py:32-39).
    """
    av = ai(a, g)
    vv = av.v() + g.dx ** 2 * av.lap() / 24.0
    return embed_into(vv, g, a)


class FV2d(CellCenterData2d):
    """Finite-volume state: stored data are cell averages, ops 4th order."""

    def to_centers(self, name, is_positive=False):
        """The cell-center version of variable `name` (a full padded array)."""
        return to_centers_array(self.get_var(name), self.grid,
                                is_positive=is_positive)

    def from_centers(self, name):
        """Re-interpret stored centers as averages, in place (functional)."""
        self.fill_BC(name)
        self.set_var(name, from_centers_array(self.get_var(name), self.grid))
