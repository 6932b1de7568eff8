"""Mesh layer: grid geometry, boundary conditions, stencil views, state.

TPU-native re-design of the reference mesh package
(/root/reference/pyro/mesh/): ghost-cell grids are static geometry objects
(hashable, closed over by jitted kernels), state lives in immutable
(nvar, qx, qy) jnp arrays, and the ArrayIndexer stencil-view algebra becomes
the pure slicing helpers in `pyro2_tpu.mesh.indexer`.
"""

from pyro2_tpu.mesh import boundary, fv, integration, reconstruction
from pyro2_tpu.mesh.boundary import BC, bc_is_solid, define_bc
from pyro2_tpu.mesh.grid import Cartesian2d, Grid2d, SphericalPolar
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.mesh.patch import (CellCenterData2d, FaceCenterData2d,
                                  cell_center_data_clone)
