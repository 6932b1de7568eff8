"""pyro2_tpu -- a TPU-native 2-D structured-grid finite-volume PDE framework.

A from-scratch JAX/XLA/Pallas re-design with the capability surface of
python-hydro/pyro2 (see SURVEY.md): 17 solvers (advection x5, Burgers x2,
compressible Euler x5, diffusion, incompressible x2, low-Mach atmosphere,
shallow water) on a 2-D ghost-cell grid, a cell-centered geometric multigrid
elliptic solver, Lagrangian tracer particles, and the surrounding runtime
(layered INI configuration, HDF5 checkpoint/restart, regression + convergence
testing, profiling, visualization).

Unlike the serial reference, state is an immutable pytree, every solver step is
a pure jitted function, and grids block-partition over a `jax.sharding.Mesh`
with halo exchange via collective-permute (see `pyro2_tpu.parallel`).

Public API mirrors the reference's notebook-first surface
(/root/reference/pyro/pyro_sim.py:34-321):

    from pyro2_tpu import Pyro
    p = Pyro("advection")
    p.initialize_problem("smooth", inputs_dict={"mesh.nx": 64, "mesh.ny": 64})
    p.run_sim()
    dens = p.get_var("density")
"""

from pyro2_tpu.mesh.boundary import BC, bc_is_solid, define_bc
from pyro2_tpu.mesh.grid import Cartesian2d, Grid2d, SphericalPolar
from pyro2_tpu.mesh.patch import CellCenterData2d, FaceCenterData2d
from pyro2_tpu.pyro_sim import Pyro, PyroBenchmark
from pyro2_tpu.util.runparams import RuntimeParameters

__version__ = "0.1.0"

__all__ = [
    "BC", "bc_is_solid", "define_bc",
    "Grid2d", "Cartesian2d", "SphericalPolar",
    "CellCenterData2d", "FaceCenterData2d",
    "Pyro", "PyroBenchmark", "RuntimeParameters",
]
