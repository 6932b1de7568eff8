"""HDF5 checkpoint reading: reconstruct a live simulation from an output file.

Mirror of /root/reference/pyro/util/io_pyro.py:27-148: any output doubles as
a restart file and as the regression-comparison format.  Re-registers custom
BCs by importing the solver's BC module, rebuilds the grid (incl. coord_type),
state, particles, a live Simulation, and re-attaches derived variables via an
MRO walk.
"""

import importlib

import h5py
import jax.numpy as jnp

import pyro2_tpu.mesh.boundary as bnd
from pyro2_tpu.mesh.grid import Cartesian2d, SphericalPolar
from pyro2_tpu.mesh.patch import CellCenterData2d

__all__ = ["read", "read_bcs"]


def read_bcs(f):
    """The custom-BC record from the HDF5 file ({name: is_solid})."""
    try:
        gb = f["BC"]
    except KeyError:
        return None
    return {name: gb[name] for name in gb}


def read(filename):
    """Read an HDF5 output and recreate the simulation (or bare patch)."""
    if not filename.endswith(".h5"):
        filename += ".h5"

    with h5py.File(filename, "r") as f:
        try:
            solver_name = f.attrs["solver"]
            problem_name = f.attrs["problem"]
            t = f.attrs["time"]
            n = f.attrs["nsteps"]
        except KeyError:
            solver_name = None

        grid = f["grid"].attrs
        coord_type = grid.get("coord_type", 0)
        grid_class = SphericalPolar if coord_type == 1 else Cartesian2d
        myg = grid_class(int(grid["nx"]), int(grid["ny"]), ng=int(grid["ng"]),
                         xmin=grid["xmin"], xmax=grid["xmax"],
                         ymin=grid["ymin"], ymax=grid["ymax"])

        # re-register any custom BCs before variable creation needs them
        custom_bcs = read_bcs(f)
        if custom_bcs is not None:
            if solver_name in ["compressible_fv4", "compressible_rk",
                               "compressible_sdc"]:
                bc_solver = "compressible"
            else:
                bc_solver = solver_name
            bcmod = importlib.import_module(
                f"pyro2_tpu.solvers.{bc_solver}.BC")
            for name, is_solid in custom_bcs.items():
                bnd.define_bc(name, bcmod.user, is_solid=bool(is_solid))

        gs = f["state"]
        names = list(gs)

        myd = CellCenterData2d(myg)
        for name in names:
            grp = gs[name]
            bc = bnd.BC(xlb=grp.attrs["xlb"], xrb=grp.attrs["xrb"],
                        ylb=grp.attrs["ylb"], yrb=grp.attrs["yrb"])
            myd.register_var(name, bc)
        myd.create()

        for k in f["aux"].attrs:
            myd.set_aux(k, f["aux"].attrs[k])

        for name in names:
            data = gs[name]["data"][...]
            full = jnp.zeros((myg.qx, myg.qy), dtype=myd.dtype)
            full = full.at[myg.ilo:myg.ihi + 1, myg.jlo:myg.jhi + 1].set(
                jnp.asarray(data))
            myd.set_var(name, full)

        # particles
        try:
            gparticles = f["particles"]
            particle_data = gparticles["particle_positions"][...]
            init_data = gparticles["init_particle_positions"][...]
            from pyro2_tpu.particles import particles
            my_particles = particles.Particles(myd, None, len(particle_data),
                                               "array", particle_data,
                                               init_data)
        except KeyError:
            my_particles = None

        if solver_name is not None:
            solver = importlib.import_module(
                f"pyro2_tpu.solvers.{solver_name}")
            sim = solver.Simulation(solver_name, problem_name, None, None)
            sim.n = int(n)
            sim.cc_data = myd
            sim.cc_data.t = float(t)
            sim.particles = my_particles
            sim.read_extras(f)

            # walk the MRO to find the solver family's derives module
            for mod in [cls.__module__ for cls in type(sim).__mro__
                        if cls is not object]:
                try:
                    derives = importlib.import_module(
                        mod.replace("simulation", "derives"))
                    sim.cc_data.add_derived(derives.derive_primitives)
                except (ModuleNotFoundError, AttributeError):
                    continue
                else:
                    break
            return sim

    return myd
