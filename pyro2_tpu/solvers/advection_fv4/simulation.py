"""4th-order FV advection Simulation (reference: pyro/advection_fv4/
simulation.py): FV2d (cell-average) data + RK evolve."""

from pyro2_tpu.mesh import fv
from pyro2_tpu.simulation_null import bc_setup, grid_setup
from pyro2_tpu.solvers import advection_rk
from pyro2_tpu.solvers.advection_fv4 import fluxes as flx


class Simulation(advection_rk.Simulation):

    def initialize(self):
        """FV2d data (cell averages), ng=4."""
        my_grid = grid_setup(self.rp, ng=4)
        my_data = fv.FV2d(my_grid)
        bc = bc_setup(self.rp)[0]
        my_data.register_var("density", bc)
        my_data.create()
        self.cc_data = my_data

        if self.rp.get_param("particles.do_particles") == 1:
            from pyro2_tpu.particles import particles
            n_particles = self.rp.get_param("particles.n_particles")
            particle_generator = self.rp.get_param(
                "particles.particle_generator")
            self.particles = particles.Particles(self.cc_data, bc,
                                                 n_particles,
                                                 particle_generator)

        self.problem_func(self.cc_data, self.rp)

    @property
    def flux_fn(self):
        return flx.fluxes

    def preevolve(self):
        """ICs were set at cell-centers; convert to cell-averages."""
        for var in self.cc_data.names:
            self.cc_data.from_centers(var)
