"""Reacting compressible Simulation (reference: pyro/compressible_react/
simulation.py): the compressible solver with "fuel"/"ash" advected species
and a Strang-split burn/diffuse scaffold (stubs, as in the reference)."""

import jax.numpy as jnp

from pyro2_tpu.solvers import compressible
from pyro2_tpu.solvers.compressible import eos


class Simulation(compressible.Simulation):

    def initialize(self, *, extra_vars=None, ng=4):
        """Same as compressible, plus fuel/ash species."""
        super().initialize(extra_vars=["fuel", "ash"] + (extra_vars or []),
                           ng=ng)

    def burn(self, dt):
        """React fuel to ash (stub, as in the reference)."""

    def diffuse(self, dt):
        """Diffuse for dt (stub, as in the reference)."""

    def evolve(self):
        """Strang splitting: burn/diffuse halves around the hydro step."""
        self.burn(self.dt / 2)
        self.diffuse(self.dt / 2)

        if self.particles is not None:
            self.particles.update_particles(self.dt / 2)

        super().evolve()

        if self.particles is not None:
            self.particles.update_particles(self.dt / 2)

        self.diffuse(self.dt / 2)
        self.burn(self.dt / 2)

    def dovis(self):
        """Runtime visualization incl. the fuel fraction."""
        from pyro2_tpu.util import plot_tools

        ivars = compressible.Variables(self.cc_data)
        gamma = self.cc_data.get_aux("gamma")
        myg = self.cc_data.grid
        q = compressible.cons_to_prim(self.cc_data.data, gamma, ivars, myg)

        rho = q[ivars.irho]
        u = q[ivars.iu]
        v = q[ivars.iv]
        p = q[ivars.ip]
        e = eos.rhoe(gamma, p) / rho
        X = q[ivars.ix]
        magvel = jnp.sqrt(u ** 2 + v ** 2)

        plot_tools.plot_fields(
            self, [(r"$\rho$", rho), ("U", magvel), ("p", p), ("e", e),
                   (r"$X_\mathrm{fuel}$", X)])
