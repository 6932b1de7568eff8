"""Massless Lagrangian tracer particles, fully vectorized.

Re-design of /root/reference/pyro/particles/particles.py: the reference's
per-particle dict of Particle objects (particles.py:89-327) becomes a single
(N, 2) position array.  Bilinear velocity interpolation is one gather;
the midpoint (RK2, AMReX AdvectWithUcc-style) advance and the per-edge
boundary enforcement (periodic wrap / reflect / outflow-delete) are masked
array ops.  Outflow "deletion" marks particles inactive (static shapes).
"""

import jax.numpy as jnp
import numpy as np

from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.util import msg

__all__ = ["Particles"]


class Particles:
    """A collection of tracer particles tied to a simulation's grid."""

    def __init__(self, sim_data, bc, n_particles, particle_generator="grid",
                 pos_array=None, init_array=None):
        self.sim_data = sim_data
        self.bc = bc

        # tolerate being handed the RuntimeParameters directly (the
        # reference compressible solver does this)
        if hasattr(n_particles, "get_param"):
            rp = n_particles
            n_particles = rp.get_param("particles.n_particles")
            particle_generator = rp.get_param("particles.particle_generator")

        if not callable(particle_generator) and \
                particle_generator != "array" and n_particles <= 0:
            msg.fail(f"ERROR: n_particles = {n_particles} <= 0")

        if callable(particle_generator):
            pos = np.asarray(particle_generator(n_particles), dtype=float)
            init = pos.copy()
        elif particle_generator == "random":
            pos, init = self._random_positions(n_particles)
        elif particle_generator == "grid":
            pos, init = self._grid_positions(n_particles)
        elif particle_generator == "array":
            if pos_array is None:
                msg.fail("ERROR: Array of particle positions has not been "
                         "passed into Particles constructor.")
            pos = np.asarray(pos_array, dtype=float)
            init = (np.asarray(init_array, dtype=float)
                    if init_array is not None else pos.copy())
        else:
            msg.fail("ERROR: do not recognise particle generator "
                     f"{particle_generator}")

        self.positions = jnp.asarray(pos)
        self.init_positions = jnp.asarray(init)
        self.active = jnp.ones(len(pos), dtype=bool)
        self.n_particles = len(pos)

    # -- generators ---------------------------------------------------------
    def _random_positions(self, n_particles):
        myg = self.sim_data.grid
        pos = np.random.rand(n_particles, 2)
        pos[:, 0] = pos[:, 0] * (myg.xmax - myg.xmin) + myg.xmin
        pos[:, 1] = pos[:, 1] * (myg.ymax - myg.ymin) + myg.ymin
        return pos, pos.copy()

    def _grid_positions(self, n_particles):
        sq = int(round(np.sqrt(n_particles)))
        if sq ** 2 != n_particles:
            msg.warning(f"WARNING: Changing number of particles from "
                        f"{n_particles} to {sq ** 2}")
        myg = self.sim_data.grid
        xs, step = np.linspace(myg.xmin, myg.xmax, num=sq, endpoint=False,
                               retstep=True)
        xs = xs + 0.5 * step
        ys, step = np.linspace(myg.ymin, myg.ymax, num=sq, endpoint=False,
                               retstep=True)
        ys = ys + 0.5 * step
        xx, yy = np.meshgrid(xs, ys, indexing="ij")
        pos = np.stack([xx.ravel(), yy.ravel()], axis=1)
        return pos, pos.copy()

    # -- accessors ----------------------------------------------------------
    def get_positions(self):
        """(N_active, 2) array of current particle positions."""
        act = np.asarray(self.active)
        return np.asarray(self.positions)[act]

    def get_init_positions(self):
        """(N_active, 2) array of the initial positions (for dye plots)."""
        act = np.asarray(self.active)
        return np.asarray(self.init_positions)[act]

    # -- dynamics -----------------------------------------------------------
    def _interp(self, u_b, v_b, pos):
        """Bilinear velocity at particle positions; u_b/v_b are buf=1
        windows of the velocity fields."""
        myg = self.sim_data.grid
        xf = (pos[:, 0] - myg.xmin) / myg.dx - 0.5
        yf = (pos[:, 1] - myg.ymin) / myg.dy - 0.5
        x_frac = jnp.mod(xf, 1.0)
        y_frac = jnp.mod(yf, 1.0)
        # truncation (not floor) + 1, matching the reference's int() cast
        xi = jnp.trunc(xf).astype(jnp.int32) + 1
        yi = jnp.trunc(yf).astype(jnp.int32) + 1
        xi = jnp.clip(xi, 0, u_b.shape[0] - 2)
        yi = jnp.clip(yi, 0, u_b.shape[1] - 2)

        def bilin(f):
            return ((1 - x_frac) * (1 - y_frac) * f[xi, yi] +
                    x_frac * (1 - y_frac) * f[xi + 1, yi] +
                    (1 - x_frac) * y_frac * f[xi, yi + 1] +
                    x_frac * y_frac * f[xi + 1, yi + 1])

        return bilin(u_b), bilin(v_b)

    def advance_pure(self, pos, active, u, v, dt):
        """PURE midpoint (RK2) advance + boundary enforcement: returns
        (new_pos, new_active) without touching self.  Used by
        update_particles and by the on-device driver loop
        (driver_loop.py), which carries (pos, active) through its scan."""
        myg = self.sim_data.grid
        u_b = ai(jnp.asarray(u), myg).v(buf=1)
        v_b = ai(jnp.asarray(v), myg).v(buf=1)

        u0, v0 = self._interp(u_b, v_b, pos)
        mid = pos + 0.5 * dt * jnp.stack([u0, v0], axis=1)
        u1, v1 = self._interp(u_b, v_b, mid)
        new_pos = pos + dt * jnp.stack([u1, v1], axis=1)

        pos = jnp.where(active[:, None], new_pos, pos)
        return self._enforce_pure(pos, active)

    def update_particles(self, dt, u=None, v=None):
        """Midpoint (RK2) advance with the cell-centered velocity."""
        if (u is None) and (v is None):
            u, v = self.sim_data.get_var("velocity")
        elif u is None:
            u = self.sim_data.get_var("x-velocity")
        elif v is None:
            v = self.sim_data.get_var("y-velocity")

        self.positions, self.active = self.advance_pure(
            self.positions, self.active, u, v, dt)

    def enforce_particle_boundaries(self):
        """Apply periodic wrap / reflection / outflow-deletion per edge."""
        self.positions, self.active = self._enforce_pure(
            self.positions, self.active)

    def _enforce_pure(self, pos, active):
        myg = self.sim_data.grid

        def apply_edge(pos, active, axis, lo, hi, lo_bc, hi_bc):
            c = pos[:, axis]

            below = c < lo
            if lo_bc in ["outflow", "neumann"]:
                active = active & ~below
            elif lo_bc == "periodic":
                c = jnp.where(below, hi + c - lo, c)
            elif lo_bc in ["reflect-even", "reflect-odd", "dirichlet"]:
                c = jnp.where(below, 2 * lo - c, c)
            else:
                msg.fail(f"ERROR: {lo_bc} invalid BC for particles")

            above = c > hi
            if hi_bc in ["outflow", "neumann"]:
                active = active & ~above
            elif hi_bc == "periodic":
                c = jnp.where(above, lo + c - hi, c)
            elif hi_bc in ["reflect-even", "reflect-odd", "dirichlet"]:
                c = jnp.where(above, 2 * hi - c, c)
            else:
                msg.fail(f"ERROR: {hi_bc} invalid BC for particles")

            return pos.at[:, axis].set(c), active

        bc = self.bc
        if bc is not None:
            pos, active = apply_edge(pos, active, 0, myg.xmin, myg.xmax,
                                     bc.xlb, bc.xrb)
            pos, active = apply_edge(pos, active, 1, myg.ymin, myg.ymax,
                                     bc.ylb, bc.yrb)
        return pos, active

    # -- I/O ----------------------------------------------------------------
    def write_particles(self, f):
        """Write particle positions to an open HDF5 file."""
        gparticles = f.create_group("particles")
        gparticles.create_dataset("particle_positions",
                                  data=self.get_positions())
        gparticles.create_dataset("init_particle_positions",
                                  data=self.get_init_positions())
