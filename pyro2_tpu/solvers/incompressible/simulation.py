"""Incompressible Simulation: 2nd-order approximate projection method.

Re-design of /root/reference/pyro/incompressible/simulation.py: the
hyperbolic stages (slopes, MAC velocities, interface states, advective
update) are jitted pure functions; the three elliptic solves per step (MAC
projection, final projection, plus the preevolve initial projection) use the
cached-compile multigrid.
"""

import jax
import jax.numpy as jnp

import pyro2_tpu.mesh.boundary as bnd
from pyro2_tpu.mesh import patch, reconstruction
from pyro2_tpu.mesh.indexer import ai, fill_ghost
from pyro2_tpu.multigrid import MG
from pyro2_tpu.simulation_null import bc_setup, grid_setup
from pyro2_tpu.solvers.burgers import Simulation as burgers_simulation
from pyro2_tpu.solvers.incompressible import incomp_interface


class Simulation(burgers_simulation):

    def initialize(self, *, other_bc=False, aux_vars=()):
        """Grid (ng=4), velocities + projection fields, ICs."""
        my_grid = grid_setup(self.rp, ng=4)
        my_data = patch.CellCenterData2d(my_grid)

        if other_bc:
            self.define_other_bc()

        bc, bc_xodd, bc_yodd = bc_setup(self.rp)

        my_data.register_var("x-velocity", bc_xodd)
        my_data.register_var("y-velocity", bc_yodd)

        # phi/gradp: Neumann when velocity is dirichlet (solid walls),
        # periodic when periodic
        if bc.xlb == "periodic":
            phi_bc = bc
        else:
            phi_bc = bnd.BC(xlb="neumann", xrb="neumann",
                            ylb="neumann", yrb="neumann")

        my_data.register_var("phi-MAC", phi_bc)
        my_data.register_var("phi", phi_bc)
        my_data.register_var("gradp_x", phi_bc)
        my_data.register_var("gradp_y", phi_bc)

        for v in aux_vars:
            my_data.set_aux(keyword=v[0], value=v[1])

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

        self.in_preevolve = False
        self.problem_func(self.cc_data, self.rp)

    # -- helpers ------------------------------------------------------------
    def _proj_mg(self):
        myg = self.cc_data.grid
        bcs = self.cc_data.BCs["phi"]
        return MG.CellCenterMG2d(myg.nx, myg.ny,
                                 xl_BC_type=bcs.xlb, xr_BC_type=bcs.xrb,
                                 yl_BC_type=bcs.ylb, yr_BC_type=bcs.yrb,
                                 xmin=myg.xmin, xmax=myg.xmax,
                                 ymin=myg.ymin, ymax=myg.ymax, verbose=0)

    def _cc_divU(self, u, v, target_grid):
        """Cell-centered divergence, built on target_grid's padded shape
        (the MG solution grid has ng=1, unlike the ng=4 solver grid)."""
        myg = self.cc_data.grid
        uv = ai(u, myg)
        vv = ai(v, myg)
        div_v = (0.5 * (uv.ip(1) - uv.ip(-1)) / myg.dx +
                 0.5 * (vv.jp(1) - vv.jp(-1)) / myg.dy)
        divU = target_grid.scratch_array()
        return divU.at[target_grid.ilo:target_grid.ihi + 1,
                       target_grid.jlo:target_grid.jhi + 1].set(div_v)

    def preevolve(self):
        """Initial projection (div U = 0) + one throwaway evolve to get
        gradp at n-1/2."""
        self.in_preevolve = True
        myg = self.cc_data.grid

        self.cc_data.fill_BC("x-velocity")
        self.cc_data.fill_BC("y-velocity")
        u = self.cc_data.get_var("x-velocity")
        v = self.cc_data.get_var("y-velocity")

        # the reference always uses periodic phi BCs for the initial
        # projection (simulation.py:91-100)
        mg = MG.CellCenterMG2d(myg.nx, myg.ny,
                               xl_BC_type="periodic", xr_BC_type="periodic",
                               yl_BC_type="periodic", yr_BC_type="periodic",
                               xmin=myg.xmin, xmax=myg.xmax,
                               ymin=myg.ymin, ymax=myg.ymax, verbose=0)

        mg.init_zeros()
        mg.init_RHS(self._cc_divU(u, v, mg.soln_grid))
        mg.solve(rtol=1.e-10)

        self.cc_data.set_var("phi", mg.get_solution(grid=myg))

        gradp_x, gradp_y = mg.get_solution_gradient(grid=myg)
        self.cc_data.set_var("x-velocity", u - gradp_x)
        self.cc_data.set_var("y-velocity", v - gradp_y)

        self.cc_data.fill_BC("x-velocity")
        self.cc_data.fill_BC("y-velocity")

        # evolve once to get gradp at n-1/2, then restore the state
        orig_data = patch.cell_center_data_clone(self.cc_data)
        self.method_compute_timestep()
        self.evolve()

        orig_data.set_var("gradp_x", self.cc_data.get_var("gradp_x"))
        orig_data.set_var("gradp_y", self.cc_data.get_var("gradp_y"))
        self.cc_data = orig_data

        if self.verbose > 0:
            print("done with the pre-evolution")
        self.in_preevolve = False

    def other_source_term(self):
        """Extra velocity sources (subclass hook); (source_x, source_y)."""
        return None, None

    def evolve(self, other_update_velocity=False, other_source_term=False):
        """One projection-method timestep."""
        myg = self.cc_data.grid
        dt = self.dt

        u = self.cc_data.get_var("x-velocity")
        v = self.cc_data.get_var("y-velocity")
        gradp_x = self.cc_data.get_var("gradp_x")
        gradp_y = self.cc_data.get_var("gradp_y")
        phi = self.cc_data.get_var("phi")

        if other_source_term:
            source_x, source_y = self.other_source_term()
        else:
            source_x, source_y = None, None

        limiter = self.rp.get_param("incompressible.limiter")

        ldelta_ux = reconstruction.limit(u, myg, 1, limiter)
        ldelta_vx = reconstruction.limit(v, myg, 1, limiter)
        ldelta_uy = reconstruction.limit(u, myg, 2, limiter)
        ldelta_vy = reconstruction.limit(v, myg, 2, limiter)

        # MAC velocities (normal velocities on cell edges)
        if self.verbose > 0:
            print("  making MAC velocities")
        u_MAC, v_MAC = incomp_interface.mac_vels(
            myg, dt, u, v, ldelta_ux, ldelta_vx, ldelta_uy, ldelta_vy,
            gradp_x, gradp_y, source_x, source_y)

        # --- MAC projection -------------------------------------------------
        if self.verbose > 0:
            print("  MAC projection")
        mg = self._proj_mg()

        um = ai(u_MAC, myg)
        vm = ai(v_MAC, myg)
        div_v = ((um.ip(1) - um.v()) / myg.dx +
                 (vm.jp(1) - vm.v()) / myg.dy)
        divU = mg.soln_grid.scratch_array()
        divU = divU.at[mg.ilo:mg.ihi + 1, mg.jlo:mg.jhi + 1].set(div_v)

        mg.init_zeros()
        mg.init_RHS(divU)
        mg.solve(rtol=1.e-12)

        solution = mg.get_solution()
        phi_MAC = self.cc_data.get_var("phi-MAC")
        phi_MAC = phi_MAC.at[myg.ilo - 1:myg.ihi + 2,
                             myg.jlo - 1:myg.jhi + 2].set(
            ai(solution, mg.soln_grid).v(buf=1))
        self.cc_data.set_var("phi-MAC", phi_MAC)

        pm = ai(phi_MAC, myg)
        # subtract the edge-centered gradient on all domain edges
        u_MAC = u_MAC.at[myg.ilo:myg.ihi + 2, myg.jlo:myg.jhi + 1].add(
            -(pm.v(buf=(0, 1, 0, 0)) - pm.ip(-1, buf=(0, 1, 0, 0))) / myg.dx)
        v_MAC = v_MAC.at[myg.ilo:myg.ihi + 1, myg.jlo:myg.jhi + 2].add(
            -(pm.v(buf=(0, 0, 0, 1)) - pm.jp(-1, buf=(0, 0, 0, 1))) / myg.dy)

        # --- full interface states -----------------------------------------
        if self.verbose > 0:
            print("  making u, v edge states")
        u_xint, v_xint, u_yint, v_yint = incomp_interface.states(
            myg, dt, u, v, ldelta_ux, ldelta_vx, ldelta_uy, ldelta_vy,
            gradp_x, gradp_y, u_MAC, v_MAC, source_x, source_y)

        # --- provisional velocity update -----------------------------------
        proj_type = self.rp.get_param("incompressible.proj_type")

        if other_update_velocity:
            self.do_other_update_velocity((u_MAC, v_MAC),
                                          (u_xint, u_yint, v_xint, v_yint))
            u = self.cc_data.get_var("x-velocity")
            v = self.cc_data.get_var("y-velocity")
        else:
            if self.verbose > 0:
                print("  doing provisional update of u, v")
            um = ai(u_MAC, myg)
            vm = ai(v_MAC, myg)
            uxi = ai(u_xint, myg)
            vxi = ai(v_xint, myg)
            uyi = ai(u_yint, myg)
            vyi = ai(v_yint, myg)

            advect_x_v = (0.5 * (um.v() + um.ip(1)) *
                          (uxi.ip(1) - uxi.v()) / myg.dx +
                          0.5 * (vm.v() + vm.jp(1)) *
                          (uyi.jp(1) - uyi.v()) / myg.dy)
            advect_y_v = (0.5 * (um.v() + um.ip(1)) *
                          (vxi.ip(1) - vxi.v()) / myg.dx +
                          0.5 * (vm.v() + vm.jp(1)) *
                          (vyi.jp(1) - vyi.v()) / myg.dy)

            sl = (slice(myg.ilo, myg.ihi + 1), slice(myg.jlo, myg.jhi + 1))
            if proj_type == 1:
                u = u.at[sl].add(-dt * advect_x_v)
                u = u - dt * gradp_x
                v = v.at[sl].add(-dt * advect_y_v)
                v = v - dt * gradp_y
            elif proj_type == 2:
                u = u.at[sl].add(-dt * advect_x_v)
                v = v.at[sl].add(-dt * advect_y_v)

            self.cc_data.set_var("x-velocity", u)
            self.cc_data.set_var("y-velocity", v)

        self.cc_data.fill_BC("x-velocity")
        self.cc_data.fill_BC("y-velocity")
        u = self.cc_data.get_var("x-velocity")
        v = self.cc_data.get_var("y-velocity")

        # --- final projection ----------------------------------------------
        if self.verbose > 0:
            print("  final projection")
        mg = self._proj_mg()

        mg.init_RHS(self._cc_divU(u, v, mg.soln_grid) / dt)
        phiGuess = mg.soln_grid.scratch_array()
        phiGuess = phiGuess.at[mg.ilo - 1:mg.ihi + 2,
                               mg.jlo - 1:mg.jhi + 2].set(
            ai(phi, myg).v(buf=1))
        mg.init_solution(phiGuess)
        mg.solve(rtol=1.e-12)

        self.cc_data.set_var("phi", mg.get_solution(grid=myg))

        gradphi_x, gradphi_y = mg.get_solution_gradient(grid=myg)

        self.cc_data.set_var("x-velocity", u - dt * gradphi_x)
        self.cc_data.set_var("y-velocity", v - dt * gradphi_y)

        if proj_type == 1:
            self.cc_data.set_var("gradp_x", gradp_x + gradphi_x)
            self.cc_data.set_var("gradp_y", gradp_y + gradphi_y)
        elif proj_type == 2:
            self.cc_data.set_var("gradp_x", gradphi_x)
            self.cc_data.set_var("gradp_y", gradphi_y)

        self.cc_data.fill_BC("x-velocity")
        self.cc_data.fill_BC("y-velocity")

        if self.particles is not None:
            self.particles.update_particles(self.dt)

        if not self.in_preevolve:
            self.cc_data.t += self.dt
            self.n += 1

    def dovis(self):
        """Runtime visualization: velocities, vorticity, div U."""
        import jax.numpy as jnp

        from pyro2_tpu.util import plot_tools

        myg = self.cc_data.grid
        u = self.cc_data.get_var("x-velocity")
        v = self.cc_data.get_var("y-velocity")

        uv = ai(u, myg)
        vv = ai(v, myg)
        vort = jnp.zeros_like(u).at[
            myg.ilo:myg.ihi + 1, myg.jlo:myg.jhi + 1].set(
            0.5 * (vv.ip(1) - vv.ip(-1)) / myg.dx -
            0.5 * (uv.jp(1) - uv.jp(-1)) / myg.dy)
        divU = self._cc_divU(u, v, myg)

        plot_tools.plot_fields(
            self, [("x-velocity", u), ("y-velocity", v),
                   ("vorticity", vort), ("div U", divU)])
