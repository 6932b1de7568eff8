"""4th-order FV compressible Simulation (reference:
pyro/compressible_fv4/simulation.py): FV2d averages, sources evaluated at
centers then converted back to averages, RK evolve."""

import jax
import jax.numpy as jnp
import numpy as np

import pyro2_tpu.solvers.compressible_fv4.fluxes as flx
from pyro2_tpu.mesh import fv
from pyro2_tpu.mesh.fv import from_centers_array, to_centers_array
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.solvers import compressible_rk
from pyro2_tpu.solvers.compressible import (get_external_sources,
                                            get_sponge_factor)


class Simulation(compressible_rk.Simulation):

    def __init__(self, solver_name, problem_name, problem_func, rp, *,
                 problem_finalize_func=None, problem_source_func=None,
                 timers=None, data_class=fv.FV2d):
        super().__init__(solver_name, problem_name, problem_func, rp,
                         problem_finalize_func=problem_finalize_func,
                         problem_source_func=problem_source_func,
                         timers=timers, data_class=data_class)

    def _make_substep(self):
        """The raw (unjitted) stage-increment closure (see
        compressible_rk.Simulation._make_substep)."""
        myg = self.cc_data.grid
        rp = self.rp
        ivars = self.ivars
        my_data = self.cc_data
        problem_source = self.problem_source
        small_dens = rp.get_param("compressible.small_dens")
        do_sponge = rp.get_param("sponge.do_sponge")
        iv_sl = (slice(None), slice(myg.ilo, myg.ihi + 1),
                 slice(myg.jlo, myg.jhi + 1))

        def substep(U, t, dt):
            # clamp the -1e200 "no floor" sentinel to the dtype's finite
            # range (an f32 cast of -1e200 overflows and warns)
            floor = max(small_dens, float(jnp.finfo(U.dtype).min))
            U = U.at[(ivars.idens,) + iv_sl[1:]].set(
                jnp.maximum(U[(ivars.idens,) + iv_sl[1:]], floor))

            # sources at centers, converted back to averages
            U_cc = to_centers_array(U, myg)
            S = get_external_sources(t, dt, U_cc, ivars, rp, myg,
                                     problem_source=problem_source)
            Sv = ai(S, myg)
            S = S.at[iv_sl].add(-myg.dx ** 2 * Sv.lap() / 24.0)

            F_x, F_y = flx.fluxes(U, my_data, rp, ivars)
            Fx = ai(F_x, myg)
            Fy = ai(F_y, myg)
            k_v = ((Fx.v() - Fx.ip(1)) / myg.dx +
                   (Fy.v() - Fy.jp(1)) / myg.dy + S[iv_sl])

            if do_sponge:
                kappa_f = get_sponge_factor(U, ivars, rp, myg)
                kf = ai(kappa_f, myg).v()
                Uv = ai(U, myg)
                k_v = k_v.at[ivars.ixmom].add(-kf * Uv.v()[ivars.ixmom])
                k_v = k_v.at[ivars.iymom].add(-kf * Uv.v()[ivars.iymom])
                k_v = k_v.at[ivars.iener].add(
                    -kf * (Uv.v()[ivars.ixmom] ** 2 /
                           Uv.v()[ivars.idens] +
                           Uv.v()[ivars.iymom] ** 2 /
                           Uv.v()[ivars.idens]))

            k = jnp.zeros_like(U)
            return k.at[iv_sl].set(k_v)

        return substep

    def preevolve(self):
        """Convert the cell-centered ICs to cell averages (dx == dy)."""
        g = self.cc_data.grid
        assert np.abs(g.dx - g.dy) < 1.e-12 * g.dx, \
            "grid cells need to be square"
        for var in self.cc_data.names:
            self.cc_data.from_centers(var)
