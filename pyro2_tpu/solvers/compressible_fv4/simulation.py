"""4th-order FV compressible Simulation (reference:
pyro/compressible_fv4/simulation.py): FV2d averages, sources evaluated at
centers then converted back to averages, RK evolve."""

import jax
import jax.numpy as jnp
import numpy as np

import pyro2_tpu.solvers.compressible_fv4.fluxes as flx
from pyro2_tpu.mesh import fv
from pyro2_tpu.mesh.fv import to_centers_array
from pyro2_tpu.mesh.indexer import ai
from pyro2_tpu.solvers import compressible_rk
from pyro2_tpu.solvers.compressible import (get_external_sources,
                                            get_sponge_factor)


def build_substep(myg, rp, ivars, problem_source=None):
    """The raw fv4 stage-increment closure on an arbitrary grid.

    Standalone so the fused Pallas band kernel
    (compressible_fv4/pallas_step.py) can instantiate the IDENTICAL
    pipeline on its band grid; Simulation._make_substep delegates here.
    """
    small_dens = rp.get_param("compressible.small_dens")
    do_sponge = rp.get_param("sponge.do_sponge")

    class _Data:
        grid = myg

    my_data = _Data()

    def substep(U, t, dt):
        # scatter-free and full-frame-aware throughout, so the SAME
        # closure runs inside the fused Pallas band kernel
        from pyro2_tpu.mesh.indexer import embed, embed_into

        # clamp the -1e200 "no floor" sentinel to the dtype's finite
        # range (an f32 cast of -1e200 overflows and warns)
        floor = max(small_dens, float(jnp.finfo(U.dtype).min))
        dens = U[ivars.idens]
        dens_f = embed_into(
            jnp.maximum(ai(dens, myg).v(), floor), myg, dens)
        rows = [U[n] for n in range(ivars.nvar)]
        rows[ivars.idens] = dens_f
        U = jnp.stack(rows)

        # sources at centers, converted back to averages
        U_cc = to_centers_array(U, myg)
        S = get_external_sources(t, dt, U_cc, ivars, rp, myg,
                                 problem_source=problem_source)
        Sv = ai(S, myg)
        S = S + embed(-myg.dx ** 2 * Sv.lap() / 24.0, myg)

        F_x, F_y = flx.fluxes(U, my_data, rp, ivars)
        Fx = ai(F_x, myg)
        Fy = ai(F_y, myg)
        k_v = ((Fx.v() - Fx.ip(1)) / myg.dx +
               (Fy.v() - Fy.jp(1)) / myg.dy + ai(S, myg).v())

        if do_sponge:
            kappa_f = get_sponge_factor(U, ivars, rp, myg)
            kf = ai(kappa_f, myg).v()
            Uv = ai(U, myg)
            krows = [k_v[n] for n in range(ivars.nvar)]
            krows[ivars.ixmom] = krows[ivars.ixmom] + \
                (-kf * Uv.v()[ivars.ixmom])
            krows[ivars.iymom] = krows[ivars.iymom] + \
                (-kf * Uv.v()[ivars.iymom])
            krows[ivars.iener] = krows[ivars.iener] + (
                -kf * (Uv.v()[ivars.ixmom] ** 2 /
                       Uv.v()[ivars.idens] +
                       Uv.v()[ivars.iymom] ** 2 /
                       Uv.v()[ivars.idens]))
            k_v = jnp.stack(krows)

        return embed(k_v, myg)

    return substep


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
        return build_substep(self.cc_data.grid, self.rp, self.ivars,
                             problem_source=self.problem_source)

    def _make_fused_substep(self):
        """The fused Pallas band-kernel twin of the substep (bitwise on
        the interior; tests/test_pallas_tpu.py)."""
        from pyro2_tpu.solvers.compressible_fv4.pallas_step import \
            make_pallas_fv4_substep
        return make_pallas_fv4_substep(self)

    def preevolve(self):
        """Convert the cell-centered ICs to cell averages (dx == dy)."""
        g = self.cc_data.grid
        assert np.abs(g.dx - g.dy) < 1.e-12 * g.dx, \
            "grid cells need to be square"
        for var in self.cc_data.names:
            self.cc_data.from_centers(var)
