"""Generic explicit Runge-Kutta integration via Butcher tableaux.

Functional analog of the reference RKIntegrator
(/root/reference/pyro/mesh/integration.py:74-129): stage starts and the final
update are pure pytree algebra over (nvar, qx, qy) stacks; only the valid
region is accumulated (ghosts are refilled by the caller each stage).
"""

import numpy as np

from pyro2_tpu.mesh import patch

a = {
    "RK2": np.array([[0.0, 0.0], [0.5, 0.0]]),
    "TVD2": np.array([[0.0, 0.0], [1.0, 0.0]]),
    "TVD3": np.array([[0.0, 0.0, 0.0],
                      [1.0, 0.0, 0.0],
                      [0.25, 0.25, 0.0]]),
    "RK4": np.array([[0.0, 0.0, 0.0, 0.0],
                     [0.5, 0.0, 0.0, 0.0],
                     [0.0, 0.5, 0.0, 0.0],
                     [0.0, 0.0, 1.0, 0.0]]),
}

b = {
    "RK2": np.array([0.0, 1.0]),
    "TVD2": np.array([0.5, 0.5]),
    "TVD3": np.array([1. / 6., 1. / 6., 2. / 3.]),
    "RK4": np.array([1. / 6., 1. / 3., 1. / 3., 1. / 6.]),
}

c = {
    "RK2": np.array([0.0, 0.5]),
    "TVD2": np.array([0.0, 1.0]),
    "TVD3": np.array([0.0, 1.0, 0.5]),
    "RK4": np.array([0.0, 0.5, 0.5, 1.0]),
}


def _add_valid(stack, g, incr, coeff):
    """stack + coeff*incr over the valid region only."""
    sl = (Ellipsis, slice(g.ilo, g.ihi + 1), slice(g.jlo, g.jhi + 1))
    return stack.at[sl].add(coeff * incr[sl])


class RKIntegrator:
    """Explicit RK over CellCenterData2d state.

    Usage matches the reference: set_start, then for each stage
    get_stage_start -> evaluate -> store_increment, finally
    compute_final_update.
    """

    def __init__(self, t, dt, method="RK4"):
        self.method = method
        self.t = t
        self.dt = dt
        self.k = [None] * len(b[self.method])
        self.start = None

    def nstages(self):
        return len(b[self.method])

    def set_start(self, start):
        """Store the starting CellCenterData2d."""
        self.start = start

    def store_increment(self, istage, k_stage):
        """Store stage istage's increment stack (no dt weighting)."""
        self.k[istage] = k_stage

    def get_stage_start(self, istage):
        """CellCenterData2d holding the stage-istage starting state."""
        if istage == 0:
            return self.start
        ytmp = patch.cell_center_data_clone(self.start)
        stack = ytmp.data
        for s in range(istage):
            coeff = self.dt * a[self.method][istage, s]
            if coeff != 0.0:
                stack = _add_valid(stack, ytmp.grid, self.k[s], coeff)
        ytmp.data = stack
        ytmp.t = self.t + c[self.method][istage] * self.dt
        return ytmp

    def compute_final_update(self):
        """The t + dt update (overwrites the start object's stack)."""
        ytmp = self.start
        stack = ytmp.data
        for s in range(self.nstages()):
            coeff = self.dt * b[self.method][s]
            if coeff != 0.0:
                stack = _add_valid(stack, ytmp.grid, self.k[s], coeff)
        ytmp.data = stack
        return ytmp

    def __str__(self):
        return (f"integration method: {self.method}; "
                f"number of stages: {self.nstages()}")
