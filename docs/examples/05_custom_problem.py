#!/usr/bin/env python3
"""Adding a custom problem through the library API.

Executable-documentation port of the reference's
docs/source/adding_a_problem_jupyter.ipynb: define a new initial-condition
function, register it with `Pyro.add_problem`, run the simulation, and
inspect the result -- all without touching the package source.

The problem contract (reference pyro_sim.py:131-139): a function
`init_data(my_data, rp)` that fills the state container, plus an optional
dict of problem parameters that become runtime parameters.

Run:  python docs/examples/05_custom_problem.py [out_dir]
"""

import os
import sys

import numpy as np

from pyro2_tpu.pyro_sim import Pyro


def tophat_init(my_data, rp):
    """A top-hat of density 2 inside a circle of radius r, 1 outside."""
    g = my_data.grid
    xctr = rp.get_param("tophat.x_center")
    yctr = rp.get_param("tophat.y_center")
    r = rp.get_param("tophat.radius")

    inside = (np.asarray(g.x2d) - xctr) ** 2 + \
        (np.asarray(g.y2d) - yctr) ** 2 < r ** 2
    my_data.set_var("density", np.where(inside, 2.0, 1.0))


def main(out_dir=None):
    p = Pyro("advection")
    p.add_problem("tophat", tophat_init,
                  problem_params={"tophat.x_center": 0.5,
                                  "tophat.y_center": 0.5,
                                  "tophat.radius": 0.2})
    p.initialize_problem("tophat", inputs_dict={
        "mesh.nx": 32, "mesh.ny": 32,
        "mesh.xlboundary": "periodic", "mesh.xrboundary": "periodic",
        "mesh.ylboundary": "periodic", "mesh.yrboundary": "periodic",
        "driver.tmax": 1.0,
        "advection.u": 1.0, "advection.v": 1.0})

    dens0 = np.asarray(p.get_var("density")).copy()
    p.run_sim()
    dens = np.asarray(p.get_var("density"))

    g = p.get_grid()
    sl = (slice(g.ilo, g.ihi + 1), slice(g.jlo, g.jhi + 1))

    # after exactly one advection period the profile returns to its start
    # (up to limiter diffusion); total mass is conserved to roundoff
    m0, m1 = dens0[sl].sum(), dens[sl].sum()
    print(f"t = {p.sim.cc_data.t:.4f}, steps = {p.sim.n}")
    print(f"mass before/after: {m0:.12g} / {m1:.12g}")
    assert abs(m1 - m0) / m0 < 1.e-12
    err = np.abs(dens[sl] - dens0[sl]).max()
    print(f"max |rho(t=1) - rho(0)| = {err:.3f} (limiter diffusion)")
    assert err < 1.0

    if out_dir is not None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(9, 4))
        for ax, (name, a) in zip(axes, [("t = 0", dens0[sl]),
                                        ("t = 1 (one period)", dens[sl])]):
            img = ax.imshow(a.T, origin="lower", extent=(0, 1, 0, 1),
                            vmin=1.0, vmax=2.0)
            fig.colorbar(img, ax=ax, shrink=0.8)
            ax.set_title(name)
        fig.tight_layout()
        out = os.path.join(out_dir, "custom_problem.png")
        fig.savefig(out, dpi=100)
        print(f"wrote {out}")

    print("05_custom_problem: ok")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
