"""A test of energy sources: heat slowly added at the domain center."""

import jax.numpy as jnp
import numpy as np

from pyro2_tpu.util import msg

DEFAULT_INPUTS = "inputs.heating"

PROBLEM_PARAMS = {"heating.rho_ambient": 1.0,
                  "heating.p_ambient": 10.0,
                  "heating.r_src": 0.1,
                  "heating.e_rate": 0.1}


def init_data(my_data, rp):
    """Initialize the heating problem."""
    if rp.get_param("driver.verbose"):
        msg.bold("initializing the heating problem...")

    gamma = rp.get_param("eos.gamma")
    g = my_data.grid
    shape = (g.qx, g.qy)
    my_data.set_var("density",
                    np.full(shape, rp.get_param("heating.rho_ambient")))
    my_data.set_var("x-momentum", np.zeros(shape))
    my_data.set_var("y-momentum", np.zeros(shape))
    my_data.set_var("energy",
                    np.full(shape,
                            rp.get_param("heating.p_ambient") /
                            (gamma - 1.0)))


def source_terms(myg, U, ivars, rp):
    """Gaussian central heating source (pure; jit-safe)."""
    xctr = 0.5 * (myg.xmin + myg.xmax)
    yctr = 0.5 * (myg.ymin + myg.ymax)
    dist = np.sqrt((myg.x2d - xctr) ** 2 + (myg.y2d - yctr) ** 2)

    e_rate = rp.get_param("heating.e_rate")
    r_src = rp.get_param("heating.r_src")

    S = jnp.zeros_like(U)
    return S.at[ivars.iener].set(
        U[ivars.idens] * e_rate * jnp.asarray(np.exp(-(dist / r_src) ** 2)))


def finalize():
    """Print out any information to the user at the end of the run."""
    print("""
          The script analysis/sedov_compare.py can be used to analyze
          these results.
          """)
